package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over an embedding column
  * (`Array[Float]`, cast to double for deterministic cross-engine math).
  *
  * Two tiers (builder prompt):
  *  - brute-force cosine top-k: the correctness baseline. Candidates
  *    stream, queries broadcast; cost O(|Q| * n * d). Fine for |Q| small
  *    at any n (it is a single scan of the candidate table).
  *  - sign-bit LSH buckets: axis-aligned hyperplane LSH (sign of the
  *    first 8 dims = 256 buckets); candidate generation becomes an
  *    EQUI-join on the bucket id, shrinking the pair space ~256x. The
  *    100 TB shape: bucket is a partition key; each query probes one
  *    bucket's partition. Recall is traded for the usual LSH guarantees.
  */
object Similarity {

  /** embeddings -> (vec_id, label, v: array<double>). */
  def vectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))

  /** Cosine similarity of two double-array columns, rounded to 6. A
    * zero-norm vector (padding row, failed embedding) yields NULL, which
    * threshold filters and topK ranking drop naturally — under Spark 4's
    * default ANSI mode an unguarded divide-by-zero would instead abort
    * the whole job.
    */
  def cosine(a: String, b: String): Column = {
    val denom = sqrt(expr(s"aggregate($a, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)")) *
      sqrt(expr(s"aggregate($b, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x)"))
    val num = expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, z) -> acc + z)")
    when(denom === 0.0, lit(null)).otherwise(round(num / denom, 6))
  }

  /** Axis-aligned LSH bucket: 8 sign bits from the first 8 dims. Kept as
    * the ORACLE form (trivially expressible in DuckDB); production uses
    * [[hyperplaneBucket]] — axis-aligned planes skew badly when leading
    * dims are correlated (e.g. all-positive first components put the
    * whole corpus in one bucket).
    */
  def signBucket(vCol: String, bits: Int = 8): Column = expr(
    s"""CAST(aggregate(sequence(0, ${bits - 1}), 0,
       |  (acc, i) -> acc + IF($vCol[i] >= CAST(0 AS DOUBLE), shiftleft(1, i), 0)) AS BIGINT)""".stripMargin)

  /** Random-hyperplane LSH bucket (production tier): bit b = sign of
    * v · r_b where r_b's components are seeded pseudo-random values in
    * [-1, 1] derived from murmur3 `hash(seed, b, i)` — deterministic
    * across runs/partitionings/engines, no hyperplane table to ship
    * (each executor recomputes components inline, codegen'd higher-order
    * functions, no UDF). `bits` sizes the bucket space (2^bits); at
    * corpus scale bits should grow with n to hold the per-bucket pair
    * count (n²/2^bits) near-constant — the knob the axis-aligned form
    * lacked. Same bucket-equi-join downstream shape as [[signBucket]].
    */
  def hyperplaneBucket(vCol: String, bits: Int, seed: Int, planeOffset: Int = 0): Column = expr(
    s"""CAST(aggregate(sequence($planeOffset, ${planeOffset + bits - 1}), CAST(0 AS BIGINT),
       |  (acc, b) -> acc + IF(
       |    aggregate(sequence(0, size($vCol) - 1), CAST(0 AS DOUBLE),
       |      (dot, i) -> dot + $vCol[i] *
       |        ((pmod(hash($seed, b, i), 2001) - 1000) / CAST(1000 AS DOUBLE))) >= CAST(0 AS DOUBLE),
       |    shiftleft(CAST(1 AS BIGINT), b - $planeOffset), CAST(0 AS BIGINT))) AS BIGINT)""".stripMargin)

  /** OR-amplified (banded) hyperplane LSH, the minhash-bands construction
    * for cosine space: `bands` independent `bitsPerBand`-bit codes drawn
    * from one global plane sequence (band k owns planes
    * [k*bitsPerBand, (k+1)*bitsPerBand)); a candidate pair is anything
    * agreeing on ANY full band. Collision probability rises from p^bits
    * (single code) to 1-(1-p^r)^bands — the recall lever at a fixed
    * total plane budget, paid for in candidate volume. Emitted as
    * (band, bkt) pairs via posexplode; downstream is the same equi-join
    * shape, keyed on BOTH columns.
    */
  def bandedHyperplane(df: DataFrame, vCol: String, bands: Int, bitsPerBand: Int,
                       seed: Int): DataFrame =
    df.select(col("*"),
      posexplode(array((0 until bands).map(k =>
        hyperplaneBucket(vCol, bitsPerBand, seed, k * bitsPerBand)): _*))
        .as(Seq("band", "bkt")))

  /** Driver-side materialization of [[hyperplaneBucket]]'s planes:
    * r_b[i] = (pmod(murmur3(seed, b, i), 2001) - 1000) / 1000. The hash
    * args are CONSTANTS, so the planes are a pure function of
    * (bits, seed, dim) — this lets the DuckDB oracle inline them as
    * literal arrays (no murmur3 needed on the oracle side) and
    * SimilaritySpec prove bit-parity with the inline-murmur3 expression.
    * Composition mirrors Spark's Murmur3Hash fold: seed 42, then one
    * hashInt per int argument.
    */
  def hyperplanes(bits: Int, seed: Int, dim: Int): Seq[Array[Double]] = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt
    (0 until bits).map { b =>
      val hb = hashInt(b, hashInt(seed, 42))
      Array.tabulate(dim)(i => (Math.floorMod(hashInt(i, hb), 2001) - 1000) / 1000.0)
    }
  }

  /** Top-k per query with deterministic (sim desc, nid) ranking. */
  def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }
}
