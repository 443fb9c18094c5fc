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

  /** Unrolled codegen'd dot product of two fixed-`dim` double-array
    * columns: `dim` scalar multiply-adds whole-stage codegen compiles
    * flat, vs a `zip_with`+`aggregate` HOF that Catalyst interprets
    * per element (lambdas never enter codegen). Left-to-right sum —
    * bit-identical to the old `aggregate` fold (0.0 + x = x).
    */
  def dot(a: String, b: String, dim: Int): Column =
    (0 until dim).map(i => col(a).getItem(i) * col(b).getItem(i)).reduce(_ + _)

  /** Unrolled codegen'd L2 norm of a fixed-`dim` double-array column. */
  def l2(vCol: String, dim: Int): Column =
    sqrt((0 until dim).map(i => col(vCol).getItem(i) * col(vCol).getItem(i)).reduce(_ + _))

  /** Cosine similarity of two fixed-`dim` double-array columns, rounded
    * to 6. Formula and fold order are bit-identical to the DuckDB oracle
    * fragment (`list_sum(products) / (sqrt(·)·sqrt(·))`), just unrolled
    * for codegen. A zero-norm vector (padding row, failed embedding)
    * yields NULL, which threshold filters and topK ranking drop
    * naturally — under Spark 4's default ANSI mode an unguarded
    * divide-by-zero would instead abort the whole job.
    */
  def cosine(a: String, b: String, dim: Int = 64): Column = {
    val denom = l2(a, dim) * l2(b, dim)
    when(denom === 0.0, lit(null)).otherwise(round(dot(a, b, dim) / denom, 6))
  }

  /** Axis-aligned LSH bucket: 8 sign bits from the first 8 dims,
    * unrolled to codegen'd scalar ops. Kept as the ORACLE form
    * (trivially expressible in DuckDB); production uses
    * [[hyperplaneBucket]] — axis-aligned planes skew badly when leading
    * dims are correlated (e.g. all-positive first components put the
    * whole corpus in one bucket).
    */
  def signBucket(vCol: String, bits: Int = 8): Column =
    (0 until bits).map(i =>
      when(col(vCol).getItem(i) >= lit(0.0), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Random-hyperplane LSH bucket (production tier): bit b = sign of
    * v · r_b where r_b's components are seeded pseudo-random values in
    * [-1, 1] derived from murmur3 `hash(seed, b, i)` — deterministic
    * across runs/partitionings/engines. The planes are pure CONSTANTS of
    * (bits, seed, dim), so they are materialized once driver-side
    * ([[hyperplanes]]) and inlined as literals; each dot product unrolls
    * into `dim` scalar multiply-adds that whole-stage codegen compiles
    * flat — no higher-order-function lambdas (Catalyst interprets those
    * per element) and no per-element murmur3 on the executors. At a few
    * KB per plane set the literals ride inside the serialized plan, the
    * cluster analog of a tiny broadcast. `bits` sizes the bucket space
    * (2^bits); at corpus scale bits should grow with n to hold the
    * per-bucket pair count (n²/2^bits) near-constant — the knob the
    * axis-aligned form lacked. Same bucket-equi-join downstream shape as
    * [[signBucket]]. `dim` must equal the vector length (out-of-bounds
    * element access throws under ANSI mode).
    */
  def hyperplaneBucket(vCol: String, bits: Int, seed: Int, dim: Int,
                       planeOffset: Int = 0): Column = {
    val planes = hyperplanes(planeOffset + bits, seed, dim).drop(planeOffset)
    val v = col(vCol)
    planes.zipWithIndex.map { case (r, b) =>
      // 0.0 + x0 + x1 + ... of the old fold == x0 + x1 + ... bit-for-bit
      // (IEEE: 0.0 + x = x up to the sign of zero, irrelevant to >= 0)
      val dot = (0 until dim).map(i => v.getItem(i) * lit(r(i))).reduce(_ + _)
      when(dot >= lit(0.0), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

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
                       seed: Int, dim: Int): DataFrame =
    df.select(col("*"),
      posexplode(array((0 until bands).map(k =>
        hyperplaneBucket(vCol, bitsPerBand, seed, dim, k * bitsPerBand)): _*))
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
