package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumns}
import org.apache.spark.sql.functions._
import graft.functions.HyperplaneBucket

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
  *
  * All vector math is native Catalyst expressions
  * (graft.functions.VectorExprs — `doGenCode`, constant code size at
  * any dim). The two rejected alternatives, for the record:
  * `zip_with`/`aggregate` HOFs are interpreted per element (r6: 16.7 s
  * on a 1.0 s query), and unrolled per-element scalar trees blow
  * janino's 64 KB method limit at dim 64 and silently knock the whole
  * stage out of whole-stage codegen (r7: embed_banded_recall
  * 1.2 s → 9.7 s). The native loop is bit-identical to both (ascending-
  * index IEEE sum; 0.0 + x = x), so oracle hashes are unchanged.
  */
object Similarity {

  /** embeddings -> (vec_id, label, v: array<double>). */
  def vectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))

  /** Native codegen'd dot product of two double-array columns
    * (graft.functions.VecDot): one tight JIT-vectorizable loop inside
    * whole-stage codegen, any dim. Ascending-index accumulation —
    * bit-identical to the DuckDB `list_sum([a[i]*b[i] ...])` fold the
    * oracles use. NULL on length mismatch or a NULL element (the fold's
    * NULL-poisoning), so no dim knob: the kernel adapts to the actual
    * array lengths instead of aborting on a wrong literal.
    */
  def dot(a: String, b: String): Column =
    GraftColumns.column(graft.functions.VecDot(
      GraftColumns.expression(col(a)), GraftColumns.expression(col(b))))

  /** Column-expression variant of [[dot]] for derived arrays (slices,
    * transforms) that have no column name to refer to.
    */
  def dotC(a: Column, b: Column): Column =
    GraftColumns.column(graft.functions.VecDot(
      GraftColumns.expression(a), GraftColumns.expression(b)))

  /** Native codegen'd L2 norm: sqrt(vec_dot(v, v)). */
  def l2(vCol: String): Column = sqrt(dot(vCol, vCol))

  /** Native dot of a vector column against a CONSTANT vector (the
    * projection kernel): the constant ships as a plan literal, so the
    * executor-side work is the same single vec_dot loop — no per-row
    * array construction, no second column scan.
    */
  def dotConst(vCol: String, r: Seq[Double]): Column =
    GraftColumns.column(graft.functions.VecDot(
      GraftColumns.expression(col(vCol)),
      GraftColumns.expression(lit(r.toArray))))

  /** Cosine similarity of two double-array columns, rounded to 6.
    * Formula and fold order are bit-identical to the DuckDB oracle
    * fragment (`list_sum(products) / (sqrt(·)·sqrt(·))`), via the
    * native dot. A zero-norm vector (padding row, failed embedding)
    * yields NULL, which threshold filters and topK ranking drop
    * naturally — under Spark 4's default ANSI mode an unguarded
    * divide-by-zero would instead abort the whole job.
    */
  def cosine(a: String, b: String): Column = {
    val denom = l2(a) * l2(b)
    when(denom === 0.0, lit(null)).otherwise(round(dot(a, b) / denom, 6))
  }

  /** [[cosine]] over column expressions (e.g. `slice(col("v"), 1, d)`
    * for prefix-dim similarity) — same formula, fold order, zero-norm
    * guard, and 6-decimal round.
    */
  def cosineC(a: Column, b: Column): Column = {
    val denom = sqrt(dotC(a, a)) * sqrt(dotC(b, b))
    when(denom === 0.0, lit(null)).otherwise(round(dotC(a, b) / denom, 6))
  }

  /** Native prefix dot: the first `n` components only
    * (graft.functions.VecDotN) — bit-identical to
    * `dotC(slice(a,1,n), slice(b,1,n))` without the two sliced-copy
    * allocations per evaluation.
    */
  def dotPrefix(a: Column, b: Column, n: Int): Column =
    GraftColumns.column(graft.functions.VecDotN(
      GraftColumns.expression(a), GraftColumns.expression(b), n))

  /** Prefix-dim cosine (Matryoshka truncation scoring): [[cosine]]'s
    * exact formula over the first `n` components via [[dotPrefix]].
    */
  def cosinePrefix(a: Column, b: Column, n: Int): Column = {
    val denom = sqrt(dotPrefix(a, a, n)) * sqrt(dotPrefix(b, b, n))
    when(denom === 0.0, lit(null)).otherwise(round(dotPrefix(a, b, n) / denom, 6))
  }

  /** Axis-aligned LSH bucket: 8 sign bits from the first 8 dims,
    * unrolled to codegen'd scalar ops (small enough to stay well under
    * the codegen budget). Kept as the ORACLE form (trivially
    * expressible in DuckDB); production uses [[hyperplaneBucket]] —
    * axis-aligned planes skew badly when leading dims are correlated
    * (e.g. all-positive first components put the whole corpus in one
    * bucket).
    */
  def signBucket(vCol: String, bits: Int = 8): Column =
    (0 until bits).map(i =>
      when(col(vCol).getItem(i) >= lit(0.0), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Random-hyperplane LSH bucket (production tier): bit b = sign of
    * v · r_b where r_b's components are seeded pseudo-random values in
    * [-1, 1] derived from murmur3 `hash(seed, b, i)` — deterministic
    * across runs/partitionings/engines. The planes are pure CONSTANTS
    * of (bits, seed, dim), materialized once at plan-build time
    * ([[hyperplanes]]) and shipped inside the serialized plan (a few
    * KB — the cluster analog of a tiny broadcast); executors never
    * hash. Evaluation is the native
    * [[graft.functions.HyperplaneBucket]] expression — a constant-size
    * generated loop regardless of bits·dim, so the stage stays inside
    * whole-stage codegen at any plane budget. `bits` sizes the bucket
    * space (2^bits); at corpus scale bits should grow with n to hold
    * the per-bucket pair count (n²/2^bits) near-constant — the knob
    * the axis-aligned form lacked. Same bucket-equi-join downstream
    * shape as [[signBucket]]. `dim` must equal the vector length
    * (shorter vectors yield NULL).
    */
  def hyperplaneBucket(vCol: String, bits: Int, seed: Int, dim: Int,
                       planeOffset: Int = 0): Column =
    GraftColumns.column(HyperplaneBucket(
      GraftColumns.expression(col(vCol)),
      HyperplaneBucket.planes(bits, seed, dim, planeOffset)))

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

  /** Driver-side materialization of [[hyperplaneBucket]]'s planes —
    * delegates to [[graft.functions.HyperplaneBucket.planes]], the ONE
    * canonical derivation (r_b[i] = (pmod(murmur3(seed, b, i), 2001)
    * - 1000) / 1000, composed exactly like Spark's Murmur3Hash fold:
    * seed 42, one hashInt per int argument). The hash args are
    * CONSTANTS, so the planes are a pure function of (bits, seed, dim)
    * — this lets the DuckDB oracle inline them as literal arrays (no
    * murmur3 needed on the oracle side) and SimilaritySpec prove
    * bit-parity with an inline-murmur3 Spark expression.
    */
  def hyperplanes(bits: Int, seed: Int, dim: Int): Seq[Array[Double]] =
    HyperplaneBucket.planes(bits, seed, dim).map(_.toArray)

  /** Top-k per query with deterministic (sim desc, nid) ranking. */
  def topK(pairs: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }
}
