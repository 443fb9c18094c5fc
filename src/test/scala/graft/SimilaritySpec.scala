package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** LSH bucket properties: the axis-aligned oracle form degenerates on
  * correlated leading dims; the seeded random-hyperplane form must
  * spread the same corpus, be deterministic per seed, and vary by seed.
  */
class SimilaritySpec extends SparkSpec {

  /** 2000 vectors, dim 16, ALL components positive — the pathological
    * corpus for axis-aligned sign bits (every first-8-dims sign is +).
    */
  private def positiveCorpus() =
    spark.range(2000).select(col("id").as("vec_id"), expr(
      "transform(sequence(0, 15), i -> (pmod(hash(id, i), 1000) + 1) / CAST(1000 AS DOUBLE))").as("v"))

  test("axis-aligned buckets collapse on a positive corpus; hyperplane buckets spread it") {
    val df = positiveCorpus()
      .withColumn("axis", Similarity.signBucket("v"))
      .withColumn("hyp", Similarity.hyperplaneBucket("v", bits = 8, seed = 1, dim = 16))
      .cache()
    try {
      // all 8 leading components positive -> one bucket for the WHOLE corpus
      assert(df.select(countDistinct(col("axis"))).head().getLong(0) === 1L)
      val counts = df.groupBy(col("hyp")).count().collect().map(_.getLong(1))
      val distinct = counts.length
      val maxShare = counts.max.toDouble / 2000.0
      // spread over a meaningful fraction of the 256-bucket space, with
      // no single bucket holding a majority. Residual concentration is
      // the DATA's: an all-positive corpus is genuinely clustered in
      // cosine space (origin-through hyperplanes see the mean offset),
      // so near-uniform balance is not achievable nor desirable — the
      // property that matters vs the axis form is collapse avoidance.
      assert(distinct >= 64, s"only $distinct hyperplane buckets")
      assert(maxShare < 0.5, s"hot bucket holds ${maxShare * 100}% of the corpus")
    } finally df.unpersist()
  }

  test("hyperplane buckets are deterministic per seed and differ across seeds") {
    val df = positiveCorpus()
      .withColumn("b1", Similarity.hyperplaneBucket("v", bits = 8, seed = 42, dim = 16))
      .withColumn("b1b", Similarity.hyperplaneBucket("v", bits = 8, seed = 42, dim = 16))
      .withColumn("b2", Similarity.hyperplaneBucket("v", bits = 8, seed = 43, dim = 16))
    assert(df.where(col("b1") =!= col("b1b")).count() === 0L)
    assert(df.where(col("b1") =!= col("b2")).count() > 0L)
  }

  test("bits parameter bounds the bucket space") {
    val df = positiveCorpus()
      .withColumn("b", Similarity.hyperplaneBucket("v", bits = 4, seed = 7, dim = 16))
    val buckets = df.select(col("b")).distinct().collect().map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < 16))
  }

  test("near-duplicate vectors land in the same hyperplane bucket (the LSH property)") {
    // pairs (v, v + tiny noise): cosine ~ 1, so nearly every pair must
    // collide; a far vector (negated) must not follow its partner
    val df = spark.range(500).select(col("id"), expr(
        "transform(sequence(0, 15), i -> (pmod(hash(id, i), 2001) - 1000) / CAST(1000 AS DOUBLE))").as("v"))
      .withColumn("vnear", expr(
        "transform(sequence(0, 15), i -> v[i] + (pmod(hash(id, i, 99), 21) - 10) / CAST(10000 AS DOUBLE))"))
      .withColumn("vfar", expr("transform(v, x -> -x)"))
      .withColumn("b", Similarity.hyperplaneBucket("v", 8, 5, 16))
      .withColumn("bn", Similarity.hyperplaneBucket("vnear", 8, 5, 16))
      .withColumn("bf", Similarity.hyperplaneBucket("vfar", 8, 5, 16))
      .cache()
    try {
      val nearHit = df.where(col("b") === col("bn")).count() / 500.0
      val farHit = df.where(col("b") === col("bf")).count() / 500.0
      assert(nearHit > 0.9, s"near-dup collision rate $nearHit")
      assert(farHit < 0.05, s"negated vectors collide at $farHit")
    } finally df.unpersist()
  }

  test("banded hyperplane codes: band k reproduces the offset single-code form, bounded by 2^r") {
    val bands = 2; val r = 4; val seed = 11
    val df = Similarity.bandedHyperplane(positiveCorpus(), "v", bands, r, seed, dim = 16)
      .withColumn("expect0", Similarity.hyperplaneBucket("v", r, seed, 16, planeOffset = 0))
      .withColumn("expect1", Similarity.hyperplaneBucket("v", r, seed, 16, planeOffset = r))
      .cache()
    try {
      // exactly `bands` rows per vector, one per band id
      assert(df.groupBy(col("vec_id")).count().where(col("count") =!= bands).count() === 0L)
      // band k's code IS hyperplaneBucket over planes [k*r, (k+1)*r)
      assert(df.where(col("band") === 0 && col("bkt") =!= col("expect0")).count() === 0L)
      assert(df.where(col("band") === 1 && col("bkt") =!= col("expect1")).count() === 0L)
      // codes live in [0, 2^r)
      assert(df.where(col("bkt") < 0 || col("bkt") >= (1 << r)).count() === 0L)
      // OR-amplification: banded collision rate (any band agrees) must be
      // at least the single 8-bit code's rate on the same corpus
      val single = positiveCorpus().withColumn("b8", Similarity.hyperplaneBucket("v", 8, seed, 16))
      val n = 2000L
      val singlePairs = single.groupBy(col("b8")).count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0)
      val bandedPairs = df.groupBy(col("band"), col("bkt")).count()
        .agg(sum(col("count") * (col("count") - 1))).head().getLong(0)
      assert(bandedPairs >= singlePairs, s"banded $bandedPairs < single $singlePairs of ${n * (n - 1)}")
    } finally df.unpersist()
  }

  test("literal-plane production bucket matches the inline-murmur3 expression bit-for-bit") {
    // Similarity.hyperplanes drives BOTH the production bucket (literal
    // planes unrolled into codegen'd dots) and the DuckDB oracle's
    // inlined plane arrays; this differential re-derives the planes
    // inside Spark SQL via `hash(seed, b, i)` (the construction's
    // definition) and pins the driver-side murmur3 fold order (seed 42,
    // one hashInt per int arg) to Spark's hash() so the two engines can
    // never silently desync.
    val bits = 8; val seed = 7; val dim = 16
    val inlineMurmur = expr(
      s"""CAST(aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT),
         |  (acc, b) -> acc + IF(
         |    aggregate(sequence(0, $dim - 1), CAST(0 AS DOUBLE),
         |      (dot, i) -> dot + v[i] *
         |        ((pmod(hash($seed, b, i), 2001) - 1000) / CAST(1000 AS DOUBLE))) >= CAST(0 AS DOUBLE),
         |    shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT))) AS BIGINT)""".stripMargin)
    val df = positiveCorpus()
      .withColumn("prod", Similarity.hyperplaneBucket("v", bits, seed, dim))
      .withColumn("murmur", inlineMurmur)
    assert(df.where(col("prod") =!= col("murmur")).count() === 0L)
  }
}
