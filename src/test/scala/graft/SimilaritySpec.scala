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

  /** The unrolled scalar forms the native kernels replaced (r7's
    * Similarity.dot/hyperplaneBucket) — kept here as the differential
    * reference so a regression in either direction is loud.
    */
  private def unrolledDot(a: String, b: String, dim: Int) =
    (0 until dim).map(i => col(a).getItem(i) * col(b).getItem(i)).reduce(_ + _)

  private def unrolledBucket(vCol: String, bits: Int, seed: Int, dim: Int) =
    Similarity.hyperplanes(bits, seed, dim).zipWithIndex.map { case (r, b) =>
      val dot = (0 until dim).map(i => col(vCol).getItem(i) * lit(r(i))).reduce(_ + _)
      when(dot >= lit(0.0), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Two deterministic dim-16 vectors per row, signed components. */
  private def pairCorpus() =
    spark.range(2000).select(
      expr("transform(sequence(0, 15), i -> (pmod(hash(id, i), 2001) - 1000) / CAST(1000 AS DOUBLE))").as("v"),
      expr("transform(sequence(0, 15), i -> (pmod(hash(id + 7, i), 2001) - 1000) / CAST(1000 AS DOUBLE))").as("w"))

  test("native vec_dot / hyperplane_bucket match the unrolled scalar forms bit-for-bit") {
    val df = pairCorpus()
      .withColumn("nd", Similarity.dot("v", "w")).withColumn("ud", unrolledDot("v", "w", 16))
      .withColumn("nb", Similarity.hyperplaneBucket("v", 8, 7, 16))
      .withColumn("ub", unrolledBucket("v", 8, 7, 16))
      .withColumn("nbo", Similarity.hyperplaneBucket("v", 4, 7, 16, planeOffset = 4))
      .withColumn("ubo", shiftright(unrolledBucket("v", 8, 7, 16), 4))
    assert(df.where(col("nd") =!= col("ud")).count() === 0L)
    assert(df.where(col("nb") =!= col("ub")).count() === 0L)
    // planeOffset slice == high bits of the full code
    assert(df.where(col("nbo") =!= col("ubo")).count() === 0L)
  }

  test("native vec_dot_n equals vec_dot over slices, bit-for-bit, corners included") {
    val df = pairCorpus()
      .withColumn("np", Similarity.dotPrefix(col("v"), col("w"), 7))
      .withColumn("sp", Similarity.dotC(slice(col("v"), 1, 7), slice(col("w"), 1, 7)))
      .withColumn("cp", Similarity.cosinePrefix(col("v"), col("w"), 7))
      .withColumn("cs", Similarity.cosineC(slice(col("v"), 1, 7), slice(col("w"), 1, 7)))
    assert(df.where(col("np") =!= col("sp")).count() === 0L)
    assert(df.where(col("np").isNull).count() === 0L)
    assert(df.where(col("cp") =!= col("cs")).count() === 0L)
    // corners: n longer than the array -> NULL; a NULL element inside
    // the prefix poisons; a NULL element BEYOND the prefix does not
    val c = spark.range(1).select(
      Similarity.dotPrefix(
        expr("array(1.0D, 2.0D)"), expr("array(3.0D, 4.0D)"), 3).as("short"),
      Similarity.dotPrefix(
        expr("array(1.0D, CAST(NULL AS DOUBLE), 2.0D)"), expr("array(1.0D, 1.0D, 1.0D)"), 2).as("poisoned"),
      Similarity.dotPrefix(
        expr("array(1.0D, 2.0D, CAST(NULL AS DOUBLE))"), expr("array(3.0D, 4.0D, 5.0D)"), 2).as("beyond"))
      .head()
    assert(c.isNullAt(0), "n past the array end must be NULL")
    assert(c.isNullAt(1), "NULL inside the prefix must poison")
    assert(c.getDouble(2) === 11.0, "NULL beyond the prefix must not poison")
  }

  test("native kernels: interpreted eval matches codegen") {
    val before = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val beforeWs = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val codegen = pairCorpus()
      .withColumn("d", Similarity.dot("v", "w"))
      .withColumn("b", Similarity.hyperplaneBucket("v", 8, 7, 16))
      .collect()
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = pairCorpus()
        .withColumn("d", Similarity.dot("v", "w"))
        .withColumn("b", Similarity.hyperplaneBucket("v", 8, 7, 16))
        .collect()
      assert(codegen.toSeq === interp.toSeq)
    } finally {
      before.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      beforeWs.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
    }
  }

  test("null-element rows: vec_dot poisons to NULL, hyperplane_bucket falls to bucket 0 (CASE parity)") {
    // one NULL component: the fold form (and vec_dot) is NULL; the
    // unrolled CASE form (and the DuckDB oracle's identical CASE) sends
    // every plane's `NULL >= 0` to ELSE 0 — bucket 0, not NULL. The
    // native kernel must reproduce EXACTLY that asymmetry or a swap
    // between the forms silently changes query results.
    val df = spark.range(50).select(col("id"), expr(
        """transform(sequence(0, 15), i -> CASE WHEN i = pmod(id, 16)
          |  THEN CAST(NULL AS DOUBLE) ELSE CAST(i + 1 AS DOUBLE) END)""".stripMargin).as("v"))
      .withColumn("d", Similarity.dot("v", "v"))
      .withColumn("nb", Similarity.hyperplaneBucket("v", 8, 7, 16))
      .withColumn("ub", unrolledBucket("v", 8, 7, 16))
    assert(df.where(col("d").isNotNull).count() === 0L)
    assert(df.where(col("nb") =!= lit(0L)).count() === 0L)
    assert(df.where(col("nb") =!= col("ub")).count() === 0L)
  }

  test("degenerate inputs are NULL, not an abort: vec_dot length mismatch, short-vector bucket") {
    val df = spark.range(10).select(
        expr("transform(sequence(0, 15), i -> CAST(i AS DOUBLE))").as("v"),
        expr("transform(sequence(0, 7), i -> CAST(i AS DOUBLE))").as("short"))
      .withColumn("d", Similarity.dot("v", "short"))
      .withColumn("b", Similarity.hyperplaneBucket("short", 8, 7, 16))
    assert(df.where(col("d").isNotNull || col("b").isNotNull).count() === 0L)
  }

  test("SQL surface: vec_dot / hyperplane_bucket register for pure-SQL sessions") {
    graft.functions.VectorExprs.register(spark)
    val row = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       hyperplane_bucket(array(1.0D, -2.0D, 0.5D), 4, 7, 3) AS b""".stripMargin).head()
    assert(row.getDouble(0) === 32.0)
    val expected = spark.range(1)
      .select(expr("array(1.0D, -2.0D, 0.5D)").as("v"))
      .select(Similarity.hyperplaneBucket("v", 4, 7, 3)).head().getLong(0)
    assert(row.getLong(1) === expected)
  }

  test("hard-negative mining picks nearest same-label and nearest other-label, planted geometry") {
    import spark.implicits._
    // query (label 1) at [1,0]: same-label near [0.9,0.1] and far [0,1];
    // other-label hard [0.7,0.3] and easy [-1,0]. Expected triplet:
    // pos=10 (not 11), neg=12 (not 13), margin > 0.
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (10L, Array(0.9f, 0.1f), 1),
      (11L, Array(0.0f, 1.0f), 1),
      (12L, Array(0.7f, 0.3f), 2),
      (13L, Array(-1.0f, 0.0f), 3))
    val tmp = java.nio.file.Files.createTempDirectory("hardneg").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = graft.queries.EmbedQueries.embedHardNegatives.run(spark, tmp).head()
    assert(got.getLong(0) === 0L)
    assert(got.getLong(1) === 10L, s"positive: $got")
    assert(got.getLong(3) === 12L, s"hard negative: $got")
    assert(got.getDouble(5) > 0.0, s"margin: $got")
  }

  test("semantic dedup keeps the member farthest from the centroid, planted geometry") {
    import spark.implicits._
    // auto k = ceil(sqrt(4)) = 2: seeds are vec_ids 0 and 1. Seed-assign
    // puts c with b (d2 0.08 vs 0.8) and the antipode with a; the
    // round-6 update gives centroids (0.5,-0.5) and (0.7,0.7); the final
    // re-assign keeps both cells. Only the {b, c} pair clears tau
    // (cos 0.96; cos(a, antipode) = 0). b and c are mirror-symmetric
    // about their centroid — an EXACT cent_sim tie — so the tie rule
    // (lower vec_id survives) drops c with n_better = 1.
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.8f, 0.6f), 0),
      (2L, Array(0.6f, 0.8f), 0),
      (100L, Array(0.0f, -1.0f), 1))
    val tmp = java.nio.file.Files.createTempDirectory("semdedup").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = graft.queries.EmbedQueries.dedupSemantic.run(spark, tmp)
      .select("vec_id", "n_better").as[(Long, Long)].collect().toSeq
    assert(got === Seq((2L, 1L)), s"dropped set: $got")
  }

  test("embed_outliers: planted far vector tops its cluster; tight cluster stays ranked by distance") {
    import spark.implicits._
    // label 0: 13 vectors near (1, 0) with tiny jitter + one at (10, 10)
    // — the planted outlier must take rank 1 with a dominant z
    val tight = (0 until 13).map(i => (i.toLong, Array(1.0f, i * 0.01f), 0))
    val rows = tight :+ (99L, Array(10.0f, 10.0f), 0)
    val tmp = java.nio.file.Files.createTempDirectory("outliers").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = graft.queries.EmbedQueries.embedOutliers.run(spark, tmp).collect()
    assert(got.length == 5)
    assert(got.map(_.getAs[Long]("rnk")).toSeq === (1L to 5L))
    assert(got.head.getAs[Long]("vec_id") === 99L, s"rank-1 was ${got.head}")
    assert(got.head.getAs[Double]("z") > 3.0)
    // distances weakly decrease down the ranking; z is monotone in dist
    val ds = got.map(_.getAs[Double]("dist"))
    assert(ds.zip(ds.tail).forall { case (a, b) => a >= b }, ds.mkString(","))
    val zs = got.map(_.getAs[Double]("z"))
    assert(zs.zip(zs.tail).forall { case (a, b) => a >= b }, zs.mkString(","))
  }

  test("matryoshka recall matches an in-memory brute mirror on seeded random vectors") {
    import spark.implicits._
    // 3 queries (ids < 10) + 30 candidates, dim 64, seeded — the mirror
    // recomputes both rankings with the query's exact fold order and
    // 6-decimal HALF_UP round, so a slice/off-by-one or a ranking-key
    // regression in embed_matryoshka_recall fails here with small data.
    val rnd = new scala.util.Random(7)
    val rows = ((0 until 3).map(i => (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), 0)) ++
      (0 until 30).map(i => (10L + i, Array.fill(64)(rnd.nextFloat() * 2 - 1), 0)))
    val tmp = java.nio.file.Files.createTempDirectory("matry").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < d) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val q = rows.filter(_._1 < 10)
    val c = rows.filter(_._1 >= 10)
    def top5(qv: Array[Float], d: Int): Set[Long] =
      c.map(n => (n._1, cos(qv, n._2, d))).sortBy(p => (-p._2, p._1)).take(5).map(_._1).toSet
    val expected = (for {
      d <- Seq(8, 16, 32); (qid, qv, _) <- q
    } yield {
      val hits = (top5(qv, 64) & top5(qv, d)).size
      (d.toLong, qid, hits.toLong,
        BigDecimal(hits / 5.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).sortBy(t => (t._1, t._2))
    val got = graft.queries.EmbedQueries.embedMatryoshkaRecall.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === expected)
    // sanity: truncation must actually bite somewhere on random vectors
    assert(got.exists(_._3 < 5L), "every prefix ranking matched full-dim — fixture too easy")
  }

  test("embed_mmr: the diversity penalty demotes an exact duplicate below a diverse candidate") {
    import spark.implicits._
    // query at (1,1); candidates 10 and 11 are IDENTICAL (1, 0.2), 12 is
    // the reflection (0.2, 1). All three tie on relevance (cos = 0.832),
    // so pure top-k order would be 10, 11, 12 (nid tie-break). MMR step 2:
    // the duplicate 11 scores 0.7·0.832 − 0.3·1.0 = 0.28 while diverse 12
    // scores 0.7·0.832 − 0.3·0.385 = 0.47 — selection must go 10, 12, 11.
    val rows = Seq(
      (0L, Array(1.0f, 1.0f), 0),
      (10L, Array(1.0f, 0.2f), 0),
      (11L, Array(1.0f, 0.2f), 0),
      (12L, Array(0.2f, 1.0f), 0))
    val tmp = java.nio.file.Files.createTempDirectory("mmr").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = graft.queries.EmbedQueries.embedMmr.run(spark, tmp)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 10L), (2L, 12L), (3L, 11L)),
      s"selection order was ${got.toSeq}")
  }

  test("embed_centroid_shift: a planted 90-degree rotation scores shift sqrt(2) and cosine 0") {
    import spark.implicits._
    // mid = (0+11)/2 = 5: ids 0,1 land in half a at (1,0); ids 10,11 in
    // half b at (0,1) -> centroid shift sqrt(2), centroid cosine 0
    val rows = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(1.0f, 0.0f), 7),
      (10L, Array(0.0f, 1.0f), 7),
      (11L, Array(0.0f, 1.0f), 7))
    val tmp = java.nio.file.Files.createTempDirectory("cshift").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val r = graft.queries.EmbedQueries.embedCentroidShift.run(spark, tmp).head()
    assert((r.getInt(0), r.getLong(1), r.getLong(2)) === ((7, 2L, 2L)))
    assert(r.getDouble(3) === 1.414214, s"shift was ${r.getDouble(3)}")
    assert(r.getDouble(4) === 0.0, s"cos was ${r.getDouble(4)}")
  }

  test("semantic dedup: k-means cells track planted geometry; k bounds per-cell volume") {
    import spark.implicits._
    // 8 tight clusters × 8 members in R^8: cluster c sits on 10·e_c with
    // a 0.01·j jitter on the next axis (intra-cosine ≈ 1, cross ≈ 0.001).
    // vec_id = j*8 + c, so the first-k seeds are one per planted cluster.
    val dim = 8
    val rows = for (c <- 0 until 8; j <- 0 until 8) yield {
      val v = Array.fill(dim)(0.0)
      v(c) = 10.0
      if (j > 0) v((c + 1) % dim) = 0.01 * j
      ((j * 8 + c).toLong, v.toSeq)
    }
    val v = rows.toDF("vec_id", "v")
    // k = 8, ABOVE any label cardinality a per-label cell scheme could
    // reach: Lloyd recovers the 8 planted cells and each cell keeps only
    // its farthest-from-centroid member (7 of 8 dropped)
    val out = graft.queries.EmbedQueries.semanticDedupFrame(v, 8L, 0.35).collect()
    assert(out.length === 56, s"expected 56 dropped rows, got ${out.length}")
    val byCell = out.groupBy(_.getAs[Long]("cell"))
    assert(byCell.size === 8, s"expected 8 cells, got ${byCell.keySet}")
    assert(byCell.values.forall(_.length === 7), "a cell dropped the wrong count")
    // per-cell candidate volume is k-bounded: nobody outranks more than
    // a cell's worth of mates
    assert(out.forall(_.getAs[Long]("n_better") <= 7L))
    // the knob drives the cell count — the O(n²/k) → O(n²·k/n²)=O(k)
    // volume control the 100 TB run turns: k=2 collapses to 2 cells
    val coarse = graft.queries.EmbedQueries.semanticDedupFrame(v, 2L, 0.35).collect()
    assert(coarse.map(_.getAs[Long]("cell")).distinct.length <= 2)
    assert(coarse.length === 56, "coarse cells must still drop per planted cluster")
  }

  test("KMeans.fit matches an independent sequential Lloyd reference on seeded dyadic fixtures") {
    import spark.implicits._
    // components are eighths (dyadic) so every distance and every
    // centroid SUM is exact in both engines regardless of fold order —
    // the one rounding per update (sum/count then round-6) is then
    // bit-identical by construction, and == comparison is legitimate.
    // The reference is a from-scratch sequential Lloyd sharing only the
    // CONTRACT (ascending dot folds, (v²+c²)−2vc association, lower-cl
    // argmin ties, round-6 HALF_UP updates, k-smallest-id seeds).
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def refFit(vecs: Seq[(Long, Seq[Double])], k: Int, iters: Int)
        : (Map[Long, (Long, Double)], Map[Long, Seq[Double]]) = {
      val dim = vecs.head._2.length
      var cents: Seq[(Long, Seq[Double])] = vecs.sortBy(_._1).take(k)
      var asg: Map[Long, (Long, Double)] = Map.empty
      for (t <- 1 to iters) {
        asg = vecs.map { case (id, v) =>
          val scored = cents.map { case (cl, c) => (cl, dot(v, v) + dot(c, c) - 2.0 * dot(v, c)) }
          val (cl, d2) = scored.minBy { case (c, dd) => (dd, c) }
          id -> ((cl, d2))
        }.toMap
        if (t < iters) {
          val byId = vecs.toMap
          cents = asg.toSeq.groupBy(_._2._1).toSeq.map { case (cl, ms) =>
            val members = ms.map(m => byId(m._1))
            (cl, (0 until dim).map(j => r6(members.map(_(j)).sum / members.size)))
          }.sortBy(_._1)
        }
      }
      (asg, cents.toMap)
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 8) {
      val n = 5 + rnd.nextInt(36)
      val d = 2 + rnd.nextInt(5)
      val k = 1 + rnd.nextInt(math.min(5, n))
      val iters = 1 + rnd.nextInt(3)
      val vecs = (0 until n).map(i =>
        ((i * 3 + 11).toLong, Seq.fill(d)((rnd.nextInt(17) - 8) / 8.0)))
      val df = vecs.toDF("vec_id", "v")
      val (assigned, cents) = graft.ml.KMeans.fit(
        df, graft.ml.KMeans.seedSmallest(df, k), iters)
      val gotAsg = assigned.collect()
        .map(r => r.getAs[Long]("vec_id") -> ((r.getAs[Long]("cl"), r.getAs[Double]("d2")))).toMap
      val gotCents = cents.collect()
        .map(r => r.getAs[Long]("cl") -> r.getSeq[Double](r.fieldIndex("cv"))).toMap
      val (refAsg, refCents) = refFit(vecs, k, iters)
      assert(gotAsg === refAsg, s"trial $trial (n=$n d=$d k=$k iters=$iters): assignment diverged")
      assert(gotCents === refCents, s"trial $trial (n=$n d=$d k=$k iters=$iters): centroids diverged")
    }
  }

  test("fitSpherical: clusters by DIRECTION, centroids stay unit, renormalize is exact") {
    import spark.implicits._
    // renormalize: (3,4) -> (0.6, 0.8) exactly
    val rn = graft.ml.KMeans.renormalize(
        Seq((0L, Seq(3.0, 4.0))).toDF("cl", "cv"))
      .collect()(0).getSeq[Double](1)
    assert(rn === Seq(0.6, 0.8), s"renormalize gave $rn")
    // two directions (x-ish, y-ish), different magnitudes pre-normalization;
    // seeds (ids 1, 2) are one per direction — spherical Lloyd must
    // group by angle, and every returned centroid must be unit-norm
    def unit(x: Double, y: Double) = {
      val n = math.sqrt(x * x + y * y)
      def r6(v: Double) = BigDecimal(v / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Seq(r6(x), r6(y))
    }
    val vecs = Seq(
      1L -> unit(1, 0), 2L -> unit(0, 1),
      3L -> unit(10, 3), 4L -> unit(3, 10),
      5L -> unit(20, 1), 6L -> unit(1, 30))
    val df = vecs.toDF("vec_id", "v")
    val (assigned, cents) = graft.ml.KMeans.fitSpherical(
      df, graft.ml.KMeans.seedSmallest(df, 2), 3)
    val asg = assigned.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cl")).toMap
    assert(asg(3L) === asg(1L) && asg(5L) === asg(1L), s"x-cone split: $asg")
    assert(asg(4L) === asg(2L) && asg(6L) === asg(2L), s"y-cone split: $asg")
    assert(asg(1L) !== asg(2L), s"cones merged: $asg")
    cents.collect().foreach { r =>
      val c = r.getSeq[Double](r.fieldIndex("cv"))
      val n2 = c.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-5, s"centroid ${c} has norm² $n2")
    }
  }

  test("semantic dedup differential: broadcast-table path == plan-literal twin at k=ceil(sqrt(n))") {
    import org.apache.spark.sql.functions._
    // pseudo-random 16-dim frame with SPARSE, OFFSET vec_ids (3·id+100)
    // — exercises the k-smallest seed rule the dense `id < k` form
    // silently broke on (r9 ADVICE), at the gate's default k=⌈√n⌉.
    // Both paths must agree EXACTLY (same doubles, same rows): the
    // table path inherits the literal twin's bit-contract — ascending
    // dot folds, (dot+c2)−2·dot association, round-6 updates, lower-cl
    // argmin ties — so this is equality, not approximation.
    val n = 289
    val v = spark.range(n).select((col("id") * 3 + 100).as("vec_id"),
      expr("transform(sequence(0, 15), j -> CAST(pmod(hash(id, j), 2001) - 1000 AS DOUBLE) / 1000.0)")
        .as("v"))
    val k = math.ceil(math.sqrt(n.toDouble)).toLong
    val table = graft.queries.EmbedQueries.semanticDedupFrame(v, k, 0.35).collect().toSeq
    val lit0 = graft.queries.EmbedQueries.semanticDedupFrameLiteral(v, k, 0.35).collect().toSeq
    assert(table.nonEmpty, "differential frame produced no drop rows — raise n or lower tau")
    assert(table === lit0, s"table path diverged from literal twin (${table.length} vs ${lit0.length} rows)")
  }
}
