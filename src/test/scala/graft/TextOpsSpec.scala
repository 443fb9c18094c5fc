package graft

import org.apache.spark.sql.functions._
import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {

  test("3-word shingles, distinct, short docs empty") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "x y"), (3L, "p q r p q r p q r p q"))
      .toDF("doc_id", "text")
    val out = TextOps.docShingles(df).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).sorted)
    // doc 2 (<3 words) filtered out entirely
    assert(out.map(_._1).toSeq === Seq(1L, 3L))
    assert(out(0)._2 === Seq("a b c", "b c d"))
    // doc 3: rolling trigrams of p q r ... collapse to 3 distinct
    assert(out(1)._2 === Seq("p q r", "q r p", "r p q"))
  }

  test("portable hash matches the DuckDB formula") {
    import spark.implicits._
    TextOps.ensureFunctions(spark)
    val got = Seq("hello").toDF("s")
      .select(expr(TextOps.portableHash64Sql("7", "s"))).collect()(0).getLong(0)
    // reference value computed independently: first 15 hex chars of
    // md5("7:hello") parsed base 16
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("7:hello".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got === java.lang.Long.parseLong(hex.take(15), 16))
  }

  test("native portable_hash64 is bit-exact with the md5 SQL formula") {
    import spark.implicits._
    TextOps.ensureFunctions(spark)
    val rnd = new scala.util.Random(17)
    val strs = (1 to 2000).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString) :+
      "" :+ "ünïcødé ∂ƒ©" :+ "tab\tnl\n"
    val mismatches = strs.toDF("s")
      .select(expr(TextOps.portableHash64Sql("'x'", "s")).as("native"),
        expr(TextOps.md5Hash64Sql("'x'", "s")).as("sqlform"))
      .where(col("native") =!= col("sqlform"))
      .count()
    assert(mismatches === 0L)
  }

  test("jaccard on known sets") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val sim = df.select(TextOps.jaccard(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(sim === 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("dedup operators are hash-agnostic: portable md5 and xxhash64 yield identical pairs") {
    import graft.queries.DedupQueries
    val dir = "/root/testdata/sf0.001"
    def pairs(hash: TextOps.HashSql): Set[(Long, Long, Double)] =
      DedupQueries.prefixFilteredPairs(DedupQueries.docHashes(spark, dir, hash))
        .where(col("sim") >= 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val portable = pairs(TextOps.portableHash64Sql)
    val xx = pairs(TextOps.xxhash64Sql)
    assert(portable.nonEmpty, "fixture should contain near-dup pairs")
    // Jaccard over hashed shingle SETS only depends on set identity, so
    // any injective-enough hash gives the same pairs and similarities;
    // the prefix filter's global hash order differs but loses no recall
    assert(xx === portable)
  }

  test("PII scrub counts and redacts planted emails/URLs (testdata has none to exercise it)") {
    import spark.implicits._
    import org.apache.spark.sql.DataFrame
    val docs = Seq(
      (1L, "contact me at jane.doe+x@example.org or http://ex.com/a?b=1 thanks"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c.d@e-f.io and https://x.y/z")).toDF("doc_id", "text")
    // run the registered query's Spark side against a planted frame by
    // swapping the table read for a temp view is overkill — reuse the
    // same expressions directly
    val email = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val url = "https?://[^ \\t\\n]+"
    def scrub(df: DataFrame) = df.select(
      col("doc_id"),
      regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
      regexp_count(col("text"), lit(url)).cast("long").as("n_urls"),
      regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"), url, "<URL>").as("red"))
    val out = scrub(docs).collect().sortBy(_.getLong(0))
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((1L, 1L), (0L, 0L), (2L, 1L)))
    out.foreach { r =>
      val red = r.getString(3)
      assert(!red.matches(s".*$email.*") && !red.matches(s".*$url.*"), red)
    }
    assert(out(0).getString(3) === "contact me at <EMAIL> or <URL> thanks")
  }

  test("native simhash32 is bit-exact with the nested-HOF formula, corners included") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows: Seq[(Long, Seq[Option[Long]])] =
      (1 to 500).map { i =>
        i.toLong -> Seq.fill(1 + rnd.nextInt(40))(Option(rnd.nextLong()))
      } ++ Seq(
        9001L -> Seq.empty[Option[Long]],                    // empty -> all 32 bits set
        9002L -> Seq[Option[Long]](None, Some(5L), None),    // null elements vote like 0L
        9003L -> Seq[Option[Long]](None))
    val df = rows.toDF("doc_id", "__wh")
      .unionByName(Seq(Tuple1(9004L)).toDF("doc_id")                // NULL array -> 0, not NULL
        .withColumn("__wh", lit(null).cast("array<bigint>")))
    val out = df
      .withColumn("native", TextOps.simhash32)
      .withColumn("hof", TextOps.simhash32Hof)
    assert(out.where(col("native").isNull).count() === 0L)
    assert(out.where(not(col("native") <=> col("hof"))).count() === 0L)
    val corners = out.where(col("doc_id") >= 9001L).orderBy("doc_id")
      .select("native").collect().map(_.getLong(0))
    assert(corners(0) === 0xFFFFFFFFL)
    assert(corners(3) === 0L)
  }

  test("native minhash_sig is bit-exact with the per-row HOF formula, corners included") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumns
    val (k, p) = (16, 2147483647L)
    val hof = expr(
      s"transform(sequence(0, ${k - 1}), i -> array_min(transform(__wh, " +
        s"x -> ((1000003 + i * 7919) * (x % $p) + i) % $p)))")
    def native(c: org.apache.spark.sql.Column) = GraftColumns.column(
      graft.functions.MinHashSig(GraftColumns.expression(c), k, 1000003L, 7919L, p))
    val rnd = new scala.util.Random(47)
    val rows: Seq[(Long, Seq[Option[Long]])] =
      (1 to 300).map { i =>
        // negative hashes included: the xxhash64 tier produces them and
        // Java/DuckDB remainder semantics must agree through the kernel
        i.toLong -> Seq.fill(1 + rnd.nextInt(40))(Option(rnd.nextLong()))
      } ++ Seq(
        9001L -> Seq.empty[Option[Long]],                  // -> k NULL slots
        9002L -> Seq[Option[Long]](None, Some(12345L)),    // null element skipped
        9003L -> Seq[Option[Long]](None))                  // all-null -> k NULL slots
    val df = rows.toDF("doc_id", "__wh")
      // NULL array -> k NULL slots too (the outer transform runs over the
      // non-null sequence; only the inner array_min sees the NULL array)
      .unionByName(Seq(Tuple1(9004L)).toDF("doc_id")
        .withColumn("__wh", lit(null).cast("array<bigint>")))
    val out = df.withColumn("native", native(col("__wh"))).withColumn("hof", hof)
    assert(out.where(col("native").isNull).count() === 0L)
    assert(out.where(not(col("native") <=> col("hof"))).count() === 0L)
    val corners = out.where(col("doc_id").isin(9001L, 9003L, 9004L)).collect()
    assert(corners.forall(_.getSeq[Any](2) === Seq.fill(k)(null)))
  }

  test("native simhash32: interpreted eval matches codegen") {
    import spark.implicits._
    def frame() = {
      val rnd = new scala.util.Random(43)
      (1 to 200).map { i =>
        i.toLong -> Seq.fill(1 + rnd.nextInt(20))(rnd.nextLong())
      }.toDF("doc_id", "__wh")
    }
    val before = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val beforeWs = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val codegen = frame().withColumn("sig", TextOps.simhash32)
      .orderBy("doc_id").collect()
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = frame().withColumn("sig", TextOps.simhash32)
        .orderBy("doc_id").collect()
      assert(codegen.toSeq === interp.toSeq)
    } finally {
      before.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      beforeWs.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
    }
  }

  test("text_zipf: every source fits a negative power-law slope with sane counts") {
    val rows = graft.queries.TextQueries.textZipf
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20, s"expected 20 sources, got ${rows.length}")
    rows.foreach { r =>
      val (vocab, toks, slope) = (r.getAs[Long]("n_vocab"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("zipf_slope"))
      assert(vocab > 0 && toks >= vocab, s"counts off: $r")
      // frequency must fall as rank rises; natural-ish corpora sit
      // well inside (-5, 0) — 0 or positive means the ranking broke
      assert(slope < 0.0 && slope > -5.0, s"slope out of range: $r")
    }
  }

  test("ml_mixture_epochs: closed-form epochs on a 100/400-token two-source corpus") {
    import spark.implicits._
    // tokens 100 vs 400 -> wt 10 vs 20, shares 1/3 and 2/3;
    // epochs = 1e6·share/tokens: small source repeats ~3333x, big ~1667x
    val docs = Seq(
      (1L, ("x " * 100).trim, "a"),
      (2L, ("y " * 400).trim, "b")).toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("epochs").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = graft.queries.MlQueries.mlMixtureEpochs.run(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === Seq(
      ("a", 100L, r6(10.0 / 30), r6(1000000L * (10.0 / 30) / 100)),
      ("b", 400L, r6(20.0 / 30), r6(1000000L * (20.0 / 30) / 400))), s"got $got")
  }

  test("text_kl_drift: identical sources score 0; disjoint halves score exactly ln 2") {
    import spark.implicits._
    def run(docs: org.apache.spark.sql.DataFrame) = {
      val tmp = java.nio.file.Files.createTempDirectory("kl").toString
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      graft.queries.TextQueries.textKlDrift.run(spark, tmp)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    }
    // both sources emit the same distribution -> corpus == source -> KL 0
    val same = run(Seq(
      (1L, "x y", "a"), (2L, "x y", "a"),
      (3L, "y x", "b"), (4L, "x y", "b")).toDF("doc_id", "text", "source"))
    assert(same === Seq(("a", 4L, 0.0), ("b", 4L, 0.0)), s"got $same")
    // disjoint vocabularies, equal sizes: p_s(w)=1, p_c(w)=1/2 -> KL = ln 2
    val ln2 = BigDecimal(math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val split = run(Seq(
      (1L, "x x x", "a"), (2L, "x x x", "a"),
      (3L, "y y y", "b"), (4L, "y y y", "b")).toDF("doc_id", "text", "source"))
    assert(split === Seq(("a", 6L, ln2), ("b", 6L, ln2)), s"got $split")
  }

  test("ml_vocab_coverage: 150-type fixture — the 100-cut bites exactly, larger cuts saturate") {
    import spark.implicits._
    // word w001..w150, word wNNN occurs (151 - NNN) times: ranking by
    // (count desc, word) is w001, w002, ... so the top-100 head and
    // every coverage share are closed-form.
    val docs = (1 to 150).map { i =>
      (i.toLong, (s"w${"%03d".format(i)} " * (151 - i)).trim)
    }.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("vocab").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val total = (1 to 150).map(i => 151 - i).sum.toDouble      // 11325
    val cov100 = (1 to 100).map(i => 151 - i).sum              // top-100 head
    val got = graft.queries.MlQueries.mlVocabCoverage.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (100L, cov100.toLong, r6(cov100 / total)),
      (1000L, 11325L, 1.0),
      (10000L, 11325L, 1.0)))
  }
}
