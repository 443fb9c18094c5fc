package graft

import org.apache.spark.sql.functions._
import graft.functions.{CMSketch, PortableHash64}

/** Properties of the Count-Min TypedImperativeAggregate: the counter
  * array is a pure function of the input multiset (partitioning/order
  * independent), point estimates upper-bound truth and are exact in the
  * collision-free regime, and the bucket formula matches the DuckDB
  * oracle mirror bit for bit.
  */
class CMSketchSpec extends SparkSpec {

  private def sketch(df: org.apache.spark.sql.DataFrame, d: Int, w: Int): Seq[Long] = {
    CMSketch.register(spark)
    df.agg(expr(s"cms_sketch(hv, $d, $w)")).head().getSeq[Long](0)
  }

  test("counter array is partitioning- and order-independent") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val hashes = (1 to 5000).map(_ => rnd.nextLong())
    val a = sketch(hashes.toDF("hv").repartition(1), 4, 256)
    val b = sketch(hashes.toDF("hv").repartition(32), 4, 256)
    val c = sketch(scala.util.Random.shuffle(hashes).toDF("hv").repartition(7), 4, 256)
    assert(a == b && b == c)
    assert(a.sum == 4L * 5000, "every row of counters sums to the stream length")
  }

  test("bucket formula matches the oracle mirror: 12-bit-strided windows of the 60-bit hash") {
    import spark.implicits._
    val hashes = (1 to 200).map(i => PortableHash64.first60Bits(
      java.security.MessageDigest.getInstance("MD5").digest(s"cms:tok$i".getBytes)))
    val (d, w) = (4, 1024)
    val got = sketch(hashes.toDF("hv"), d, w)
    val want = new Array[Long](d * w)
    for (h <- hashes; r <- 0 until d)
      want(r * w + ((h >>> (12 * r)) & (w - 1)).toInt) += 1L
    assert(got == want.toSeq)
  }

  test("point estimate >= truth always, == truth when a row is collision-free") {
    import spark.implicits._
    // 50 distinct tokens, zipf-ish counts, width 1024 => collisions are
    // possible per row but P(all 4 rows collide for one key) ~ (50/1024)^4;
    // the estimate bound est >= truth holds unconditionally.
    graft.ops.TextOps.ensureFunctions(spark)
    val toks = (1 to 50).flatMap(i => Seq.fill(51 - i)(s"tok$i"))
    val df = toks.toDF("word")
      .select(col("word"), expr(graft.ops.TextOps.portableHash64Sql("'cms'", "word")).as("hv"))
    val (d, w) = (4, 1024)
    val counters = sketch(df, d, w)
    val truth = toks.groupBy(identity).map { case (t, xs) => (t, xs.size.toLong) }
    truth.foreach { case (t, n) =>
      val h = PortableHash64.first60Bits(
        java.security.MessageDigest.getInstance("MD5").digest(s"cms:$t".getBytes))
      val est = (0 until d).map(r => counters(r * w + ((h >>> (12 * r)) & (w - 1)).toInt)).min
      assert(est >= n, s"$t: est $est < truth $n")
    }
    val exact = truth.count { case (t, n) =>
      val h = PortableHash64.first60Bits(
        java.security.MessageDigest.getInstance("MD5").digest(s"cms:$t".getBytes))
      (0 until d).map(r => counters(r * w + ((h >>> (12 * r)) & (w - 1)).toInt)).min == n
    }
    assert(exact == truth.size, "at width 1024 / 50 keys every estimate should be collision-free-exact")
  }

  test("rejects a non-power-of-two width and an over-60-bit stride") {
    import spark.implicits._
    CMSketch.register(spark)
    val df = Seq(1L).toDF("hv")
    val e1 = intercept[Exception](df.agg(expr("cms_sketch(hv, 4, 1000)")).head())
    assert(e1.getMessage.contains("power of two"))
    val e2 = intercept[Exception](df.agg(expr("cms_sketch(hv, 6, 4096)")).head())
    assert(e2.getMessage.contains("60-bit"))
  }

  test("rejects an out-of-Int-range BIGINT knob instead of truncating it") {
    import spark.implicits._
    CMSketch.register(spark)
    graft.functions.BloomSketch.register(spark)
    val df = Seq(1L).toDF("hv")
    // 2^32 + 1024 truncates to 1024 via Long.intValue — a power of two,
    // so without the range check this silently builds the wrong geometry
    val e1 = intercept[Exception](
      df.agg(expr("cms_sketch(hv, 4, 4294968320)")).head())
    assert(e1.getMessage.contains("int-range"))
    val e2 = intercept[Exception](
      df.agg(expr("bloom_sketch(hv, 4294971392, 4)")).head())
    assert(e2.getMessage.contains("int-range"))
  }

  test("weighted form over a (key, count) rollup equals one update per occurrence") {
    import spark.implicits._
    CMSketch.register(spark)
    val rnd = new scala.util.Random(17)
    val pairs = (1 to 300).map(_ => rnd.nextLong() -> (1 + rnd.nextInt(9)).toLong)
    val occurrences = pairs.flatMap { case (h, n) => Seq.fill(n.toInt)(h) }
    val perRow = sketch(occurrences.toDF("hv").repartition(8), 4, 256)
    val weighted = pairs.toDF("hv", "n").repartition(5)
      .agg(expr("cms_sketch_weighted(hv, n, 4, 256)")).head().getSeq[Long](0)
    assert(perRow == weighted)
    // null and non-positive weights contribute nothing
    val padded = (pairs.map { case (h, n) => (h, Some(n)) } ++
      Seq((1L, None), (2L, Some(0L)), (3L, Some(-5L))))
      .toDF("hv", "n")
      .agg(expr("cms_sketch_weighted(hv, n, 4, 256)")).head().getSeq[Long](0)
    assert(padded == weighted)
  }

  test("heavy-hitters query: estimates bound truth on the real corpus slice") {
    val df = graft.queries.TextQueries.sketchHeavyHitters.run(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("exact_cnt"), r.getAs[Long]("cms_est"))
      assert(est >= exact, s"${r.getAs[String]("word")}: est $est < exact $exact")
    }
  }
}
