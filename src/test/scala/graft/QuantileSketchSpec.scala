package graft

import org.apache.spark.sql.functions._
import graft.functions.QuantileSketch

/** Properties of the bottom-k-by-hash quantile TypedImperativeAggregate:
  * the sample (and so the result) is a pure function of the input set —
  * partitioning/order independent — it degrades to the exact continuous
  * quantile when k covers the group, hash ties resolve deterministically,
  * and nulls/empty groups follow the `percentile` contract.
  */
class QuantileSketchSpec extends SparkSpec {

  private def qs(df: org.apache.spark.sql.DataFrame, k: Int, ps: String): Seq[Double] = {
    QuantileSketch.register(spark)
    df.agg(expr(s"sample_quantiles(hv, val, $k, $ps)")).head().getSeq[Double](0)
  }

  test("result is partitioning- and order-independent") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (1 to 4000).map(i => (rnd.nextLong(), rnd.nextDouble() * 1000))
    val a = qs(rows.toDF("hv", "val").repartition(1), 64, "array(0.25D, 0.5D, 0.9D)")
    val b = qs(rows.toDF("hv", "val").repartition(32), 64, "array(0.25D, 0.5D, 0.9D)")
    val c = qs(scala.util.Random.shuffle(rows).toDF("hv", "val").repartition(7),
      64, "array(0.25D, 0.5D, 0.9D)")
    assert(a == b && b == c)
  }

  test("k >= n degrades to the exact continuous quantile (vs Spark percentile, round-9)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val rows = (1 to 997).map(i => (i.toLong, rnd.nextDouble() * 500 - 100))
    val df = rows.toDF("hv", "val")
    val got = qs(df, 1024, "array(0.0D, 0.031D, 0.5D, 0.95D, 1.0D)")
    val want = df.agg(expr("percentile(val, array(0.0D, 0.031D, 0.5D, 0.95D, 1.0D))"))
      .head().getSeq[Double](0)
    // percentile uses lo + (hi-lo)*f, the sketch DuckDB's lo*(1-f)+hi*f —
    // algebraically equal, up to 1 ulp apart; round-9 collapses both
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9, s"sketch $g vs percentile $w")
    }
  }

  test("bounded-sample estimate brackets truth within the ~1/sqrt(k) rank band") {
    import spark.implicits._
    // values 1..20000 with hv = portable-ish spread: the k=256 sample's
    // p50 must land within +-4/sqrt(256) rank error of 10000
    val rnd = new scala.util.Random(41)
    val rows = (1 to 20000).map(i => (rnd.nextLong(), i.toDouble))
    val Seq(p50) = qs(rows.toDF("hv", "val"), 256, "array(0.5D)")
    assert(math.abs(p50 - 10000) < 20000 * (4.0 / 16),
      s"p50 estimate $p50 implausibly far from 10000")
  }

  test("hash ties keep the smaller value regardless of arrival order") {
    import spark.implicits._
    val fwd = Seq((1L, 9.0), (1L, 3.0), (2L, 5.0)).toDF("hv", "val")
    val rev = Seq((2L, 5.0), (1L, 3.0), (1L, 9.0)).toDF("hv", "val")
    assert(qs(fwd, 16, "array(0.0D, 1.0D)") == Seq(3.0, 5.0))
    assert(qs(rev, 16, "array(0.0D, 1.0D)") == Seq(3.0, 5.0))
  }

  test("null values are skipped; an all-null group yields NULL") {
    import spark.implicits._
    QuantileSketch.register(spark)
    val df = Seq((1L, Some(7.0)), (2L, None), (3L, Some(1.0))).toDF("hv", "val")
    assert(qs(df, 16, "array(0.0D, 1.0D)") == Seq(1.0, 7.0))
    val allNull = df.where(col("val").isNull)
      .agg(expr("sample_quantiles(hv, val, 16, array(0.5D))").as("q")).head()
    assert(allNull.isNullAt(0), "all-null group must evaluate to NULL")
  }

  test("rejects non-literal knobs, bad percentiles, and wrong types with real messages") {
    import spark.implicits._
    QuantileSketch.register(spark)
    val df = Seq((1L, 2.0)).toDF("hv", "val")
    val e1 = intercept[Exception](
      df.agg(expr("sample_quantiles(hv, val, 4, array(1.5D))")).head())
    assert(e1.getMessage.contains("[0, 1]"))
    val e2 = intercept[Exception](
      df.agg(expr("sample_quantiles(hv, val, 4, hv)")).head())
    assert(e2.getMessage.contains("literal"))
    val e3 = intercept[Exception](
      df.agg(expr("sample_quantiles(val, val, 4, array(0.5D))")).head())
    assert(e3.getMessage.contains("bigint"))
    val e4 = intercept[Exception](
      df.agg(expr("sample_quantiles(hv, val, 1, array(0.5D))")).head())
    assert(e4.getMessage.contains("k must be"))
  }
}
