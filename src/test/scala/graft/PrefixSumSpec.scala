package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.PrefixSum

/** Differential law for the two-level bucketed prefix sum: for every
  * key, `PrefixSum.running` must equal the single-window global
  * cumulative it replaces — ascending and descending, grouped and
  * ungrouped, integer and continuous keys, and at degenerate bucket
  * counts (1 bucket = the global window itself; more buckets than
  * rows = one row per bucket).
  */
class PrefixSumSpec extends SparkSpec {

  private def globalRef(df: DataFrame, parts: Seq[String], order: String,
      measures: Seq[String], desc: Boolean): DataFrame = {
    val ord = if (desc) col(order).desc else col(order).asc
    val w = Window.partitionBy(parts.map(col): _*).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(parts.map(col): _*)
    measures.foldLeft(df) { (d, m) =>
      d.withColumn(s"${m}_cum", sum(col(m)).over(w).cast("long"))
        .withColumn(s"${m}_tot", sum(col(m)).over(tot).cast("long"))
    }
  }

  private def assertSame(got: DataFrame, want: DataFrame, key: Seq[String]): Unit = {
    val cols = want.columns.sorted.map(col)
    val g = got.select(cols: _*).orderBy(key.map(col): _*).collect().toSeq
    val w = want.select(cols: _*).orderBy(key.map(col): _*).collect().toSeq
    assert(g === w)
  }

  test("two-level == global window: long keys, asc and desc, multi-measure") {
    val rnd = new scala.util.Random(42)
    import spark.implicits._
    val data = rnd.shuffle((0 until 400).toList).take(257)
      .map(k => (k.toLong * 7 - 100, rnd.nextInt(90).toLong, rnd.nextInt(50).toLong))
    val df = data.toDF("k", "a", "b")
    for (desc <- Seq(false, true); buckets <- Seq(1, 7, 64, 1000)) {
      val got = PrefixSum.running(df, Nil, "k", Seq("a", "b"),
        descending = desc, withTotals = true, buckets = buckets)
      assertSame(got, globalRef(df, Nil, "k", Seq("a", "b"), desc), Seq("k"))
    }
  }

  test("two-level == global window: continuous double keys (the classifier-score case)") {
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val data = (0 until 300).map(_ => rnd.nextDouble() * 1e6 - 5e5).distinct
      .map(s => (s, rnd.nextInt(10).toLong))
    val df = data.toDF("score", "c")
    for (desc <- Seq(false, true)) {
      val got = PrefixSum.running(df, Nil, "score", Seq("c"),
        descending = desc, withTotals = true, buckets = 16)
      assertSame(got, globalRef(df, Nil, "score", Seq("c"), desc), Seq("score"))
    }
  }

  test("two-level == global window: grouped (per-source rank-selection shape)") {
    val rnd = new scala.util.Random(11)
    import spark.implicits._
    val data = for {
      src <- Seq("a", "b", "c")
      k <- rnd.shuffle((0 until 200).toList).take(80)
    } yield (src, k.toLong, rnd.nextInt(30).toLong)
    val df = data.toDF("source", "x", "c")
    val got = PrefixSum.running(df, Seq("source"), "x", Seq("c"),
      withTotals = true, buckets = 9)
    assertSame(got, globalRef(df, Seq("source"), "x", Seq("c"), desc = false),
      Seq("source", "x"))
  }

  test("degenerate inputs: single row, and a two-row extreme-spread domain") {
    import spark.implicits._
    val one = Seq((5L, 3L)).toDF("k", "c")
    val gotOne = PrefixSum.running(one, Nil, "k", Seq("c"), withTotals = true)
    assertSame(gotOne, globalRef(one, Nil, "k", Seq("c"), desc = false), Seq("k"))
    val spread = Seq((Long.MinValue / 4, 1L), (Long.MaxValue / 4, 2L)).toDF("k", "c")
    val gotSp = PrefixSum.running(spread, Nil, "k", Seq("c"), withTotals = true)
    assertSame(gotSp, globalRef(spread, Nil, "k", Seq("c"), desc = false), Seq("k"))
  }

  test("balanced == uniform == global on a pathological outlier-stretched domain, " +
      "and balanced buckets actually spread the mass") {
    // 99% of rows inside 1/1000 of the range (scores massed in
    // [0.999, 1.0]) plus outliers at 0 — uniform-range bucketing lands
    // the mass in ONE bucket; quantile bucketing must spread it
    val rnd = new scala.util.Random(13)
    import spark.implicits._
    val mass = (0 until 990).map(_ => 0.999 + rnd.nextDouble() * 0.001)
    val outliers = (0 until 10).map(_ => rnd.nextDouble() * 0.01)
    val data = (mass ++ outliers).distinct.map(s => (s, rnd.nextInt(10).toLong))
    val df = data.toDF("score", "c")
    for (desc <- Seq(false, true); bal <- Seq(false, true)) {
      val got = PrefixSum.running(df, Nil, "score", Seq("c"),
        descending = desc, withTotals = true, buckets = 16, balanced = bal)
      assertSame(got, globalRef(df, Nil, "score", Seq("c"), desc), Seq("score"))
    }
    // balance assertion: with quantile boundaries the biggest bucket
    // holds a bounded share; with uniform-range it holds ~99%
    def maxShare(bal: Boolean): Double = {
      val bucketed = PrefixSum.running(df, Nil, "score", Seq("c"),
          buckets = 16, balanced = bal)
        .count() // force; share measured via a re-derivation below
      // re-derive bucket histogram the same way running() does
      val x = col("score").cast("double")
      val n = data.size.toDouble
      if (bal) {
        val pcts = (1 until 16).map(i => i.toDouble / 16)
        val bnds = df.agg(percentile_approx(x, lit(pcts.toArray), lit(10000)).as("b"))
        df.crossJoin(bnds)
          .select(aggregate(col("b"), lit(0), (a, bd) => a + when(x >= bd, 1).otherwise(0)).as("bk"))
          .groupBy(col("bk")).count().agg(max(col("count"))).head().getLong(0) / n
      } else {
        val mn = data.map(_._1).min; val mx = data.map(_._1).max
        df.select(least(lit(15), floor((x - mn) / (mx - mn) * 16).cast("int")).as("bk"))
          .groupBy(col("bk")).count().agg(max(col("count"))).head().getLong(0) / n
      }
    }
    assert(maxShare(bal = false) > 0.9, "fixture not pathological for uniform buckets")
    assert(maxShare(bal = true) < 0.25,
      "quantile buckets failed to spread an outlier-stretched domain")
  }

  test("balanced-bucket mass CONTRACT: max bucket <= n/buckets + 2n/accuracy (all-distinct keys)") {
    // the r12-verdict quantification: the GK sketch bounds each
    // boundary's rank error by n/accuracy, so a bucket (the rank gap
    // between two boundaries) holds at most n/64 + 2n/10000 rows —
    // asserted on the outlier-stretched fixture where uniform RANGE
    // buckets collapse ~99% of rows into one
    import spark.implicits._
    val n = 20000
    val keys = (0 until n).map(i =>
      if (i % 100 == 0) 1e9 + i else i.toDouble / n) // all distinct
    val g = keys.map(k => (k, 1L)).toDF("score", "one")
    val counts = PrefixSum.bucketize(g, Nil, "score", 64, balanced = true)
      .groupBy(col(PrefixSum.BucketCol)).count()
      .collect().map(_.getLong(1))
    val bound = math.ceil(n / 64.0 + 2.0 * n / PrefixSum.BalancedAccuracy).toLong
    assert(counts.max <= bound, s"max bucket mass ${counts.max} > contract bound $bound")
    assert(counts.length >= 32, s"only ${counts.length} buckets materialized")
    // sanity: the fixture IS the failure mode quantile boundaries fix
    val uMax = PrefixSum.bucketize(g, Nil, "score", 64, balanced = false)
      .groupBy(col(PrefixSum.BucketCol)).count()
      .collect().map(_.getLong(1)).max
    assert(uMax >= (n * 0.9).toLong, "fixture no longer outlier-stretched")
  }

  test("null order key raises instead of silently dropping rows") {
    import spark.implicits._
    val df = Seq((java.lang.Long.valueOf(1L), 1L), (null.asInstanceOf[java.lang.Long], 2L))
      .toDF("k", "c")
    for (bal <- Seq(false, true)) {
      val e = intercept[Exception] {
        PrefixSum.running(df, Nil, "k", Seq("c"), balanced = bal).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("null order key")), s"wrong failure: $e")
    }
  }

  test("plan: the only unpartitioned window orders the bucket rollup") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, 1L)).toDF("k", "c")
    val lp = PrefixSum.running(df, Nil, "k", Seq("c"), withTotals = true)
      .queryExecution.optimizedPlan
    val unpart = lp.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(unpart.nonEmpty)
    unpart.foreach { w =>
      assert(w.orderSpec.flatMap(_.references.toSeq).map(_.name).distinct
        === Seq(PrefixSum.BucketCol), s"unpartitioned window not on bucket rollup:\n$w")
    }
  }
}
