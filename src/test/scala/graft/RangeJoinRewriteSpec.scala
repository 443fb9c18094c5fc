package graft

import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

/** The tier-(c) optimizer rule: a naive point-in-interval join must
  * (a) produce byte-identical output to the un-rewritten join, and
  * (b) lose its BroadcastNestedLoopJoin in favor of an equi-join.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  private def fixtures() = {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val base = ts("2024-01-01 00:00:00").getTime
    val points = (1 to 400).map { i =>
      (i.toLong, new java.sql.Timestamp(base + rnd.nextInt(96 * 3600) * 1000L))
    }.toDF("pid", "pts")
    val intervals = (1 to 60).map { i =>
      val s = base + rnd.nextInt(96 * 3600) * 1000L
      // minutes to multi-hour spans, incl. zero/inverted to test the guard
      (i.toLong, new java.sql.Timestamp(s),
        new java.sql.Timestamp(s + (rnd.nextInt(7) - 1) * 1800L * 1000L))
    }.toDF("iid", "istart", "iend")
    (points, intervals)
  }

  private def naiveJoin(points: org.apache.spark.sql.DataFrame,
                        intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
        col("pts") >= col("istart") && col("pts") < col("iend"))
      .select(col("pid"), col("iid"))

  test("rewritten join output equals the naive join, and the BNLJ is gone") {
    val (points, intervals) = fixtures()
    val want = naiveJoin(points, intervals).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "fixture should produce matches")

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      val q = naiveJoin(points, intervals)
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"rule did not fire:\n$plan")
      assert(plan.contains("Generate explode"), s"no chunk explode in:\n$plan")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule leaves equi-joins and non-containment conditions alone") {
    import spark.implicits._
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      val a = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "ats")
      val b = Seq((1L, ts("2024-01-01 09:00:00"))).toDF("k", "bts")
      // plain equi join: untouched (no explode in plan)
      val eq = a.join(b, "k")
      assert(!eq.queryExecution.executedPlan.toString.contains("Generate explode"))
      assert(eq.count() === 1L)
      // one-sided bound only: not the containment pattern, untouched
      val half = a.join(b, col("ats") >= col("bts"))
      assert(!half.queryExecution.executedPlan.toString.contains("Generate explode"))
      assert(half.count() === 1L)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule respects the disable conf") {
    val (points, intervals) = fixtures()
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    try {
      val plan = naiveJoin(points, intervals).queryExecution.executedPlan.toString
      assert(!plan.contains("Generate explode"))
    } finally {
      spark.conf.set("spark.graft.rangeJoin.enabled", "true")
      spark.experimental.extraOptimizations = prev
    }
  }
}
