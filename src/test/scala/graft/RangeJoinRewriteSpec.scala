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

  test("rewritten join output equals the naive join (as a MULTISET), and the BNLJ is gone") {
    val (points, intervals) = fixtures()
    // sorted-seq compare: set equality would hide duplicated match rows,
    // the exact failure mode the one-row-per-match argument guards
    val want = naiveJoin(points, intervals).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(want.nonEmpty, "fixture should produce matches")

    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      val q = naiveJoin(points, intervals)
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got === want)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("Generate explode"), s"no chunk explode in:\n$plan")
      // the only BNLJ left is the long-interval fallback branch, which
      // is empty for these fixtures (all spans < cap): the short branch
      // must be an equi (hash) join
      assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), s"no equi join in:\n$plan")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("open-ended sentinel intervals take the bounded fallback branch, output still exact") {
    import spark.implicits._
    val (points, _) = fixtures()
    // one year-3000 sentinel (span >> cap) + one normal interval
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("3000-01-01 00:00:00")),
      (2L, ts("2024-01-01 12:00:00"), ts("2024-01-01 14:00:00"))
    ).toDF("iid", "istart", "iend")
    val want = naiveJoin(points, intervals).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      val got = naiveJoin(points, intervals).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got === want) // sentinel matches all 400 points via the fallback
      assert(want.count(_._2 == 1L) === 400)
    } finally spark.experimental.extraOptimizations = prev
  }

  test("rule is idempotent: the optimizer converges with exactly one explode branch") {
    val (points, intervals) = fixtures()
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      val q = naiveJoin(points, intervals)
      val opt = q.queryExecution.optimizedPlan.toString
      // a non-idempotent rule would nest a Union per fixpoint iteration
      // (its own fallback join re-matching) — ~99 stacked branches
      assert("Generate explode".r.findAllIn(opt).size === 1, s"re-entered rewrite:\n$opt")
      assert("Union".r.findAllIn(opt).size <= 1, s"nested unions:\n$opt")
    } finally spark.experimental.extraOptimizations = prev
  }

  test("keyed interval joins (existing equi-conjunct) are left alone") {
    import spark.implicits._
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      val p = Seq((1L, ts("2024-01-01 10:30:00"))).toDF("k", "pts")
      val i = Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
        .toDF("k2", "istart", "iend")
      val q = p.join(i, col("k") === col("k2") &&
        col("pts") >= col("istart") && col("pts") < col("iend"))
      // already a hash join on k; the rule must not re-bucket it
      assert(!q.queryExecution.executedPlan.toString.contains("Generate explode"))
      assert(q.count() === 1L)
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

  test("rule converges inside the operator-optimization batch (spark.sql.extensions path)") {
    // injectOptimizerRule places the rule in a fixpoint batch WITH
    // ColumnPruning/CollapseProject/FoldablePropagation — the round-2 bug:
    // those rules eroded the fallback-branch marker column each iteration,
    // so the rule re-rewrote its own fallback join until maxIterations
    // (throws under spark.testing, which sbt sets). The marker is now an
    // unprunable cross-side conjunct; this builds a REAL extensions
    // session and asserts convergence + exactness there.
    import org.apache.spark.sql.SparkSession
    val base = spark // force shared-session init before we swap defaults
    val (wantRows, pRows, iRows) = {
      import base.implicits._
      val (points, intervals) = fixtures()
      (naiveJoin(points, intervals).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted,
        points.collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSeq,
        intervals.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSeq)
    }
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is read from the SparkContext conf, frozen at
    // context creation — unreachable when tests share one context. The
    // builder's withExtensions hits the IDENTICAL injectOptimizerRule →
    // operator-optimization-batch path; only class-loading differs.
    val ext = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      assert(ext ne base, "extensions test needs its own session")
      import ext.implicits._
      val points = pRows.toDF("pid", "pts")
      // mix in a sentinel so the fallback branch is non-empty and itself
      // subject to re-matching on every fixpoint iteration
      val intervals = (iRows :+ ((999L, ts("2024-01-01 00:00:00"), ts("3000-01-01 00:00:00"))))
        .toDF("iid", "istart", "iend")
      val q = naiveJoin(points, intervals)
      val opt = q.queryExecution.optimizedPlan.toString // throws on non-convergence under spark.testing
      assert("Generate explode".r.findAllIn(opt).size === 1, s"re-entered rewrite:\n$opt")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val want = (wantRows ++ pRows.map(p => (p._1, 999L))).sorted
      assert(got === want)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
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
