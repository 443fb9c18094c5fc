package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Eager-checkpoint wrapper, and the window-sweep's eyes into plans
  * that `localCheckpoint` would otherwise erase: a checkpointed frame
  * re-plans as a bare `LogicalRDD` scan, so any operator UPSTREAM of
  * the checkpoint — including an unpartitioned window that would
  * single-task the job — became invisible to PlanSpec's global sweeps
  * (the r11 verdict's blind spot). Every eager checkpoint in the
  * engine now routes through [[eager]] (`df.transform(Ckpt.eager)`),
  * which snapshots the PRE-checkpoint optimized plan into a
  * thread-local buffer whenever a recording is active.
  *
  * Production cost: one ThreadLocal read per checkpoint (nanoseconds);
  * the optimizer only runs on the snapshot INSIDE a recording, i.e. in
  * tests. The buffer is thread-local so concurrently-running suites
  * can't pollute each other's attribution.
  */
object Ckpt {

  private val rec =
    new ThreadLocal[scala.collection.mutable.Buffer[LogicalPlan]]()

  /** `df.localCheckpoint(eager = true)`, recording the pre-checkpoint
    * optimized plan when a [[recording]] is active on this thread.
    *
    * STATS-COMPOUNDING GUARD (r13): Spark's checkpoint keeps the ORIGIN
    * plan's statistics on the new LogicalRDD leaf (so a checkpointed
    * small dim still broadcasts downstream). In an ITERATIVE
    * checkpoint loop that inheritance compounds: round k+1's plan
    * multiplies round k's inherited sizeInBytes at every self-join, so
    * the estimate's DIGIT COUNT doubles-or-worse per round (measured:
    * 26 → 807 bits in six join+checkpoint rounds; Isotonic's 5M-pool
    * probe hit million-digit BigIntegers by round 14 with the planner
    * spending MINUTES inside SizeInBytesOnlyStatsPlanVisitor's
    * products). Estimates past 2^128 carry zero information — any real
    * size fits in a long, and every broadcast threshold compares
    * against megabytes — so past that line the leaf is rebuilt WITHOUT
    * origin stats (a plain createDataFrame over the checkpointed RDD;
    * the row-conversion cost only applies on this already-pathological
    * path). Sane frames keep the cheap path and their useful stats.
    */
  def eager(df: DataFrame): DataFrame = {
    val b = rec.get()
    if (b != null) b += df.queryExecution.optimizedPlan
    val ck = df.localCheckpoint(eager = true)
    if (ck.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength <= 128) ck
    else ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Run `f`, collecting every pre-checkpoint plan [[eager]] snapshots
    * on this thread — PlanSpec's sweep hook.
    */
  def recording[T](f: => T): (T, Seq[LogicalPlan]) = {
    val buf = scala.collection.mutable.Buffer[LogicalPlan]()
    rec.set(buf)
    try { val r = f; (r, buf.toSeq) }
    finally rec.remove()
  }
}
