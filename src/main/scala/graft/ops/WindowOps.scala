package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time window operators.
  *
  * A5 — the flagship: forward sliding event-time count. For each event at
  * time t within a partition, count events (incl. itself) with timestamp in
  * [t, t+window) — left-closed right-open, pinned empirically against the
  * reference's reversed-index pandas rolling sum
  * (bicis/etl/feature_extraction/next_window_target.py:61-111). Only "full
  * windows" are emitted: events with t <= max(partition ts) − window,
  * inclusive, where the cutoff is the partition's own max, not the global
  * one (next_window_target.py:86-96).
  *
  * The reference implements this with groupByKey + per-station pandas — the
  * whole station materialized in one Python worker (skew hazard, no
  * codegen). Here it is a single Catalyst RANGE-frame window over
  * microsecond event time: one hash exchange on the partition key, one
  * sort, one WindowExec — and the full-window mask reuses the same
  * partitioning (an unordered max window), so Catalyst plans ONE shuffle.
  * At 100 TB a hot station is handled by AQE skew hints upstream or by
  * pre-bucketing the events table on the partition key.
  */
object WindowOps {

  /** A5: per-key forward [t, t+window) event count with full-window mask.
    * Emits (idCol, n_rents). `windowMicros − 1` enforces the open right
    * bound on the microsecond-long range frame.
    */
  def forwardWindowCount(events: DataFrame, partKey: String, tsCol: String,
                         idCol: String, windowMicros: Long): DataFrame = {
    val frame = Window.partitionBy(col(partKey)).orderBy(col("__us"))
      .rangeBetween(0L, windowMicros - 1)
    val whole = Window.partitionBy(col(partKey))
    events
      .withColumn("__us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("n_rents", count(lit(1)).over(frame).cast("long"))
      .withColumn("__max", max(col("__us")).over(whole))
      .where(col("__us") <= col("__max") - windowMicros)
      .select(col(idCol), col("n_rents"))
  }

  /** A10: tumbling event-time window count (the notebook's `resample('H')`).
    * Implemented as groupBy over the window start — a plain hash aggregate,
    * partial-combined map-side.
    */
  def tumblingCount(events: DataFrame, tsCol: String, duration: String): DataFrame =
    events
      .groupBy(window(col(tsCol).cast("timestamp"), duration).getField("start").as("ws"))
      .agg(count(lit(1)).as("n"))
}
