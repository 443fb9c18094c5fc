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
  * At 100 TB a hot station is handled by [[forwardWindowCountChunked]] —
  * a window frame cannot be AQE-split, so skew needs the time-chunk
  * decomposition, not a join-style hint.
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

  /** A5 under key skew: the plain operator's window exchange puts a whole
    * key in ONE task (a window frame cannot be AQE-split the way a skewed
    * join can), so a station with 30% of all events serializes 30% of the
    * work. This variant decomposes TIME instead: events are duplicated
    * into their own `window`-sized chunk (owner row) and the previous
    * chunk (context row) — an event's [t, t+w) frame spans at most those
    * two chunks — and the window runs within (key, chunk) partitions.
    * Each real event appears exactly once per partition (chunk-c events
    * as owners, chunk-c+1 events as context), so the frame count equals
    * the plain operator's (WindowOpsSpec proves equality, hot key
    * included). The full-window cutoff comes from a tiny per-key
    * aggregate joined back (Catalyst broadcasts it under the threshold)
    * instead of a whole-partition max window, which would re-serialize
    * the hot key.
    *
    * Cost: 2× shuffle rows. Win: parallelism = keys × active chunks, so
    * a hot key's work spreads over its time range. Use when one key
    * holds ≳ a task's worth of rows; the plain operator is cheaper on
    * balanced keys (SkewProbe records the crossover).
    */
  def forwardWindowCountChunked(events: DataFrame, partKey: String, tsCol: String,
                                idCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    val w = windowMicros
    val base = events.select(col(partKey).as("__k"), col(idCol).as("__id"),
      unix_micros(col(tsCol).cast("timestamp")).as("__us"))
    val cutoffs = base.groupBy(col("__k")).agg(max(col("__us")).as("__mx"))
    // exact floor division for any sign: align to the positive remainder,
    // then `div` (which truncates) is exact on the aligned numerator
    val chunk = expr(s"(__us - pmod(__us, ${w}L)) div ${w}L")
    val dup = base.select(col("__k"), col("__id"), col("__us"),
      explode(array(
        struct(chunk.as("__chunk"), lit(true).as("__own")),
        struct((chunk - 1).as("__chunk"), lit(false).as("__own")))).as("__d"))
      .select(col("__k"), col("__id"), col("__us"),
        col("__d.__chunk").as("__chunk"), col("__d.__own").as("__own"))
    val frame = Window.partitionBy(col("__k"), col("__chunk")).orderBy(col("__us"))
      .rangeBetween(0L, w - 1)
    dup
      .withColumn("n_rents", count(lit(1)).over(frame).cast("long"))
      .where(col("__own"))
      .join(cutoffs, "__k")
      .where(col("__us") <= col("__mx") - w)
      .select(col("__id").as(idCol), col("n_rents"))
  }

  /** Typed escape hatch for A5 (SURVEY.md §7.4): same semantics via
    * groupByKey + flatMapGroups — the fallback if a RANGE-frame boundary
    * mismatch ever surfaced, and the template for per-group imperative
    * logic Spark expressions can't write. NOTE the scale tradeoff this
    * makes explicit: the whole group materializes in one task (the
    * reference's groupByKey hazard), vs the window version's streaming
    * frame evaluation. Kept for API completeness and as a differential
    * test oracle (WindowOpsSpec asserts equality).
    */
  def forwardWindowCountTyped(spark: org.apache.spark.sql.SparkSession,
                              events: DataFrame, partKey: String, tsCol: String,
                              idCol: String, windowMicros: Long): DataFrame = {
    import spark.implicits._
    events
      // the partition key groups by its STRING form — injective for
      // numerics and identity for strings, so the fallback really does
      // accept every key type the primary operator accepts (a long cast
      // would throw under ANSI on station-name keys, or null-merge them)
      .select(col(partKey).cast("string"), col(idCol).cast("long"),
        unix_micros(col(tsCol).cast("timestamp")))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (_: String, it: Iterator[(String, Long, Long)]) =>
        forwardCountsCore(it.map(e => (e._2, e._3)).toArray, windowMicros).iterator
      }
      .toDF(idCol, "n_rents")
  }

  /** Pure single-group A5 core (two-pointer over the ts-sorted events):
    * (id, count of events with ts in [t, t+w)) for every event with
    * t <= max(ts) - w. Factored out so WindowLawsProps can law-check it
    * against the O(n²) definition without a Spark session.
    */
  private[graft] def forwardCountsCore(events: Array[(Long, Long)],
                                       windowMicros: Long): Seq[(Long, Long)] = {
    val es = events.sortBy(_._2)
    if (es.isEmpty) Seq.empty
    else {
      val cutoff = es.last._2 - windowMicros
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var lo = 0 // first idx with ts >= t (ties before the current row count!)
      var hi = 0 // first idx with ts >= t + w
      var idx = 0
      while (idx < es.length && es(idx)._2 <= cutoff) {
        val (id, t) = es(idx)
        while (es(lo)._2 < t) lo += 1
        if (hi < lo) hi = lo
        while (hi < es.length && es(hi)._2 < t + windowMicros) hi += 1
        out += ((id, (hi - lo).toLong))
        idx += 1
      }
      out.toSeq
    }
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
