package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (engine extension; the reference is pure
  * batch — SURVEY.md §2.9. Its streaming-shaped computation is the A10
  * tumbling count and the incrementally-maintained station profile that
  * Redis held, hour_feature_builder.py:59-92).
  *
  * Same transforms compose over `spark.readStream` sources: event-time
  * tumbling counts with a watermark (late data beyond the delay is
  * dropped and state is GC'd — bounded state at any scale), and the
  * station hour-profile as explicit keyed state via
  * flatMapGroupsWithState (the Redis replacement: state lives in the
  * state store, checkpointed, partitioned by station).
  */
object Streaming {

  final case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                      event_type: String)
  final case class ProfileRow(user_id: Long, hour: Int, n: Long)

  /** A10 streaming twin: watermarked event-time tumbling counts. Groups
    * by the window STRUCT (projecting `start` only after the aggregate):
    * extracting the field before grouping severs the watermark linkage
    * and Spark rejects append-mode sinks ("aggregation without
    * watermark").
    */
  def tumblingCounts(events: DataFrame, tsCol: String, duration: String,
                     watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))

  final case class FwState(maxTs: Long, emittedUpTo: Long, buf: List[(Long, Long)])
  final case class FwOut(event_id: Long, n_rents: Long)

  /** The flagship A5 as an INCREMENTAL streaming operator: per key, an
    * event at time t is emitted with its [t, t+w) forward count once the
    * key's max event time reaches t + w + lateness (the per-key
    * full-window cutoff, exactly the batch semantics of
    * WindowOps.forwardWindowCount).
    *
    * Out-of-order hardening: arrivals are buffered and sorted by event
    * time, and `latenessMicros` delays emission so that any event
    * arriving up to that far behind the key's max STILL lands inside the
    * retained buffer before anything overlapping its window is emitted —
    * exact counts under bounded disorder, the watermark contract. Events
    * later than the horizon are dropped (never emitted wrong), matching
    * Structured Streaming's late-data semantics.
    *
    * State per key stays bounded: only events with ts > maxTs - w -
    * lateness are retained. Everything older is both emitted and
    * unreachable as a counter for any still-pending event (pending t' >
    * cutoff, so its window only needs counters o >= t' > cutoff).
    */
  def streamingForwardWindowCount(spark: SparkSession, events: Dataset[Ev],
                                  windowMicros: Long,
                                  latenessMicros: Long = 0L): Dataset[FwOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FwState, FwOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Ev], state: GroupState[FwState]) =>
          val prev = state.getOption.getOrElse(FwState(Long.MinValue, Long.MinValue, Nil))
          val incoming = batch.map(e =>
            (e.event_id, e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000)).toList
          val all = (prev.buf ++ incoming).sortBy(_._2)
          val mx = if (all.isEmpty) prev.maxTs else math.max(prev.maxTs, all.map(_._2).max)
          val cutoff = mx - windowMicros - latenessMicros
          val out = all.collect {
            case (id, t) if t <= cutoff && t > prev.emittedUpTo =>
              FwOut(id, all.count { case (_, o) => o >= t && o < t + windowMicros }.toLong)
          }
          state.update(FwState(mx, cutoff, all.filter { case (_, t) => t > cutoff }))
          out.iterator
      }
  }

  /** Event-time SESSION windows per key: activity separated by gaps
    * longer than `gap` starts a new session (Spark's native
    * `session_window` — merging windows in the state store, finalized
    * and emitted once the watermark passes a session's end). The
    * streaming twin of the batch gap-sessionize operator.
    */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
                    gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"))

  /** Stream-stream interval join: pairs each left event with right
    * events of the same key landing in [left.ts, left.ts + bound]. Both
    * sides are watermarked, and the time-range predicate bounds the
    * state store on BOTH sides (Spark GC's buffered rows once the
    * watermark passes their join horizon — without the range condition
    * stream-stream state grows forever). The canonical
    * attribution/enrichment shape (click ⋈ conversions-within-1h).
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
                         keyCol: String, tsCol: String,
                         watermarkDelay: String, boundSeconds: Long): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay).alias("l")
    val r = right.withWatermark(tsCol, watermarkDelay).alias("r")
    l.join(r,
      expr(s"""l.$keyCol = r.$keyCol AND
              |r.$tsCol >= l.$tsCol AND
              |r.$tsCol <= l.$tsCol + interval $boundSeconds seconds""".stripMargin))
      .select(col(s"l.$keyCol").as(keyCol),
        col("l.event_id").as("left_id"), col("r.event_id").as("right_id"),
        col(s"l.$tsCol").as("left_ts"), col(s"r.$tsCol").as("right_ts"))
  }

  /** Streaming exact dedup: first occurrence of each content digest
    * passes, replays and duplicates are dropped; the watermark bounds the
    * digest state store (dedup keys older than the delay are GC'd — the
    * standard unbounded-stream tradeoff: exactness within the watermark
    * horizon).
    */
  def streamingDedup(docs: DataFrame, tsCol: String, contentCol: String,
                     watermarkDelay: String): DataFrame =
    docs
      .withColumn("__digest", md5(col(contentCol).cast("binary")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicates("__digest")
      .drop("__digest")

  /** Incrementally-maintained per-station hour profile (the Redis hash
    * `{station}_{hour} -> counts` as proper keyed state). Emits the
    * updated (station, hour, running count) rows per micro-batch.
    */
  def runningHourProfile(spark: SparkSession, events: Dataset[Ev]): Dataset[ProfileRow] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Map[Int, Long], ProfileRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[Map[Int, Long]]) =>
          val prev = state.getOption.getOrElse(Map.empty[Int, Long])
          // UTC hour from the epoch, independent of the JVM default zone
          // (toLocalDateTime would follow user.timezone and diverge from
          // the batch profile computed under spark.sql.session.timeZone)
          val add = batch.toSeq
            .groupBy(e => (math.floorMod(e.ts.getTime / 1000L, 86400L) / 3600L).toInt)
            .view.mapValues(_.size.toLong).toMap
          val next = (prev.keySet ++ add.keySet).map { h =>
            h -> (prev.getOrElse(h, 0L) + add.getOrElse(h, 0L))
          }.toMap
          state.update(next)
          add.keysIterator.map(h => ProfileRow(user, h, next(h)))
      }
  }
}
