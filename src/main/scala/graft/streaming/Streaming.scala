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

  /** A10 streaming twin: watermarked event-time tumbling counts. */
  def tumblingCounts(events: DataFrame, tsCol: String, duration: String,
                     watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), duration).getField("start").as("ws"))
      .agg(count(lit(1)).as("n"))

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
          val add = batch.toSeq.groupBy(_.ts.toLocalDateTime.getHour)
            .view.mapValues(_.size.toLong).toMap
          val next = (prev.keySet ++ add.keySet).map { h =>
            h -> (prev.getOrElse(h, 0L) + add.getOrElse(h, 0L))
          }.toMap
          state.update(next)
          add.keysIterator.map(h => ProfileRow(user, h, next(h)))
      }
  }
}
