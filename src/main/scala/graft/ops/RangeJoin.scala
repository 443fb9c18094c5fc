package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: points joined to [start, end) intervals on a
  * shared key.
  *
  * Spark's naive plan for `p.ts >= r.start AND p.ts < r.end` is a
  * nested-loop join. This is the bucketed formulation: intervals are
  * exploded into the fixed-width time chunks they overlap, points map to
  * their single chunk, and the join becomes an EQUI-join on
  * (key, chunk) with the range predicate as a residual filter. Cost
  * scales with true overlaps (plus interval length / chunk width
  * duplication), not |points| x |intervals| — the standard interval-join
  * decomposition used by time-series engines.
  *
  * Chunk ids use integer division of microsecond epochs (double division
  * of >2^53 micros would mis-bucket points within ~128 µs of a boundary).
  */
object RangeJoin {

  /** Join points (pointTs) to intervals ([startCol, endCol), same key).
    * Returns point rows ++ interval rows for each containment match.
    * Empty/inverted intervals (end <= start) match nothing.
    * `chunkMicros` trades explode duplication vs candidate precision;
    * choose ~ the typical interval length.
    *
    * Intervals spanning more than `maxChunksPerInterval` chunks
    * (open-ended sentinels, year-long rows) take a key-hash-join union
    * branch instead of materializing a multi-million-element chunk
    * array — the atypical row must not OOM the job.
    */
  def pointInInterval(points: DataFrame, pKey: String, pointTs: String,
                      intervals: DataFrame, iKey: String, startCol: String,
                      endCol: String, chunkMicros: Long,
                      maxChunksPerInterval: Long = 4096L): DataFrame = {
    val valid = intervals.where(col(endCol) > col(startCol))
    val spanChunks =
      expr(s"(unix_micros($endCol) - 1) div $chunkMicros - unix_micros($startCol) div $chunkMicros")
    val p = points
      .withColumn("__chunk", expr(s"unix_micros($pointTs) div $chunkMicros"))
    val i = valid
      .where(spanChunks < maxChunksPerInterval)
      .withColumn("__chunk", explode(expr(
        // an interval ending exactly on a chunk boundary does not own
        // that chunk (end exclusive) -> upper bound from end-1
        s"sequence(unix_micros($startCol) div $chunkMicros, (unix_micros($endCol) - 1) div $chunkMicros)")))
    val shortJoin = p.join(i, p("__chunk") === i("__chunk") && p(pKey) === i(iKey) &&
        col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__chunk")
    val longSide = valid.where(spanChunks >= maxChunksPerInterval)
    val longJoin = points.join(longSide,
      points(pKey) === longSide(iKey) &&
        col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
    // positional union: both branches are [points.*, intervals.*], and
    // pKey/iKey may share a name (unionByName rejects duplicates)
    shortJoin.union(longJoin)
  }
}
