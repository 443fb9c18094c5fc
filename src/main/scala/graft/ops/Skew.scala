package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities for hot keys at cluster scale.
  *
  * AQE's skew-join splitting covers sort-merge joins; these cover the
  * cases it doesn't: a single dominant group in an aggregation (the "hot
  * station" of the reference's groupByKey path, SURVEY.md §3.3) and
  * broadcastable-dim joins against a skewed fact key.
  */
object Skew {

  /** Two-phase salted aggregation: counts per (key, salt) combine
    * map-side into `buckets` partial rows per hot key, then a cheap
    * final combine. Equivalent to a plain groupBy-count, but the first
    * shuffle spreads a hot key over `buckets` reducers.
    */
  def saltedCount(df: DataFrame, key: Column, buckets: Int): DataFrame =
    df.groupBy(key.as("k"), (rand(42) * buckets).cast("int").as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("k"))
      .agg(sum(col("__partial")).as("n"))

  /** Generic salted two-phase aggregation for algebraic aggregates:
    * partial on (key, salt), final re-aggregation supplied by caller.
    */
  def salted(df: DataFrame, key: Column, buckets: Int,
             partial: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.groupBy(key.as("k"), (rand(42) * buckets).cast("int").as("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col("k"))
      .agg(finalAgg.head, finalAgg.tail: _*)
}
