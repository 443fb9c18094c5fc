package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TimeKeys

/** Feature-builder surface — the reference's pluggable FeatureBuilder ABC
  * + CompositeBuilder (bicis/lib/feature_builders/base_builders.py:11-57),
  * re-expressed as column-appending DataFrame transforms with a static
  * name-collision check (the reference asserts at runtime,
  * base_builders.py:48-50).
  *
  * The flagship builder is the cyclic hour-ring (W1,
  * bicis/lib/feature_builders/hour_feature_builder.py:27-48): for a trip
  * at hour h, a `window`-dim feature of per-station hourly averages at
  * hours h-1, h-2, ... (wrap-around ring, newest first). The reference
  * fetched these from Redis per row (a network RPC per trip!); here the
  * station profile is a broadcast join + pure array indexing — one scan,
  * no external state.
  */
trait FeatureBuilder {
  /** Names of the columns this builder appends. */
  def featureNames: Seq[String]
  /** Append feature columns to a trips-shaped frame. */
  def apply(trips: DataFrame): DataFrame
}

final class CompositeFeatureBuilder(builders: Seq[FeatureBuilder]) extends FeatureBuilder {
  val featureNames: Seq[String] = builders.flatMap(_.featureNames)
  require(featureNames.distinct.size == featureNames.size,
    s"feature name collision across builders: ${featureNames.diff(featureNames.distinct).distinct}")
  def apply(trips: DataFrame): DataFrame = builders.foldLeft(trips)((df, b) => b(df))
}

/** W1: `window` cyclic hourly lags of the station's average rents and
  * returns. `profile` must be the A6/A7 wide pivot (user_id, h0..h23) for
  * one measure; stations absent from the profile are dropped (inner
  * join), missing hours are zero-filled by the pivot.
  */
final class HourRingFeatures(spark: SparkSession, profile: DataFrame,
                             measure: String, window: Int = 24) extends FeatureBuilder {
  val featureNames: Seq[String] = (0 until window).map(i => s"${measure}_${i}_hb")

  def apply(trips: DataFrame): DataFrame = {
    val profArr = profile.select(col("user_id"),
      array((0 to 23).map(h => col(s"h$h")): _*).as(s"__prof_$measure"))
    val withProf = trips
      .join(broadcast(profArr), "user_id")
      .withColumn("__h", TimeKeys.hourKey(col("ts")))
    val ringCols = (0 until window).map { i =>
      // ring index (h-1-i) mod 24, kept non-negative (hour_feature_builder.py:33-39)
      expr(s"__prof_$measure[(((__h - 1 - $i) % 24) + 24) % 24]").as(s"${measure}_${i}_hb")
    }
    withProf.select(Seq(col("*")) ++ ringCols: _*)
      .drop(s"__prof_$measure", "__h")
  }
}
