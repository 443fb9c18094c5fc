package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** M1: temporal train/validation/test split with fixed trailing periods
  * (bicis/etl/raw_data/split.py:15-85).
  *
  * Boundary semantics pinned to the reference (split.py:49-72):
  *   training   = ts <  max − (validation + test)
  *   validation = ts >= max − (validation + test)  AND  ts < max − test
  *   testing    = ts >= max − test                 AND  ts <= max   (closed!)
  *
  * The reference collects max dates to the driver (split.py:36-42); we keep
  * the boundary inside the plan as a broadcast 1-row aggregate
  * (crossJoin(broadcast(bounds))) so the split is a single distributed
  * scan-filter per branch — no driver round-trip, survives any scale.
  */
object TemporalSplit {

  final case class Spec(validationDays: Int = 90, testDays: Int = 90)

  /** 1-row DataFrame with all boundary timestamps (the S8 metadata). */
  def bounds(df: DataFrame, tsCol: String, spec: Spec): DataFrame = {
    val total = spec.validationDays + spec.testDays
    df.agg(max(col(tsCol)).as("__max"))
      .select(
        (col("__max") - expr(s"INTERVAL $total DAYS")).as("training_end_date"),
        (col("__max") - expr(s"INTERVAL $total DAYS")).as("validation_start_date"),
        (col("__max") - expr(s"INTERVAL ${spec.testDays} DAYS")).as("validation_end_date"),
        (col("__max") - expr(s"INTERVAL ${spec.testDays} DAYS")).as("testing_start_date"),
        col("__max").as("testing_end_date"))
  }

  def split(df: DataFrame, tsCol: String, spec: Spec): (DataFrame, DataFrame, DataFrame) = {
    val b = bounds(df, tsCol, spec)
    val withB = df.crossJoin(broadcast(b))
    val ts = col(tsCol)
    val training = withB.where(ts < col("training_end_date"))
    val validation = withB.where(ts >= col("validation_start_date") &&
      ts < col("validation_end_date"))
    val testing = withB.where(ts >= col("testing_start_date") &&
      ts <= col("testing_end_date"))
    val drop = Seq("training_end_date", "validation_start_date",
      "validation_end_date", "testing_start_date", "testing_end_date")
    (training.drop(drop: _*), validation.drop(drop: _*), testing.drop(drop: _*))
  }

  /** Split-metadata JSON sink (S8, split.py:74-85) — tiny driver-side write. */
  def writeBoundsJson(spark: SparkSession, df: DataFrame, tsCol: String,
                      spec: Spec, path: String): Unit = {
    val row = bounds(df, tsCol, spec).collect()(0)
    val fields = row.schema.fieldNames.zipWithIndex
      .map { case (n, i) => s""""$n": "${row.get(i)}"""" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), fields)
  }
}
