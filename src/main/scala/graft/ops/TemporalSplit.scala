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
  * Bounds are one 1-row max aggregate COLLECTED ONCE (the S10-sanctioned
  * tiny driver summary, like the reference's split.py:36-42) and applied
  * as literal predicates: materializing all three branches costs one
  * bounds scan total (an in-plan broadcast subtree would re-run the
  * aggregate per branch action), and literal timestamp filters reach the
  * scan for rowgroup/partition pruning.
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

  /** The collected 1-row bounds — compute ONCE per run and share between
    * [[split]] and [[writeBoundsJson]] (each would otherwise re-scan).
    */
  def boundsRow(df: DataFrame, tsCol: String, spec: Spec): org.apache.spark.sql.Row =
    bounds(df, tsCol, spec).collect()(0)

  def split(df: DataFrame, tsCol: String, spec: Spec,
            precomputed: Option[org.apache.spark.sql.Row] = None): (DataFrame, DataFrame, DataFrame) = {
    val b = precomputed.getOrElse(boundsRow(df, tsCol, spec))
    val ts = col(tsCol)
    val (trEnd, vaStart, vaEnd, teStart, teEnd) =
      (lit(b.get(0)), lit(b.get(1)), lit(b.get(2)), lit(b.get(3)), lit(b.get(4)))
    (df.where(ts < trEnd),
      df.where(ts >= vaStart && ts < vaEnd),
      df.where(ts >= teStart && ts <= teEnd))
  }

  /** Split-metadata JSON sink (S8, split.py:74-85) — tiny driver-side
    * write through the Hadoop FS (object-store safe), values escaped.
    */
  def writeBoundsJson(spark: SparkSession, row: org.apache.spark.sql.Row, path: String): Unit = {
    // timestamps render in UTC explicitly — Timestamp.toString follows
    // the JVM default zone (user.timezone), which is NOT pinned by the
    // engine; the sidecar must not shift per host while the session
    // semantics stay UTC
    val utcFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    def render(v: Any): String = v match {
      case t: java.sql.Timestamp => utcFmt.format(t.toInstant)
      case other => String.valueOf(other)
    }
    val fields = row.schema.fieldNames.zipWithIndex
      .map { case (n, i) => s"${graft.core.Json.quote(n)}: ${graft.core.Json.quote(render(row.get(i)))}" }
      .mkString("{", ", ", "}")
    graft.core.Fs.writeString(spark, path, fields)
  }

  def writeBoundsJson(spark: SparkSession, df: DataFrame, tsCol: String,
                      spec: Spec, path: String): Unit =
    writeBoundsJson(spark, boundsRow(df, tsCol, spec), path)
}
