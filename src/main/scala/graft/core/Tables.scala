package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * All tables are parquet with embedded schemas — the engine never infers
  * schemas from CSV at query time (unlike the reference, which re-infers on
  * every load: bicis/lib/utils.py:15-26). Parquet scans give Catalyst
  * column pruning + predicate pushdown for free, which is the 100 TB-scale
  * posture: a query touching 2 of 16 columns must read 2 column chunks.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` normalization. The generator has shipped two encodings:
    * parquet TIMESTAMP(NANOS) (read nanos-as-long via the legacy conf,
    * truncated to µs — matching DuckDB's ns→µs truncation) and untagged
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false, which Spark 4 reads as
    * TIMESTAMP_NTZ (`spark.sql.parquet.inferTimestampNTZ.enabled` default).
    * Either way the engine's contract is a session-zone (UTC) instant
    * timestamp — the NTZ cast preserves the wall clock under the pinned
    * UTC session zone, so oracle parity holds unchanged.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
