package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink surface (S5 header-CSV, S8 JSON summaries + fails report).
  *
  * The engine's stage boundaries are parquet (columnar, statistics,
  * splittable); CSV/JSON sinks exist for reference-compatible exports.
  */
object Sinks {

  /** S5: header CSV export (split.py:49-72 et al.). */
  def csvWithHeader(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def json(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Training-data shard writer — the 100 TB output shape: directory-
    * partitioned by low-cardinality routing columns (source, lang,
    * quality bucket — enables partition PRUNING for downstream mixture
    * readers), with file sizes controlled two ways:
    *
    *  - `maxRecordsPerFile` caps the big end (no 50 GB single file when
    *    one partition value dominates);
    *  - `repartitionByRange(partitionCols ++ sortCols)` before the write
    *    collapses the small end — without a pre-write repartition every
    *    incoming task writes one file PER partition value it touches,
    *    the classic small-files explosion (T tasks × P values files
    *    instead of ~P). Range (not hash-on-partitionCols) partitioning
    *    matters at scale: hashing a partition value routes ALL of its
    *    rows through ONE task — a dominant value (say one language at
    *    50% of the corpus) becomes a single straggler task with an
    *    unbounded sort. Ranging over (partitionCols ++ sortCols) keeps
    *    each value contiguous across only as many tasks as its share
    *    requires, so hot values parallelize and the small-files bound
    *    (~max(P, shuffle partitions) files) still holds.
    *
    * `sortWithinPartitions` orders rows inside each file so parquet
    * min/max column statistics become selective (row-group skip on the
    * sort key).
    */
  def shardedParquet(df: DataFrame, path: String, partitionCols: Seq[String],
                     sortCols: Seq[String], maxRecordsPerFile: Long): Unit =
    df.repartitionByRange((partitionCols ++ sortCols).map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** S8: row-count reconciliation sidecar (build_dataset.py:87-110):
    * input/output counts, error count, and <=100 sample dropped ids.
    * The anti-join is cached so the error count and sample share one
    * computation; the input/output counts are separate cheap aggregates
    * of their (typically parquet-materialized) frames.
    */
  def failsReport(input: DataFrame, output: DataFrame, idCol: String,
                  path: String): Unit = {
    val dropped = input.select(col(idCol)).join(output.select(col(idCol)),
      Seq(idCol), "left_anti").cache()
    try {
      val nErr = dropped.count()
      // JSON-encode ids: numeric ids print bare, anything else quoted
      // with escapes (a raw mkString of string ids is not valid JSON)
      val sample = dropped.limit(100).collect().map(_.get(0)).map {
        case n: java.lang.Number => n.toString
        case other => Json.quote(String.valueOf(other))
      }.mkString("[", ", ", "]")
      val nIn = input.count()
      val nOut = output.count() // real output rows (may duplicate/add ids)
      val jsonStr =
        s"""{"input_count": $nIn, "output_count": $nOut, "number_of_errors": $nErr, "error_ids": $sample}"""
      Fs.writeString(input.sparkSession, path, jsonStr)
    } finally dropped.unpersist()
  }
}
