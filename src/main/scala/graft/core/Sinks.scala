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

  /** INCREMENTAL shard maintenance (r14 verdict §2): rewrite only the
    * hive partitions whose CONTENT changed since the last write,
    * leaving every untouched partition's files in place — the append
    * path's shard cost becomes ∝ partitions touched by the batch, not
    * corpus size. The change detection is a cheap id-sized diff, never
    * a heavy-column read: both sides project to
    * (partitionCols ++ sortCols ++ keyCol) — the parquet scan of the
    * existing layout column-prunes the text away — and a row outside
    * that projection cannot differ, PROVIDED every other column is
    * determined by `keyCol` (documents are immutable per doc_id; the
    * caller's contract — and (partitionCols ++ sortCols ++ keyCol)
    * tuples must be UNIQUE: the diff is a set difference, so a
    * multiplicity-only change in duplicate keyed rows is invisible to
    * it). Changed partitions are replaced via dynamic partition
    * overwrite (only partitions present in the written data are
    * dropped), with the same range-repartition + in-file sort +
    * file-size cap as [[shardedParquet]]. A first write (no _SUCCESS)
    * falls back to the full writer, and so does a rerun after a crash
    * MID-incremental-write: the root _SUCCESS marker is retired before
    * the first mutation and restored only at commit, so a torn write
    * can never be mistaken for a finished one (the full writer's
    * delete-at-start self-heal, kept). Returns the number of
    * partitions rewritten (-1 = full write).
    */
  def shardedParquetIncremental(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String], keyCol: String,
      maxRecordsPerFile: Long): Int = {
    val spark = df.sparkSession
    if (!Fs.exists(spark, s"$path/_SUCCESS")) {
      shardedParquet(df, path, partitionCols, sortCols, maxRecordsPerFile)
      return -1
    }
    // partition columns compare AS STRINGS on both sides: hive
    // partition-type inference reads a numeric-looking value back as
    // INT, and a typed except() against the frame's own column type
    // would throw where the full writer succeeded (r15 review)
    val proj = (partitionCols.map(c => col(c).cast("string").as(c)) ++
      (sortCols :+ keyCol).distinct.filterNot(partitionCols.contains).map(col))
    val old = spark.read.parquet(path).select(proj: _*)
    val neu = df.select(proj: _*)
    // changed-partition census: symmetric difference of the id-sized
    // projections, collapsed to partition values (bounded: ≤ |partitions|)
    val changed = neu.except(old).select(partitionCols.map(col): _*)
      .unionByName(old.except(neu).select(partitionCols.map(col): _*))
      .distinct().collect()
    if (changed.isEmpty) return 0
    val sep = "\u0001"
    val key = concat_ws(sep, partitionCols.map(c => col(c).cast("string")): _*)
    val wanted = changed.map(r =>
      partitionCols.indices.map(i => String.valueOf(r.get(i))).mkString(sep))
    val slice = df.where(key.isin(wanted.toIndexedSeq: _*))
    val present = slice.select(key.as("__k")).distinct()
      .collect().map(_.getString(0)).toSet
    // retire the root commit marker BEFORE any mutation (restored at
    // the overwrite job's own commit, or explicitly on the
    // deletions-only path) — a crash between the deletes below and the
    // job commit must leave the layout looking UNfinished so the next
    // derive full-rewrites instead of serving a torn layout
    Fs.delete(spark, s"$path/_SUCCESS")
    // a partition whose every row disappeared has nothing in the written
    // data, so dynamic overwrite would leave its stale files behind —
    // drop the emptied directories explicitly (the retraction case).
    // Directory names use Spark's OWN partition-path escaping, not the
    // raw value (a source like "a/b" writes as a%2Fb).
    wanted.filterNot(present).foreach { k =>
      val dir = partitionCols.zip(k.split(sep, -1))
        .map { case (c, v) =>
          org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(c, v)
        }.mkString(s"$path/", "/", "")
      Fs.deleteRecursive(spark, dir)
    }
    if (present.nonEmpty)
      slice
        .repartitionByRange((partitionCols ++ sortCols).map(col): _*)
        .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", maxRecordsPerFile)
        .partitionBy(partitionCols: _*)
        .parquet(path)
    // restore the commit marker EXPLICITLY: the dynamic-overwrite
    // commit protocol stages per-partition moves and does not recreate
    // the root _SUCCESS this writer uses as its finished-layout marker
    Fs.writeString(spark, s"$path/_SUCCESS", "")
    changed.length
  }

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
