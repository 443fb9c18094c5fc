package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.GraftColumns
import org.apache.spark.sql.functions._

/** Multi-column data-layout clustering for scan pruning — the write-side
  * complement to hive partitioning (low-cardinality dims) and
  * single-column sort (one range dim): cluster files by the Z-ORDER
  * key of several bucketized columns so every file's parquet min/max
  * stats form a tight bounding BOX over all of them, and a
  * multi-predicate scan skips every file whose box misses the query box
  * (the Delta/Iceberg OPTIMIZE ZORDER layout idea, on the
  * [[graft.functions.ZOrder64]] native kernel). ZOrderSpec measures the
  * skip advantage over a single-column sort; q_zorder_census gates the
  * write→read cycle against a layout-independent oracle.
  */
object Layout {

  /** Z-order sort key over pre-bucketized non-negative integral
    * columns (each clamped into its ⌊63/k⌋-bit budget by the kernel).
    */
  def zorder(cols: Column*): Column =
    GraftColumns.column(graft.functions.ZOrder64(
      cols.map(GraftColumns.expression).toIndexedSeq))

  /** Monotone range bucket of `c` into [0, 2^bits) given inclusive
    * bounds — the quantizer in front of [[zorder]] for real domains
    * (bucket balance is best-effort; pruning correctness only needs
    * monotonicity, and out-of-bounds values clamp in the kernel).
    */
  def rangeBucket(c: Column, mn: Long, mx: Long, bits: Int): Column = {
    val buckets = (1L << bits).toDouble
    floor((c.cast("double") - lit(mn.toDouble)) /
      lit((mx - mn + 1).toDouble) * lit(buckets)).cast("long")
  }

  /** Write `df` clustered by `zkey`: range-partition across `numFiles`
    * write tasks for cross-file key locality, sort within each, cap
    * rows per file. The key column is dropped before the write (sort
    * order survives the projection — no exchange between them).
    */
  def zorderedParquet(df: DataFrame, path: String, zkey: Column,
      numFiles: Int, maxRecordsPerFile: Long): Unit =
    df.withColumn("__zkey", zkey)
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
