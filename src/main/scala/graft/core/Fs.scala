package graft.core

import org.apache.spark.sql.SparkSession

/** Target-exists + sidecar-write helpers through the Hadoop FileSystem
  * API, so the pipeline's Luigi-style checkpoint semantics hold on
  * hdfs:///s3a:// outDirs, not just local disk (java.io.File silently
  * reports false there, defeating every skip guard).
  */
object Fs {

  private def fs(spark: SparkSession, path: org.apache.hadoop.fs.Path) =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    fs(spark, p).exists(p)
  }

  /** Overwrite a small text sidecar (JSON summaries, fingerprints). */
  def writeString(spark: SparkSession, path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = fs(spark, p).create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  def readString(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in = fs(spark, p).open(p)
    try new String(in.readAllBytes(), "UTF-8") finally in.close()
  }

  /** Delete a sidecar/marker (no-op when absent). Non-recursive —
    * meant for fingerprints and flags, never stage data.
    */
  def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    fs(spark, p).delete(p, false): Unit
  }

  /** Recursive delete of a stage subtree (no-op when absent) — used by
    * forced pipeline runs to clear stale append/batch state.
    */
  def deleteRecursive(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    fs(spark, p).delete(p, true): Unit
  }

  /** Directory rename (the write-aside + swap step of crash-safe
    * artifact replacement). One metadata op on HDFS/local; fails loud
    * rather than silently leaving both trees.
    */
  def rename(spark: SparkSession, from: String, to: String): Unit = {
    val f = new org.apache.hadoop.fs.Path(from)
    val t = new org.apache.hadoop.fs.Path(to)
    require(fs(spark, f).rename(f, t), s"Fs.rename: $from -> $to failed")
  }

  /** Recursive tree copy (artifact cloning: a mutation gate that needs
    * the same base artifact another query already built clones the
    * tree — bytes move once through the FileSystem API, no recompute
    * and no Spark job). Replaces an existing destination.
    */
  def copyRecursive(spark: SparkSession, from: String, to: String): Unit = {
    val f = new org.apache.hadoop.fs.Path(from)
    val t = new org.apache.hadoop.fs.Path(to)
    val sfs = fs(spark, f)
    val tfs = fs(spark, t)
    if (tfs.exists(t)) tfs.delete(t, true)
    require(org.apache.hadoop.fs.FileUtil.copy(
      sfs, f, tfs, t, false, spark.sparkContext.hadoopConfiguration),
      s"Fs.copyRecursive: $from -> $to failed")
  }
}

/** The one JSON string escaper (Verify's oracle dump, the fails report,
  * the bounds sidecar all need it; hand-rolled copies drifted).
  */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
