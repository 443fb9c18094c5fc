package graft

import org.apache.spark.sql.functions._
import graft.ops.{IvfIndex, Scratch}

/** Persisted-index append laws: with centroids held fixed, appending a
  * batch must equal a full rebuild — cell assignments, probe results,
  * and file layout (append adds files, never rewrites the base).
  */
class IvfIndexSpec extends SparkSpec {

  private val dim = 8

  /** 4 planted clusters at scaled unit corners; base ids 0..199,
    * batch ids 200..249 drawn from the same clusters.
    */
  private def planted(n: Int, idBase: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(idBase + 5)
    (0 until n).map { k =>
      val c = rnd.nextInt(4)
      val v = Array.tabulate(dim)(i =>
        (if (i == c) 10.0 else 0.0) + rnd.nextInt(100) / 1000.0)
      (idBase + k, v.toSeq)
    }.toDF("vec_id", "v")
  }

  test("append == rebuild: assignments and probe agree with assign-all on fixed centroids") {
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val root = Scratch.dir("spec_ivf_append")
    IvfIndex.build(base, k = 4, iters = 2, root)
    IvfIndex.append(spark, batch, root)

    val got = IvfIndex.assignments(spark, root)
      .select(col("vec_id"), col("cl")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = graft.ml.KMeans.assign(
        base.unionByName(batch), IvfIndex.centroids(spark, root))
      .select(col("vec_id"), col("cl")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(got.size === 250)

    // probe over the appended index == probe over a rebuilt index
    val rebuiltRoot = Scratch.dir("spec_ivf_rebuild")
    IvfIndex.build(base, k = 4, iters = 2, rebuiltRoot)
    graft.ml.KMeans.assign(base.unionByName(batch), IvfIndex.centroids(spark, rebuiltRoot))
      .select(col("vec_id"), col("v"), col("cl"))
      .write.mode("overwrite").partitionBy("cl").parquet(s"$rebuiltRoot/assignments")
    val q = base.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv"))
    def res(r: String) = IvfIndex.probe(spark, q, r, nprobe = 2, topk = 3,
        cand = _.where(col("vec_id") >= 5)).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3))).toSet
    assert(res(root) === res(rebuiltRoot))
  }

  test("append only ADDS files under the cell partitions (base never rewritten)") {
    val base = planted(200, 0L)
    val batch = planted(50, 200L)
    val root = Scratch.dir("spec_ivf_files")
    IvfIndex.build(base, k = 4, iters = 2, root)
    // identity = (path, CONTENT hash): mtime granularity is 1 s on some
    // filesystems, so a same-length rewrite within one tick would have
    // slipped past an (mtime, length) check (r11 advice)
    def files = {
      val fs = new java.io.File(s"$root/assignments")
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      walk(fs).filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          (f.getAbsolutePath, md.digest(bytes).map("%02x".format(_)).mkString)
        }.toSet
    }
    val before = files
    IvfIndex.append(spark, batch, root)
    val after = files
    assert(before.subsetOf(after), "append rewrote or dropped base files")
    assert(after.size > before.size, "append added no files")
  }
}
