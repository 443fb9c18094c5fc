package graft

import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  test("stub decode is deterministic and within declared ranges") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val m1 = Multimodal.decodeOne(1L, "hello world".getBytes("UTF-8"), md)
    val m2 = Multimodal.decodeOne(1L, "hello world".getBytes("UTF-8"), md)
    assert(m1 === m2)
    assert(m1.n_bytes === 11L)
    assert(m1.width >= 1 && m1.width <= 1024)
    assert(m1.height >= 1 && m1.height <= 1024)
    assert(m1.n_frames >= 1 && m1.n_frames <= 64)
    assert(Set("image", "audio", "video").contains(m1.fmt))
  }

  test("dataset decode preserves row count and ids") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val out = Multimodal.decode(spark, Multimodal.mediaTable(spark, docs))
      .collect().sortBy(_.doc_id)
    assert(out.map(_.doc_id).toSeq === Seq(1L, 2L, 3L))
    assert(out.map(_.n_bytes).toSeq === Seq(5L, 4L, 5L))
  }
}
