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

  test("audioWindows: segments follow the md5-duration window law, hop-spaced, uncovered tail under one hop") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = Multimodal.audioWindows(spark, Multimodal.mediaTable(spark, docs))
      .collect().groupBy(_.doc_id)
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, text) <- Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma", 4L -> "delta")) {
      md.reset()
      val hex = md.digest(text.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val dur = 500L + java.lang.Long.parseLong(hex.substring(16, 20), 16) % 20000L
      val n = 1L + math.max(0L, (dur - 4000L) / 2000L)
      val ws = got(id).sortBy(_.seg_idx)
      assert(ws.length.toLong === n, s"doc $id: ${ws.length} windows, law says $n (dur $dur)")
      ws.zipWithIndex.foreach { case (w, i) =>
        assert(w.seg_idx === i.toLong && w.start_ms === i * 2000L && w.dur_ms === dur)
        assert(w.end_ms === math.min(i * 2000L + 4000L, dur))
      }
      // the uncovered tail is always shorter than one hop (otherwise the
      // law would have emitted another window); only a sub-window clip
      // produces a clipped (single) segment
      assert(dur - ws.last.end_ms < 2000L,
        s"doc $id: tail ${dur - ws.last.end_ms} ms >= hop")
      if (dur >= 4000L) ws.foreach(w => assert(w.end_ms - w.start_ms === 4000L))
    }
  }

  test("resize emits the re-encoded payload: |out_media| == out_bytes == w*h*3, deterministic") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val media = Multimodal.mediaTable(spark, docs)
    val out = Multimodal.resize(spark, media).collect().sortBy(_.doc_id)
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.out_media.length.toLong === r.out_bytes, s"doc ${r.doc_id}")
      assert(r.out_bytes === r.out_w * r.out_h * 3L, s"doc ${r.doc_id}")
      assert(r.out_w >= 1 && r.out_w <= 256 && r.out_h >= 1)
    }
    // stub re-encode is deterministic (same doc -> same bytes)
    val again = Multimodal.resize(spark, media).collect().sortBy(_.doc_id)
    out.zip(again).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.out_media, b.out_media), s"doc ${a.doc_id}")
    }
    // metadata projection agrees with the payload-emitting operator
    val meta = Multimodal.resizeMeta(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(meta.toSeq === out.toSeq.map(r => (r.doc_id, r.out_w, r.out_h, r.out_bytes)))
  }

  test("featureExtract: fixed dims, bins in 0..255, equals the md5 reference") {
    import spark.implicits._
    val docs = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val media = Multimodal.mediaTable(spark, docs)
    val out = Multimodal.featureExtract(spark, media).collect().sortBy(_.doc_id)
    assert(out.map(_.feat.length).toSeq === Seq(8, 8))
    out.foreach(_.feat.foreach(b => assert(b >= 0 && b <= 255)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val refAlpha = md.digest("alpha".getBytes("UTF-8")).take(8)
      .map(b => (b.toLong + 256) % 256)
    assert(out(0).feat.toSeq === refAlpha.toSeq)
  }

  test("phash: bit i = descriptor sign bit; banded dedup equals brute-force hamming <= 3") {
    import spark.implicits._
    // 120 synthetic "images": enough that a few random 16-bit hashes
    // land within hamming 3 of each other. The banded candidate path
    // must reproduce the all-pairs answer EXACTLY (4x4-bit pigeonhole
    // is lossless at threshold 3) — a band arithmetic bug or a lossy
    // banding shows up as a missing pair here.
    val docs = (1 to 120).map(i => (i.toLong, s"media payload number $i"))
      .toDF("doc_id", "text")
    val media = Multimodal.mediaTable(spark, docs)
    val ph = Multimodal.phash(spark, media).collect().sortBy(_.doc_id)
    // formula pin vs the featureExtract reference
    val feats = Multimodal.featureExtract(spark, media, 16).collect()
      .map(f => f.doc_id -> f.feat).toMap
    ph.foreach { p =>
      val expected = feats(p.doc_id).zipWithIndex
        .map { case (b, i) => if (b >= 128L) 1L << i else 0L }.sum
      assert(p.ph === expected, s"doc ${p.doc_id}")
      assert(p.ph >= 0L && p.ph < (1L << 16), s"doc ${p.doc_id} out of 16-bit range")
    }
    // query output == brute-force all-pairs
    val tmp = java.nio.file.Files.createTempDirectory("phash").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val expectedPairs = (for {
      a <- ph; b <- ph if a.doc_id < b.doc_id
      d = java.lang.Long.bitCount(a.ph ^ b.ph) if d <= 3
    } yield (a.doc_id, b.doc_id, d.toLong)).sortBy(t => (t._1, t._2)).toSeq
    val got = graft.queries.EmbedQueries.multimodalPhashDedup.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expectedPairs)
    assert(expectedPairs.nonEmpty, "fixture produced no near pairs — enlarge it")
  }
}
