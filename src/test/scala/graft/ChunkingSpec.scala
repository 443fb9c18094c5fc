package graft

/** Semantics of ml_chunk_documents the oracle can't falsify alone (a
  * shared off-by-one would land identically on both engines): chunk
  * count, tail-chunk shortening, full-coverage with stride overlap, and
  * the map-only plan shape.
  */
class ChunkingSpec extends SparkSpec {

  private def run(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("chunks").toString
    texts.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    graft.queries.MlQueries.mlChunkDocuments.run(spark, tmp)
  }

  test("chunk count is ceil(len/stride); tail chunks run short, never dropped") {
    // width 120, stride 90
    val df = run(Seq(
      (0L, ""),          // excluded entirely
      (1L, "x" * 1),     // 1 chunk of 1
      (2L, "x" * 90),    // boundary: exactly one stride -> 1 chunk
      (3L, "x" * 91),    // 2 chunks; second is the 1-char tail
      (4L, "x" * 300)))  // 4 chunks: 120,120,120,30
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byDoc = got.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(!byDoc.contains(0L))
    assert(byDoc(1L).map(c => (c._3, c._4)).toSeq === Seq((1L, 1L)))
    assert(byDoc(2L).map(c => (c._3, c._4)).toSeq === Seq((1L, 90L)))
    assert(byDoc(3L).map(c => (c._3, c._4)).toSeq === Seq((1L, 91L), (91L, 1L)))
    assert(byDoc(4L).map(c => (c._3, c._4)).toSeq ===
      Seq((1L, 120L), (91L, 120L), (181L, 120L), (271L, 30L)))
    // chunk_idx is dense from 0 in stride units
    byDoc.values.foreach { cs =>
      assert(cs.map(_._2).toSeq === cs.indices.map(_.toLong).toSeq)
    }
  }

  test("every character lands in at least one chunk (stride < width overlap)") {
    val df = run(Seq((7L, "y" * 1234)))
    val spans = df.collect().map(r => (r.getLong(2), r.getLong(2) + r.getLong(3) - 1))
    val covered = spans.foldLeft(0L) { case (hi, (s, e)) =>
      assert(s <= hi + 1, s"gap before $s (covered to $hi)"); math.max(hi, e)
    }
    assert(covered === 1234L)
  }

  test("chunking is map-only: no hash exchange, only the output sort") {
    val p = run(Seq((1L, "z" * 500))).queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"), s"unexpected shuffle in:\n$p")
  }
}
