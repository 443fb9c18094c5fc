package graft

import org.apache.spark.sql.functions._

/** Planted-fixture pin of the reciprocal-rank-fusion LAW behind
  * retrieval_hybrid_rrf (the oracle gate proves the corpus-wide
  * computation; this proves the semantics on a geometry where every
  * rank is hand-derivable):
  *
  *  - doc 12 is rank 2 in BOTH arms → rrf 1/62 + 1/62 ≈ 0.032258
  *  - doc 10 is rank 1 LEXICAL-ONLY (zero embedding → null cosine,
  *    absent from the vector arm) → rrf 1/61
  *  - doc 11 is rank 1 VECTOR-ONLY (shares no query term, absent from
  *    the lexical arm) → rrf 1/61
  *
  * so the both-arms doc must beat each single-arm winner (the reason
  * fusion exists), the 1/61 tie breaks by nid, and each absent arm
  * surfaces as a null rank — outer-join fusion, not inner.
  */
class RrfSpec extends SparkSpec {

  test("fusion law: both-arms rank-2 beats each arm's exclusive rank-1; absent arms are null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rrf_fix").toString

    def doc(id: Long, text: String) = (id, text, "en", "src", text.length.toLong)
    Seq(
      doc(0L, "alpha beta gamma delta epsilon"),                       // the query
      doc(10L, "alpha beta gamma alpha beta gamma alpha beta gamma"),  // lexical rank 1
      doc(11L, "zebra yak walrus otter heron"),                        // no shared terms
      doc(12L, "alpha beta filler filler filler filler filler filler") // lexical rank 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0),     // query vector
      (10L, Array(0f, 0f, 0f, 0f), 0),    // zero norm -> null sim -> absent
      (11L, Array(0.9f, 0.1f, 0f, 0f), 0),// cos ~= 0.994 -> vector rank 1
      (12L, Array(0.7f, 0.7f, 0f, 0f), 0) // cos ~= 0.707 -> vector rank 2
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val rows = graft.queries.EmbedQueries.retrievalHybridRrf.run(spark, dir)
      .where(col("qid") === 0)
      .select(col("nid"), col("lex_rnk"), col("vec_rnk"), col("rrf"), col("frnk"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getDouble(3), r.getLong(4)))

    assert(rows.toSeq === Seq(
      (12L, 2L, 2L, math.rint(2.0 / 62.0 * 1e6) / 1e6, 1L),
      (10L, 1L, -1L, math.rint(1.0 / 61.0 * 1e6) / 1e6, 2L),
      (11L, -1L, 1L, math.rint(1.0 / 61.0 * 1e6) / 1e6, 3L)))
  }

  test("retrieval_ndcg: planted ranks 1+3 give dcg (1 + 0.5)/idcg(2), and a matchless query reports null ndcg, zero mrr") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ndcg").toString
    // q0 (label 1) ranks: 10 sim 1.0 rel, 11 sim .8 non, 12 sim .6 rel,
    // 13 sim 0 non -> relevant at ranks {1,3}: dcg = w1+w3 = 1.5 exactly
    // (decimal weight table), idcg = cw(2) = 1.630929753571457.
    // q1 (label 3) matches NO candidate -> n_rel 0: ndcg/recall null, mrr 0.
    Seq(
      (0L, Array(1f, 0f), 1), (1L, Array(0.7f, 0.7f), 3),
      (10L, Array(1f, 0f), 1), (11L, Array(0.8f, 0.6f), 2),
      (12L, Array(0.6f, 0.8f), 1), (13L, Array(0f, 1f), 2)
    ).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.queries.EmbedQueries.retrievalNdcg.run(spark, dir).collect()
      .map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Long]("n_rel"),
          Option(r.getAs[java.lang.Double]("ndcg10")).map(_.toDouble),
          r.getAs[Double]("mrr10"),
          Option(r.getAs[java.lang.Double]("recall10")).map(_.toDouble)))).toMap
    assert(got.keySet === Set(0L, 1L))
    assert(got(0L) === ((2L, Some(0.919721), 1.0, Some(1.0))))
    assert(got(1L) === ((0L, None, 0.0, None)))
  }
}
