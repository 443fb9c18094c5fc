package graft

import graft.functions.PortableHash64

/** Semantic mirror of ml_sample_weighted: the query's output must be
  * exactly the 5 largest Efraimidis-Spirakis priority keys ln(u)/w per
  * source, computed independently here from the raw corpus — pinning
  * the hash → uniform → key → top-k chain end to end (the DuckDB oracle
  * pins cross-engine agreement; this pins both against intent).
  */
class WeightedSamplingSpec extends SparkSpec {

  test("selected docs are the per-source top-5 priority keys, w-weighted without replacement") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))
    val space = (1L << 60).toDouble
    val keyed = docs.map { case (id, src, text) =>
      val nTok = "[a-z0-9]+".r.findAllIn(text.toLowerCase).length
      val w = 1.0 + nTok / 100.0
      val h = PortableHash64.first60Bits(
        java.security.MessageDigest.getInstance("MD5").digest(s"wsamp:$id".getBytes))
      (src, id, math.log((h + 1) / space) / w)
    }
    val want = keyed.groupBy(_._1).toSeq.flatMap { case (src, xs) =>
      xs.sortBy(x => (-x._3, x._2)).take(5).map(x => (src, x._2))
    }.toSet

    val got = graft.queries.MlQueries.mlSampleWeighted.run(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"))).toSet
    assert(got == want,
      s"sample mismatch: extra=${got -- want} missing=${want -- got}")
    // every source with >= 5 docs contributes exactly 5
    val perSource = got.groupBy(_._1).view.mapValues(_.size).toMap
    docs.groupBy(_._2).foreach { case (src, xs) =>
      assert(perSource.getOrElse(src, 0) == math.min(5, xs.length), s"wrong count for $src")
    }
  }
}
