package graft

import org.apache.spark.sql.functions._
import graft.core.Ingest

/** Golden test of the 4-dialect CSV ingest over committed fixtures
  * (FIXTURES.md §A1): per-dialect header maps, multi-format dates,
  * duration parsing, derived return_date, malformed-row drops, and
  * unknown-year skip.
  */
class IngestSpec extends SparkSpec {

  private def fixture(name: String): String =
    getClass.getResource(s"/bicis/$name").getPath

  private lazy val paths = Seq(
    "recorridos-realizados-2011.csv", "recorridos-realizados-2012.csv",
    "recorridos-realizados-2013.csv", "recorridos-realizados-2016.csv",
    "recorridos-realizados-2099.csv").map(fixture)

  private lazy val unified = Ingest.unify(spark, paths).cache()

  test("row accounting: parsed minus malformed, unknown year skipped") {
    // 2011: 5 rows, 1 bad rent_date -> 4; 2012: 4 rows, 1 bad return +
    // 2-part duration -> 3; 2013: 3 rows -> 3; 2016: 4 rows, one '7M'
    // duration (<3 parts -> null return) -> 3; 2099: unknown year skipped.
    assert(unified.count() === 13L)
  }

  test("ids unique, dates non-null, stations nullable") {
    assert(unified.select("id").distinct().count() === 13L)
    assert(unified.where(col("rent_date").isNull || col("return_date").isNull).count() === 0L)
    // 2013 fixture has an empty return_station kept as null
    assert(unified.where(col("return_station").isNull).count() === 1L)
  }

  test("P3: derived return_date = rent_date + parsed duration (v4 dialect)") {
    val v4 = unified.where(col("rent_date") === ts("2016-07-05 08:05:00")).collect()
    assert(v4.length === 1)
    // 0H 25M 13S = 1513 s
    assert(v4(0).getAs[java.sql.Timestamp]("return_date") === ts("2016-07-05 08:30:13"))
    val bare = unified.where(col("rent_date") === ts("2016-07-05 09:10:00")).collect()
    // bare "45" = 45 MINUTES
    assert(bare(0).getAs[java.sql.Timestamp]("return_date") === ts("2016-07-05 09:55:00"))
  }

  test("P1: all three date formats parsed") {
    assert(unified.where(col("rent_date") === ts("2011-02-13 10:45:30")).count() === 1L)
    assert(unified.where(col("rent_date") === ts("2013-05-02 14:30:00.5")).count() === 1L)
  }

  test("denseIds: gap-free 0..n-1 in physical partition order, equal to zipWithIndex") {
    // uneven multi-partition frame (incl. an empty partition via filter)
    val df = spark.range(0, 1000).repartition(7)
      .where(col("id") % 11 =!= 0).select(col("id").as("x")).cache()
    try {
      val dense = Ingest.denseIds(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val viaRdd = df.rdd.zipWithIndex()
        .map { case (row, i) => i -> row.getLong(0) }.collect().sortBy(_._1)
      assert(dense.map(_._1).toSeq === (0L until dense.length.toLong))
      assert(dense.map(_._2).toSeq === viaRdd.map(_._2).toSeq)
    } finally df.unpersist()
  }

  test("readJsonl: explicit schema, malformed lines quarantined not fatal") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonl")
    val f = dir.resolve("docs.jsonl")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "hola", "lang": "es"}
        |this line is not json at all
        |{"doc_id": 4, "text": "ok", "lang": "en", "extra_field": 9}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val df = Ingest.readJsonl(spark, f.toString, schema).cache()
    try {
      val good = df.where(col("_corrupt").isNull)
      assert(good.count() === 3L) // extra fields are fine; garbage is not
      assert(good.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 4L))
      val bad = df.where(col("_corrupt").isNotNull).select("_corrupt").collect()
      assert(bad.length === 1 && bad(0).getString(0).startsWith("this line"))
      // schema is exactly as declared + the quarantine column
      assert(df.columns.toSeq === Seq("doc_id", "text", "lang", "_corrupt"))
    } finally df.unpersist()
  }
}
