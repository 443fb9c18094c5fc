package graft

import org.apache.spark.sql.functions._
import graft.core.Sinks

class SinksSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sinks").toString

  test("header CSV roundtrip") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val p = tmp() + "/csv"
    Sinks.csvWithHeader(df, p)
    val back = spark.read.option("header", "true").csv(p)
    assert(back.columns.toSeq === Seq("id", "v"))
    assert(back.count() === 2L)
  }

  test("fails report reconciles dropped rows with sample ids") {
    import spark.implicits._
    val input = (1L to 10L).toDF("id")
    val output = input.where(col("id") % 3 =!= 0)
    val p = tmp() + "/fails.json"
    Sinks.failsReport(input, output, "id", p)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(p))
    assert(txt.contains(""""input_count": 10"""))
    assert(txt.contains(""""number_of_errors": 3"""))
    assert(txt.contains("3") && txt.contains("6") && txt.contains("9"))
  }
}
