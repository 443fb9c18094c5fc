package graft

import org.apache.spark.sql.functions._
import graft.core.TimeKeys
import graft.ops.SeriesAggs

class SeriesAggsSpec extends SparkSpec {

  test("A2 averages over ACTIVE periods only (no zero-fill)") {
    import spark.implicits._
    // station A, hour key 10: 3 events on day 1, 1 event on day 3; day 2
    // has NO hour-10 event and must NOT contribute a zero -> avg = 2.0
    val df = Seq(
      "2024-01-01 10:00:00", "2024-01-01 10:20:00", "2024-01-01 10:40:00",
      "2024-01-03 10:15:00")
      .toDF("s").withColumn("ts", to_timestamp(col("s"))).withColumn("u", lit(7L))
    val out = SeriesAggs.activePeriodAvg(df, col("u"),
      TimeKeys.hourGroup(col("ts")), TimeKeys.hourKey(col("ts")), "n_rents")
      .collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 7L)
    assert(out(0).getLong(1) === 10L)
    assert(out(0).getDouble(2) === 2.0)
  }

  test("hour pivot has dense 0..23 domain with zero fill") {
    import spark.implicits._
    val series = Seq((1L, 5L, 3.5), (1L, 23L, 1.0)).toDF("user_id", "k", "v")
    val out = SeriesAggs.stationHourPivot(series, "v").collect()(0)
    val schema = SeriesAggs.stationHourPivot(series, "v").columns
    assert(schema.toSeq === "user_id" +: (0 to 23).map(h => s"h$h"))
    assert(out.getDouble(schema.indexOf("h5")) === 3.5)
    assert(out.getDouble(schema.indexOf("h23")) === 1.0)
    assert(out.getDouble(schema.indexOf("h0")) === 0.0)
  }

  test("ISO weekday: Monday=1 ... Sunday=7") {
    import spark.implicits._
    val df = Seq("2024-01-01 12:00:00" /* Mon */ , "2024-01-07 12:00:00" /* Sun */)
      .toDF("s").withColumn("ts", to_timestamp(col("s")))
    val got = df.select(TimeKeys.isoWeekday(col("ts"))).collect().map(_.getInt(0))
    assert(got.toSeq === Seq(1, 7))
  }
}
