package graft

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("bucketed range join equals naive range join, incl. boundaries") {
    import spark.implicits._
    val points = Seq(
      (1L, 7L, "2024-01-01 10:00:00"), (2L, 7L, "2024-01-01 11:59:59"),
      (3L, 7L, "2024-01-01 12:00:00"), // == end -> excluded (open bound)
      (4L, 9L, "2024-01-01 10:30:00"), // other key
      (5L, 7L, "2024-01-02 10:30:00")) // far outside
      .toDF("pid", "user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val intervals = Seq(
      (100L, 7L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"), // [10,12)
      (101L, 9L, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
      (102L, 7L, "2024-01-01 13:00:00", "2024-01-01 13:00:00")) // empty
      .toDF("rid", "user_id", "ss", "se")
      .withColumn("start", to_timestamp(col("ss")))
      .withColumn("fin", to_timestamp(col("se"))).select("rid", "user_id", "start", "fin")

    val got = RangeJoin.pointInInterval(points, "user_id", "ts",
        intervals, "user_id", "start", "fin", 3600L * 1000000L)
      .select("rid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // interval 100 contains points 1 (== start, closed) and 2; NOT 3 (== end)
    assert(got === Set((100L, 1L), (100L, 2L), (101L, 4L)))
  }

  test("matches brute force on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1 to 500).map(i => (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(100000).toLong))
    val ivs = (1 to 100).map { i =>
      val s = rnd.nextInt(100000); (1000L + i, rnd.nextInt(3).toLong, s.toLong, (s + rnd.nextInt(20000)).toLong)
    }
    val p = pts.toDF("pid", "k", "off")
      .withColumn("ts", timestamp_seconds(col("off") + 1700000000L)).drop("off")
    val iv = ivs.toDF("rid", "k", "so", "eo")
      .withColumn("start", timestamp_seconds(col("so") + 1700000000L))
      .withColumn("fin", timestamp_seconds(col("eo") + 1700000000L)).drop("so", "eo")
    val got = RangeJoin.pointInInterval(p, "k", "ts", iv, "k", "start", "fin",
        7200L * 1000000L)
      .select("rid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (pid, pk, poff) <- pts
      (rid, ik, so, eo) <- ivs
      if pk == ik && poff >= so && poff < eo
    } yield (rid, pid)).toSet
    assert(got === want)
  }
}
