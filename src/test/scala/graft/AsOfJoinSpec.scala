package graft

import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("latest prior match, inclusive tie, and null for no-match") {
    import spark.implicits._
    val left = Seq(
      (1L, 7L, "2024-01-01 10:00:00"),  // before any right row -> null
      (2L, 7L, "2024-01-01 12:00:00"),  // exact tie with right @12:00 -> matches it
      (3L, 7L, "2024-01-01 15:00:00"),  // latest prior is @14:00
      (4L, 9L, "2024-01-01 12:00:00"))  // other key, no right rows -> null
      .toDF("event_id", "user_id", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val right = Seq(
      (7L, "2024-01-01 12:00:00", 10.0),
      (7L, "2024-01-01 14:00:00", 20.0))
      .toDF("user_id", "s", "rvalue")
      .withColumn("rts", to_timestamp(col("s"))).drop("s")

    val out = AsOfJoin.asofJoin(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.sql.Timestamp]("asof_ts")).map(_.toString),
        Option(r.getAs[java.lang.Double]("asof_rvalue")).map(_.toDouble)))

    assert(out.toSeq === Seq(
      (1L, None, None),
      (2L, Some("2024-01-01 12:00:00.0"), Some(10.0)),
      (3L, Some("2024-01-01 14:00:00.0"), Some(20.0)),
      (4L, None, None)))
  }

  test("null carried value does not fall back to a stale older right row") {
    import spark.implicits._
    val left = Seq((1L, 7L, "2024-01-01 11:00:00"))
      .toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val right = Seq((7L, "2024-01-01 09:00:00", Some(5.0)),
      (7L, "2024-01-01 10:00:00", None: Option[Double]))
      .toDF("user_id", "s", "rvalue")
      .withColumn("rts", to_timestamp(col("s"))).drop("s")
    val out = AsOfJoin.asofJoin(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
      .collect()(0)
    // the 10:00 row is the as-of match; its NULL value must survive,
    // not be replaced by the 09:00 row's 5.0
    assert(out.getAs[java.sql.Timestamp]("asof_ts").toString === "2024-01-01 10:00:00.0")
    assert(out.isNullAt(out.fieldIndex("asof_rvalue")))
  }

  test("null right timestamps never match (NULL <= ts is never true)") {
    import spark.implicits._
    val left = Seq((1L, 7L, "2024-01-01 11:00:00"))
      .toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    // only right row for the key has a NULL ts: must NOT become a match
    val right = Seq((7L, Option.empty[String], 99.0))
      .toDF("user_id", "s", "rvalue")
      .withColumn("rts", to_timestamp(col("s"))).drop("s")
    val out = AsOfJoin.asofJoin(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
      .collect()(0)
    assert(out.isNullAt(out.fieldIndex("asof_ts")))
    assert(out.isNullAt(out.fieldIndex("asof_rvalue")))
  }

  test("null keys never match (SQL equality semantics)") {
    import spark.implicits._
    val left = Seq((1L, Option.empty[Long], "2024-01-01 11:00:00"))
      .toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val right = Seq((Option.empty[Long], "2024-01-01 09:00:00", 5.0))
      .toDF("user_id", "s", "rvalue")
      .withColumn("rts", to_timestamp(col("s"))).drop("s")
    val out = AsOfJoin.asofJoin(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
      .collect()(0)
    assert(out.isNullAt(out.fieldIndex("asof_ts")))
    assert(out.isNullAt(out.fieldIndex("asof_rvalue")))
  }
}
