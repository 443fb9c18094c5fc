package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin

/** Semantics fixtures run against BOTH as-of formulations — the
  * composed union-and-window form and the native physical operator
  * (graft.plans.AsOfJoinExec) — so the two can never silently drift.
  */
class AsOfJoinSpec extends SparkSpec {

  private type Impl = (DataFrame, String, String, DataFrame, String, String, Seq[String]) => DataFrame
  private val impls: Seq[(String, Impl)] = Seq(
    "composed" -> (AsOfJoin.asofJoin _),
    "native" -> (AsOfJoin.asofJoinNative _))

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

    for ((name, impl) <- impls) {
      val out = impl(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
        .orderBy("event_id")
        .collect()
        .map(r => (r.getLong(0), Option(r.getAs[java.sql.Timestamp]("asof_ts")).map(_.toString),
          Option(r.getAs[java.lang.Double]("asof_rvalue")).map(_.toDouble)))
      assert(out.toSeq === Seq(
        (1L, None, None),
        (2L, Some("2024-01-01 12:00:00.0"), Some(10.0)),
        (3L, Some("2024-01-01 14:00:00.0"), Some(20.0)),
        (4L, None, None)), s"impl $name")
    }
  }

  test("null carried value does not fall back to a stale older right row") {
    import spark.implicits._
    val left = Seq((1L, 7L, "2024-01-01 11:00:00"))
      .toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val right = Seq((7L, "2024-01-01 09:00:00", Some(5.0)),
      (7L, "2024-01-01 10:00:00", None: Option[Double]))
      .toDF("user_id", "s", "rvalue")
      .withColumn("rts", to_timestamp(col("s"))).drop("s")
    for ((name, impl) <- impls) {
      val out = impl(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
        .collect()(0)
      // the 10:00 row is the as-of match; its NULL value must survive,
      // not be replaced by the 09:00 row's 5.0
      assert(out.getAs[java.sql.Timestamp]("asof_ts").toString === "2024-01-01 10:00:00.0",
        s"impl $name")
      assert(out.isNullAt(out.fieldIndex("asof_rvalue")), s"impl $name")
    }
  }

  test("null right timestamps never match (NULL <= ts is never true)") {
    import spark.implicits._
    val left = Seq((1L, 7L, "2024-01-01 11:00:00"))
      .toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    // only right row for the key has a NULL ts: must NOT become a match
    val right = Seq((7L, Option.empty[String], 99.0))
      .toDF("user_id", "s", "rvalue")
      .withColumn("rts", to_timestamp(col("s"))).drop("s")
    for ((name, impl) <- impls) {
      val out = impl(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
        .collect()(0)
      assert(out.isNullAt(out.fieldIndex("asof_ts")), s"impl $name")
      assert(out.isNullAt(out.fieldIndex("asof_rvalue")), s"impl $name")
    }
  }

  test("null keys never match (SQL equality semantics)") {
    import spark.implicits._
    val left = Seq((1L, Option.empty[Long], "2024-01-01 11:00:00"))
      .toDF("event_id", "user_id", "s").withColumn("ts", to_timestamp(col("s"))).drop("s")
    val right = Seq((Option.empty[Long], "2024-01-01 09:00:00", 5.0))
      .toDF("user_id", "s", "rvalue")
      .withColumn("rts", to_timestamp(col("s"))).drop("s")
    for ((name, impl) <- impls) {
      val out = impl(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
        .collect()(0)
      assert(out.isNullAt(out.fieldIndex("asof_ts")), s"impl $name")
      assert(out.isNullAt(out.fieldIndex("asof_rvalue")), s"impl $name")
    }
  }

  test("native == composed on seeded random data (differential, multi-partition)") {
    import spark.implicits._
    val rnd = new scala.util.Random(404)
    def ts0(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val left = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(12).toLong, ts0(rnd.nextInt(500)))).toDF("event_id", "user_id", "ts")
    val right = (1 to 150).map(_ =>
      (rnd.nextInt(12).toLong, ts0(rnd.nextInt(500)), rnd.nextInt(1000).toDouble))
      .toDF("user_id", "rts", "rvalue")
      // the merge is undefined for duplicate (key, ts) right rows — dedup
      .groupBy("user_id", "rts").agg(max("rvalue").as("rvalue"))
    val a = AsOfJoin.asofJoin(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    val b = AsOfJoin.asofJoinNative(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("the native plan actually uses AsOfJoinExec: two thin exchanges, no union, no window") {
    import spark.implicits._
    val left = (1 to 50).map(i => (i.toLong, (i % 5).toLong,
      new java.sql.Timestamp(1700000000000L + i * 1000L))).toDF("event_id", "user_id", "ts")
    val right = (1 to 20).map(i => ((i % 5).toLong,
      new java.sql.Timestamp(1700000000000L + i * 2500L), i.toDouble))
      .toDF("user_id", "rts", "rvalue")
    val df = AsOfJoin.asofJoinNative(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix; "!" would flag unresolved refs
    assert(p.contains("AsOfJoin") && !p.contains("!AsOfJoin"),
      s"native exec missing or invalid in:\n$p")
    assert(!p.contains("Window") && !p.contains("Union"),
      s"fell back to the composed union+window shape:\n$p")
    // one hash exchange per side, keyed on the join key — the thin-shuffle
    // contract (count the AQE FINAL plan only; the string repeats the
    // initial plan below it)
    val pf = p.split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(pf).size === 2,
      s"expected exactly two per-side exchanges in:\n$pf")
  }

  test("forward as-of: earliest future match; native == composed; edges hold under negation") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    // key 1: left at t=5 must take rts=6 (not 8); left at t=9 has no
    // future match; key 2's only right row is in the past -> null
    val left = Seq((1L, 1L, ts(5)), (2L, 1L, ts(9)), (3L, 2L, ts(4)))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(6), 10.0), (1L, ts(8), 20.0), (2L, ts(1), 30.0))
      .toDF("user_id", "rts", "rvalue")
    val got = AsOfJoin.asofJoinForward(left, "user_id", "ts",
        right, "user_id", "rts", Seq("rvalue"))
      .orderBy("event_id")
      .select("event_id", "asof_ts", "asof_rvalue")
      .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)).map(_.getTime),
        Option(r.get(2)))).toSeq
    assert(got === Seq(
      (1L, Some(ts(6).getTime), Some(10.0)),
      (2L, None, None),
      (3L, None, None)), s"forward matches: $got")
    // inclusive bound: a right row AT the left ts matches (ties)
    val tie = AsOfJoin.asofJoinForward(
        Seq((9L, 1L, ts(6))).toDF("event_id", "user_id", "ts"), "user_id", "ts",
        right, "user_id", "rts", Seq("rvalue"))
      .select("asof_rvalue").head().getDouble(0)
    assert(tie === 10.0, "inclusive >= bound broken")
    // native == composed on seeded random data
    val rnd = new scala.util.Random(11)
    val bigL = (1 to 400).map(i => (i.toLong, rnd.nextInt(8).toLong,
      new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 100L)))
      .toDF("event_id", "user_id", "ts")
    val bigR = (1 to 150).map(i => (rnd.nextInt(8).toLong,
      new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 100L), i.toDouble))
      .toDF("user_id", "rts", "rvalue")
      .groupBy("user_id", "rts").agg(org.apache.spark.sql.functions.max("rvalue").as("rvalue"))
    val a = AsOfJoin.asofJoinForward(bigL, "user_id", "ts", bigR, "user_id", "rts", Seq("rvalue"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    val b = AsOfJoin.asofJoinForward(bigL, "user_id", "ts", bigR, "user_id", "rts", Seq("rvalue"),
        native = true)
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("toleranced as-of: stale matches null out, fresh matches and LEFT rows survive") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    // key 1: left@100 matches right@95 (gap 5 s <= tol 10 s, kept);
    //        left@200 matches right@95 (gap 105 s > tol, masked to null);
    //        left@50 has no predecessor at all (plain LEFT null)
    // boundary: left@105 gap EXACTLY tol -> kept (inclusive bound)
    val left = Seq((1L, 1L, ts(100)), (2L, 1L, ts(200)), (3L, 1L, ts(50)),
      (4L, 1L, ts(105))).toDF("event_id", "user_id", "ts")
    val right = Seq((1L, ts(95), 7.0)).toDF("user_id", "rts", "rvalue")
    for (native <- Seq(false, true)) {
      val got = AsOfJoin.asofJoinWithin(left, "user_id", "ts",
          right, "user_id", "rts", Seq("rvalue"),
          toleranceMicros = 10L * 1000000L, native = native)
        .orderBy("event_id")
        .select("event_id", "asof_ts", "asof_rvalue")
        .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)).map(_.getTime),
          Option(r.get(2)))).toSeq
      assert(got === Seq(
        (1L, Some(ts(95).getTime), Some(7.0)),
        (2L, None, None),
        (3L, None, None),
        (4L, Some(ts(95).getTime), Some(7.0))), s"native=$native: $got")
    }
    // tolerance never changes WHICH row matches: with a huge tolerance
    // the output is exactly the untoleranced as-of
    val plain = AsOfJoin.asofJoin(left, "user_id", "ts", right, "user_id", "rts", Seq("rvalue"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    val loose = AsOfJoin.asofJoinWithin(left, "user_id", "ts", right, "user_id", "rts",
        Seq("rvalue"), toleranceMicros = Long.MaxValue / 2)
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(plain === loose)
  }

  test("forward as-of survives a right ts column named 'ts' (reserved-alias carry, r9 ADVICE)") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val left = Seq((1L, 1L, ts(5)), (2L, 1L, ts(9))).toDF("event_id", "user_id", "ts")
    // right ts ALSO named "ts": the old carry-as-asof_<rightTs> scheme
    // collided with the internal asof_ts and drop("asof_ts") removed
    // both — the matched timestamp silently vanished from the output
    val right = Seq((1L, ts(6), 10.0), (1L, ts(8), 20.0)).toDF("user_id", "ts", "rvalue")
    for (native <- Seq(false, true)) {
      val out = AsOfJoin.asofJoinForward(left, "user_id", "ts",
        right, "user_id", "ts", Seq("rvalue"), native = native)
      assert(out.columns.count(_ == "asof_ts") === 1,
        s"native=$native: asof_ts not exactly once in ${out.columns.toSeq}")
      val got = out.orderBy("event_id")
        .select("event_id", "asof_ts", "asof_rvalue")
        .collect().map(r => (r.getLong(0), Option(r.getTimestamp(1)).map(_.getTime),
          Option(r.get(2)))).toSeq
      assert(got === Seq(
        (1L, Some(ts(6).getTime), Some(10.0)),
        (2L, None, None)), s"native=$native: $got")
    }
  }
}
