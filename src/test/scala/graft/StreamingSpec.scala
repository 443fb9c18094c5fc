package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streaming
import graft.streaming.Streaming.Ev

class StreamingSpec extends SparkSpec {

  test("watermarked tumbling counts over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val query = Streaming.tumblingCounts(ms.toDF(), "ts", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_t").outputMode("complete")
      .start()
    try {
      ms.addData(
        Ev(1, 1, ts("2024-01-01 00:10:00"), "click"),
        Ev(2, 1, ts("2024-01-01 00:50:00"), "click"),
        Ev(3, 2, ts("2024-01-01 01:05:00"), "click"))
      query.processAllAvailable()
      val got = spark.table("tumbling_t").orderBy("ws")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      assert(got.toSeq === Seq(("2024-01-01 00:00:00.0", 2L), ("2024-01-01 01:00:00.0", 1L)))
    } finally query.stop()
  }

  test("update mode: a late in-lateness row RE-emits its window; last-writer-wins merge == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val updLog = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val logBatch: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, bid) => {
      df.collect().foreach(r => updLog.synchronized {
        updLog += ((bid, r.getTimestamp(0).toString, r.getLong(1)))
      })
      ()
    }
    val query = Streaming.tumblingCounts(ms.toDF(), "ts", "1 hour", "3 hours")
      .writeStream.outputMode("update").foreachBatch(logBatch).start()
    try {
      // batch 0: window 00:00 created and emitted with n=2
      ms.addData(Ev(1, 1, ts("2024-01-01 00:10:00"), "c"),
        Ev(2, 1, ts("2024-01-01 00:20:00"), "c"))
      query.processAllAvailable()
      // batch 1: advances the watermark to 00:00 (03:00 − 3h)
      ms.addData(Ev(3, 1, ts("2024-01-01 03:00:00"), "c"))
      query.processAllAvailable()
      // batch 2: LATE row into the already-emitted 00:00 window —
      // above the watermark, so it must UPDATE, not be dropped
      ms.addData(Ev(4, 1, ts("2024-01-01 00:40:00"), "c"))
      query.processAllAvailable()
    } finally query.stop()
    val w0 = updLog.filter(_._2 == "2024-01-01 00:00:00.0").sortBy(_._1)
    assert(w0.map(_._3).toSeq === Seq(2L, 3L), s"expected re-emit with corrected count: $updLog")
    // consumer-side merge law: last writer wins per window == batch counts
    val merged = updLog.groupBy(_._2).map { case (ws, rs) => ws -> rs.maxBy(_._1)._3 }
    assert(merged === Map("2024-01-01 00:00:00.0" -> 3L, "2024-01-01 03:00:00.0" -> 1L))
  }

  test("streaming presence masks merge monotonically across batches; updates bit_or to the final state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def at(d: Long, h: Long) = new java.sql.Timestamp((d * 86400L + h * 3600L) * 1000L)
    val ms = MemoryStream[Ev]
    val query = Streaming.streamingPresenceMask(spark, ms.toDS())
      .writeStream.format("memory").queryName("mask_t").outputMode("update").start()
    try {
      ms.addData(Ev(1, 1, at(0, 0), "click"), Ev(2, 2, at(0, 5), "click"))
      query.processAllAvailable()
      ms.addData(Ev(3, 1, at(1, 3), "click"))
      query.processAllAvailable()
      val updates = spark.table("mask_t").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("hour_mask"), r.getAs[Long]("day_mask")))
      // user 1 emitted twice; the second update carries BOTH batches' bits
      val u1 = updates.filter(_._1 == 1L)
      assert(u1.length === 2)
      assert(u1.map(_._2).max === 9L, "hours {0,3} must merge to 1|8")   // 1|8
      assert(u1.map(_._2).reduce(_ | _) === u1.map(_._2).max,
        "updates must be monotone: bit_or of updates == latest state")
      assert(u1.map(_._3).max === 3L, "weekdays {0,1} must merge to 1|2")
      // user 2: single batch, single bit each
      val u2 = updates.filter(_._1 == 2L)
      assert(u2.toSeq === Seq((2L, 32L, 1L)))
    } finally query.stop()
  }

  test("streaming forward-window count replays to the batch A5 result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val events = (1 to 120).map { i =>
      Ev(i.toLong, (i % 3).toLong, ts("2024-01-01 00:00:00"), "click")
    }.zipWithIndex.map { case (e, i) =>
      e.copy(ts = new java.sql.Timestamp(
        ts("2024-01-01 00:00:00").getTime + (i * 137 + rnd.nextInt(300)) * 1000L))
    }.sortBy(_.ts.getTime)

    // batch reference
    val batchDf = events.toDF()
    val want = graft.ops.WindowOps
      .forwardWindowCount(batchDf, "user_id", "ts", "event_id", 3600L * 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val ms = MemoryStream[Ev]
    val query = Streaming.streamingForwardWindowCount(spark, ms.toDS(), 3600L * 1000000L)
      .writeStream.format("memory").queryName("fw_t").outputMode("append").start()
    try {
      events.grouped(40).foreach { chunk =>
        ms.addData(chunk); query.processAllAvailable()
      }
      val got = spark.table("fw_t").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want)
      assert(got.nonEmpty)
    } finally query.stop()
  }

  test("SHUFFLED replay within the lateness horizon still matches batch A5") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val base = ts("2024-01-01 00:00:00").getTime
    val events = (1 to 120).map { i =>
      Ev(i.toLong, (i % 3).toLong,
        new java.sql.Timestamp(base + (i * 137 + rnd.nextInt(300)) * 1000L), "click")
    }
    // per-key flush sentinels far beyond every real window + lateness so
    // the stream emits the full tail (batch never emits them: empty window)
    val maxT = events.map(_.ts.getTime).max
    val flush = (0 until 3).map(k =>
      Ev(10000L + k, k.toLong, new java.sql.Timestamp(maxT + 4 * 3600 * 1000L), "click"))

    val want = graft.ops.WindowOps
      .forwardWindowCount((events ++ flush).toDF(), "user_id", "ts", "event_id", 3600L * 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // out-of-order delivery: shuffle within sliding blocks of 10 (max
    // disorder ~75 min), lateness horizon 2 h > disorder
    val disordered = events.sortBy(_.ts.getTime).grouped(10).flatMap(rnd.shuffle(_)).toSeq ++ flush
    val ms = MemoryStream[Ev]
    val query = Streaming.streamingForwardWindowCount(
        spark, ms.toDS(), 3600L * 1000000L, latenessMicros = 2 * 3600L * 1000000L)
      .writeStream.format("memory").queryName("fw_ooo_t").outputMode("append").start()
    try {
      disordered.grouped(17).foreach { chunk =>
        ms.addData(chunk); query.processAllAvailable()
      }
      val got = spark.table("fw_ooo_t").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === 120, s"tail not flushed: ${got.size}")
      assert(got === want.filter(_._1 <= 120L))
    } finally query.stop()
  }

  test("with a watermark, a quiet key's tail flushes exactly via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val query = Streaming.streamingForwardWindowCount(
        spark, ms.toDS(), 3600L * 1000000L, watermarkDelay = Some("0 seconds"))
      .writeStream.format("memory").queryName("fw_flush_t").outputMode("append").start()
    try {
      // key 7: three events in one hour, then silence forever
      ms.addData(
        Ev(1, 7, ts("2024-01-01 10:00:00"), "click"),
        Ev(2, 7, ts("2024-01-01 10:30:00"), "click"),
        Ev(3, 7, ts("2024-01-01 10:59:00"), "click"))
      query.processAllAvailable()
      // other keys keep the stream alive, advancing the global watermark
      // far past key 7's maxTs + window -> its timeout fires and the
      // tail emits with exact counts (no per-key flush sentinel needed)
      ms.addData(Ev(100, 8, ts("2024-01-01 15:00:00"), "click"))
      query.processAllAvailable()
      ms.addData(Ev(101, 8, ts("2024-01-01 16:00:00"), "click"))
      query.processAllAvailable()
      val got = spark.table("fw_flush_t").where(col("event_id") < 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // windows: [10:00,11:00)->3, [10:30,11:30)->2, [10:59,11:59)->1
      assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    } finally query.stop()
  }

  test("streaming as-of: out-of-order rights upgrade pending matches; ties inclusive; nulls flush on timer") {
    import spark.implicits._
    import graft.streaming.Streaming.AsOfIn
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[AsOfIn]
    val query = graft.streaming.Streaming.streamingAsOfJoin(spark, ms.toDS(), "2 hours")
      .writeStream.format("memory").queryName("asof_t").outputMode("append").start()
    try {
      def L(id: Long, key: Long, t: String) = AsOfIn(0, id, key, ts(t), 0.0)
      def R(key: Long, t: String, v: Double) = AsOfIn(1, 0L, key, ts(t), v)
      // b1: left at 10:00 buffers (its match is not final yet); an
      // early right at 9:00 is the current-best candidate
      ms.addData(L(1, 7, "2024-01-01 10:00:00"), R(7, "2024-01-01 09:00:00", 1.0),
        L(3, 9, "2024-01-01 10:30:00"))
      query.processAllAvailable()
      // b2: OUT-OF-ORDER rights inside the watermark horizon — 9:30
      // must upgrade left 1's match, and the duplicate 9:30 timestamps
      // must fold to max(value); plus an equal-ts pair (inclusive tie)
      ms.addData(R(7, "2024-01-01 09:30:00", 2.0), R(7, "2024-01-01 09:30:00", 5.0),
        L(2, 7, "2024-01-01 12:00:00"), R(7, "2024-01-01 12:00:00", 7.0))
      query.processAllAvailable()
      assert(spark.table("asof_t").isEmpty,
        "nothing may emit while the watermark can still admit a better match")
      // b3/b4: another key advances the watermark past every pending
      // left; the armed event-time timers flush keys 7 and 9 exactly
      ms.addData(L(100, 8, "2024-01-01 16:00:00"))
      query.processAllAvailable()
      ms.addData(L(101, 8, "2024-01-01 17:00:00"))
      query.processAllAvailable()
      val got = spark.table("asof_t").where(col("event_id") < 100)
        .collect().map(r => r.getLong(0) ->
          ((Option(r.get(1)).map(_.toString), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
      assert(got === Map(
        1L -> ((Some("1704101400000000"), Some(5.0))),   // 09:30 UTC µs, max-folded
        2L -> ((Some("1704110400000000"), Some(7.0))),   // inclusive 12:00 tie
        3L -> ((None, None))), s"got $got")              // no right for key 9
    } finally query.stop()
  }

  test("streaming dedup drops same-content duplicates across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = ms.toDF().toDF("doc_id", "ts", "text")
    val query = Streaming.streamingDedup(df, "ts", "text", "1 hour")
      .writeStream.format("memory").queryName("dedup_t").outputMode("append").start()
    try {
      ms.addData((1L, ts("2024-01-01 10:00:00"), "alpha"), (2L, ts("2024-01-01 10:01:00"), "beta"))
      query.processAllAvailable()
      ms.addData((3L, ts("2024-01-01 10:02:00"), "alpha"), // dup across batches
        (4L, ts("2024-01-01 10:03:00"), "gamma"))
      query.processAllAvailable()
      val kept = spark.table("dedup_t").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(kept === Set(1L, 2L, 4L))
    } finally query.stop()
  }

  test("streaming quality funnel matches batch ml_quality_funnel survivors on in-order replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val good1 = "the and of to in " + (1 to 55).map(i => s"word$i").mkString(" ")
    val good2 = "the and of to in " + (1 to 55).map(i => s"item$i").mkString(" ")
    val und = (1 to 60).map(i => s"zz$i$i").mkString(" ")       // no lang markers
    val short = "the and of to in tiny"                          // < 50 words
    val rows = Seq( // (doc_id, text); doc 5 is doc 1's exact twin
      (1L, good1), (2L, good2), (3L, und), (4L, short), (5L, good1))
    // batch truth over the same fixture
    val tmp = java.nio.file.Files.createTempDirectory("sfunnel").toString
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val batchKeep = graft.queries.MlQueries.mlQualityFunnel.run(spark, tmp)
      .where(col("keep") === 1).collect().map(_.getLong(0)).toSet
    assert(batchKeep === Set(1L, 2L)) // fixture sanity: every stage exercised
    // streaming replay in doc_id order, split across micro-batches
    val ms = MemoryStream[(Long, java.sql.Timestamp, String)]
    val df = ms.toDF().toDF("doc_id", "ts", "text")
    val query = Streaming.streamingQualityFunnel(df, "ts", "1 hour")
      .writeStream.format("memory").queryName("sfunnel_t").outputMode("append").start()
    try {
      ms.addData((1L, ts("2024-01-01 10:00:00"), good1), (2L, ts("2024-01-01 10:01:00"), good2),
        (3L, ts("2024-01-01 10:02:00"), und))
      query.processAllAvailable()
      ms.addData((4L, ts("2024-01-01 10:03:00"), short), (5L, ts("2024-01-01 10:04:00"), good1))
      query.processAllAvailable()
      val streamKeep = spark.table("sfunnel_t").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(streamKeep === batchKeep)
    } finally query.stop()
  }

  test("stream-static decontamination flags docs overlapping the benchmark, statelessly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.ops.TextOps.ensureFunctions(spark)
    // benchmark = shingles of one known eval document
    val bench = Seq((0L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val bm = bench
      .withColumn("__w", graft.ops.TextOps.wordsExpr)
      .select(explode(graft.ops.TextOps.shinglesExpr).as("s"))
      .select(expr(graft.ops.TextOps.portableHash64Sql("'g'", "s")).as("h"))
      .distinct()
    val ms = MemoryStream[(Long, String)]
    val query = Streaming.streamingDecontaminate(ms.toDF().toDF("doc_id", "text"), bm)
      .writeStream.format("memory").queryName("decon_t").outputMode("append").start()
    try {
      ms.addData(
        (1L, "totally clean document with fresh words only"),
        (2L, "he saw the quick brown fox jumps away"), // shares 3 shingles
        (3L, "xy"))                                     // < 3 words -> no shingles
      query.processAllAvailable()
      ms.addData((4L, "the quick brown fox jumps over the lazy dog indeed")) // heavy overlap
      query.processAllAvailable()
      val got = spark.table("decon_t").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet === Set(2L, 4L))
      // "the quick brown", "quick brown fox", "brown fox jumps"
      assert(got(2L) === 3L)
      assert(got(4L) >= 6L)  // nearly the whole benchmark shingle set
    } finally query.stop()
  }

  test("session windows merge activity and split on gaps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val query = Streaming.sessionCounts(ms.toDF(), "user_id", "ts", "30 minutes", "0 seconds")
      .writeStream.format("memory").queryName("sess_t").outputMode("append").start()
    try {
      // user 1: three events within 30-min gaps -> one session of 3;
      // then a 2-hour gap -> new session
      ms.addData(
        Ev(1, 1, ts("2024-01-01 10:00:00"), "click"),
        Ev(2, 1, ts("2024-01-01 10:20:00"), "click"),
        Ev(3, 1, ts("2024-01-01 10:45:00"), "click"),
        Ev(4, 1, ts("2024-01-01 13:00:00"), "click"))
      query.processAllAvailable()
      // advance the watermark past the second session's horizon
      ms.addData(Ev(5, 2, ts("2024-01-01 18:00:00"), "click"))
      query.processAllAvailable()
      val got = spark.table("sess_t").where(col("user_id") === 1)
        .orderBy(col("session_start"))
        .collect().map(r => (r.getTimestamp(1).toString, r.getLong(3)))
      assert(got.toSeq === Seq(("2024-01-01 10:00:00.0", 3L), ("2024-01-01 13:00:00.0", 1L)))
    } finally query.stop()
  }

  test("streaming session counts equal batch session_window on random replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(41)
    val base = ts("2024-01-01 00:00:00").getTime
    val events = (1 to 200).map { i =>
      Ev(i.toLong, (i % 3).toLong,
        new java.sql.Timestamp(base + rnd.nextInt(48 * 3600) * 1000L), "click")
    }.sortBy(_.ts.getTime)
    // flush sentinels push the watermark far past every session's end
    val flush = (0 until 3).map(k =>
      Ev(9000L + k, k.toLong, ts("2024-02-01 00:00:00"), "click"))

    val want = events.toDF()
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start"), col("n"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(2))).toSet

    val ms = MemoryStream[Ev]
    val query = Streaming.sessionCounts(ms.toDF(), "user_id", "ts", "30 minutes", "0 seconds")
      .writeStream.format("memory").queryName("sessdiff_t").outputMode("append").start()
    try {
      (events ++ flush).grouped(50).foreach { c => ms.addData(c); query.processAllAvailable() }
      val got = spark.table("sessdiff_t")
        .where(col("user_id") < 3 && col("session_start") < ts("2024-02-01 00:00:00"))
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getLong(3))).toSet
      assert(got === want)
    } finally query.stop()
  }

  test("stream-stream interval join matches the batch join on replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(
      Ev(1, 1, ts("2024-01-01 10:00:00"), "click"),
      Ev(2, 2, ts("2024-01-01 10:05:00"), "click"),
      Ev(3, 1, ts("2024-01-01 12:00:00"), "click"))
    val views = Seq(
      Ev(101, 1, ts("2024-01-01 10:20:00"), "view"),  // joins click 1 (within 1h)
      Ev(102, 1, ts("2024-01-01 11:30:00"), "view"),  // joins nothing (1.5h after 1)
      Ev(103, 2, ts("2024-01-01 10:04:00"), "view"),  // before click 2 -> no
      Ev(104, 1, ts("2024-01-01 12:59:00"), "view"))  // joins click 3
    val msL = MemoryStream[Ev]; val msR = MemoryStream[Ev]
    val joined = Streaming.streamIntervalJoin(
      msL.toDF(), msR.toDF(), "user_id", "ts", "10 minutes", 3600L)
    val query = joined.writeStream.format("memory").queryName("ssj_t")
      .outputMode("append").start()
    try {
      msL.addData(clicks.take(2)); msR.addData(views.take(2))
      query.processAllAvailable()
      msL.addData(clicks.drop(2)); msR.addData(views.drop(2))
      query.processAllAvailable()
      val got = spark.table("ssj_t").select("left_id", "right_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
      assert(got === Set(1L -> 101L, 3L -> 104L))
    } finally query.stop()
  }

  test("parquet sink + checkpoint: restart resumes exactly-once (no dup windows)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("ssink").toString
    val (sink, ckpt) = (s"$base/out", s"$base/ckpt")
    val ms = MemoryStream[Ev]
    def run() = Streaming.tumblingCounts(ms.toDF(), "ts", "1 hour", "0 seconds")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    ms.addData(Ev(1, 1, ts("2024-01-01 10:10:00"), "click"),
      Ev(2, 1, ts("2024-01-01 10:50:00"), "click"))
    val q1 = run(); try q1.processAllAvailable() finally q1.stop()

    // restart from the checkpoint; the new event advances the watermark
    // past hour 10, finalizing its window exactly once in the new run
    ms.addData(Ev(3, 2, ts("2024-01-01 11:05:00"), "click"))
    val q2 = run(); try q2.processAllAvailable() finally q2.stop()
    ms.addData(Ev(4, 2, ts("2024-01-01 12:30:00"), "click"))
    val q3 = run(); try q3.processAllAvailable() finally q3.stop()

    val got = spark.read.parquet(sink).collect()
      .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toSeq.sorted
    assert(got === Seq("2024-01-01 10:00:00.0" -> 2L, "2024-01-01 11:00:00.0" -> 1L))
  }

  test("stateful hour profile accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val query = Streaming.runningHourProfile(spark, ms.toDS())
      .writeStream.format("memory").queryName("profile_t").outputMode("update")
      .start()
    try {
      ms.addData(Ev(1, 7, ts("2024-01-01 09:10:00"), "click"),
        Ev(2, 7, ts("2024-01-01 09:40:00"), "click"))
      query.processAllAvailable()
      ms.addData(Ev(3, 7, ts("2024-01-02 09:20:00"), "click"))
      query.processAllAvailable()
      // state store carried hour-9 count 2 across the batch boundary -> 3
      val last = spark.table("profile_t")
        .where(col("user_id") === 7 && col("hour") === 9)
        .orderBy(col("n")).collect().map(_.getLong(2))
      assert(last.last === 3L)
    } finally query.stop()
  }

  test("streaming LSH near-dup candidates match the batch band-bucket join on replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.ops.TextOps.ensureFunctions(spark)
    // three near-dup families + noise: docs in a family share most words
    def doc(base: String, tail: String) = s"$base $tail"
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = "one two three four five six seven eight nine ten eleven twelve"
    val c = "red orange yellow green blue indigo violet black white gray pink teal"
    val corpus = Seq(
      1L -> doc(a, "ending one"), 2L -> doc(a, "ending two"), 3L -> doc(a, "ending one"),
      4L -> doc(b, "tail x"), 5L -> doc(b, "tail y"),
      6L -> doc(c, "suffix p"), 7L -> doc(c, "suffix q"),
      8L -> "completely unrelated text with its own private vocabulary here")
    // batch reference: the SAME shared pipeline the batch LSH query
    // calls (TextOps.bandedSignatures) — a constant/scheme change there
    // flows into both sides of this parity check, never one
    val bd = graft.ops.TextOps.bandedSignatures(
      corpus.toDF("doc_id", "text")
        .withColumn("__w", graft.ops.TextOps.wordsExpr)
        .select(col("doc_id"), graft.ops.TextOps.shinglesExpr.as("sh"))
        .where(size(col("sh")) > 0)
        .select(col("doc_id"), graft.ops.TextOps.sortedShingleHashes().as("hs")),
      k = 16, bands = 8, r = 2)
    val batchPairs = bd.as("x").join(bd.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty) // families must actually collide
    // streaming replay in three micro-batches, shuffled arrival order
    val ms = MemoryStream[(Long, String)]
    val query = Streaming.streamingNearDupCandidates(
        spark, ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("neardup_t").outputMode("append").start()
    try {
      ms.addData(6L -> doc(c, "suffix p"), 1L -> doc(a, "ending one"))
      query.processAllAvailable()
      ms.addData(4L -> doc(b, "tail x"), 2L -> doc(a, "ending two"),
        8L -> "completely unrelated text with its own private vocabulary here")
      query.processAllAvailable()
      ms.addData(7L -> doc(c, "suffix q"), 3L -> doc(a, "ending one"),
        5L -> doc(b, "tail y"))
      query.processAllAvailable()
      val streamed = spark.table("neardup_t").select("i", "j")
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batchPairs)
    } finally query.stop()
  }

  test("streaming CMS+KMV sketch state merges across micro-batches to the batch aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two tumbling hours of token hashes, shuffled across three batches:
    // the window's state-store entry must merge TypedImperativeAggregate
    // partials exactly as batch map-side combine does
    val rnd = new scala.util.Random(23)
    val rows = (1 to 3000).map { i =>
      val hour = if (i % 3 == 0) "2024-01-01 01" else "2024-01-01 00"
      (ts(s"$hour:${10 + i % 40}:00"), rnd.nextInt(200).toLong)
    }
    graft.functions.CMSketch.register(spark)
    graft.functions.KMVDistinct.register(spark)
    val batch = rows.toDF("ts", "hv")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(expr("cms_sketch(hv, 4, 1024)").as("cms"), expr("kmv_distinct(hv, 64)").as("kmv"))
      .select(col("w.start").as("ws"), col("cms"), col("kmv"))
      .collect().map(r => r.getTimestamp(0).toString -> (r.getSeq[Long](1), r.getDouble(2))).toMap
    val ms = MemoryStream[(java.sql.Timestamp, Long)]
    val query = Streaming.streamingTokenSketch(
        ms.toDF().toDF("ts", "hv"), "ts", "hv", "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("sketch_t").outputMode("complete").start()
    try {
      scala.util.Random.shuffle(rows).grouped(1000).foreach { chunk =>
        ms.addData(chunk); query.processAllAvailable()
      }
      val streamed = spark.table("sketch_t")
        .collect().map(r => r.getTimestamp(0).toString -> (r.getSeq[Long](1), r.getDouble(2))).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (w, (cms, kmv)) =>
        assert(cms === batch(w)._1, s"window $w: CMS counters diverge from batch")
        assert(kmv === batch(w)._2, s"window $w: KMV estimate diverges from batch")
      }
    } finally query.stop()
  }

  test("streaming quantile sketch converges to the batch sample across shuffled micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // doc-level stream (ts, doc-hash, length): the bottom-k sample is a
    // pure function of the window's row set, so any micro-batch split /
    // arrival order must produce the batch aggregate's exact quantiles
    val rnd = new scala.util.Random(31)
    val rows = (1 to 2000).map { i =>
      val hour = if (i % 4 == 0) "2024-01-01 01" else "2024-01-01 00"
      (ts(s"$hour:${10 + i % 40}:00"), rnd.nextLong(), rnd.nextDouble() * 900 + 100)
    }
    graft.functions.QuantileSketch.register(spark)
    val batch = rows.toDF("ts", "hv", "len")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(expr("sample_quantiles(hv, len, 128, array(0.25D, 0.5D, 0.95D))").as("qs"))
      .collect().map(r => r.getStruct(0).getTimestamp(0).toString -> r.getSeq[Double](1)).toMap
    val ms = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val query = Streaming.streamingTokenSketch(
        ms.toDF().toDF("ts", "hv", "len"), "ts", "hv", "1 hour", "10 minutes",
        valCol = Some("len"))
      .writeStream.format("memory").queryName("sketch_q").outputMode("complete").start()
    try {
      scala.util.Random.shuffle(rows).grouped(700).foreach { chunk =>
        ms.addData(chunk); query.processAllAvailable()
      }
      val streamed = spark.table("sketch_q")
        .collect().map(r => r.getTimestamp(0).toString -> r.getSeq[Double](3)).toMap
      assert(streamed.keySet === batch.keySet)
      streamed.foreach { case (w, qs) =>
        assert(qs === batch(w), s"window $w: quantile sample diverges from batch")
      }
    } finally query.stop()
  }

  test("streaming rate limiter: cap binds across micro-batches; a new window resets the count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hour = 3600L * 1000000L
    val ms = MemoryStream[Ev]
    val query = Streaming.streamingRateLimit(spark, ms.toDS(), hour, cap = 2)
      .writeStream.format("memory").queryName("rl_t").outputMode("append").start()
    try {
      // batch 1: user 1 admits events 1, 2 in hour A (event 3 over cap);
      // user 2 admits its single event
      ms.addData(
        Ev(1L, 1L, ts("2024-01-01 10:00:00"), "click"),
        Ev(2L, 1L, ts("2024-01-01 10:05:00"), "click"),
        Ev(3L, 1L, ts("2024-01-01 10:10:00"), "click"),
        Ev(4L, 2L, ts("2024-01-01 10:00:00"), "click"))
      query.processAllAvailable()
      // batch 2: same hour A for user 1 -> STATE must keep the cap shut;
      // hour B resets the count to admit again
      ms.addData(
        Ev(5L, 1L, ts("2024-01-01 10:20:00"), "click"),
        Ev(6L, 1L, ts("2024-01-01 11:00:00"), "click"))
      query.processAllAvailable()
      val got = spark.table("rl_t")
        .collect().map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
      assert(got.toSeq === Seq((1L, 1L), (2L, 2L), (4L, 1L), (6L, 1L)),
        s"admissions were ${got.toSeq}")
    } finally query.stop()
  }

  test("CDC apply: last-write-wins state, deletes tombstone, duplicate redelivery is dropped") {
    import spark.implicits._
    import graft.streaming.Streaming.CdcIn
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[CdcIn]
    val query = Streaming.streamingCdcApply(spark, ms.toDS())
      .writeStream.format("memory").queryName("cdc_t").outputMode("update").start()
    try {
      // batch 1: key 1 upserts 1.0 then 2.0; key 2 upserts then deletes
      ms.addData(
        CdcIn(1L, ts("2024-01-01 10:00:00"), 1L, "U", Some(1.0)),
        CdcIn(1L, ts("2024-01-01 10:05:00"), 2L, "U", Some(2.0)),
        CdcIn(2L, ts("2024-01-01 10:00:00"), 3L, "U", Some(5.0)),
        CdcIn(2L, ts("2024-01-01 10:05:00"), 4L, "D", None))
      query.processAllAvailable()
      // batch 2: REDELIVERY of key 1's event 2 (stale — the frontier
      // must drop it, ver stays put), then a real delete; key 2 revives
      ms.addData(
        CdcIn(1L, ts("2024-01-01 10:05:00"), 2L, "U", Some(2.0)),
        CdcIn(1L, ts("2024-01-01 10:10:00"), 5L, "D", None),
        CdcIn(2L, ts("2024-01-01 10:10:00"), 6L, "U", Some(9.0)))
      query.processAllAvailable()
      val rows = spark.table("cdc_t").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      // converged state = max-ver row per key
      val fin = rows.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
      assert(fin(1L) === ((1L, 3L, false, None)), s"key 1 final ${fin(1L)}")
      assert(fin(2L) === ((2L, 3L, true, Some(9.0))), s"key 2 final ${fin(2L)}")
      // the duplicate never bumped the version: no ver-4 row exists
      assert(rows.forall(_._2 <= 3L), s"redelivery bumped a version: ${rows.toSeq}")
      // batch-1 intermediate emission for key 1 was the 2.0 upsert
      assert(rows.contains((1L, 2L, true, Some(2.0))), s"rows were ${rows.toSeq}")
    } finally query.stop()
  }
}
