package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** The oracle-gated STREAMING replay harnesses (an eighth,
  * `streaming_decontaminate_replay`, lives beside its batch twin in
  * DedupQueries): each feeds a deterministic table replay through a
  * [[graft.streaming.Streaming]] operator and hash-checks the emitted
  * rows against the batch oracle. Split out of BicisQueries (which
  * keeps the batch bicis-parity surface) — same package, same
  * registry, pure mechanical move.
  */
object StreamingReplays {

  private val HourMicros = 3600L * 1000000L

  /** The flagship A5 operator executed through the STREAMING engine and
    * hash-checked against the same DuckDB oracle as the batch
    * `next_window_target` — the strongest replay-parity statement the
    * gate can make: the incremental `flatMapGroupsWithState` operator
    * (graft.streaming.Streaming.streamingForwardWindowCount), fed the
    * events table as an in-order micro-batched FILE SOURCE, produces
    * BIT-IDENTICAL labels to the batch RANGE-window plan (both emit
    * exactly the events at or before max − w; in-order feed means
    * nothing lands beyond the no-watermark cutoff).
    *
    * The replay path is the production shape end to end: a distributed
    * range-sort write stages the corpus as ordered chunk files (see
    * [[stageOrderedFiles]] — nothing is collected to the driver) and
    * `readStream.parquet` + maxFilesPerTrigger=1 replays them as 4
    * in-order micro-batches, exactly how a file-fed deployment would
    * run. Rough cost: one staging write + one stateful pass over events.
    */
  val streamingA5Replay: QueryDef = QueryDef.sql("streaming_a5_replay",
    s"""WITH b AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
       |w AS (SELECT event_id, us,
       |        count(*) OVER (PARTITION BY user_id ORDER BY us
       |                       RANGE BETWEEN CURRENT ROW AND ${HourMicros - 1} FOLLOWING) AS c,
       |        max(us) OVER (PARTITION BY user_id) AS mx
       |      FROM b)
       |SELECT event_id, CAST(c AS BIGINT) AS n_rents FROM w
       |WHERE us <= mx - $HourMicros ORDER BY event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.streaming.Streaming
    val src = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val (watched, base) = stageOrderedFiles(src, 4, Seq(col("ts"), col("event_id")))
    try {
      val stream = s.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched).as[Streaming.Ev]
      val sink = s"a5_replay_${replaySeq.incrementAndGet()}"
      // State partitioning sized to the keyspace (~3k users), captured at
      // stream start only — same replay-harness discipline as
      // streaming_sessionize_replay; result-invariant (state is per-key)
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.streamingForwardWindowCount(s, stream, HourMicros)
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.table(sink).select(col("event_id"), col("n_rents")).orderBy(col("event_id"))
    } finally rmTree(base)
  }

  private val replaySeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Stage `df` as `n` chronologically-ordered parquet files for a FILE-
    * SOURCE replay — the harness-honesty upgrade over collect()+
    * MemoryStream: the input never materializes on the driver, it flows
    * through a distributed range-sort write and back in through
    * `readStream.parquet` exactly as a production file/Kafka deployment
    * would. `repartitionByRange(n, rangeCols)` makes partition i hold
    * strictly earlier range values than partition i+1, so the written
    * part files ARE the in-order micro-batch chunks; they are renamed
    * c0000..c000(n-1) with strictly ascending modification times because
    * FileStreamSource triggers batches oldest-mod-time-first — with
    * `maxFilesPerTrigger=1` the stream replays the corpus in order, one
    * chunk per micro-batch. Returns (watchedDir, baseDir-to-delete).
    */
  private[graft] def stageOrderedFiles(df: org.apache.spark.sql.DataFrame, n: Int,
      rangeCols: Seq[org.apache.spark.sql.Column]): (String, java.io.File) = {
    val base = java.nio.file.Files.createTempDirectory("graft_replay_").toFile
    val staging = new java.io.File(base, "stage")
    val watched = new java.io.File(base, "in"); watched.mkdirs()
    df.repartitionByRange(n, rangeCols: _*)
      .write.mode("overwrite").parquet(staging.getAbsolutePath)
    val parts = staging.listFiles().filter(_.getName.startsWith("part-")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      val dst = new java.io.File(watched, f"c$i%04d.parquet")
      java.nio.file.Files.move(f.toPath, dst.toPath)
      // fixed, strictly ascending mod-times: the source's trigger order
      // must not depend on how fast the filesystem stamped the writes
      dst.setLastModified(1600000000000L + i * 60000L): Unit
    }
    (watched.getAbsolutePath, base)
  }

  private[graft] def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(): Unit
  }

  /** VALUE-deterministic chunk staging: one watched file per caller-
    * supplied frame, trigger order = list order. [[stageOrderedFiles]]
    * cuts by repartitionByRange, whose sampled boundaries are NOT
    * replayable — fine for COMMUTING appends (the IVF index assigns
    * each vector independently at fixed centroids), but graph inserts
    * see the graph state their predecessors built, so an oracle must
    * replay the EXACT chunk composition; the caller pins it with value
    * predicates (e.g. vec_id % 3) the SQL side can restate.
    */
  private[graft] def stageChunkFiles(
      chunks: Seq[org.apache.spark.sql.DataFrame]): (String, java.io.File) = {
    val base = java.nio.file.Files.createTempDirectory("graft_replay_").toFile
    val watched = new java.io.File(base, "in"); watched.mkdirs()
    chunks.zipWithIndex.foreach { case (c, i) =>
      val staging = new java.io.File(base, s"stage$i")
      c.coalesce(1).write.mode("overwrite").parquet(staging.getAbsolutePath)
      val part = staging.listFiles().filter(_.getName.startsWith("part-")).head
      val dst = new java.io.File(watched, f"c$i%04d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1600000000000L + i * 60000L): Unit
    }
    (watched.getAbsolutePath, base)
  }

  /** Two-source staging for stream-stream joins: ONE shared ts midpoint
    * (scalar percentile upstream) cuts BOTH sides into the same global
    * time ranges, so with maxFilesPerTrigger=1 batch i of the left
    * source covers exactly batch i's range on the right — the "one
    * global ts-ordered chunking drives both sides" invariant with no
    * driver feed. Optional shared sentinel frames append one extra
    * lockstep chunk file per side each (watermark advance / eviction
    * trigger for outer joins). Returns (leftDir, rightDir, baseToDelete).
    */
  private def stageTwoSided(ev: org.apache.spark.sql.DataFrame,
      lPred: org.apache.spark.sql.Column, rPred: org.apache.spark.sql.Column,
      midUs: Long,
      sentinels: Seq[org.apache.spark.sql.DataFrame]): (String, String, java.io.File) = {
    val base = java.nio.file.Files.createTempDirectory("graft_replay_2s_").toFile
    // the four filtered chunk writes each re-evaluate `ev` — cache it
    // for the staging's lifetime (gate-scale input; released below)
    val cached = ev.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def side(pred: org.apache.spark.sql.Column, sub: String): String = {
      val d = new java.io.File(base, sub); d.mkdirs()
      val chunks = Seq(col("ts") < timestamp_micros(lit(midUs)),
          col("ts") >= timestamp_micros(lit(midUs)))
        .map(p => cached.where(pred && p)) ++ sentinels
      chunks.zipWithIndex.foreach { case (cdf, i) =>
        val stage = new java.io.File(base, s"${sub}_stage$i")
        cdf.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
        // an EMPTY chunk (e.g. no left rows before the ts midpoint at a
        // tiny SF) may emit no part file — skip the chunk rather than
        // crash on .head (r9 ADVICE). Batch slicing is not load-bearing
        // for the joined result; the sentinel chunks still advance the
        // watermark in their own trigger.
        stage.listFiles().filter(_.getName.startsWith("part-"))
          .sortBy(_.getName).headOption.foreach { part =>
            val dst = new java.io.File(d, f"c$i%04d.parquet")
            java.nio.file.Files.move(part.toPath, dst.toPath)
            dst.setLastModified(1600000000000L + i * 60000L): Unit
          }
      }
      d.getAbsolutePath
    }
    try (side(lPred, "left"), side(rPred, "right"), base)
    finally cached.unpersist(false)
  }

  /** [[stageOrderedFiles]] plus appended SENTINEL chunk files: each
    * sentinel frame (a 1-row watermark-advancer / eviction-trigger)
    * becomes one more ordered file AFTER the data chunks, so the
    * sentinel protocol the windowed replays need rides the file order
    * instead of a driver feed — with maxFilesPerTrigger=1 each sentinel
    * is its own micro-batch, exactly the advance-then-evict cadence.
    */
  private def stageWithSentinels(df: org.apache.spark.sql.DataFrame, n: Int,
      rangeCols: Seq[org.apache.spark.sql.Column],
      sentinels: Seq[org.apache.spark.sql.DataFrame]): (String, java.io.File) = {
    val (watched, base) = stageOrderedFiles(df, n, rangeCols)
    val wd = new java.io.File(watched)
    sentinels.zipWithIndex.foreach { case (sd, i) =>
      val stage = new java.io.File(base, s"sent$i")
      sd.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      // sentinel frames are 1-row by construction, but harden the same
      // way as stageTwoSided's chunks: no part file -> no chunk file
      stage.listFiles().filter(_.getName.startsWith("part-"))
        .sortBy(_.getName).headOption.foreach { part =>
          val dst = new java.io.File(wd, f"s$i%04d.parquet")
          java.nio.file.Files.move(part.toPath, dst.toPath)
          // strictly after every data chunk's mod-time
          dst.setLastModified(1600000000000L + (1000 + i) * 60000L): Unit
        }
    }
    (watched, base)
  }

  /** Native `session_window` sessionization through the STREAMING engine
    * (Streaming.sessionCounts: watermarked merging session windows in
    * the state store), hash-checked against the same gaps-and-islands
    * oracle as the batch `q_session_window` — the stateful-aggregation
    * counterpart to `streaming_a5_replay`'s flatMapGroupsWithState gate
    * entry, proving the WHOLE session set matches batch bit-for-bit.
    *
    * Append-mode session windows only emit once the watermark passes a
    * session's end, so a bare replay would pin the tail sessions in the
    * state store forever (the watermark never outruns the last event).
    * The replay closes them with a WATERMARK SENTINEL: two far-future
    * events on a reserved key (user −1, beyond every real session end)
    * — the first advances the event-time watermark past all real
    * sessions, the second triggers the eviction pass that emits them.
    * Sentinel rows are dropped from the result; a production deployment
    * doesn't need this because its stream outlives any session horizon.
    */
  val streamingSessionizeReplay: QueryDef = QueryDef.sql("streaming_sessionize_replay",
    """WITH g AS (SELECT user_id, ts,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT user_id, ts,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTES AS session_end, count(*) AS n
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.streaming.Streaming
    val src = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val maxMs = src.agg(max(col("ts"))).head().getTimestamp(0).getTime
    // day +1 sentinel advances the watermark past every real session
    // end; the +2d sentinel's batch runs the eviction that emits them
    def sentinelDf(id: Long, offsetMs: Long) =
      Seq((id, -1L, new java.sql.Timestamp(maxMs + offsetMs), "sentinel"))
        .toDF("event_id", "user_id", "ts", "event_type")
    val (watched, base) = stageWithSentinels(src, 2, Seq(col("ts"), col("event_id")),
      Seq(sentinelDf(-1L, 86400000L), sentinelDf(-2L, 172800000L)))
    try {
      val stream = s.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched)
      val sink = s"sess_replay_${replaySeq.incrementAndGet()}"
      // The replay's cost is per-batch state-store commit overhead ×
      // partitions: size the stream's state partitioning to the keyspace
      // (~3k users) instead of the batch engine's CPU-count default — the
      // setting is captured at stream START, so the batch queries around
      // this one are untouched. Result-invariant (state is per-key).
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.sessionCounts(stream, "user_id", "ts",
            "30 minutes", "0 seconds")
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.table(sink)
        .where(col("user_id") >= 0)
        .select(col("user_id"), col("session_start"), col("session_end"), col("n"))
        .orderBy(col("user_id"), col("session_start"))
    } finally rmTree(base)
  }

  /** STREAM-STREAM interval join through the oracle gate — the third
    * stateful-operator class after flatMapGroupsWithState
    * (`streaming_a5_replay`) and merging session windows
    * (`streaming_sessionize_replay`): view events joined to purchase
    * events of the same user landing within 6 h (the attribution shape,
    * Streaming.streamIntervalJoin — both sides watermarked, the range
    * predicate bounds BOTH state stores). Replay stages both sides as
    * FILE SOURCES cut at one shared ts midpoint (no driver collect),
    * so arrivals are in order across lockstep micro-batches and
    * the inner join emits every match before GC can touch its partner:
    * a buffered left row is evicted only once the watermark passes
    * l.ts + bound, and every not-yet-seen right row has ts ≥ the
    * watermark — already outside that window. No sentinel needed (inner
    * joins emit on match, not on watermark).
    */
  val streamingIntervalJoinReplay: QueryDef = QueryDef.sql("streaming_interval_join_replay",
    """SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id,
      |  l.ts AS left_ts, r.ts AS right_ts
      |FROM events l JOIN events r
      |  ON l.user_id = r.user_id AND l.event_type = 'view' AND r.event_type = 'purchase'
      | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOURS
      |ORDER BY left_id, right_id""".stripMargin) { (s, dir) =>
    import graft.streaming.Streaming
    val ev = Tables.events(s, dir)
      .where(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // FILE-SOURCE replay for both streams: one SHARED ts midpoint (a
    // scalar percentile — S10-tiny) cuts both sides into the same
    // global time ranges, so batch i of the left source covers exactly
    // batch i's range on the right — the "one global ts-ordered
    // chunking drives BOTH sides" invariant of the old driver feed,
    // with no collect. maxFilesPerTrigger=1 per source → each
    // micro-batch consumes chunk i from BOTH sides in lockstep and
    // neither watermark outruns the other's unfed data.
    val midUs = ev.agg(expr("CAST(percentile(unix_micros(ts), 0.5) AS LONG)"))
      .head().getLong(0)
    val (lDir, rDir, base) = stageTwoSided(ev,
      col("event_type") === "view", col("event_type") === "purchase", midUs, Nil)
    try {
      def src(p: String) = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val sink = s"ij_replay_${replaySeq.incrementAndGet()}"
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.streamIntervalJoin(src(lDir), src(rDir),
            "user_id", "ts", "0 seconds", 21600L)
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.table(sink)
        .select(col("user_id"), col("left_id"), col("right_id"),
          col("left_ts"), col("right_ts"))
        .orderBy(col("left_id"), col("right_id"))
    } finally rmTree(base)
  }

  /** Stream-stream LEFT OUTER interval join through the oracle gate —
    * the ninth streaming class, and the semantics the inner replay
    * can't reach: a view with NO purchase inside its 6-hour window must
    * still be emitted (null right columns), but only once the watermark
    * proves no partner can arrive — STATE-STORE EVICTION as the
    * emission trigger. Hash-checked against the batch LEFT JOIN oracle,
    * so the gate proves the full trichotomy: every matched pair emitted
    * exactly once, every unmatched view null-emitted exactly once,
    * nothing null-emitted while a partner was still admissible.
    *
    * Replay mechanics: same globally ts-ordered two-chunk feed as the
    * inner replay (in-order arrivals), then a WATERMARK SENTINEL pair
    * on both streams — the first (7 h past the last event, beyond every
    * open window's close at delay 0s) advances both watermarks, the
    * second triggers the eviction batch that emits the outer nulls
    * (watermark movement is observed at the NEXT batch). Sentinel rows
    * (user −1) are dropped from the result; the sentinel left row
    * itself never emits (its own window never closes before stop).
    */
  val streamingOuterJoinReplay: QueryDef = QueryDef.sql("streaming_outer_join_replay",
    """SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id,
      |  l.ts AS left_ts, r.ts AS right_ts
      |FROM (SELECT * FROM events WHERE event_type = 'view') l
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      |  ON l.user_id = r.user_id
      | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 6 HOURS
      |ORDER BY left_id, right_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.streaming.Streaming
    val ev = Tables.events(s, dir)
      .where(col("event_type").isin("view", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val agg = ev.agg(expr("CAST(percentile(unix_micros(ts), 0.5) AS LONG)"),
      max(col("ts"))).head()
    val midUs = agg.getLong(0)
    val maxMs = agg.getTimestamp(1).getTime
    // watermark-close + eviction-observe sentinel pair (7 h and 14 h
    // past the last event; every real window closes at +6 h) — one
    // lockstep sentinel chunk file per side each
    def sentinelDf(offsetMs: Long) =
      Seq((-1L, -1L, new java.sql.Timestamp(maxMs + offsetMs), "sentinel"))
        .toDF("event_id", "user_id", "ts", "event_type")
    val (lDir, rDir, base) = stageTwoSided(ev,
      col("event_type") === "view", col("event_type") === "purchase", midUs,
      Seq(sentinelDf(25200000L), sentinelDf(50400000L)))
    try {
      def src(p: String) = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
      val sink = s"oj_replay_${replaySeq.incrementAndGet()}"
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.streamIntervalJoinLeftOuter(src(lDir), src(rDir),
            "user_id", "ts", "0 seconds", 21600L)
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.table(sink)
        .where(col("user_id") =!= -1L)
        .select(col("user_id"), col("left_id"), col("right_id"),
          col("left_ts"), col("right_ts"))
        .orderBy(col("left_id"), col("right_id"))
    } finally rmTree(base)
  }

  /** STREAMING AS-OF JOIN through the oracle gate — the tenth stateful
    * class ([[graft.streaming.Streaming.streamingAsOfJoin]]): for every
    * click, the latest purchase at/before it per user, LEFT semantics —
    * hash-checked against the SAME DuckDB `ASOF LEFT JOIN` oracle as
    * the batch q_asof_join, so one oracle now certifies THREE
    * executions of the operator: composed union+window, the native
    * physical exec, and the streaming state machine.
    *
    * Replay mechanics: the two-sided shared-midpoint staging (in-order
    * lockstep chunks, no driver feed) + the outer-join replay's
    * watermark sentinel pair — the first advances both watermarks past
    * every event, the second triggers the timer batch in which every
    * buffered click's match is provably final and flushes (state-store
    * eviction as the emission trigger). Duplicate purchase timestamps
    * fold to max(value) inside the state, arrival-order-independent —
    * the oracle's pre-aggregation without a second stateful operator.
    */
  val streamingAsofReplay: QueryDef = QueryDef.sql("streaming_asof_replay",
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS rts, max(value) AS rvalue
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, p.rts AS asof_ts, p.rvalue AS asof_rvalue
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.rts <= c.ts
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.streaming.Streaming
    val ev = Tables.events(s, dir)
      .where(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
        col("value"))
    val agg = ev.agg(expr("CAST(percentile(unix_micros(ts), 0.5) AS LONG)"),
      max(col("ts"))).head()
    val midUs = agg.getLong(0)
    val maxMs = agg.getTimestamp(1).getTime
    // watermark-advance + timer-observe sentinel pair (watermark
    // movement is visible at the NEXT batch, which is when the armed
    // event-time timers fire and flush every pending click)
    def sentinelDf(offsetMs: Long) =
      Seq((-1L, -1L, new java.sql.Timestamp(maxMs + offsetMs), "sentinel", 0.0))
        .toDF("event_id", "user_id", "ts", "event_type", "value")
    val (lDir, rDir, base) = stageTwoSided(ev,
      col("event_type") === "click", col("event_type") === "purchase", midUs,
      Seq(sentinelDf(3600000L), sentinelDf(7200000L)))
    try {
      def src(p: String, side: Int) = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(p)
        .select(lit(side).as("side"), col("event_id").as("id"),
          col("user_id"), col("ts"), col("value"))
      val in = src(lDir, 0).unionByName(src(rDir, 1)).as[Streaming.AsOfIn]
      val sink = s"asof_replay_${replaySeq.incrementAndGet()}"
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.streamingAsOfJoin(s, in, "0 seconds")
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.table(sink)
        .where(col("event_id") =!= -1L)
        .select(col("event_id"), expr("timestamp_micros(asof_us)").as("asof_ts"),
          col("asof_rvalue"))
        .orderBy(col("event_id"))
    } finally rmTree(base)
  }

  /** Streaming EXACT DEDUP through the oracle gate — the fourth stateful
    * operator class after flatMapGroupsWithState, merging session
    * windows and the stream-stream join: `dropDuplicatesWithinWatermark`
    * keyed on the content digest (Streaming.streamingDedup — the
    * watermark GC's digest state older than the delay, so the store is
    * bounded on an unbounded stream). Replay feeds the documents table
    * in doc_id order with a synthetic event time (doc_id seconds — the
    * corpus as an arrival log) and a delay covering the whole span, so
    * no state is evicted and the streamed survivor set must equal the
    * batch distinct-text set EXACTLY.
    *
    * Which row of a duplicate group survives is an arrival-order detail
    * (within a micro-batch it is not contractual), so the gate projects
    * the survivor rows onto digest-determined columns only (digest,
    * n_chars) — any survivor yields the identical row, and the hash
    * compare proves the STATE SEMANTICS: one survivor per distinct
    * content, none dropped, none duplicated. Eviction-horizon behavior
    * is StreamingSpec territory.
    */
  val streamingDedupReplay: QueryDef = QueryDef.sql("streaming_dedup_replay",
    """SELECT DISTINCT md5(text) AS digest, CAST(length(text) AS BIGINT) AS n_chars
      |FROM documents ORDER BY digest""".stripMargin) { (s, dir) =>
    import graft.streaming.Streaming
    // offset the synthetic clock well past epoch 0: an event time equal
    // to the stream's initial watermark (0) is treated as late and
    // silently dropped — doc_id 0 would never reach the dedup state
    val src = Tables.documents(s, dir).select(col("doc_id"),
      timestamp_seconds(lit(1000000000L) + col("doc_id")).as("ts"), col("text"))
    val (watched, base) = stageOrderedFiles(src, 4, Seq(col("doc_id")))
    try {
      val stream = s.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched)
      val sink = s"dedup_replay_${replaySeq.incrementAndGet()}"
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.streamingDedup(stream, "ts", "text", "3650 days")
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.table(sink)
        .select(md5(col("text").cast("binary")).as("digest"),
          length(col("text")).cast("long").as("n_chars"))
        .orderBy(col("digest"))
    } finally rmTree(base)
  }

  /** Watermarked event-time TUMBLING AGGREGATION through the oracle gate
    * — the fifth stateful operator class (after flatMapGroupsWithState,
    * merging session windows, the stream-stream join and
    * dropDuplicatesWithinWatermark): the canonical Structured Streaming
    * shape, `withWatermark → groupBy(window(ts)) → count` in APPEND mode
    * (Streaming.tumblingCounts), where a window's count lives in the
    * state store until the watermark passes its end and is emitted
    * exactly once. Hash-checked against the SAME DuckDB oracle as the
    * batch `tumbling_hour` — streamed hourly counts must equal the batch
    * group-by bit-for-bit, including windows whose events are split
    * across micro-batches (the cross-batch partial-merge path).
    *
    * Same watermark-sentinel discipline as sessionize: append mode
    * never emits the tail windows on its own (the watermark cannot
    * outrun the last event), so a reserved far-future row advances it
    * past every real window end and a second batch runs the eviction
    * pass. Sentinel windows are dropped by the ws cutoff; a production
    * deployment needs neither because its stream outlives any window.
    */
  val streamingTumblingReplay: QueryDef = QueryDef.sql("streaming_tumbling_replay",
    """SELECT date_trunc('hour', ts) AS ws, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY ws""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.streaming.Streaming
    val src = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val maxMs = src.agg(max(col("ts"))).head().getTimestamp(0).getTime
    // every real window starts at or before the max event's hour floor
    val lastRealWs = new java.sql.Timestamp(maxMs - maxMs % 3600000L)
    def sentinelDf(id: Long, offsetMs: Long) =
      Seq((id, -1L, new java.sql.Timestamp(maxMs + offsetMs), "sentinel"))
        .toDF("event_id", "user_id", "ts", "event_type")
    val (watched, base) = stageWithSentinels(src, 2, Seq(col("ts"), col("event_id")),
      Seq(sentinelDf(-1L, 86400000L), sentinelDf(-2L, 172800000L)))
    try {
      val stream = s.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched)
      val sink = s"tumb_replay_${replaySeq.incrementAndGet()}"
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.tumblingCounts(stream, "ts", "1 hour", "0 seconds")
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.table(sink)
        .where(col("ws") <= lit(lastRealWs))
        .select(col("ws"), col("n"))
        .orderBy(col("ws"))
    } finally rmTree(base)
  }

  /** Native SKETCH AGGREGATES inside the streaming state store, through
    * the oracle gate: per watermarked hourly window, the KMV distinct-
    * user estimate (Streaming.streamingTokenSketch — the monitoring-
    * dashboard shape, whose per-window state is a CONSTANT 32 KB CMS +
    * k·8 B KMV regardless of row volume; each micro-batch's partial
    * merges into the window's entry exactly as map-side partials merge
    * in batch). KMV is a pure function of the window's row SET, so the
    * DuckDB oracle replays each window's estimate from sorted distinct
    * hashes — proving the TypedImperativeAggregate's serialize /
    * deserialize / merge cycle through the state store is lossless, not
    * just batch-consistent (StreamingSpec pins the CMS counters and
    * quantile sample the same way, engine-to-engine). Append-mode
    * eviction + watermark sentinel as in the other windowed replays.
    */
  val streamingSketchReplay: QueryDef = {
    val duckHash = OracleSql.hash64("'u'", "CAST(user_id AS VARCHAR)")
    QueryDef.sql("streaming_sketch_replay",
      s"""WITH b AS (SELECT date_trunc('hour', ts) AS ws, $duckHash AS hv FROM events),
         |d AS (SELECT DISTINCT ws, hv FROM b),
         |r AS (SELECT ws, hv, row_number() OVER (PARTITION BY ws ORDER BY hv) AS rn,
         |             count(*) OVER (PARTITION BY ws) AS nd FROM d)
         |SELECT ws,
         |  round(CASE WHEN max(nd) < 64 THEN CAST(max(nd) AS DOUBLE)
         |        ELSE 63.0 * 1152921504606846976.0 / CAST(max(CASE WHEN rn = 64 THEN hv END) AS DOUBLE)
         |        END, 6) AS est
         |FROM r GROUP BY ws ORDER BY ws""".stripMargin) { (s, dir) =>
      import s.implicits._
      graft.ops.TextOps.ensureFunctions(s)
      val src = Tables.events(s, dir)
        .select(col("ts"),
          expr(graft.ops.TextOps.portableHash64Sql("'u'", "CAST(user_id AS STRING)")).as("hv"))
      val maxMs = src.agg(max(col("ts"))).head().getTimestamp(0).getTime
      val lastRealWs = new java.sql.Timestamp(maxMs - maxMs % 3600000L)
      def sentinelDf(offsetMs: Long) =
        Seq((new java.sql.Timestamp(maxMs + offsetMs), -1L)).toDF("ts", "hv")
      val (watched, base) = stageWithSentinels(src, 2, Seq(col("ts"), col("hv")),
        Seq(sentinelDf(86400000L), sentinelDf(172800000L)))
      try {
        val stream = s.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", "1").parquet(watched)
        val sink = s"sketch_replay_${replaySeq.incrementAndGet()}"
        val savedParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query =
          try graft.streaming.Streaming
            .streamingTokenSketch(stream, "ts", "hv", "1 hour", "0 seconds")
            .writeStream.format("memory").queryName(sink).outputMode("append").start()
          finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
        try query.processAllAvailable() finally query.stop()
        s.table(sink)
          .where(col("ws") <= lit(lastRealWs))
          .select(col("ws"), round(col("kmv"), 6).as("est"))
          .orderBy(col("ws"))
      } finally rmTree(base)
    }
  }

  /** The event-time rate limiter ([[graft.streaming.Streaming
    * .streamingRateLimit]], eighth streaming class: row-level admission
    * with keyed counter state) replayed over the events table and
    * hash-checked against the batch rank filter — per (user, hour
    * window) the first 5 events in (ts, event_id) order are admitted
    * with their admission index; everything else is dropped in flight.
    * Two-chunk in-order replay exercises cross-batch counter state
    * (a window spanning the chunk boundary must not restart at k=1);
    * the window-pruning keeps state O(1) windows per key.
    */
  val streamingRatelimitReplay: QueryDef = QueryDef.sql("streaming_ratelimit_replay",
    """SELECT event_id, user_id,
      |  CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS win, CAST(rk AS BIGINT) AS k
      |FROM (SELECT event_id, user_id, ts,
      |        row_number() OVER (PARTITION BY user_id, epoch_us(ts) // 3600000000
      |                           ORDER BY ts, event_id) AS rk
      |      FROM events)
      |WHERE rk <= 5 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.streaming.Streaming
    val src = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // range partitioning compares the FULL-microsecond timestamp (plus
    // the event_id tiebreak), so a chunk boundary can never invert two
    // same-ms events across batches — the invariant the old driver feed
    // enforced by sorting on micros
    val (watched, base) = stageOrderedFiles(src, 2, Seq(col("ts"), col("event_id")))
    try {
      val stream = s.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched).as[Streaming.Ev]
      val sink = s"ratelimit_replay_${replaySeq.incrementAndGet()}"
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.streamingRateLimit(s, stream, HourMicros, 5)
          .writeStream.format("memory").queryName(sink).outputMode("append").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.table(sink).select(col("event_id"), col("user_id"), col("win"), col("k"))
        .orderBy(col("event_id"))
    } finally rmTree(base)
  }

  /** CDC materialization through the streaming engine: the events table
    * replayed as an in-order changelog ('view' rows are deletes, the
    * rest upserts of `value`), applied by
    * [[graft.streaming.Streaming.streamingCdcApply]]'s keyed
    * current-row state; the reader takes max-version per key from the
    * update-mode sink — exactly how a downstream consumer materializes
    * a CDC topic. The batch oracle is the last-write-wins compaction
    * (one window pass): final presence + value + applied-op count per
    * key must match the stream's converged state bit-for-bit. All-
    * integer/bool state plus a pass-through parquet double — no
    * rounding anywhere.
    */
  val streamingCdcReplay: QueryDef = QueryDef.sql("streaming_cdc_replay",
    """WITH c AS (SELECT user_id, ts, event_id,
      |    CASE event_type WHEN 'view' THEN 'D' ELSE 'U' END AS op, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
      |    count(*) OVER (PARTITION BY user_id) AS n_ops
      |  FROM events)
      |SELECT user_id, CAST(n_ops AS BIGINT) AS n_ops, op = 'U' AS present,
      |  CASE WHEN op = 'U' THEN value END AS value
      |FROM c WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.streaming.Streaming
    val src = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type") === "view", "D").otherwise("U").as("op"), col("value"))
    val (watched, base) = stageOrderedFiles(src, 4, Seq(col("ts"), col("event_id")))
    try {
      val stream = s.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched).as[Streaming.CdcIn]
      val sink = s"cdc_replay_${replaySeq.incrementAndGet()}"
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.streamingCdcApply(s, stream)
          .writeStream.format("memory").queryName(sink).outputMode("update").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      import org.apache.spark.sql.expressions.Window
      s.table(sink)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(col("ver").desc)))
        .where(col("rn") === 1)
        .select(col("user_id"), col("ver").as("n_ops"), col("present"),
          when(col("present"), col("value")).as("value"))
        .orderBy(col("user_id"))
    } finally rmTree(base)
  }

  /** CRDT-monotone keyed state through the oracle gate: the per-user
    * presence bitmasks ([[graft.streaming.Streaming.streamingPresenceMask]])
    * replayed over staged file chunks, gated by the SAME law as the
    * batch `q_presence_bitmask` (one oracle, two execution tiers — the
    * q_asof_join precedent). The sink sees one update per (user, batch);
    * because mask state is a join-semilattice, bit_or over ALL updates
    * equals the final state — exactly the merge the gate applies, so
    * out-of-order or duplicated update consumption cannot change the
    * answer (the property that lets a deployment fan updates into any
    * downstream store without sequencing).
    */
  val streamingBitmaskReplay: QueryDef = QueryDef.sql("streaming_bitmask_replay",
    """WITH e AS (SELECT user_id,
      |    CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT) AS h,
      |    CAST(epoch_us(ts) // 86400000000 % 7 AS BIGINT) AS wd
      |  FROM events)
      |SELECT user_id,
      |  CAST(bit_or(CAST(1 AS BIGINT) << h) AS BIGINT) AS hour_mask,
      |  CAST(bit_count(bit_or(CAST(1 AS BIGINT) << h)) AS BIGINT) AS n_hours,
      |  CAST(bit_or(CAST(1 AS BIGINT) << wd) AS BIGINT) AS day_mask,
      |  CAST(bit_count(bit_or(CAST(1 AS BIGINT) << wd)) AS BIGINT) AS n_days
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    import s.implicits._
    import graft.streaming.Streaming
    val src = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val (watched, base) = stageOrderedFiles(src, 3, Seq(col("ts"), col("event_id")))
    try {
      val stream = s.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched).as[Streaming.Ev]
      val sink = s"bitmask_replay_${replaySeq.incrementAndGet()}"
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.streamingPresenceMask(s, stream)
          .writeStream.format("memory").queryName(sink).outputMode("update").start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.table(sink)
        .groupBy(col("user_id"))
        .agg(expr("CAST(bit_or(hour_mask) AS BIGINT)").as("hour_mask"),
          expr("CAST(bit_count(bit_or(hour_mask)) AS BIGINT)").as("n_hours"),
          expr("CAST(bit_or(day_mask) AS BIGINT)").as("day_mask"),
          expr("CAST(bit_count(bit_or(day_mask)) AS BIGINT)").as("n_days"))
        .orderBy(col("user_id"))
    } finally rmTree(base)
  }

  /** The at-ingest quality funnel through the oracle gate
    * ([[graft.streaming.Streaming.streamingQualityFunnel]] — previously
    * spec-only): Gopher rules + language gate stateless, then
    * keep-FIRST exact dedup in the watermark-bounded digest state. The
    * oracle states the STREAM's law — the first QUALITY-PASSING doc per
    * digest survives (filter-then-dedup), which under doc_id-ordered
    * arrival is min(doc_id) over the kept set. That is deliberately NOT
    * the batch funnel's law (k_exact there is first-over-ALL-docs, so a
    * digest whose earliest copy fails quality keeps nobody): admission
    * control dedups what it admits; the census dedups the corpus.
    */
  val streamingFunnelReplay: QueryDef = {
    import graft.queries.TextQueries.{gopherCntsDuck, langCntsDuck, gopherKeepSql, langCaseSql}
    QueryDef.sql("streaming_funnel_replay",
      s"""WITH c AS (SELECT doc_id, md5(text) AS dg,
         |  $gopherCntsDuck,
         |  $langCntsDuck
         |  FROM documents),
         |k AS (SELECT doc_id, dg FROM c
         |      WHERE ($gopherKeepSql) AND ($langCaseSql) <> 'und')
         |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id
         |FROM k GROUP BY dg ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.streaming.Streaming
      val src = Tables.documents(s, dir).select(col("doc_id"),
        timestamp_seconds(lit(1000000000L) + col("doc_id")).as("ts"), col("text"))
      val (watched, base) = stageOrderedFiles(src, 4, Seq(col("doc_id")))
      try {
        val stream = s.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", "1").parquet(watched)
        val sink = s"funnel_replay_${replaySeq.incrementAndGet()}"
        val savedParts = s.conf.get("spark.sql.shuffle.partitions")
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val query =
          try Streaming.streamingQualityFunnel(stream, "ts", "3650 days")
            .writeStream.format("memory").queryName(sink).outputMode("append").start()
          finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
        try query.processAllAvailable() finally query.stop()
        s.table(sink).select(col("doc_id")).orderBy(col("doc_id"))
      } finally rmTree(base)
    }
  }

  /** UPDATE-MODE late data through the oracle gate — the thirteenth
    * replay class and the one semantics the append-mode twelve can't
    * express: a row arriving LATE but within the allowed lateness must
    * UPDATE an already-emitted aggregate, and the consumer owns the
    * merge. The replay splits the corpus: every even-id event from the
    * final 24 h ships as one LATE trailing chunk after three in-order
    * chunks of everything else, under a 48 h watermark delay — so the
    * touched hourly windows are first created (and emitted) from their
    * on-time odd-id rows, then RE-emitted with corrected counts when
    * the late chunk lands (still above the watermark: maxTs − 48 h <
    * maxTs − 24 h — inside allowed lateness, nothing is dropped).
    *
    * The sink is the production update-mode shape: foreachBatch appends
    * each micro-batch's changed rows to an update LOG with its batch id
    * (no memory-sink crutch, no sentinel — update mode emits on change,
    * not on watermark). The consumer-side merge law is last-writer-wins
    * per window (`max_by(n, batch_id)`; counts are monotone under late
    * adds, so the max-merge a CRDT counter would use — the
    * streaming_bitmask_replay precedent — agrees). Final merged state
    * is gated against the SAME batch oracle as streaming_tumbling_replay:
    * late delivery within lateness must cost nothing.
    */
  val streamingUpdateLateReplay: QueryDef = QueryDef.sql("streaming_update_late_replay",
    """SELECT date_trunc('hour', ts) AS ws, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY ws""".stripMargin) { (s, dir) =>
    import graft.streaming.Streaming
    val src = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val maxMs = src.agg(max(col("ts"))).head().getTimestamp(0).getTime
    val lateCut = new java.sql.Timestamp(maxMs - 24L * 3600000L)
    val isLate = col("ts") >= lit(lateCut) && col("event_id") % 2 === 0
    val (watched, base) = stageWithSentinels(src.where(!isLate), 3,
      Seq(col("ts"), col("event_id")), Seq(src.where(isLate)))
    try {
      val stream = s.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1").parquet(watched)
      val updLog = graft.ops.Scratch.dir(s"upd_late_${replaySeq.incrementAndGet()}")
      val writeBatch: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, bid) => {
        df.withColumn("batch_id", lit(bid)).write.mode("append").parquet(updLog)
        ()
      }
      val savedParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val query =
        try Streaming.tumblingCounts(stream, "ts", "1 hour", "48 hours")
          .writeStream.outputMode("update").foreachBatch(writeBatch).start()
        finally s.conf.set("spark.sql.shuffle.partitions", savedParts)
      try query.processAllAvailable() finally query.stop()
      s.read.parquet(updLog)
        .groupBy(col("ws")).agg(max_by(col("n"), col("batch_id")).as("n"))
        .orderBy(col("ws"))
    } finally rmTree(base)
  }

  val all: Seq[QueryDef] = Seq(streamingA5Replay,
    streamingSessionizeReplay, streamingIntervalJoinReplay,
    streamingOuterJoinReplay, streamingAsofReplay,
    streamingDedupReplay, streamingTumblingReplay, streamingSketchReplay,
    streamingRatelimitReplay, streamingCdcReplay, streamingBitmaskReplay,
    streamingFunnelReplay, streamingUpdateLateReplay)
}
