package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (engine extension; the reference is pure
  * batch — SURVEY.md §2.9. Its streaming-shaped computation is the A10
  * tumbling count and the incrementally-maintained station profile that
  * Redis held, hour_feature_builder.py:59-92).
  *
  * Same transforms compose over `spark.readStream` sources: event-time
  * tumbling counts with a watermark (late data beyond the delay is
  * dropped and state is GC'd — bounded state at any scale), and the
  * station hour-profile as explicit keyed state via
  * flatMapGroupsWithState (the Redis replacement: state lives in the
  * state store, checkpointed, partitioned by station).
  */
object Streaming {

  final case class Ev(event_id: Long, user_id: Long, ts: java.sql.Timestamp,
                      event_type: String)
  final case class ProfileRow(user_id: Long, hour: Int, n: Long)

  /** A10 streaming twin: watermarked event-time tumbling counts. Groups
    * by the window STRUCT (projecting `start` only after the aggregate):
    * extracting the field before grouping severs the watermark linkage
    * and Spark rejects append-mode sinks ("aggregation without
    * watermark").
    */
  def tumblingCounts(events: DataFrame, tsCol: String, duration: String,
                     watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))

  final case class FwState(maxTs: Long, emittedUpTo: Long, buf: List[(Long, Long)])
  final case class FwOut(event_id: Long, n_rents: Long)

  /** The flagship A5 as an INCREMENTAL streaming operator: per key, an
    * event at time t is emitted with its [t, t+w) forward count once the
    * key's max event time reaches t + w + lateness (the per-key
    * full-window cutoff, exactly the batch semantics of
    * WindowOps.forwardWindowCount).
    *
    * Out-of-order hardening: arrivals are buffered and sorted by event
    * time, and `latenessMicros` delays emission so that any event
    * arriving up to that far behind the key's max STILL lands inside the
    * retained buffer before anything overlapping its window is emitted —
    * exact counts under bounded disorder, the watermark contract. Events
    * later than the horizon are dropped (never emitted wrong), matching
    * Structured Streaming's late-data semantics.
    *
    * State per key stays bounded in SIZE: only events with ts > maxTs -
    * w - lateness are retained (everything older is both emitted and
    * unreachable as a counter for a pending event). Bounding state in
    * KEY COUNT needs `watermarkDelay`: with it, the operator arms an
    * event-time timeout at maxTs + w + lateness — once the global
    * watermark passes that, every buffered window is provably complete
    * (nothing in-horizon can precede it), so the tail flushes with exact
    * counts and the key's state is REMOVED. Without a watermark, dead
    * keys pin their tail forever (the pure per-key-cutoff semantics).
    *
    * Counting is a two-pointer pass over the sorted buffer (O(n) per
    * batch, the batch core's shape), not a rescan per emitted event.
    */
  def streamingForwardWindowCount(spark: SparkSession, events: Dataset[Ev],
                                  windowMicros: Long,
                                  latenessMicros: Long = 0L,
                                  watermarkDelay: Option[String] = None): Dataset[FwOut] = {
    import spark.implicits._
    val src = watermarkDelay.map(d => events.withWatermark("ts", d)).getOrElse(events)
    val timeoutConf =
      if (watermarkDelay.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    // counts for the sorted buffer's prefix up to `cutoff` (exclusive of
    // already-emitted rows): lo/hi are the [t, t+w) bounds, both only
    // ever advancing — O(n) total
    def emitPrefix(arr: Array[(Long, Long)], cutoff: Long, emittedUpTo: Long): List[FwOut] = {
      val out = scala.collection.mutable.ListBuffer.empty[FwOut]
      var lo = 0; var hi = 0; var idx = 0
      while (idx < arr.length && arr(idx)._2 <= cutoff) {
        val (id, t) = arr(idx)
        while (arr(lo)._2 < t) lo += 1
        if (hi < lo) hi = lo
        while (hi < arr.length && arr(hi)._2 < t + windowMicros) hi += 1
        if (t > emittedUpTo) out += FwOut(id, (hi - lo).toLong)
        idx += 1
      }
      out.toList
    }

    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FwState, FwOut](OutputMode.Append, timeoutConf) {
        (_: Long, batch: Iterator[Ev], state: GroupState[FwState]) =>
          val prev = state.getOption.getOrElse(FwState(Long.MinValue, Long.MinValue, Nil))
          if (state.hasTimedOut) {
            // watermark >= mx + w + lateness: no in-horizon event can
            // still land in any buffered window — flush the tail exactly
            val arr = prev.buf.sortBy(_._2).toArray
            val out = emitPrefix(arr, Long.MaxValue, prev.emittedUpTo)
            state.remove()
            out.iterator
          } else {
            val incoming = batch.map(e =>
              (e.event_id, e.ts.getTime * 1000L + (e.ts.getNanos / 1000) % 1000)).toList
            val all = (prev.buf ++ incoming).sortBy(_._2)
            val mx = if (all.isEmpty) prev.maxTs else math.max(prev.maxTs, all.map(_._2).max)
            val cutoff = mx - windowMicros - latenessMicros
            val arr = all.toArray
            val out = emitPrefix(arr, cutoff, prev.emittedUpTo)
            state.update(FwState(mx, cutoff, all.filter { case (_, t) => t > cutoff }))
            if (timeoutConf == GroupStateTimeout.EventTimeTimeout && mx != Long.MinValue) {
              val atMs = (mx + windowMicros + latenessMicros) / 1000L + 1L
              state.setTimeoutTimestamp(math.max(atMs, state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  /** Event-time SESSION windows per key: activity separated by gaps
    * longer than `gap` starts a new session (Spark's native
    * `session_window` — merging windows in the state store, finalized
    * and emitted once the watermark passes a session's end). The
    * streaming twin of the batch gap-sessionize operator.
    */
  def sessionCounts(events: DataFrame, keyCol: String, tsCol: String,
                    gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"))

  /** Stream-stream interval join: pairs each left event with right
    * events of the same key landing in [left.ts, left.ts + bound]. Both
    * sides are watermarked, and the time-range predicate bounds the
    * state store on BOTH sides (Spark GC's buffered rows once the
    * watermark passes their join horizon — without the range condition
    * stream-stream state grows forever). The canonical
    * attribution/enrichment shape (click ⋈ conversions-within-1h).
    */
  def streamIntervalJoin(left: DataFrame, right: DataFrame,
                         keyCol: String, tsCol: String,
                         watermarkDelay: String, boundSeconds: Long): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay).alias("l")
    val r = right.withWatermark(tsCol, watermarkDelay).alias("r")
    l.join(r,
      expr(s"""l.$keyCol = r.$keyCol AND
              |r.$tsCol >= l.$tsCol AND
              |r.$tsCol <= l.$tsCol + interval $boundSeconds seconds""".stripMargin))
      .select(col(s"l.$keyCol").as(keyCol),
        col("l.event_id").as("left_id"), col("r.event_id").as("right_id"),
        col(s"l.$tsCol").as("left_ts"), col(s"r.$tsCol").as("right_ts"))
  }

  /** Stream-stream LEFT OUTER interval join — the outer-join-on-streams
    * semantics the inner form can't show: a left row with NO partner in
    * [ts, ts+bound] is emitted with null right columns, but only once
    * the watermark provably CLOSES its window (state-store eviction is
    * the emission trigger — before that, a partner could still arrive).
    * Matched rows emit on match, exactly as in [[streamIntervalJoin]];
    * the outer nulls are the late tail. Both state stores stay bounded
    * by the same watermark + range-condition GC as the inner join.
    *
    * The replay gate hash-checks the complete output (matches + null
    * rows) against the batch LEFT JOIN oracle — proving no left row is
    * dropped, duplicated, or null-emitted while a partner was still
    * admissible.
    */
  def streamIntervalJoinLeftOuter(left: DataFrame, right: DataFrame,
                                  keyCol: String, tsCol: String,
                                  watermarkDelay: String, boundSeconds: Long): DataFrame = {
    val l = left.withWatermark(tsCol, watermarkDelay).alias("l")
    val r = right.withWatermark(tsCol, watermarkDelay).alias("r")
    l.join(r,
      expr(s"""l.$keyCol = r.$keyCol AND
              |r.$tsCol >= l.$tsCol AND
              |r.$tsCol <= l.$tsCol + interval $boundSeconds seconds""".stripMargin),
      "leftOuter")
      .select(col(s"l.$keyCol").as(keyCol),
        col("l.event_id").as("left_id"), col("r.event_id").as("right_id"),
        col(s"l.$tsCol").as("left_ts"), col(s"r.$tsCol").as("right_ts"))
  }

  final case class AsOfIn(side: Int, id: Long, user_id: Long,
                          ts: java.sql.Timestamp, value: Double)
  final case class AsOfState(lefts: List[(Long, Long)],        // (event_id, tsMicros) pending emission
                             rights: List[(Long, Double)])     // (rtsMicros, max value), watermark-GC'd
  final case class AsOfOut(event_id: Long, asof_us: Option[Long],
                           asof_rvalue: Option[Double])

  /** STREAMING AS-OF JOIN (tenth stateful class): for each left event,
    * the latest right row with rts ≤ ts on the same key — LEFT
    * semantics, ties inclusive, duplicate right timestamps folded to
    * max(value) in state (the batch oracle's pre-aggregation, made
    * arrival-order-independent). Spark's stream-stream joins cannot
    * express "latest" (range predicates admit ALL partners), so this is
    * flatMapGroupsWithState over the union-tagged pair of streams.
    *
    * Emission discipline: a left row's match is only FINAL once the
    * watermark passes its timestamp (any later-arriving right at
    * rts ≤ ts would itself be late and dropped), so lefts buffer until
    * `ts < watermark` and flush either inline or on the event-time
    * TIMER armed at the earliest pending left — state-store eviction as
    * the emission trigger, the outer-interval-join discipline applied
    * to as-of.
    *
    * State per key is watermark-bounded: pending lefts sit inside the
    * watermark horizon by construction, and rights GC to (all rights
    * above the watermark) + the single latest right at/below it — the
    * one candidate any future left can still reach back to. A key with
    * no traffic keeps that O(1) right row (the streaming analog of the
    * batch dimension retention).
    */
  def streamingAsOfJoin(spark: SparkSession, in: Dataset[AsOfIn],
                        watermarkDelay: String): Dataset[AsOfOut] = {
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    in.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, AsOfOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, batch: Iterator[AsOfIn], state: GroupState[AsOfState]) =>
          val prev = state.getOption.getOrElse(AsOfState(Nil, Nil))
          var lefts = prev.lefts
          val rightsMap = scala.collection.mutable.HashMap.from(prev.rights)
          batch.foreach { e =>
            val us = micros(e.ts)
            if (e.side == 0) lefts ::= (e.id, us)
            else rightsMap.updateWith(us) {
              case Some(v) => Some(math.max(v, e.value))
              case None    => Some(e.value)
            }
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val rightsSorted = rightsMap.toArray.sortBy(_._1)
          // latest rts <= t via binary search over the sorted right table
          def matchFor(t: Long): Option[(Long, Double)] = {
            var lo = 0; var hi = rightsSorted.length
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (rightsSorted(mid)._1 <= t) lo = mid + 1 else hi = mid
            }
            if (lo == 0) None else Some(rightsSorted(lo - 1))
          }
          val (ready, pending) = lefts.partition(_._2 < wmUs)
          val out = ready.sortBy(l => (l._2, l._1)).map { case (id, t) =>
            matchFor(t) match {
              case Some((rts, v)) => AsOfOut(id, Some(rts), Some(v))
              case None           => AsOfOut(id, None, None)
            }
          }
          // rights GC: everything above the watermark plus the single
          // latest candidate at/below it
          val keepFrom = matchFor(wmUs).map(_._1).getOrElse(Long.MinValue)
          val rightsKept = rightsSorted.filter(_._1 >= keepFrom).toList
          if (pending.isEmpty && rightsKept.isEmpty) state.remove()
          else {
            state.update(AsOfState(pending, rightsKept))
            if (pending.nonEmpty) {
              val atMs = pending.map(_._2).min / 1000L + 1L
              state.setTimeoutTimestamp(math.max(atMs, state.getCurrentWatermarkMs() + 1L))
            }
          }
          out.iterator
      }
  }

  /** Streaming exact dedup: first occurrence of each content digest
    * passes, replays and duplicates are dropped; the watermark bounds the
    * digest state store (dedup keys older than the delay are GC'd — the
    * standard unbounded-stream tradeoff: exactness within the watermark
    * horizon). Uses `dropDuplicatesWithinWatermark`: a plain
    * dropDuplicates on the digest alone would never evict state (Spark
    * only GCs dedup state when the event-time column is in the subset),
    * growing the store for the life of the query.
    */
  def streamingDedup(docs: DataFrame, tsCol: String, contentCol: String,
                     watermarkDelay: String): DataFrame =
    docs
      .withColumn("__digest", md5(col(contentCol).cast("binary")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** At-ingest preprocessing funnel — the streaming twin of the batch
    * `ml_quality_funnel`: Gopher rule-set filter and language-ID gate
    * (STATELESS projections, composed from the same
    * [[graft.queries.TextQueries]] fragments as the batch query, so the
    * two tiers cannot drift), then exact-dedup keep-first
    * ([[streamingDedup]]'s watermark-bounded digest state). Stage order
    * is the production insight: the cheap stateless filters run BEFORE
    * the stateful dedup, so the digest state store only ever holds
    * documents that survived quality — at ingest rates the state-size
    * difference is the difference between a bounded store and OOM.
    * Emits surviving rows unchanged (plus nothing else: reason flags are
    * the batch query's job; the stream's job is admission).
    */
  def streamingQualityFunnel(docs: DataFrame, tsCol: String,
                             watermarkDelay: String): DataFrame = {
    import graft.queries.TextQueries.{gopherCntCols, gopherKeepSql, langCntCols, langCaseSql}
    val counted = docs.select(
      Seq(col("*")) ++ gopherCntCols ++ langCntCols: _*)
    val kept = counted
      .where(expr(gopherKeepSql) && expr(langCaseSql) =!= "und")
      .select(docs.columns.map(col).toIndexedSeq: _*)
    streamingDedup(kept, tsCol, "text", watermarkDelay)
  }

  /** Stream-static decontamination: incoming documents checked against a
    * STATIC benchmark shingle-hash table (`h: bigint`) — the in-flight
    * twin of the batch `dedup_decontaminate` pass. STATELESS by design:
    * the benchmark set is collapsed to one broadcast array row and the
    * overlap is a pure projection (`array_intersect`), so the query runs
    * in append mode with no state store, no watermark, and no shuffle —
    * eval suites are small, corpora are not; put the small side in the
    * row. Emits (doc_id, n_hits) for contaminated documents only.
    * Callers must `TextOps.ensureFunctions` on the session first.
    */
  def streamingDecontaminate(docs: DataFrame, benchmarkHashes: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val bm = broadcast(benchmarkHashes.agg(collect_set(col("h")).as("__bm")))
    docs
      .withColumn("__w", graft.ops.TextOps.wordsExpr)
      .select(col("doc_id"), graft.ops.TextOps.shinglesExpr.as("__sh"))
      .where(size(col("__sh")) > 0)
      .select(col("doc_id"), expr(
        s"transform(__sh, x -> ${graft.ops.TextOps.portableHash64Sql("'g'", "x")})").as("__hs"))
      .crossJoin(bm)
      .select(col("doc_id"),
        size(array_intersect(col("__hs"), col("__bm"))).cast("long").as("n_hits"))
      .where(col("n_hits") > 0)
  }

  final case class RlOut(event_id: Long, user_id: Long, win: Long, k: Long)

  /** Event-time rate limiter: per (key, tumbling window) admit the first
    * `cap` events in EVENT-TIME order and drop the rest — the per-source
    * ingestion cap every crawl/feed pipeline runs in front of expensive
    * stages (one hot feed must not monopolize a batch), as explicit
    * keyed state rather than best-effort sampling. Emits admitted rows
    * with their admission index k ∈ [1, cap].
    *
    * Parity contract: under an in-order feed (the replay harness sorts
    * by (ts, event_id); a production deployment gets the same guarantee
    * from a watermark + per-key buffering as in
    * [[streamingForwardWindowCount]]), the admitted set is EXACTLY the
    * batch rank filter `row_number() OVER (PARTITION BY key, window
    * ORDER BY ts, event_id) <= cap` — the oracle the gate checks.
    *
    * State per key is a (window → count) map PRUNED to windows at or
    * after the current batch's minimum: with non-decreasing event time
    * across batches nothing can land in an older window again, so state
    * is O(1) windows per key — the manual analog of watermark eviction
    * (kept explicit here because admission must act row-by-row, which a
    * windowed aggregate cannot).
    */
  def streamingRateLimit(spark: SparkSession, events: Dataset[Ev],
                         windowMicros: Long, cap: Int): Dataset[RlOut] = {
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Map[Long, Long], RlOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[Map[Long, Long]]) =>
          var counts = state.getOption.getOrElse(Map.empty[Long, Long])
          val evs = batch.toArray.sortBy(e => (micros(e.ts), e.event_id))
          val out = scala.collection.mutable.ListBuffer.empty[RlOut]
          evs.foreach { e =>
            val win = Math.floorDiv(micros(e.ts), windowMicros)
            val c = counts.getOrElse(win, 0L)
            if (c < cap) {
              counts = counts.updated(win, c + 1)
              out += RlOut(e.event_id, user, win, c + 1)
            }
          }
          if (evs.nonEmpty) {
            val minWin = Math.floorDiv(micros(evs.head.ts), windowMicros)
            counts = counts.filter { case (w, _) => w >= minWin }
          }
          state.update(counts)
          out.iterator
      }
  }

  final case class MaskOut(user_id: Long, hour_mask: Long, day_mask: Long)

  /** Streaming presence bitmasks — the at-ingest twin of the batch
    * `q_presence_bitmask`: per-user hour-of-day and day-of-week sets
    * maintained as two BIGINT bit_or masks in keyed state (16 bytes per
    * user, CRDT-monotone: updates only ever set bits). Each micro-batch
    * folds its arrivals into the masks and emits the current value in
    * UPDATE mode; because the state is a join-semilattice, the bit_or
    * of ALL emitted updates equals the final state — consumers (and the
    * replay gate) can merge update streams without ordering guarantees,
    * the same property that makes the masks map-side combinable in
    * batch. No watermark/timeout: presence is cumulative by definition;
    * a deployment that wants a sliding horizon adds a timeout like
    * [[streamingDedup]].
    */
  def streamingPresenceMask(spark: SparkSession,
                            events: Dataset[Ev]): Dataset[MaskOut] = {
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long), MaskOut](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[(Long, Long)]) =>
          var (hm, dm) = state.getOption.getOrElse((0L, 0L))
          batch.foreach { e =>
            val us = micros(e.ts)
            hm |= 1L << (Math.floorDiv(us, 3600000000L) % 24)
            dm |= 1L << (Math.floorDiv(us, 86400000000L) % 7)
          }
          state.update((hm, dm))
          MaskOut(user, hm, dm)
      }
  }

  final case class BandDoc(band: Int, bh: String, doc_id: Long)
  final case class CandPair(i: Long, j: Long, band: Int)

  /** Streaming NEAR-dup candidates — the at-ingest twin of the batch
    * `dedup_minhash_lsh` candidate stage: each arriving document is
    * tokenized, shingled, minhash-signed (the native [[graft.functions
    * .MinHashSig]] one-pass kernel) and banded map-only; keyed state per
    * (band, band-hash) BUCKET then emits a candidate pair against every
    * document already resident in that bucket. Downstream verifies
    * exact Jaccard exactly as in batch (candidates may repeat across
    * bands — dedup with the verify, same as the batch `.distinct()`).
    *
    * Scale shape: state per bucket is a doc_id list, bounded by
    * `maxBucket` — a saturated bucket (degenerate band, e.g. boilerplate
    * text) stops BOTH emitting and admitting, so the pair fan-out, the
    * state list and the per-arrival membership scan all stay capped
    * instead of going quadratic — the same guard a batch LSH join needs
    * against skewed band keys. State never times
    * out here (a corpus accepts docs forever); production bounds the
    * horizon with a ValueState TTL / watermark timeout like
    * [[streamingDedup]] when "duplicate of something older than N days"
    * is acceptable.
    */
  def streamingNearDupCandidates(spark: SparkSession, docs: DataFrame,
                                 k: Int = 16, bands: Int = 8, r: Int = 2,
                                 maxBucket: Int = 64): Dataset[CandPair] = {
    import spark.implicits._
    graft.ops.TextOps.ensureFunctions(spark)
    val hs = docs
      .withColumn("__w", graft.ops.TextOps.wordsExpr)
      .select(col("doc_id"), graft.ops.TextOps.shinglesExpr.as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("doc_id"), graft.ops.TextOps.sortedShingleHashes().as("hs"))
    // pin = false: an aggregate barrier is illegal before arbitrary
    // stateful ops in a streaming query; the banding is map-only here
    val sigs = graft.ops.TextOps.bandedSignatures(hs, k, bands, r, pin = false)
      .select(col("band"), col("bh"), col("doc_id"))
      .as[BandDoc]
    sigs
      .groupByKey(bd => (bd.band, bd.bh))
      .flatMapGroupsWithState[List[Long], CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((band, _), rows, state) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.ListBuffer[CandPair]()
          rows.toSeq.sortBy(_.doc_id).foreach { bd =>
            // saturated bucket: neither emit nor grow state — the cap
            // bounds BOTH the pair fan-out and the state list (and the
            // O(|seen|) contains scan), which is the point of the guard
            if (seen.size < maxBucket && !seen.contains(bd.doc_id)) {
              seen.foreach(p => out += CandPair(
                math.min(p, bd.doc_id), math.max(p, bd.doc_id), band))
              seen = bd.doc_id :: seen
            }
          }
          state.update(seen)
          out.iterator
      }
  }

  /** Incrementally-maintained per-station hour profile (the Redis hash
    * `{station}_{hour} -> counts` as proper keyed state). Emits the
    * updated (station, hour, running count) rows per micro-batch.
    *
    * `zone` must match `spark.sql.session.timeZone` for parity with the
    * batch profile (TimeKeys.hourKey = `hour(ts)` follows the session
    * zone); the UTC default matches every engine entry point, which pins
    * the session to UTC. Never the JVM default zone — that would vary by
    * host.
    */
  /** Streaming sketch build: per watermarked tumbling window, the
    * Count-Min counter array and KMV distinct estimate over a token-hash
    * stream. The TypedImperativeAggregates merge each micro-batch's
    * partial into the window's state-store entry exactly as they merge
    * map-side partials in batch — so per-window state stays CONSTANT
    * (32 KB CMS + k·8 B KMV) no matter how many rows stream through:
    * the monitoring-dashboard shape (per-hour heavy-hitter and
    * cardinality panels) with bounded state and exact batch parity
    * (StreamingSpec pins replay equivalence against the batch
    * aggregate). Input is the already-hashed LongType column, same
    * hash-agnostic contract as the batch family.
    */
  def streamingTokenSketch(docs: DataFrame, tsCol: String, hvCol: String,
                           duration: String, watermarkDelay: String,
                           valCol: Option[String] = None): DataFrame = {
    graft.functions.CMSketch.register(docs.sparkSession)
    graft.functions.KMVDistinct.register(docs.sparkSession)
    graft.functions.QuantileSketch.register(docs.sparkSession)
    val base = Seq(
      expr(s"cms_sketch($hvCol, 4, 1024)").as("cms"),
      expr(s"kmv_distinct($hvCol, 64)").as("kmv"))
    // optional fourth sketch: per-window value-distribution quantiles
    // (e.g. doc lengths keyed by doc-hash) — the bottom-k sample merges
    // across micro-batches like the others (pure function of the
    // window's row SET, so late arrivals within the watermark can't
    // change the converged result either)
    val aggs = base ++ valCol.map(v =>
      expr(s"sample_quantiles($hvCol, $v, 128, array(0.25D, 0.5D, 0.95D))").as("qs"))
    val out = Seq(col("w.start").as("ws"), col("cms"), col("kmv")) ++
      valCol.map(_ => col("qs"))
    docs.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), duration).as("w"))
      .agg(aggs.head, aggs.tail: _*)
      .select(out: _*)
  }

  final case class CdcIn(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
                         op: String, value: Option[Double])
  final case class CdcState(lastUs: Long, lastId: Long, present: Boolean,
                            value: Option[Double], ver: Long)
  final case class CdcOut(user_id: Long, ver: Long, present: Boolean, value: Option[Double])

  /** CDC apply: maintain the CURRENT row per key from a changelog stream
    * of upserts ('U' carries the new value) and deletes ('D') — the
    * streaming twin of the batch q_merge_upsert / q_changelog_compact
    * pair, and the keyed-state materialization every CDC-fed feature
    * store runs. Events apply in strict (ts, event_id) order: the
    * replay feeds chronologically-ordered micro-batches, each batch's
    * iterator is sorted locally, and a persisted (lastUs, lastId)
    * frontier drops stale/duplicate deliveries (at-least-once safe).
    * Emits the key's updated state each trigger it changed, stamped
    * with a monotone per-key version (= applied-op count) so a reader
    * can take max-version per key as the materialized table. State is
    * O(1) per key — a current-row store, the smallest stateful shape.
    */
  def streamingCdcApply(spark: SparkSession, in: Dataset[CdcIn]): Dataset[CdcOut] = {
    import spark.implicits._
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState[CdcState, CdcOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: Long, batch: Iterator[CdcIn], state: GroupState[CdcState]) =>
          val prev = state.getOption.getOrElse(
            CdcState(Long.MinValue, Long.MinValue, present = false, None, 0L))
          var st = prev
          batch.toArray.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val us = micros(e.ts)
            val fresh = us > st.lastUs || (us == st.lastUs && e.event_id > st.lastId)
            if (fresh)
              st =
                if (e.op == "D") CdcState(us, e.event_id, present = false, None, st.ver + 1)
                else CdcState(us, e.event_id, present = true, e.value, st.ver + 1)
          }
          if (st.ver > prev.ver) {
            state.update(st)
            Iterator.single(CdcOut(k, st.ver, st.present, st.value))
          } else Iterator.empty
      }
  }

  def runningHourProfile(spark: SparkSession, events: Dataset[Ev],
                         zone: java.time.ZoneId = java.time.ZoneOffset.UTC): Dataset[ProfileRow] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Map[Int, Long], ProfileRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Ev], state: GroupState[Map[Int, Long]]) =>
          val prev = state.getOption.getOrElse(Map.empty[Int, Long])
          val add = batch.toSeq
            .groupBy(e => java.time.Instant.ofEpochMilli(e.ts.getTime)
              .atZone(zone).getHour)
            .view.mapValues(_.size.toLong).toMap
          val next = (prev.keySet ++ add.keySet).map { h =>
            h -> (prev.getOrElse(h, 0L) + add.getOrElse(h, 0L))
          }.toMap
          state.update(next)
          add.keysIterator.map(h => ProfileRow(user, h, next(h)))
      }
  }
}
