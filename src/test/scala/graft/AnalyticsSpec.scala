package graft

import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the event-sequence analytics queries —
  * the oracle gate proves cross-engine parity, but on the synthetic
  * corpus the ordering/window constraints barely bite; these fixtures
  * make each constraint the deciding factor.
  */
class AnalyticsSpec extends SparkSpec {

  private def run(q: graft.queries.QueryDef,
                  rows: Seq[(Long, java.sql.Timestamp, Long, String)]) = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("events").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    q.run(spark, tmp)
  }

  test("conversion funnel: ordering and 6h windows decide, not mere existence") {
    // user 1: view 10:00 -> click 11:00 -> purchase 12:00  (converts fully)
    // user 2: click 09:00 BEFORE first view 10:00; no later click -> stops at view
    // user 3: view 10:00 -> click 17:00 (7h later, outside window) -> stops at view
    // user 4: view -> click 11:00 -> purchase 18:30 (7.5h after click) -> stops at click
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 11:00:00"), 1L, "click"),
      (3L, ts("2024-01-01 12:00:00"), 1L, "purchase"),
      (4L, ts("2024-01-01 09:00:00"), 2L, "click"),
      (5L, ts("2024-01-01 10:00:00"), 2L, "view"),
      (6L, ts("2024-01-01 10:00:00"), 3L, "view"),
      (7L, ts("2024-01-01 17:00:00"), 3L, "click"),
      (8L, ts("2024-01-01 10:00:00"), 4L, "view"),
      (9L, ts("2024-01-01 11:00:00"), 4L, "click"),
      (10L, ts("2024-01-01 18:30:00"), 4L, "purchase"))
    val got = run(graft.queries.BicisQueries.qConversionFunnel, rows)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === Seq(
      (1L, 1, 1, 1),
      (2L, 1, 0, 0), // click existed but BEFORE the first view
      (3L, 1, 0, 0), // click outside the 6h window
      (4L, 1, 1, 0)  // purchase outside the 6h window after the click
    ))
  }

  test("retention cohorts: users split by first week; absence leaves a smaller cell, not a zero row") {
    // user 1 first active week of Mon 2024-01-01, returns week 1 and week 2
    // user 2 same cohort, returns week 2 only
    // user 3 cohort of week Mon 2024-01-08, never returns
    val rows = Seq(
      (1L, ts("2024-01-02 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-09 10:00:00"), 1L, "click"),
      (3L, ts("2024-01-16 10:00:00"), 1L, "view"),
      (4L, ts("2024-01-03 10:00:00"), 2L, "view"),
      (5L, ts("2024-01-17 10:00:00"), 2L, "view"),
      (6L, ts("2024-01-10 10:00:00"), 3L, "view"))
    val got = run(graft.queries.BicisQueries.qRetentionCohort, rows)
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 0L, 2L), // both cohort-1 users active in week 0
      ("2024-01-01", 1L, 1L), // only user 1 returned in week 1
      ("2024-01-01", 2L, 2L), // both returned in week 2
      ("2024-01-08", 0L, 1L)  // user 3's one-week cohort
    ))
  }

  test("series_anomaly: planted spike fires; warm-up and self-exclusion hold") {
    import spark.implicits._
    // one user, 40 minutely events alternating 9/11 (sd ≈ 1), with a
    // 100.0 spike at index 4 (only 4 prior events — under the 12-event
    // warm-up floor, must NOT fire) and at index 30 (24 clean priors —
    // must fire). Neighbors of the spikes stay quiet: rows before the
    // late spike never see it (trailing frame excludes self), rows
    // after it absorb it INTO their window stats, inflating sd and
    // suppressing z — the self-exclusion/contamination geometry that
    // the oracle's hash can't articulate.
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val rows = (0 until 40).map { i =>
      val v = if (i == 4 || i == 30) 100.0 else if (i % 2 == 0) 9.0 else 11.0
      (i.toLong, new java.sql.Timestamp(base + i * 60000L), 1L, "view", v)
    }
    val tmp = java.nio.file.Files.createTempDirectory("anomaly").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.BicisQueries.seriesAnomaly.run(spark, tmp).collect()
    assert(got.map(_.getAs[Long]("event_id")).toSeq === Seq(30L),
      s"flagged set was ${got.map(_.getAs[Long]("event_id")).mkString(",")}")
    assert(got.head.getAs[Double]("z") >= 3.0)
    assert(got.head.getAs[Double]("mu") === 10.0)
  }

  test("q_skyline: planted frontier — dominated and duplicate points drop, incomparable points survive") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("skyline").toString
    // one segment; (n_orders, spend): A(3,300) B(2,400) C(1,500) keep —
    // pairwise incomparable; D(2,350) dominated by B on both; E(1,100)
    // dominated by everyone; F duplicates B exactly — lowest-key B wins
    val orders = Seq(
      (1L, 100.0), (1L, 100.0), (1L, 100.0), // A = cust 1
      (2L, 200.0), (2L, 200.0),              // B = cust 2
      (3L, 500.0),                           // C
      (4L, 175.0), (4L, 175.0),              // D
      (5L, 100.0),                           // E
      (9L, 200.0), (9L, 200.0))              // F = duplicate of B, higher key
    orders.toDF("o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    (1L to 9L).map(k => (k, "SEG")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
    val got = graft.queries.RelationalQueries.qSkyline.run(spark, tmp)
      .collect().map(r => (r.getAs[Long]("cust"), r.getAs[Long]("n_orders"),
        r.getAs[Double]("spend")))
    assert(got.toSeq === Seq((3L, 1L, 500.0), (2L, 2L, 400.0), (1L, 3L, 300.0)),
      s"frontier was ${got.mkString(",")}")
  }

  test("q_interval_coverage: overlap and touch merge, gaps split, duplicates are absorbed") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-05-01 00:00:00").getTime
    def at(s: Long) = new java.sql.Timestamp(base + s * 1000L)
    // user 1: [0,10]+[5,20] overlap → merge; [20,25] TOUCHES → same
    // island; [40,45] gapped → second island; duplicate [40,45] absorbs.
    // user 2: one zero-length interval (value 0) → 1 island, 0 covered
    val rows = Seq(
      (1L, at(0), 1L, "e", 10.0), (2L, at(5), 1L, "e", 15.0),
      (3L, at(20), 1L, "e", 5.0), (4L, at(40), 1L, "e", 5.0),
      (5L, at(40), 1L, "e", 5.0), (6L, at(100), 2L, "e", 0.4))
    val tmp = java.nio.file.Files.createTempDirectory("coverage").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.BicisQueries.qIntervalCoverage.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_islands"),
        r.getAs[Long]("covered_us")))
    assert(got.toSeq === Seq((1L, 2L, 30000000L), (2L, 1L, 0L)),
      s"coverage was ${got.mkString(",")}")
  }

  test("sketch_setops: under-k vocabularies make every estimate the exact count") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("setops").toString
    // |en| = 3, |fr| = 4, overlap {banana, cherry} → union 5, intersect 2;
    // both under k=64 so KMV's small-set branch returns exact cardinality
    Seq((1L, "apple banana cherry", "en"),
        (2L, "banana cherry durian elderberry", "fr"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = graft.queries.TextQueries.sketchSetops.run(spark, tmp).collect().head
    assert(r.getAs[Double]("est_en") === 3.0)
    assert(r.getAs[Double]("est_fr") === 4.0)
    assert(r.getAs[Double]("est_union") === 5.0)
    assert(r.getAs[Double]("est_intersect") === 2.0)
  }

  test("series_seasonality: pure rhythm scores 1, pure cross-day noise scores 0, flat users drop") {
    import spark.implicits._
    // user 1: identical hour profile on both days (h10: 2 events, h11: 1)
    //   -> per-hour means explain everything -> strength 1.0
    // user 2: same hour, different days (1 vs 3 events) -> hour mean
    //   explains nothing -> strength 0.0
    // user 3: one cell only -> SST = 0 -> filtered out
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"), (2L, ts("2024-01-01 10:30:00"), 1L, "view"),
      (3L, ts("2024-01-01 11:00:00"), 1L, "view"),
      (4L, ts("2024-01-02 10:00:00"), 1L, "view"), (5L, ts("2024-01-02 10:30:00"), 1L, "view"),
      (6L, ts("2024-01-02 11:00:00"), 1L, "view"),
      (7L, ts("2024-01-01 09:00:00"), 2L, "view"),
      (8L, ts("2024-01-02 09:00:00"), 2L, "view"), (9L, ts("2024-01-02 09:10:00"), 2L, "view"),
      (10L, ts("2024-01-02 09:20:00"), 2L, "view"),
      (11L, ts("2024-01-01 12:00:00"), 3L, "view"))
    val tmp = java.nio.file.Files.createTempDirectory("season").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.BicisQueries.seriesSeasonality.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((1L, 4L, 1.0), (2L, 2L, 0.0)), s"got $got")
  }

  test("ml_dp_histogram: noise equals the md5 closed form, deterministic across runs") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 10:01:00"), 1L, "view"),
      (3L, ts("2024-01-01 10:02:00"), 2L, "click"))
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    def expectedNoise(eventType: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dp:$eventType".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      val u = (h % 999999L + 1L) / 1000001.0 - 0.5
      -1.0 * math.signum(u) * math.log(1 - 2 * math.abs(u))
    }
    def fetch() = graft.queries.MlQueries.mlDpHistogram.run(spark, tmp)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = fetch()
    assert(a.map(_._1) === Seq("click", "view"))
    a.foreach { case (et, n, dp) =>
      val want = BigDecimal(n + expectedNoise(et))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(dp === want, s"$et: dp_n $dp != closed form $want")
      assert(dp !== n.toDouble, s"$et: noise collapsed to zero")
      assert(math.abs(dp - n) < 14.0, s"$et: noise outside the bounded-u envelope")
    }
    assert(fetch() === a, "release is not deterministic")
  }

  test("q_histogram: unit-spaced fixture fills every bin; the max value folds into the last") {
    import spark.implicits._
    // prices 0..16: min 0, max 16, width 1 — bin i holds value i for
    // i < 15, and bin 15 holds BOTH 15 and 16 (the least() fold that
    // keeps x == max in range)
    val tmp = java.nio.file.Files.createTempDirectory("hist").toString
    (0 to 16).map(i => (i.toLong, i.toDouble)).toDF("l_orderkey", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = graft.queries.RelationalQueries.qHistogram.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    val expected = (0L to 15L).map(i =>
      (i, if (i == 15L) 2L else 1L, i.toDouble, (i + 1).toDouble))
    assert(got === expected)
  }

  test("series_cusum: planted level shift breaks at the step; flat and short users drop") {
    import spark.implicits._
    // user 1: 15 days at 2/day then 15 days at 8/day — mean 5, S_t adds
    // −3/day through day 15 (|S| peaks at 45 on the last low day) then
    // +3/day back to 0: break date = the last LOW day, stat =
    // 45/sqrt(var·N) with var = 270/29 exactly
    // user 2: 20 flat days (zero variance) — filtered
    // user 3: 10 days (under the 14-day floor) — filtered
    val base = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime
    def day(d: Int) = base + d * 86400000L
    var id = 0L
    val rows =
      (0 until 30).flatMap { d =>
        val n = if (d < 15) 2 else 8
        (0 until n).map { j => id += 1; (id, new java.sql.Timestamp(day(d) + j * 60000L), 1L, "view", 1.0) }
      } ++
      (0 until 20).map { d => id += 1; (id, new java.sql.Timestamp(day(d)), 2L, "view", 1.0) } ++
      (0 until 10).flatMap { d =>
        (0 until (d % 3 + 1)).map { j => id += 1; (id, new java.sql.Timestamp(day(d) + j * 60000L), 3L, "view", 1.0) }
      }
    val tmp = java.nio.file.Files.createTempDirectory("cusum").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.BicisQueries.seriesCusum.run(spark, tmp).collect()
    assert(got.map(_.getAs[Long]("user_id")).toSeq === Seq(1L),
      s"emitted users: ${got.map(_.getAs[Long]("user_id")).mkString(",")}")
    val r = got.head
    assert(r.getAs[java.sql.Date]("break_date").toString === "2024-02-15") // last 2/day day
    val expStat = math.rint(45.0 / math.sqrt(270.0 / 29.0 * 30.0) * 1e6) / 1e6
    assert(r.getAs[Double]("cusum_stat") === expStat)
    assert(r.getAs[Double]("cusum_stat") > 1.3) // clears the Brownian-bridge 5% line
  }

  test("series_cross_corr: purchases shifted +2h peak the xcorr at exactly lag 2") {
    import spark.implicits._
    // clicks follow a varying hourly pattern p(h); purchases replay the
    // SAME counts 2 hours later — lag 2 pairs are identical series
    // (xcorr 1.0 exactly under integer moments), every other lag pairs
    // misaligned values and scores strictly lower. The zero-filled
    // spine is load-bearing: hours where only one side is active enter
    // as 0, not dropped.
    val base = java.sql.Timestamp.valueOf("2024-06-01 00:00:00").getTime
    def p(h: Int) = 1 + (h * 7) % 5
    var id = 0L
    val rows =
      (0 until 24).flatMap { h =>
        (0 until p(h)).map { j => id += 1; (id, new java.sql.Timestamp(base + h * 3600000L + j * 1000L), 1L, "click", 1.0) }
      } ++
      (0 until 24).flatMap { h =>
        (0 until p(h)).map { j => id += 1; (id, new java.sql.Timestamp(base + (h + 2) * 3600000L + j * 1000L), 1L, "purchase", 1.0) }
      }
    val tmp = java.nio.file.Files.createTempDirectory("xcorr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.BicisQueries.seriesCrossCorr.run(spark, tmp)
      .collect().map(r => r.getAs[Long]("lag") -> r.getAs[Double]("xcorr")).toMap
    assert(got(2L) === 1.0, s"lag-2 xcorr was ${got(2L)}")
    Seq(0L, 1L, 3L).foreach(l => assert(got(l) < 1.0, s"lag $l also scored ${got(l)}"))
  }

  test("ml_epoch_order: a true permutation — shard-dense positions, full coverage, run-stable, not id order") {
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.MlQueries.mlEpochOrder
    val a = q.run(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every doc exactly once
    val docs = graft.core.Tables.documents(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a.map(_._3).sorted.toSeq === docs)
    // positions within each shard are dense 1..n_s
    a.groupBy(_._1).foreach { case (s, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.length).toSeq, s"shard $s positions not dense")
    }
    // deterministic across runs
    val b = q.run(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(a.toSeq === b.toSeq)
    // actually shuffles: within some shard, visit order inverts doc_id order
    assert(a.groupBy(_._1).values.exists { rs =>
      val order = rs.sortBy(_._2).map(_._3)
      order.zip(order.tail).exists { case (x, y) => x > y }
    }, "epoch order is doc_id order — no permutation happened")
  }

  test("series_snaive_eval: a perfect weekly rhythm scores MASE 0; a linear trend scores exactly 7") {
    // user 1: daily counts cycle 1..7 over 28 days — every eval day's
    // seasonal forecast is exact (se = 0 -> mase 0) while the naive
    // denominator is positive. user 2: count = day index + 1 — each eval
    // day errs by 7 seasonally and 1 naively -> mase = 7 exactly.
    var id = 0L
    val rows = for {
      (user, countOf) <- Seq(1L -> ((d: Int) => d % 7 + 1), 2L -> ((d: Int) => d + 1))
      d <- 0 until 28
      _ <- 1 to countOf(d)
    } yield {
      id += 1
      (id, ts(f"2024-01-${d + 1}%02d 12:00:00"), user, "click")
    }
    val got = run(graft.queries.BicisQueries.seriesSnaiveEval, rows)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4))).toSeq
    assert(got === Seq((1L, 21L, 0.0), (2L, 21L, 7.0)), s"got $got")
  }

  test("series_m4_downsample: min/max/first/last are selections; ts ties resolve by event_id") {
    import spark.implicits._
    // one user, one day: values arrive 5.0, 1.0, 9.0, 3.0 — and the LAST
    // two rows share a timestamp, so vlast must follow the higher event_id
    val rows = Seq(
      (1L, ts("2024-01-01 08:00:00"), 1L, "click", 5.0),
      (2L, ts("2024-01-01 09:00:00"), 1L, "click", 1.0),
      (3L, ts("2024-01-01 10:00:00"), 1L, "click", 9.0),
      (4L, ts("2024-01-01 10:00:00"), 1L, "click", 3.0))
    val tmp = java.nio.file.Files.createTempDirectory("m4").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = graft.queries.BicisQueries.seriesM4Downsample.run(spark, tmp).collect()
    assert(r.length === 1)
    val (n, vmin, vmax, vfirst, vlast) =
      (r(0).getLong(2), r(0).getDouble(3), r(0).getDouble(4), r(0).getDouble(5), r(0).getDouble(6))
    assert((n, vmin, vmax, vfirst, vlast) === ((4L, 1.0, 9.0, 5.0, 3.0)))
  }

  test("q_decile_profile: ntile heights differ by at most one and spend fenceposts nest") {
    val r = graft.queries.RelationalQueries.qDecileProfile.run(spark, "/root/testdata/sf0.001")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(4), x.getDouble(5)))
    assert(r.length === 10 && r.map(_._1).toSeq === (1L to 10L).toSeq)
    val sizes = r.map(_._2)
    assert(sizes.max - sizes.min <= 1, s"ntile heights not equal-height: ${sizes.toSeq}")
    // decile d's floor must be >= decile d+1's top (descending spend order)
    r.sliding(2).foreach { case Array((d, _, _, floor), (_, _, top2, _)) =>
      assert(floor >= top2, s"decile $d floor $floor below next top $top2")
    }
  }

  test("q_ab_test: planted shifted groups score Welch t = -6 and df = 8 exactly") {
    import spark.implicits._
    // both groups have variance 2.5 over n=5; means 10 vs 16 ->
    // t = -6/sqrt(0.5+0.5) = -6, Welch df = 1/( (0.5)^2/4 * 2 ) = 8
    var id = 0L
    def g(name: String, vals: Seq[Double]) = vals.map { v =>
      id += 1; (id, ts("2024-01-01 10:00:00"), 1L, name, v)
    }
    val rows = g("alpha", Seq(8.0, 9.0, 10.0, 11.0, 12.0)) ++
      g("beta", Seq(14.0, 15.0, 16.0, 17.0, 18.0))
    val tmp = java.nio.file.Files.createTempDirectory("abtest").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val r = graft.queries.RelationalQueries.qAbTest.run(spark, tmp).head()
    assert(r.getString(0) === "alpha" && r.getString(1) === "beta")
    assert(r.getDouble(6) === -6.0, s"t was ${r.getDouble(6)}")
    assert(r.getDouble(7) === 8.0, s"df was ${r.getDouble(7)}")
    assert(r.getLong(8) === 1L, "shift of 6 pooled sd must flag significant")
  }

  test("series_trend: a perfect linear ramp fits slope 1 / R2 1; a constant user is filtered") {
    var id = 0L
    val rows = (for {
      (user, countOf) <- Seq(1L -> ((d: Int) => d + 1), 2L -> ((_: Int) => 3))
      d <- 0 until 20
      _ <- 1 to countOf(d)
    } yield { id += 1; (id, ts(f"2024-01-${d + 1}%02d 12:00:00"), user, "click") })
    val got = run(graft.queries.BicisQueries.seriesTrend, rows)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === Seq((1L, 1.0, 1.0, 1.0)),
      s"constant user must drop (zero y-variance), ramp fits exactly: $got")
  }

  test("series_burstiness: clockwork gaps score -1; alternating near-zero/huge gaps approach 0") {
    var id = 0L
    def user(uid: Long, gapsSec: Seq[Int]) = {
      var t = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
      (Seq(t) ++ gapsSec.map { g => t = t.plusSeconds(g); t }).map { ts0 =>
        id += 1
        (id, java.sql.Timestamp.valueOf(ts0), uid, "click")
      }
    }
    // user 1: 21 exactly-hourly gaps -> sigma 0 -> B = -1 (round-6 absorbs
    // the ~1e-8 float residue of the big-magnitude moment difference);
    // user 2: alternating 1 s / 3599 s -> sigma ~ mu, B near the Poisson 0
    // (the 11/10 gap-count imbalance lands it a hair above)
    val rows = user(1L, Seq.fill(21)(3600)) ++
      user(2L, (1 to 21).map(i => if (i % 2 == 1) 1 else 3599))
    val got = run(graft.queries.BicisQueries.seriesBurstiness, rows)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) === -1.0, s"clockwork user scored ${got(1L)}")
    assert(math.abs(got(2L)) < 0.1, s"alternating user scored ${got(2L)}, expected near 0")
  }

  test("q_chi2_independence: perfect association scores Cramer's V = 1; a balanced table scores 0") {
    var id = 0L
    def ev(day: String, tpe: String, k: Int) = (1 to k).map { _ =>
      id += 1; (id, ts(s"$day 10:00:00"), 1L, tpe)
    }
    // 2024-01-01 is a Monday, 01-02 a Tuesday
    val dependent = ev("2024-01-01", "alpha", 10) ++ ev("2024-01-02", "beta", 10)
    val r1 = run(graft.queries.RelationalQueries.qChi2Independence, dependent).head()
    assert(r1.getLong(0) === 20L && r1.getLong(1) === 1L)
    assert(r1.getDouble(2) === 20.0, s"chi2 was ${r1.getDouble(2)}")   // chi2 = n for a perfect 2x2
    assert(r1.getDouble(3) === 1.0, s"V was ${r1.getDouble(3)}")
    id = 0L
    val balanced = ev("2024-01-01", "alpha", 5) ++ ev("2024-01-02", "alpha", 5) ++
      ev("2024-01-01", "beta", 5) ++ ev("2024-01-02", "beta", 5)
    val r2 = run(graft.queries.RelationalQueries.qChi2Independence, balanced).head()
    assert(r2.getDouble(2) === 0.0 && r2.getDouble(3) === 0.0,
      s"independent table scored chi2=${r2.getDouble(2)}, V=${r2.getDouble(3)}")
  }

  test("q_merge_upsert: every MERGE branch decides correctly, including the null-op kept class") {
    import spark.implicits._
    // base keys (orders < 1997): 10, 20, 30, 40. change source rows are
    // orders >= 1997 whose key-1 remap targets: 10 (P->U update),
    // 20 (F->D delete), 30 (O->I collide: drop), 99 (O->I insert),
    // 98 (P->U no-op: unmatched), while base 40 is untouched -> kept
    def o(key: Long, status: String, price: Double, date: String) =
      (key, 1L, status, price, ts(s"$date 00:00:00"), "1-URGENT")
    val rows = Seq(
      o(10L, "O", 100.0, "1996-01-01"), o(20L, "O", 200.0, "1996-01-02"),
      o(30L, "O", 300.0, "1996-01-03"), o(40L, "O", 400.0, "1996-01-04"),
      o(11L, "P", 555.0, "1997-06-01"),  // -> key 10, update
      o(21L, "F", 666.0, "1997-06-02"),  // -> key 20, delete
      o(31L, "O", 777.0, "1997-06-03"),  // -> key 30, colliding insert: drop
      o(100L, "O", 888.0, "1997-06-04"), // -> key 99, clean insert
      o(99L, "P", 999.0, "1997-06-05"))  // -> key 98, unmatched update: no-op
    val tmp = java.nio.file.Files.createTempDirectory("merge").toString
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = graft.queries.RelationalQueries.qMergeUpsert.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === Seq(
      (10L, "updated", 610.5),   // 555.0 * 1.1 exact in decimal
      (40L, "kept", 400.0),
      (99L, "inserted", 888.0)), s"got $got")
  }

  test("series_acf core: planted period-2 rhythm scores -1/+1 exactly; a flat series is NULL") {
    import spark.implicits._
    // alternating 0,4,0,4,... over 11 days: lag-1 pairs are perfectly
    // anti-phase (-1), lag-2 pairs in phase (+1) — both EXACT under the
    // integer-moment formula (x == y at even lags makes corr 1 by identity)
    val alt = (0L to 10L).map(d => (d, if (d % 2 == 0) 0L else 4L)).toDF("d", "n")
    val got = graft.queries.BicisQueries.acfOf(spark, alt, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) === -1.0 && got(3L) === -1.0, s"odd lags: $got")
    assert(got(2L) === 1.0 && got(4L) === 1.0, s"even lags: $got")
    // zero-variance series: the nullif guard yields NULL, not a 0/0 abort
    val flat = (0L to 9L).map(d => (d, 7L)).toDF("d", "n")
    val flatRows = graft.queries.BicisQueries.acfOf(spark, flat, 2).collect()
    assert(flatRows.length === 2 && flatRows.forall(_.isNullAt(2)),
      "flat series must emit NULL acf per lag")
  }

  test("scd2 apply: incremental merge == full rebuild (differential); actions partition the rows") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 3 keys: key 1 has history + batch rows (close + chain), key 2 has
    // history only (stays current), key 3 is batch-only (new key)
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
      (2L, ts("2024-01-02 10:00:00"), 1L, "b", 2.0),
      (3L, ts("2024-01-01 09:00:00"), 2L, "a", 3.0),
      (4L, ts("2024-01-10 08:00:00"), 1L, "c", 4.0),   // batch (cut = Jan 5)
      (5L, ts("2024-01-11 08:00:00"), 1L, "d", 5.0),   // batch
      (6L, ts("2024-01-12 08:00:00"), 3L, "a", 6.0))   // batch, new key
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val cut = lit("2024-01-05 00:00:00").cast("timestamp")
    val applied = graft.queries.BicisQueries.scd2Apply(rows, cut)

    // differential: apply(dim(<cut), batch(>=cut)) == rebuild over ALL rows
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val rebuilt = rows.select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts").as("valid_from"), lead(col("ts"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
    val a = applied.drop("action").collect().map(_.toString).toSet
    val b = rebuilt.collect().map(_.toString).toSet
    assert(a == b, s"apply diverged from rebuild: only-apply=${(a -- b).take(3)} only-rebuild=${(b -- a).take(3)}")

    // action semantics: key 1's current row closed AT the batch's first
    // ts; key 2 untouched current; key 3 all-new with one open row
    val byAction = applied.collect()
      .groupBy(_.getAs[String]("action")).view.mapValues(_.toSeq).toMap
    assert(byAction("closed").map(r => (r.getAs[Long]("event_id"),
      r.getAs[java.sql.Timestamp]("valid_to"))) ==
      Seq((2L, ts("2024-01-10 08:00:00"))), "close must hit key 1's open row at first batch ts")
    assert(byAction("current").map(_.getAs[Long]("event_id")) == Seq(3L),
      "key 2 must stay current")
    assert(byAction("kept").map(_.getAs[Long]("event_id")) == Seq(1L))
    assert(byAction("new").map(_.getAs[Long]("event_id")).sorted == Seq(4L, 5L, 6L))
    assert(byAction("new").count(_.getAs[Long]("is_current") == 1L) == 2,
      "keys 1 and 3 each end with one open batch row")
  }

  test("series_stl: additive identity holds; planted daily rhythm lands in seasonal, spike in resid") {
    import spark.implicits._
    // 96 hours: flat base 4/hour, +6 every day at hour-of-day 6 (the
    // seasonal signal), +6 once at absolute hour 40 (the anomaly). With
    // only 3 interior samples per hour-of-day a third of the anomaly
    // leaks into seasonal@16, so the planted rhythm must out-amplitude
    // that leak for the dominance assert — and trend + seasonal + resid
    // must reassemble n exactly (up to round-6).
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    var id = 0L
    val rows = for {
      hd <- 0 until 96
      k <- 0 until (4 + (if (hd % 24 == 6) 6 else 0) + (if (hd == 40) 6 else 0))
    } yield {
      id += 1
      (id, new java.sql.Timestamp(base + hd * 3600000L + k * 60000L), 1L, "click")
    }
    val got = run(graft.queries.BicisQueries.seriesStl, rows).collect()
      .map(r => (r.getAs[Long]("hd"), r.getAs[Long]("h"), r.getAs[Long]("n"),
        r.getAs[Double]("trend"), r.getAs[Double]("seasonal"), r.getAs[Double]("resid")))
    val d0 = rows.map(_._2.getTime / 3600000L).min
    // interior rows only: hd 12..83 relative to the spine start
    assert(got.map(_._1).min === d0 + 12 && got.map(_._1).max === d0 + 83)
    assert(got.length === 72)
    // additive identity n = trend + seasonal + resid (each rounded to 6)
    got.foreach { case (hd, _, n, t, s0, r0) =>
      assert(math.abs(n - (t + s0 + r0)) < 3e-6, s"additivity broken at hd=$hd") }
    // point-check the exact MA: window of hd=20+d0 spans one hour-6 and
    // no anomaly -> (25*4 + 3)/25; hd=42+d0 spans TWO hour-6 cells
    // (42%24=18, the duplicated hour-of-day) plus the anomaly
    val t20 = got.find(_._1 == d0 + 20).get._4
    assert(math.abs(t20 - 106.0 / 25) < 1e-6, s"trend@20 = $t20")
    val t42 = got.find(_._1 == d0 + 42).get._4
    assert(math.abs(t42 - 118.0 / 25) < 1e-6, s"trend@42 = $t42")
    // the daily rhythm lands in seasonal: hour 6 dominates every other
    // hour-of-day by ~the planted +3 (minus what the MA absorbed)
    val byH = got.groupBy(_._2).map { case (h, rs) => h -> rs.head._5 }
    val others = (byH - 6L).values
    assert(byH(6L) > others.max + 2.0,
      s"seasonal@6 ${byH(6L)} not dominant over ${others.max}")
    // the one-off spike lands in resid at exactly hd=40
    val worst = got.maxBy(r => math.abs(r._6))
    assert(worst._1 === d0 + 40, s"largest resid at hd=${worst._1}, not 40")
    assert(worst._6 > 3.0, s"spike resid ${worst._6} too small")
  }

  test("ml_naive_bayes: disjoint planted vocabularies classify every test doc correctly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("nb").toString
    // class 'aa' speaks {alpha, beta}, class 'bb' speaks {gamma, delta} —
    // disjoint vocab, so every test doc's true class dominates via the
    // seen-token likelihoods while the other class pays the add-one
    // smoothing floor on every token. Any misrouted smoothing/prior
    // arithmetic flips a prediction.
    val docs = (1 to 60).map { i =>
      if (i % 2 == 0) (i.toLong, "aa", "alpha beta alpha alpha beta")
      else (i.toLong, "bb", "gamma delta delta gamma gamma")
    }
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlNaiveBayes.run(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("actual"),
        r.getAs[String]("predicted"), r.getAs[Boolean]("correct")))
    assert(got.nonEmpty, "hash split produced an empty test set")
    assert(got.length < 60, "hash split put everything in test")
    got.foreach { case (id, actual, pred, correct) =>
      assert(pred === actual && correct, s"doc $id: predicted $pred, actual $actual") }
  }

  test("series_mann_kendall: monotone series give tau ±1 with exact Theil-Sen slopes, and an outlier day cannot drag the slope") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mk").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    def day(uid: Long, d: Int, y: Int) = (0 until y).map { k =>
      (uid * 100000 + d * 1000 + k.toLong,
        new java.sql.Timestamp(base + d * 86400000L), uid, "trip")
    }
    // u1: y = d+1 -> every pairwise slope 1, tau 1
    // u2: y = 2d+1 except day 13 spikes to 200 -> 78 of 91 slopes are
    //     exactly 2, lower median rank 46 lands on 2.0 (OLS would be
    //     dragged to ~5); still strictly increasing -> tau 1
    // u3: y = 30-2d -> tau -1, slope -2
    val rows =
      (0 until 14).flatMap(d => day(1L, d, d + 1)) ++
      (0 until 14).flatMap(d => day(2L, d, if (d == 13) 200 else 2 * d + 1)) ++
      (0 until 14).flatMap(d => day(3L, d, 30 - 2 * d))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.BicisQueries.seriesMannKendall.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("s_stat"),
          r.getAs[Double]("tau"), r.getAs[Double]("ts_slope")))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((14L, 91L, 1.0, 1.0)))
    assert(got(2L) === ((14L, 91L, 1.0, 2.0)))
    assert(got(3L) === ((14L, -91L, -1.0, -2.0)))
  }

  test("ml_auc: separation gives 1.0, reversal 0.0, and a planted tie earns exactly half credit") {
    import spark.implicits._
    def auc(rows: Seq[(Long, String, Long)]): (Long, Long, Double) = {
      val tmp = java.nio.file.Files.createTempDirectory("auc").toString
      rows.toDF("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val r = graft.queries.MlQueries.mlAuc.run(spark, tmp).collect()
      assert(r.length === 1)
      (r(0).getAs[Long]("np"), r(0).getAs[Long]("nn"), r(0).getAs[Double]("auc"))
    }
    // perfect separation: every en score above every non-en -> AUC 1
    val sep = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "de", 1L), (4L, "de", 2L))
    assert(auc(sep) === ((2L, 2L, 1.0)))
    // perfect reversal -> AUC 0
    val rev = sep.map { case (id, l, s) => (id, l, -s) }
    assert(auc(rev) === ((2L, 2L, 0.0)))
    // tie at score 2: pos{2,3} neg{1,2} -> (1 + 0.5 + 2)/4 = 0.875; a
    // rank() that gives ties full or zero credit lands on 1.0 or 0.75
    val tie = Seq((1L, "en", 2L), (2L, "en", 3L), (3L, "de", 1L), (4L, "de", 2L))
    assert(auc(tie) === ((2L, 2L, 0.875)))
  }

  test("ml_classifier_eval: planted confusion matrix yields exact per-class tp/fp/fn and the never-predicted class still reports") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ceval").toString
    // en docs: 3 marker-pure (pred en) + 1 wearing es markers (pred es);
    // es docs: 2 marker-pure; zh doc: no markers -> pred 'und', and zh is
    // never predicted (no marker list) so its row must survive the join
    val docs = Seq(
      (1L, "en", "the and of"), (2L, "en", "the and of"), (3L, "en", "the and of"),
      (4L, "en", "el la de que"),
      (5L, "es", "el la que"), (6L, "es", "el la que"),
      (7L, "zh", "ni hao"))
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlClassifierEval.run(spark, tmp).collect()
      .map(r => r.getAs[String]("cl") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          Option(r.getAs[java.lang.Double]("precision")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("recall")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("f1")).map(_.toDouble)))).toMap
    assert(got.keySet === Set("en", "es", "zh", "und"))
    assert(got("en") === ((3L, 0L, 1L, Some(1.0), Some(0.75), Some(0.857143))))
    assert(got("es")._1 === 2L && got("es")._2 === 1L && got("es")._3 === 0L)
    assert(got("es")._4 === Some(0.666667) && got("es")._5 === Some(1.0))
    // zh: never predicted -> precision undefined (null), recall 0
    assert(got("zh") === ((0L, 0L, 1L, None, Some(0.0), Some(0.0))))
    // und: predicted once, never actual -> recall undefined
    assert(got("und") === ((0L, 1L, 0L, Some(0.0), None, Some(0.0))))
  }

  test("ml_target_encoding: leave-one-out excludes the row's own label and smoothing pulls toward the prior") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tenc").toString
    // prior = 2/5; source A (2 en of 3), source B (0 en of 2):
    //   A,en: (2-1 + 10*0.4)/(3-1+10) = 5/12; A,de: 6/12; B: 4/11
    Seq((1L, "A", "en"), (2L, "A", "en"), (3L, "A", "de"),
      (4L, "B", "de"), (5L, "B", "de"))
      .toDF("doc_id", "source", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlTargetEncoding.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("enc")).toMap
    assert(got === Map(
      1L -> 0.416667, 2L -> 0.416667, 3L -> 0.5,
      4L -> 0.363636, 5L -> 0.363636))
  }

  test("ml_calibration: planted marker shares land in integer-exact bins with exact conf/acc/ece/brier") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("calib").toString
    // bin9: p=1.0 docs (2 en + 1 de) -> conf 1, acc 2/3, brier 1/3
    // bin5: p=0.5 en doc -> conf .5, acc 1, brier .25
    // bin0: p=0 de docs -> all zero; the zh doc has no markers -> excluded
    val docs = Seq(
      (1L, "en", "the and"), (2L, "en", "the and"), (3L, "de", "the and"),
      (4L, "en", "the que"),
      (5L, "de", "el que"), (6L, "de", "el que"),
      (7L, "zh", "ni hao"))
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlCalibration.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("bin") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("conf"), r.getAs[Double]("acc"),
          r.getAs[Double]("ece_part"), r.getAs[Double]("brier")))).toMap
    assert(got.keySet === Set(0L, 5L, 9L))
    assert(got(9L) === ((3L, 1.0, 0.666667, 0.166667, 0.333333)))
    assert(got(5L) === ((1L, 0.5, 1.0, 0.083333, 0.25)))
    assert(got(0L) === ((2L, 0.0, 0.0, 0.0, 0.0)))
  }

  test("ml_bootstrap_ci: constant column collapses the CI to the point mean; spread data keeps lo <= mean <= hi in range") {
    import spark.implicits._
    def ci(chars: Seq[Long]): (Double, Double, Double) = {
      val tmp = java.nio.file.Files.createTempDirectory("bci").toString
      chars.zipWithIndex.map { case (c, i) => (i.toLong, c) }
        .toDF("doc_id", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val r = graft.queries.MlQueries.mlBootstrapCi.run(spark, tmp).collect()
      assert(r.length === 1)
      (r(0).getAs[Double]("mean"), r(0).getAs[Double]("lo"), r(0).getAs[Double]("hi"))
    }
    // every Poisson weight multiplies the same 42 -> every replicate mean
    // is exactly 42 regardless of the draws
    assert(ci(Seq.fill(50)(42L)) === ((42.0, 42.0, 42.0)))
    val (mean, lo, hi) = ci((1 to 50).map(i => (i % 2) * 100L))
    assert(mean === 50.0)
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] does not straddle $mean")
    assert(lo >= 0.0 && hi <= 100.0, s"CI [$lo, $hi] escapes the data range")
    assert(lo < hi, s"spread data should give a non-degenerate CI [$lo, $hi]")
  }

  test("text_readability: hand-counted sentences/words/vowel-groups reproduce the Flesch formulas; no-punctuation floors sents at 1") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("read").toString
    Seq((1L, "Hello world. It is good."), (2L, "no punctuation here"), (3L, "   "))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.TextQueries.textReadability.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("sents"), r.getAs[Long]("words"), r.getAs[Long]("sylls"),
          r.getAs[Double]("flesch"), r.getAs[Double]("fk_grade")))).toMap
    // whitespace-only doc has zero words -> excluded
    assert(got.keySet === Set(1L, 2L))
    def fl(w: Double, s: Double, sy: Double) =
      math.rint((206.835 - 1.015 * (w / s) - 84.6 * (sy / w)) * 1e6) / 1e6
    def fk(w: Double, s: Double, sy: Double) =
      math.rint((0.39 * (w / s) + 11.8 * (sy / w) - 15.59) * 1e6) / 1e6
    // "Hello world. It is good.": 2 sentence runs, 5 words, 6 vowel groups
    assert(got(1L) === ((2L, 5L, 6L, fl(5, 2, 6), fk(5, 2, 6))))
    // "no punctuation here": sents floored at 1; 3 words; vowel groups:
    // o | u-ua-io | e-e = 1 + 3 + 2 = 6
    assert(got(2L) === ((1L, 3L, 6L, fl(3, 1, 6), fk(3, 1, 6))))
  }

  test("ml_decision_stump: a pure split wins with gini 0, and equal-gini candidates break toward the smaller threshold") {
    import spark.implicits._
    def stump(rows: Seq[(Long, String, Long)]): (Long, Long, Long, Double, Double) = {
      val tmp = java.nio.file.Files.createTempDirectory("stump").toString
      rows.toDF("doc_id", "lang", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val r = graft.queries.MlQueries.mlDecisionStump.run(spark, tmp).collect()
      assert(r.length === 1)
      (r(0).getAs[Long]("split_value"), r(0).getAs[Long]("n_left"),
        r(0).getAs[Long]("n_right"), r(0).getAs[Double]("gini"), r(0).getAs[Double]("acc"))
    }
    // short de docs vs long en docs: x <= 10 separates perfectly
    val pure = Seq((1L, "de", 10L), (2L, "de", 10L), (3L, "de", 10L),
      (4L, "en", 100L), (5L, "en", 100L), (6L, "en", 200L))
    assert(stump(pure) === ((10L, 3L, 3L, 0.0, 1.0)))
    // x=2 also splits pure and beats x=1's 0.4; a tie would pick min x
    val two = Seq((1L, "de", 1L), (2L, "de", 2L), (3L, "en", 3L), (4L, "en", 3L))
    assert(stump(two) === ((2L, 2L, 2L, 0.0, 1.0)))
  }

  test("q_window_navigation: planted 4-order customer pins every navigation and distribution value") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("nav").toString
    def d(s: String) = java.sql.Timestamp.valueOf(s"2024-01-0$s 00:00:00")
    Seq((1L, 7L, 10.0, d("1")), (2L, 7L, 20.0, d("2")),
      (3L, 7L, 30.0, d("3")), (4L, 7L, 40.0, d("4")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = graft.queries.RelationalQueries.qWindowNavigation.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("o_orderkey") ->
        ((Option(r.getAs[java.lang.Double]("next_price")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("prev_price")).map(_.toDouble),
          r.getAs[Double]("first_price"), r.getAs[Double]("last_price"),
          r.getAs[Double]("second_price"), r.getAs[Long]("quartile"),
          r.getAs[Double]("prank"), r.getAs[Double]("cdist")))).toMap
    assert(got(1L) === ((Some(20.0), None, 10.0, 40.0, 20.0, 1L, 0.0, 0.25)))
    assert(got(2L) === ((Some(30.0), Some(10.0), 10.0, 40.0, 20.0, 2L, 0.333333, 0.5)))
    assert(got(3L) === ((Some(40.0), Some(20.0), 10.0, 40.0, 20.0, 3L, 0.666667, 0.75)))
    assert(got(4L) === ((None, Some(30.0), 10.0, 40.0, 20.0, 4L, 1.0, 1.0)))
  }

  test("series_pacf: lag 1 equals the ACF, lag 2 satisfies the Durbin-Levinson identity against series_acf") {
    val dir = "/root/testdata/sf0.001"
    val acf = graft.queries.BicisQueries.seriesAcf.run(spark, dir).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("acf")).toMap
    val pacf = graft.queries.BicisQueries.seriesPacf.run(spark, dir).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("pacf")).toMap
    assert(pacf.keySet === Set(1L, 2L, 3L))
    assert(pacf(1L) === acf(1L), "pacf(1) must equal acf(1)")
    val expected2 = math.rint((acf(2L) - acf(1L) * acf(1L)) /
      (1 - acf(1L) * acf(1L)) * 1e6) / 1e6
    assert(pacf(2L) === expected2,
      s"pacf(2)=${pacf(2L)} vs Durbin-Levinson $expected2 from acf ${acf(1L)},${acf(2L)}")
  }

  test("ml_t_closeness: densed grid gives exact TV distances; a missing sensitive value still contributes") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tcl").toString
    // N=14, en=8, de=6; D carries NO de docs -> densing must add |0 - n_de*n_s|
    val docs =
      Seq.fill(3)("A" -> "en") ++ Seq("A" -> "de") ++
      Seq("B" -> "en") ++ Seq.fill(3)("B" -> "de") ++
      Seq.fill(2)("C" -> "en") ++ Seq.fill(2)("C" -> "de") ++
      Seq.fill(2)("D" -> "en")
    docs.zipWithIndex.map { case ((s0, l), i) => (i.toLong, s0, l) }
      .toDF("doc_id", "source", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlTCloseness.run(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("tv_num"), r.getAs[Double]("t"),
          r.getAs[Boolean]("at_risk")))).toMap
    assert(got("A") === ((4L, 20L, 0.178571, false)))
    assert(got("B") === ((4L, 36L, 0.321429, true)))
    assert(got("C") === ((4L, 8L, 0.071429, false)))
    assert(got("D") === ((2L, 24L, 0.428571, true)))
  }

  test("q_array_funcs: sorted cents arrays slice, filter and fold to the hand-computed values") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("arrf").toString
    Seq((1L, 7L, 300.0), (2L, 7L, 100.0), (3L, 7L, 200.0), (4L, 7L, 200000.0),
      (5L, 8L, 50.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val got = graft.queries.RelationalQueries.qArrayFuncs.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        ((r.getAs[Long]("n_orders"), r.getAs[String]("low3"),
          r.getAs[Long]("n_over_100k"), r.getAs[Long]("low3_sum"),
          r.getAs[Long]("max_cents")))).toMap
    // cust 7 sorted cents: [10000, 20000, 30000, 20000000]
    assert(got(7L) === ((4L, "10000,20000,30000", 1L, 60000L, 20000000L)))
    assert(got(8L) === ((1L, "5000", 0L, 5000L, 5000L)))
  }

  test("q_agg_funcs: conditional counts, bool folds, unique-key arg-extrema and exact medians on a planted table") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("aggf").toString
    Seq((1L, "en", 100L), (2L, "en", 600L), (3L, "en", 600L),
      (4L, "de", 0L), (5L, "de", 4000L))
      .toDF("doc_id", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.RelationalQueries.qAggFuncs.run(spark, tmp).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_long"), r.getAs[Boolean]("all_pos"),
          r.getAs[Boolean]("any_huge"), r.getAs[Long]("longest_doc"),
          r.getAs[Long]("shortest_doc"), r.getAs[Double]("med_chars")))).toMap
    // en: n_chars tie at 600 breaks to the larger doc_id via the packed key
    assert(got("en") === ((3L, 2L, true, false, 3L, 1L, 600.0)))
    // de: even count -> interpolated median (0+4000)/2
    assert(got("de") === ((2L, 1L, false, true, 5L, 4L, 2000.0)))
  }

  test("ml_ks_test: disjoint halves reach D=1; overlapping halves tie-break to the smallest argmax value") {
    import spark.implicits._
    def ks(rows: Seq[(Long, Long)]): (Long, Long, Long, Double, Long) = {
      val tmp = java.nio.file.Files.createTempDirectory("ks").toString
      rows.toDF("doc_id", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val r = graft.queries.MlQueries.mlKsTest.run(spark, tmp).collect()
      assert(r.length === 1)
      (r(0).getAs[Long]("n1"), r(0).getAs[Long]("n2"), r(0).getAs[Long]("ks_num"),
        r(0).getAs[Double]("ks"), r(0).getAs[Long]("ks_at"))
    }
    // even ids (ref) at {1,2}, odd ids (cur) at {3,4}: fully separated -> D=1 at x=2
    assert(ks(Seq((0L, 1L), (2L, 2L), (1L, 3L), (3L, 4L))) === ((2L, 2L, 4L, 1.0, 2L)))
    // ref {1,2}, cur {2,3}: |F1-F2| = 1/2 at both x=1 and x=2 -> argmax picks 1
    assert(ks(Seq((0L, 1L), (2L, 2L), (1L, 2L), (3L, 3L))) === ((2L, 2L, 2L, 0.5, 1L)))
  }

  test("ml_pr_curve: descending thresholds sweep exact tp/fp with the hand-computed precision/recall/f1 points") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("pr").toString
    Seq((1L, "en", 2L), (2L, "en", 3L), (3L, "de", 1L), (4L, "de", 2L))
      .toDF("doc_id", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlPrCurve.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("score") ->
        ((r.getAs[Long]("tp"), r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Double]("precision"), r.getAs[Double]("recall"),
          r.getAs[Double]("f1")))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(3L) === ((1L, 0L, 1L, 1.0, 0.5, 0.666667)))
    assert(got(2L) === ((2L, 1L, 0L, 0.666667, 1.0, 0.8)))
    assert(got(1L) === ((2L, 2L, 0L, 0.5, 1.0, 0.666667)))
  }

  test("ml_stratified_effect: per-stratum arm means and their difference; a missing arm reports null") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ate").toString
    Seq((1L, "A", "en", 10L), (2L, "A", "en", 20L), (3L, "A", "de", 2L),
      (4L, "B", "de", 5L), (5L, "B", "de", 7L))
      .toDF("doc_id", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlStratifiedEffect.run(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_t"),
          Option(r.getAs[java.lang.Double]("mean_t")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("mean_c")).map(_.toDouble),
          Option(r.getAs[java.lang.Double]("effect")).map(_.toDouble)))).toMap
    assert(got("A") === ((3L, 2L, Some(15.0), Some(2.0), Some(13.0))))
    assert(got("B") === ((2L, 0L, None, Some(6.0), None)))
  }

  test("q_presence_bitmask: hour/weekday sets pack into exact bit positions with bit_count cardinalities") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mask").toString
    def ts(d: Long, h: Long) = new java.sql.Timestamp((d * 86400L + h * 3600L) * 1000L)
    val rows = Seq(
      (1L, ts(0, 0), 1L, "trip"), (2L, ts(0, 3), 1L, "trip"), (3L, ts(1, 3), 1L, "trip"),
      (4L, ts(6, 23), 2L, "trip"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.BicisQueries.qPresenceBitmask.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("hour_mask"), r.getAs[Long]("n_hours"),
          r.getAs[Long]("day_mask"), r.getAs[Long]("n_days")))).toMap
    // user 1: hours {0,3} -> 1|8, weekdays {0,1} -> 1|2
    assert(got(1L) === ((9L, 2L, 3L, 2L)))
    // user 2: hour 23, weekday 6 -> single high bits
    assert(got(2L) === ((1L << 23, 1L, 64L, 1L)))
  }

  test("ml_class_weights: inverse-frequency weights satisfy w_c = N/(K n_c) exactly") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("cw").toString
    (Seq.fill(4)("en") :+ "de").zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlClassWeights.run(spark, tmp).collect()
      .map(r => r.getAs[String]("lang") -> ((r.getAs[Long]("n"), r.getAs[Double]("weight"))))
      .toMap
    assert(got === Map("en" -> ((4L, 0.625)), "de" -> ((1L, 2.5))))
  }

  test("ml_assoc_rules: planted baskets give exact support/confidence and an asymmetric-confidence lift above 1") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("assoc").toString
    // 8 baskets {1,2}, 4 baskets {2}, 4 baskets {3}: only the (1,2) pair
    // clears min-support 8. N=16, n_1=8, n_2=12.
    val rows = (1 to 8).flatMap(o => Seq((o.toLong, 1L), (o.toLong, 2L))) ++
      (9 to 12).map(o => (o.toLong, 2L)) ++ (13 to 16).map(o => (o.toLong, 3L))
    rows.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = graft.queries.MlQueries.mlAssocRules.run(spark, tmp).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")) ->
        ((r.getAs[Long]("n_xy"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift")))).toMap
    assert(got.keySet === Set((1L, 2L), (2L, 1L)))
    // 1->2 is certain (conf 1), 2->1 is not (8/12); lift is symmetric:
    // 8*16/(8*12) = 4/3
    assert(got((1L, 2L)) === ((8L, 0.5, 1.0, 1.333333)))
    assert(got((2L, 1L)) === ((8L, 0.5, 0.666667, 1.333333)))
  }

  test("series_anova: a flat fortnight has zero between-group variance; a planted weekday effect yields the exact F") {
    import spark.implicits._
    def anova(daily: Seq[Int]): (Long, Long, Double, Double, Option[Double], Option[Double]) = {
      val tmp = java.nio.file.Files.createTempDirectory("anova").toString
      val rows = daily.zipWithIndex.flatMap { case (y, d) =>
        (0 until y).map(i => (d * 1000L + i,
          new java.sql.Timestamp((d.toLong * 86400L) * 1000L), 1L, "trip"))
      }
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val r = graft.queries.BicisQueries.seriesAnova.run(spark, tmp).collect()(0)
      (r.getAs[Long]("n_days"), r.getAs[Long]("k"), r.getAs[Double]("ssb"),
        r.getAs[Double]("ssw"),
        Option(r.getAs[java.lang.Double]("f_stat")).map(_.toDouble),
        Option(r.getAs[java.lang.Double]("eta2")).map(_.toDouble))
    }
    // two identical weeks: every moment collapses, F undefined (0/0 guarded)
    assert(anova(Seq.fill(14)(10)) === ((14L, 7L, 0.0, 0.0, None, None)))
    // one weekday runs hot (20/28 on days 0 and 7): ssb 336, ssw 32,
    // F = (336/6)/(32/7) = 12.25, eta2 = 336/368
    val hot = Seq(20, 10, 10, 10, 10, 10, 10, 28, 10, 10, 10, 10, 10, 10)
    assert(anova(hot) === ((14L, 7L, 336.0, 32.0, Some(12.25), Some(0.913043))))
  }

  test("q_attribution: first/last touch pick the window-bounded extremes and out-of-window views never credit") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("attr").toString
    val base = java.sql.Timestamp.valueOf("2024-01-10 00:00:00").getTime
    def at(h: Long) = new java.sql.Timestamp(base + h * 3600000L)
    val rows = Seq(
      (1L, at(-24 * 8), 1L, "view"),   // 8 days before: outside the window
      (2L, at(-30), 1L, "view"),        // first touch
      (3L, at(-5), 1L, "view"),         // last touch
      (4L, at(0), 1L, "purchase"),
      (5L, at(1), 2L, "view"),          // after the purchase: no credit
      (6L, at(0), 2L, "purchase"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.BicisQueries.qAttribution.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("pid") ->
        ((r.getAs[Long]("first_view"), r.getAs[Long]("last_view"), r.getAs[Long]("n_touch"))))
      .toMap
    // purchase 4: views 2 and 3 in window; the 8-day-old view is out
    assert(got === Map(4L -> ((2L, 3L, 2L))))
    // purchase 6 has no preceding view -> no row (inner semantics)
    assert(!got.contains(6L))
  }

  test("series_bollinger: a flat series never breaches; a planted spike breaches the upper band with exact window moments") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("boll").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val rows = (0 until 10).flatMap { d =>
      val k = if (d == 9) 50 else 5
      (0 until k).map(i => (d * 1000L + i,
        new java.sql.Timestamp(base + d * 86400000L), 1L, "trip"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = graft.queries.BicisQueries.seriesBollinger.run(spark, tmp).collect()
      .map(r => (r.getAs[Long]("y"), r.getAs[Double]("ma"), r.getAs[Double]("sd"),
        r.getAs[Boolean]("breach_hi"), r.getAs[Boolean]("breach_lo"))).toSeq
    // full windows exist for the last 4 days only
    assert(got.length === 4)
    got.init.foreach(r => assert(r === ((5L, 5.0, 0.0, false, false))))
    val spike = got.last
    assert(spike._1 === 50L)
    assert(spike._2 === math.rint(80.0 / 7 * 1e6) / 1e6)
    assert(spike._3 === math.rint(math.sqrt(7.0 * 2650 - 80.0 * 80) / 7 * 1e6) / 1e6)
    assert(spike._4 && !spike._5, "the spike must breach the upper band only")
  }

  test("ml_outlier_iqr: rank-exact quartiles and doubled-integer Tukey fences flag the planted extreme") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("iqr").toString
    val docs = ((1 to 8).map(_.toLong) :+ 100L).zipWithIndex
      .map { case (x, i) => (i.toLong, "A", x) }
    docs.toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlOutlierIqr.run(spark, tmp).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n"), r.getAs[Long]("q1"),
        r.getAs[Long]("q3"), r.getAs[Long]("n_low"), r.getAs[Long]("n_high"))).toSeq
    // n=9: q1 = min x with 4cum>=9 -> 3; q3 = min x with 4cum>=27 -> 7;
    // high fence 2x > 14+12 -> only the 100
    assert(got === Seq(("A", 9L, 3L, 7L, 0L, 1L)))
  }

  test("ml_mad: the planted extreme moves neither the rank-exact median nor the MAD") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mad").toString
    Seq(1L, 2L, 3L, 4L, 100L).zipWithIndex.map { case (x, i) => (i.toLong, "A", x) }
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlMad.run(spark, tmp).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n"),
        r.getAs[Long]("med"), r.getAs[Long]("mad"))).toSeq
    // med of {1,2,3,4,100} = 3; deviations {2,1,0,1,97} -> mad 1
    assert(got === Seq(("A", 5L, 3L, 1L)))
  }

  test("text_novelty: first-seen bigrams score 1, partial reuse 0.5, a verbatim repeat 0") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("nov").toString
    Seq((1L, "a b c"), (2L, "a b d"), (3L, "a b c"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.TextQueries.textNovelty.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_new"), r.getAs[Double]("novelty"))))
      .toMap
    assert(got === Map(
      1L -> ((2L, 2L, 1.0)), 2L -> ((2L, 1L, 0.5)), 3L -> ((2L, 0L, 0.0))))
  }

  test("ml_psi: identical halves give zero psi everywhere; a shifted half concentrates with null-guarded empty bins") {
    import spark.implicits._
    def psi(rows: Seq[(Long, Long)]): Map[Long, (Long, Long, Option[Double])] = {
      val tmp = java.nio.file.Files.createTempDirectory("psi").toString
      rows.toDF("doc_id", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      graft.queries.MlQueries.mlPsi.run(spark, tmp).collect()
        .map(r => r.getAs[Long]("bin") ->
          ((r.getAs[Long]("n_ref"), r.getAs[Long]("n_cur"),
            Option(r.getAs[java.lang.Double]("psi_part")).map(_.toDouble)))).toMap
    }
    // ref = even ids at x 1..10, cur = odd ids at the SAME values:
    // boundaries land at x=k, every bin balanced -> psi 0 in every bin
    val same = (1 to 10).flatMap(x => Seq((2L * x, x.toLong), (2L * x + 1, x.toLong)))
    val flat = psi(same)
    assert(flat.keySet === (1L to 9L).toSet)
    flat.foreach { case (b, (nr, nc, p)) =>
      assert(nr === nc && p === Some(0.0), s"bin $b: ($nr, $nc, $p)") }
    // cur collapses onto x=10 (bin 9): bins 1..8 lose their cur side
    // (null-guarded), bin 9 carries (0.2-1)*ln(0.2)
    val shifted = psi((1 to 10).map(x => (2L * x, x.toLong)) ++
      (1 to 10).map(i => (2L * i + 1, 10L)))
    (1L to 8L).foreach(b => assert(shifted(b) === ((if (b == 9L) 2L else 1L, 0L, None))))
    assert(shifted(9L)._1 === 2L && shifted(9L)._2 === 10L)
    assert(shifted(9L)._3 === Some(math.rint((0.2 - 1.0) * math.log(0.2) * 1e6) / 1e6))
  }

  test("ml_corr_matrix: planted linear/anti-linear/constant features give corr 1, -1 and null from one moment scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("corr").toString
    (1 to 10).map(i => (i.toLong, 1, i.toDouble, 2.0 * i, 10.0 - i, 3.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = graft.queries.MlQueries.mlCorrMatrix.run(spark, tmp).collect()
      .map(r => (r.getAs[String]("va"), r.getAs[String]("vb")) ->
        Option(r.getAs[java.lang.Double]("corr")).map(_.toDouble)).toMap
    assert(got.size === 6)
    assert(got(("q", "p")) === Some(1.0))
    assert(got(("q", "d")) === Some(-1.0))
    assert(got(("p", "d")) === Some(-1.0))
    // t is constant -> zero variance -> guarded null, not a crash or NaN
    assert(got(("q", "t")) === None && got(("p", "t")) === None && got(("d", "t")) === None)
  }

  test("graph_distance_hist: dist-0 mass equals the seed count and the share curve is monotone to 1") {
    val got = graft.queries.GraphQueries.graphDistanceHist.run(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("dist"), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("cum_share")))
    assert(got.nonEmpty && got.head._1 === 0L)
    assert(got.map(_._3).toSeq === got.map(_._3).sorted.toSeq, "cum_share must be monotone")
    assert(got.last._3 === 1.0)
    // every reached pair beyond hop 0 grows the mass (connected trade graph)
    assert(got.forall(_._2 > 0))
  }

  test("ml_mcc and ml_cohen_kappa: a planted confusion matrix yields the hand-computed chance-corrected scores") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mcc").toString
    // en: 2 pred-en (tp) + 1 pred-es (fn); de: 1 pred-en (fp) + 2 pred-es (tn
    // for the en-vs-rest binarization)
    Seq((1L, "en", "the and"), (2L, "en", "the and"), (3L, "en", "el la que"),
      (4L, "de", "the and"), (5L, "de", "el que"), (6L, "de", "el que"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val mcc = graft.queries.MlQueries.mlMcc.run(spark, tmp).collect()(0)
    assert((mcc.getAs[Long]("tp"), mcc.getAs[Long]("fp"), mcc.getAs[Long]("fn"),
      mcc.getAs[Long]("tn")) === ((2L, 1L, 1L, 2L)))
    // (2*2 - 1*1)/sqrt(3*3*3*3) = 3/9
    assert(mcc.getAs[Double]("mcc") === 0.333333)
    // multi-class: diag 2, marginals rows {en 3, de 3}, cols {en 3, es 3}
    // -> chance = 3*3 = 9; kappa = (6*2-9)/(36-9) = 3/27
    val k = graft.queries.MlQueries.mlCohenKappa.run(spark, tmp).collect()(0)
    assert((k.getAs[Long]("nn"), k.getAs[Long]("diag"), k.getAs[Long]("chance")) ===
      ((6L, 2L, 9L)))
    assert(k.getAs[Double]("kappa") === 0.111111)
  }

  test("embed_dim_stats: planted two-vector matrix yields exact per-dimension moments") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dims").toString
    Seq((1L, Array(1f, 4f), 0), (2L, Array(3f, 8f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = graft.queries.EmbedQueries.embedDimStats.run(spark, tmp).collect()
      .map(r => r.getAs[Long]("dim") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean"), r.getAs[Double]("var"),
          r.getAs[Double]("mn"), r.getAs[Double]("mx")))).toMap
    assert(got === Map(
      1L -> ((2L, 2.0, 1.0, 1.0, 3.0)),
      2L -> ((2L, 6.0, 4.0, 4.0, 8.0))))
  }

  test("ml_herfindahl: equal sources give 1/k, a dominant source drives hhi toward its squared share") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("hhi").toString
    // 8 docs from A, 1 each from B and C: hhi = (64+1+1)/100, top 0.8
    (Seq.fill(8)("A") ++ Seq("B", "C")).zipWithIndex.map { case (s0, i) => (i.toLong, s0) }
      .toDF("doc_id", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = graft.queries.MlQueries.mlHerfindahl.run(spark, tmp).collect()(0)
    assert((r.getAs[Long]("n_sources"), r.getAs[Long]("n_docs"),
      r.getAs[Double]("hhi"), r.getAs[Double]("top_share")) === ((3L, 10L, 0.66, 0.8)))
  }

  test("ml_gini: equal lengths give 0, a planted concentration gives the hand-computed 0.72") {
    import spark.implicits._
    def gini(xs: Seq[Long]): (Long, Long, Long, Double) = {
      val tmp = java.nio.file.Files.createTempDirectory("gini").toString
      xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("doc_id", "n_chars")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val r = graft.queries.MlQueries.mlGini.run(spark, tmp).collect()
      assert(r.length === 1)
      (r(0).getAs[Long]("n"), r(0).getAs[Long]("sum_chars"),
        r(0).getAs[Long]("gini_num"), r(0).getAs[Double]("gini"))
    }
    assert(gini(Seq(5L, 5L, 5L, 5L)) === ((4L, 20L, 0L, 0.0)))
    // sorted {1,1,1,97}: num = -3 -1 +1 +3*97 = 288; G = 288/(4*100)
    assert(gini(Seq(97L, 1L, 1L, 1L)) === ((4L, 100L, 288L, 0.72)))
  }

  test("ml_simpson_diversity: a 50/50 source scores 0.5, a monoculture scores 0") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("simp").toString
    Seq((1L, "A", "en"), (2L, "A", "en"), (3L, "A", "de"), (4L, "A", "de"),
      (5L, "B", "en"), (6L, "B", "en"), (7L, "B", "en"))
      .toDF("doc_id", "source", "lang")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlSimpsonDiversity.run(spark, tmp).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_langs"), r.getAs[Double]("simpson")))).toMap
    assert(got === Map("A" -> ((4L, 2L, 0.5)), "B" -> ((3L, 1L, 0.0))))
  }

  test("ml_cv_linreg: an exact line yields zero mse in every fold; one outlier is recovered only by the fold that holds it out") {
    import spark.implicits._
    def cv(rows: Seq[(Long, Int, Double, Double)]): Seq[(Long, Long, Double, Double, Double)] = {
      val tmp = java.nio.file.Files.createTempDirectory("cv").toString
      rows.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
      graft.queries.MlQueries.mlCvLinreg.run(spark, tmp).collect()
        .map(r => (r.getAs[Long]("fold"), r.getAs[Long]("n_test"),
          r.getAs[Double]("slope"), r.getAs[Double]("intercept"), r.getAs[Double]("mse")))
        .toSeq
    }
    val clean = (1 to 200).map(i => (i.toLong, 1, (i % 50).toDouble + 1, 2.0 * ((i % 50) + 1) + 1))
    val exact = cv(clean)
    assert(exact.map(_._1).toSet === Set(0L, 1L, 2L, 3L, 4L), "all 5 folds must be populated")
    exact.foreach { case (f, _, s0, i0, m) =>
      assert(s0 === 2.0 && i0 === 1.0 && m === 0.0, s"fold $f: ($s0, $i0, mse $m)") }
    // one gross outlier: only the fold that holds it OUT trains the exact
    // line — and that fold's test mse is the largest (it contains the outlier)
    val noisy = cv(clean :+ ((999L, 1, 25.0, 100000.0)))
    val exactFolds = noisy.filter(r => r._3 === 2.0 && r._4 === 1.0)
    assert(exactFolds.length === 1, s"expected exactly one clean-trained fold, got $noisy")
    assert(exactFolds.head._5 === noisy.map(_._5).max,
      "the clean-trained fold must carry the outlier's test error")
  }

  test("ml_linreg: planted exact line recovers slope/intercept/r2=1; noise drops r2") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("linreg").toString
    // group A: exact y = 2x + 1 -> slope 2, intercept 1, r2 1
    // group B: same line with one off-line point -> r2 < 1, slope/intercept move
    val a = (1 to 20).map(i => ("A", i.toDouble, 2.0 * i + 1))
    val b = (1 to 20).map(i => ("B", i.toDouble, 2.0 * i + 1)) :+ (("B", 10.0, 200.0))
    (a ++ b).toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = graft.queries.MlQueries.mlLinreg.run(spark, tmp).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        ((r.getAs[Double]("slope"), r.getAs[Double]("intercept"), r.getAs[Double]("r2"))))
      .toMap
    val (sa, ia, ra) = got("A")
    assert(math.abs(sa - 2.0) < 1e-6 && math.abs(ia - 1.0) < 1e-6 && math.abs(ra - 1.0) < 1e-6,
      s"exact line not recovered: $got")
    val (_, _, rb) = got("B")
    assert(rb < 0.9, s"outlier group r2 $rb should drop well below 1")
  }
}
