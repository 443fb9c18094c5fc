package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Tables, TimeKeys}
import graft.ops.{SeriesAggs, TemporalSplit, WindowOps}

/** Bicis-parity queries over the `events` table, with `user_id` standing in
  * for the station, `ts` for rent_date, event_type 'click' for rents and
  * 'purchase' for returns (FIXTURES.md role mapping).
  */
object BicisQueries {

  private val Rent = "click"
  private val Return = "purchase"
  private val HourMicros = 3600L * 1000000L

  /** Inner count CTE shared by the series oracles. */
  private def seriesCte(eventType: String, group: String, key: String): String =
    s"""SELECT user_id, date_trunc('$group', ts) AS g, CAST($key AS BIGINT) AS k, count(*) AS n
       |FROM events WHERE event_type = '$eventType' GROUP BY 1, 2, 3""".stripMargin

  private def seriesSql(eventType: String, group: String, key: String, out: String): String =
    s"""WITH c AS (${seriesCte(eventType, group, key)})
       |SELECT user_id, k, round(avg(n), 6) AS $out FROM c GROUP BY 1, 2 ORDER BY user_id, k""".stripMargin

  private def series(kind: String, eventType: String, out: String) =
    (s: org.apache.spark.sql.SparkSession, dir: String) => {
      val e = Tables.events(s, dir).where(col("event_type") === eventType)
      val (key, group) = TimeKeys.keyAndGroup(kind, col("ts"))
      SeriesAggs.activePeriodAvg(e, col("user_id"), group, key, out)
        .orderBy(col("user_id"), col("k"))
    }

  private val kindToDuck = Map(
    "weekday" -> ("week", "isodow(ts)"),
    "hour" -> ("hour", "hour(ts)"),
    "month" -> ("month", "month(ts)"))

  private def seriesQuery(kind: String): QueryDef = {
    val (group, key) = kindToDuck(kind)
    QueryDef.sql(s"series_$kind", seriesSql(Rent, group, key, "n_rents"))(series(kind, Rent, "n_rents"))
  }

  /** basic_features.py:41-66 computes BOTH measures for all three keys —
    * the returns-mode mirror of seriesQuery (hour is covered two-sided by
    * series_join already).
    */
  private def seriesReturnsQuery(kind: String): QueryDef = {
    val (group, key) = kindToDuck(kind)
    QueryDef.sql(s"series_${kind}_returns",
      seriesSql(Return, group, key, "n_returns"))(series(kind, Return, "n_returns"))
  }

  val seriesWeekday: QueryDef = seriesQuery("weekday")
  val seriesHour: QueryDef = seriesQuery("hour")
  val seriesMonth: QueryDef = seriesQuery("month")
  val seriesWeekdayReturns: QueryDef = seriesReturnsQuery("weekday")
  val seriesMonthReturns: QueryDef = seriesReturnsQuery("month")

  /** J1: rents ⋈ returns hour series (broadcast-sized sides). */
  val seriesJoin: QueryDef = QueryDef.sql("series_join",
    s"""WITH cr AS (${seriesCte(Rent, "hour", "hour(ts)")}),
       |ct AS (${seriesCte(Return, "hour", "hour(ts)")}),
       |r AS (SELECT user_id, k, round(avg(n), 6) AS n_rents FROM cr GROUP BY 1, 2),
       |t AS (SELECT user_id, k, round(avg(n), 6) AS n_returns FROM ct GROUP BY 1, 2)
       |SELECT user_id, k, n_rents, n_returns FROM r JOIN t USING (user_id, k)
       |ORDER BY user_id, k""".stripMargin) { (s, dir) =>
    SeriesAggs.joinSeries(
        series("hour", Rent, "n_rents")(s, dir),
        series("hour", Return, "n_returns")(s, dir))
      .select("user_id", "k", "n_rents", "n_returns")
      .orderBy("user_id", "k")
  }

  /** A6/A7: station × hour profile pivoted wide, dense 0..23, zero-filled. */
  val stationHourPivot: QueryDef = {
    val cols = (0 to 23)
      .map(h => s"coalesce(max(v) FILTER (WHERE k = $h), 0.0) AS h$h").mkString(",\n  ")
    QueryDef.sql("station_hour_pivot",
      s"""WITH c AS (${seriesCte(Rent, "hour", "hour(ts)")}),
         |s AS (SELECT user_id, k, round(avg(n), 6) AS v FROM c GROUP BY 1, 2)
         |SELECT user_id,
         |  $cols
         |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      SeriesAggs.stationHourPivot(series("hour", Rent, "v")(s, dir), "v")
        .orderBy("user_id")
    }
  }

  /** A5 flagship: next-1h forward window count with full-window mask. */
  val nextWindowTarget: QueryDef = QueryDef.sql("next_window_target",
    s"""WITH b AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
       |w AS (SELECT event_id, us,
       |        count(*) OVER (PARTITION BY user_id ORDER BY us
       |                       RANGE BETWEEN CURRENT ROW AND ${HourMicros - 1} FOLLOWING) AS c,
       |        max(us) OVER (PARTITION BY user_id) AS mx
       |      FROM b)
       |SELECT event_id, CAST(c AS BIGINT) AS n_rents FROM w
       |WHERE us <= mx - $HourMicros ORDER BY event_id""".stripMargin) { (s, dir) =>
    WindowOps.forwardWindowCount(Tables.events(s, dir), "user_id", "ts", "event_id", HourMicros)
      .orderBy("event_id")
  }

  /** A5 skew variant, oracle-checked against the SAME SQL as the plain
    * operator: the time-chunk decomposition must be output-identical
    * (WindowOpsSpec proves it on fixtures; this proves it on the real
    * events table against DuckDB).
    */
  val nextWindowTargetChunked: QueryDef = QueryDef.sql("next_window_target_chunked",
    s"""WITH b AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
       |w AS (SELECT event_id, us,
       |        count(*) OVER (PARTITION BY user_id ORDER BY us
       |                       RANGE BETWEEN CURRENT ROW AND ${HourMicros - 1} FOLLOWING) AS c,
       |        max(us) OVER (PARTITION BY user_id) AS mx
       |      FROM b)
       |SELECT event_id, CAST(c AS BIGINT) AS n_rents FROM w
       |WHERE us <= mx - $HourMicros ORDER BY event_id""".stripMargin) { (s, dir) =>
    WindowOps.forwardWindowCountChunked(
        Tables.events(s, dir), "user_id", "ts", "event_id", HourMicros)
      .orderBy("event_id")
  }

  /** A10: tumbling 1-hour count (aligned windows == date_trunc in the oracle). */
  val tumblingHour: QueryDef = QueryDef.sql("tumbling_hour",
    """SELECT date_trunc('hour', ts) AS ws, count(*) AS n
      |FROM events GROUP BY 1 ORDER BY ws""".stripMargin) { (s, dir) =>
    WindowOps.tumblingCount(Tables.events(s, dir), "ts", "1 hour").orderBy("ws")
  }

  /** M1: the three split branches, summarized as (count, min, max). */
  private def splitQuery(which: String): QueryDef = {
    val spec = TemporalSplit.Spec()
    val total = spec.validationDays + spec.testDays
    val pred = which match {
      case "training"   => s"o_orderdate < mx - INTERVAL $total DAYS"
      case "validation" => s"o_orderdate >= mx - INTERVAL $total DAYS AND o_orderdate < mx - INTERVAL ${spec.testDays} DAYS"
      case "testing"    => s"o_orderdate >= mx - INTERVAL ${spec.testDays} DAYS AND o_orderdate <= mx"
    }
    QueryDef.sql(s"split_$which",
      s"""WITH b AS (SELECT max(o_orderdate) AS mx FROM orders)
         |SELECT count(*) AS n, min(o_orderdate) AS mn, max(o_orderdate) AS mx
         |FROM orders, b WHERE $pred""".stripMargin) { (s, dir) =>
      val (tr, va, te) = TemporalSplit.split(Tables.orders(s, dir), "o_orderdate", spec)
      val branch = which match {
        case "training" => tr; case "validation" => va; case "testing" => te
      }
      branch.agg(count(lit(1)).as("n"), min(col("o_orderdate")).as("mn"),
        max(col("o_orderdate")).as("mx"))
    }
  }

  val splitTraining: QueryDef = splitQuery("training")
  val splitValidation: QueryDef = splitQuery("validation")
  val splitTesting: QueryDef = splitQuery("testing")

  /** Gap-based sessionization: a new session starts after a >30 min gap
    * per user. lag + running sum over one (user, ts) window — the same
    * single-exchange shape as A5.
    */
  val sessionize: QueryDef = QueryDef.sql("sessionize",
    """WITH g AS (SELECT user_id, ts, event_id,
      |  CASE WHEN lag(ts) OVER w IS NULL
      |         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (SELECT user_id, ts, event_id,
      |  sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g)
      |SELECT user_id, CAST(sid AS BIGINT) AS sid, count(*) AS n,
      |  min(ts) AS session_start, max(ts) AS session_end
      |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("__prev", lag(col("ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_micros(col("ts")) - unix_micros(col("__prev")) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("__new")).over(run).cast("long"))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"), min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("sid"))
  }

  /** Native `session_window` sessionization (merging event-time windows;
    * the batch twin of Streaming.sessionCounts). Semantics differ from
    * `sessionize` at the exact boundary: the window is [first, last+gap),
    * so a gap of EXACTLY 30 min starts a new session (>=, not >) and the
    * session end is last_ts + gap. The oracle mirrors that with a
    * gaps-and-islands formulation.
    */
  val qSessionWindow: QueryDef = QueryDef.sql("q_session_window",
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
    Tables.events(s, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** S1/S6/U1 + P1-P3 + F4 through the driver's oracle gate: the
    * multi-dialect unify chain (graft.core.Ingest) run END TO END. The
    * driver only serves parquet, so the four dialect files are
    * reconstructed as raw STRING frames from `events` — dialect-specific
    * messy headers (mixed case, padding, an unmapped junk column),
    * dialect-specific column sets, reference-format date/duration
    * strings, and injected garbage rows — and pushed through the real
    * `Ingest.unifyFrames` (identical code path to `unify` minus the CSV
    * byte read, which IngestSpec covers with real files). The oracle
    * re-derives what the chain must produce: per-dialect projection,
    * first-match timestamp parse (second truncation), bare-int-minutes /
    * h-m-s duration parse, return-date derivation for the dialect that
    * lacks the column (v4/2016), and the unparseable-row drops
    * (bicis/lib/parse_raw_data.py:79-117, unify.py:30-50).
    */
  val qUnifyParse: QueryDef = QueryDef.sql("q_unify_parse",
    """WITH b AS (SELECT event_id, user_id, ts,
      |  event_id % 4 AS dial,
      |  CASE WHEN event_id % 97 = 0 THEN NULL ELSE date_trunc('second', ts) END AS rent_p,
      |  date_trunc('second', ts + to_seconds(event_id % 5400)) AS ret_p,
      |  CASE WHEN event_id % 3 = 0 THEN (event_id % 120) * 60
      |       WHEN event_id % 3 = 1 THEN (event_id % 2) * 3600 + (event_id % 90) * 60 + (event_id % 60)
      |       ELSE NULL END AS dur_s
      |  FROM events)
      |SELECT rent_p AS rent_date,
      |  'S' || CAST(user_id % 50 AS VARCHAR) AS rent_station,
      |  CASE WHEN dial = 3 THEN rent_p + to_seconds(dur_s) ELSE ret_p END AS return_date,
      |  'T' || CAST(user_id % 37 AS VARCHAR) AS return_station
      |FROM b
      |WHERE rent_p IS NOT NULL AND (dial <> 3 OR dur_s IS NOT NULL)
      |ORDER BY rent_date, rent_station, return_date, return_station""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("ts"),
      (col("event_id") % 4).as("dial"),
      when(col("event_id") % 97 === 0, lit("not a date"))
        .otherwise(date_format(col("ts"), "dd/MM/yyyy HH:mm:ss")).as("rent_raw"),
      date_format(expr("timestampadd(SECOND, event_id % 5400, ts)"),
        "dd/MM/yyyy HH:mm:ss").as("ret_raw"),
      when(col("event_id") % 3 === 0, (col("event_id") % 120).cast("string"))
        .when(col("event_id") % 3 === 1, concat(
          (col("event_id") % 2).cast("string"), lit("H "),
          (col("event_id") % 90).cast("string"), lit("M "),
          (col("event_id") % 60).cast("string"), lit("S")))
        .otherwise(lit("n/a")).as("dur_raw"),
      concat(lit("S"), (col("user_id") % 50).cast("string")).as("rst"),
      concat(lit("T"), (col("user_id") % 37).cast("string")).as("tst"))
    val v1 = ev.where(col("dial") === 0).select(
      col("rent_raw").as(" OrigenFecha "), col("rst").as("NombreOrigen"),
      col("ret_raw").as("DestinoFecha"), col("tst").as("NombreDestino"),
      col("dur_raw").as("TiempoUso"), col("event_id").cast("string").as("PERIODO"))
    val v2 = ev.where(col("dial") === 1).select(
      col("rent_raw").as("ORIGENFECHA"), col("rst").as("OrigenNombre"),
      col("ret_raw").as("DestinoFecha"), col("tst").as("DestinoNombre"),
      col("dur_raw").as("TiempoUso"))
    val v3 = ev.where(col("dial") === 2).select(
      col("rent_raw").as("origen_fecha"), col("rst").as("nombre_origen"),
      col("ret_raw").as("destino_fecha"), col("tst").as("destino_estacion"))
    val v4 = ev.where(col("dial") === 3).select(
      col("rent_raw").as("Fecha_Hora_Retiro"), col("dur_raw").as("tiempo_uso"),
      col("rst").as("nombre_origen"), col("tst").as("nombre_destino"))
    graft.core.Ingest.unifyFrames(Seq(v1 -> 2011, v2 -> 2012, v3 -> 2014, v4 -> 2016))
      .select(col("rent_date"), col("rent_station"),
        col("return_date"), col("return_station"))
      .orderBy(col("rent_date"), col("rent_station"),
        col("return_date"), col("return_station"))
  }

  /** Ordered conversion funnel: view → click within 6 h of first view →
    * purchase within 6 h of that click, per user. Each stage is a
    * conditional min over the NEXT event type constrained to a time
    * window AFTER the previous stage — the ordering + window constraint
    * is what separates this from three independent EXISTS checks (and
    * what makes the gate distribution non-trivial: 150 → 19 → 1 users
    * at sf0.01). Each stage filter pushes its event_type to the scan;
    * stage tables are per-user (tiny vs events) so the joins broadcast.
    */
  val qConversionFunnel: QueryDef = QueryDef.sql("q_conversion_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts >= v.t1
      |        AND e.ts <= v.t1 + INTERVAL 6 HOUR GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts >= c.t2
      |        AND e.ts <= c.t2 + INTERVAL 6 HOUR GROUP BY 1)
      |SELECT v.user_id AS user_id,
      |  1 AS s_view,
      |  CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS s_click,
      |  CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS s_purchase
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c = e.where(col("event_type") === "click").as("e")
      .join(broadcast(v).as("v"), col("e.user_id") === col("v.user_id") &&
        col("e.ts") >= col("v.t1") &&
        col("e.ts") <= col("v.t1") + expr("INTERVAL 6 HOUR"))
      .groupBy(col("e.user_id").as("user_id")).agg(min(col("e.ts")).as("t2"))
    val p = e.where(col("event_type") === "purchase").as("e")
      .join(broadcast(c).as("c"), col("e.user_id") === col("c.user_id") &&
        col("e.ts") >= col("c.t2") &&
        col("e.ts") <= col("c.t2") + expr("INTERVAL 6 HOUR"))
      .groupBy(col("e.user_id").as("user_id")).agg(min(col("e.ts")).as("t3"))
    v.join(c.withColumnRenamed("user_id", "cu"), col("user_id") === col("cu"), "left")
      .join(p.withColumnRenamed("user_id", "pu"), col("user_id") === col("pu"), "left")
      .select(col("user_id"), lit(1).as("s_view"),
        when(col("cu").isNull, 0).otherwise(1).as("s_click"),
        when(col("pu").isNull, 0).otherwise(1).as("s_purchase"))
      .orderBy(col("user_id"))
  }

  /** Retention cohorts: users grouped by first-activity week, activity
    * counted per (cohort, weeks-since) cell — both week keys are
    * date_trunc('week') so the difference is an exact multiple of 7
    * days (integer division is safe). One distinct per (user, week),
    * one small join to the cohort table, one aggregate.
    */
  val qRetentionCohort: QueryDef = QueryDef.sql("q_retention_cohort",
    """WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
      |SELECT f.cw AS cohort_week,
      |  CAST(date_diff('day', f.cw, a.w) // 7 AS BIGINT) AS week_n,
      |  count(DISTINCT a.user_id) AS n_active
      |FROM a JOIN f ON a.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY cohort_week, week_n""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val f = e.groupBy(col("user_id")).agg(date_trunc("week", min(col("ts"))).as("cw"))
    val a = e.select(col("user_id"), date_trunc("week", col("ts")).as("w")).distinct()
    a.join(broadcast(f), Seq("user_id"))
      .groupBy(col("cw").as("cohort_week"),
        expr("datediff(w, cw) div 7").cast("long").as("week_n"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_n"))
  }

  /** Truncated exponential smoothing (EWMA, α = 0.5, 8-term horizon)
    * over per-user hourly activity counts — the standard trend feature
    * beside raw lags (`ml_lag_features`). α = 0.5 makes every weight an
    * exact binary fraction (2^-(j+1)) and the counts are integers, so
    * each product is exact in double; numerator and denominator are
    * written as the identical left-associated chain on both engines —
    * bit-reproducible without rounding tricks. Missing leading lags drop
    * out of BOTH sums (renormalized partial window), so early rows are
    * true partial-window averages, not zero-padded. Smoothing is over
    * observed hours; compose with q_gap_fill's spine first when true-
    * clock decay matters.
    *
    * Scale: one (user_id) exchange shared by the 7 lag evaluations in a
    * single Window operator; everything else is map-side.
    */
  val seriesEwma: QueryDef = {
    val horizon = 8 // current + 7 lags
    // 0.5, 0.25, ... as exact decimal literals both engines parse identically
    def w(j: Int): String = java.math.BigDecimal.valueOf(0.5).pow(j + 1).toPlainString
    val lagCols = (1 until horizon).map(j => s"lag(c, $j) OVER w AS c$j").mkString(",\n      |  ")
    // e0 suffix: DuckDB otherwise parses bare decimals as DECIMAL and the
    // arithmetic diverges from Spark's double path
    val num = (s"c * ${w(0)}e0" +: (1 until horizon).map(j => s"coalesce(c$j, 0) * ${w(j)}e0")).mkString(" + ")
    val den = (s"${w(0)}e0" +: (1 until horizon).map(j =>
      s"CASE WHEN c$j IS NULL THEN 0e0 ELSE ${w(j)}e0 END")).mkString(" + ")
    QueryDef.sql("series_ewma",
      s"""WITH h AS (SELECT user_id, date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS c
         |           FROM events WHERE user_id % 25 = 0 GROUP BY 1, 2),
         |l AS (SELECT user_id, h, c,
         |  $lagCols
         |  FROM h WINDOW w AS (PARTITION BY user_id ORDER BY h))
         |SELECT user_id, h, c AS n_events,
         |  round(($num) / ($den), 6) AS ewma
         |FROM l ORDER BY user_id, h""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy(col("user_id")).orderBy(col("h"))
      val base = Tables.events(s, dir).where(col("user_id") % 25 === 0)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("c"))
      val lagged = (1 until horizon).foldLeft(base) { (df, j) =>
        df.withColumn(s"c$j", lag(col("c"), j).over(win))
      }
      val numE = (1 until horizon).foldLeft(col("c") * lit(w(0).toDouble): org.apache.spark.sql.Column) {
        (acc, j) => acc + coalesce(col(s"c$j"), lit(0L)) * lit(w(j).toDouble)
      }
      val denE = (1 until horizon).foldLeft(lit(w(0).toDouble): org.apache.spark.sql.Column) {
        (acc, j) => acc + when(col(s"c$j").isNull, lit(0.0)).otherwise(lit(w(j).toDouble))
      }
      lagged.select(col("user_id"), col("h"), col("c").as("n_events"),
        round(numE / denE, 6).as("ewma"))
        .orderBy(col("user_id"), col("h"))
    }
  }

  /** ORC interop roundtrip — the second columnar format through the
    * gate beside parquet: the corpus is written as native ORC (the
    * Hive-ecosystem interchange format a 100 TB pipeline inevitably
    * meets at its edges), read back, and censused per (lang, source)
    * with a content signature — so the gate proves the
    * write → read cycle loses neither rows nor bytes across the
    * format boundary. Same census oracle family as q_shard_roundtrip;
    * the format is the variable.
    */
  val qOrcRoundtrip: QueryDef = QueryDef.sql("q_orc_roundtrip",
    s"""SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id,
       |  CAST(sum(${OracleSql.hash64("'orc'", "text")} % 1000003) AS BIGINT) AS text_sig
       |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, dir) =>
    graft.ops.TextOps.ensureFunctions(s)
    val src = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val orcDir = graft.ops.Scratch.dir(s"q_orc_roundtrip_${Integer.toHexString(dir.hashCode)}")
    src.write.mode("overwrite").orc(orcDir)
    s.read.orc(orcDir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(expr(graft.ops.TextOps.portableHash64Sql("'orc'", "text")) % 1000003L).as("text_sig"))
      .orderBy(col("lang"), col("source"))
  }

  /** JSON-lines sink→source roundtrip under the q_orc_roundtrip gate
    * law: write documents as .json, read back with the EXPLICIT source
    * schema (no inference — a re-inferred schema is a different
    * contract), and prove content identity via the same per-group
    * count/sum/min/max/text-signature rollup the oracle computes from
    * the parquet source. Exercises JSON string escaping (quotes,
    * control chars, unicode) through a full write+read cycle.
    */
  val qJsonRoundtrip: QueryDef = QueryDef.sql("q_json_roundtrip",
    s"""SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id,
       |  CAST(sum(${OracleSql.hash64("'js'", "text")} % 1000003) AS BIGINT) AS text_sig
       |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, dir) =>
    graft.ops.TextOps.ensureFunctions(s)
    val src = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val jsonDir = graft.ops.Scratch.dir(s"q_json_roundtrip_${Integer.toHexString(dir.hashCode)}")
    src.write.mode("overwrite").json(jsonDir)
    s.read.schema(src.schema).json(jsonDir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(expr(graft.ops.TextOps.portableHash64Sql("'js'", "text")) % 1000003L).as("text_sig"))
      .orderBy(col("lang"), col("source"))
  }

  /** CSV sink→source roundtrip (same gate law): header + full quoting
    * with doubled-quote escapes and multiLine read, the one lossy-prone
    * text format — embedded commas, quotes and newlines must survive
    * the cycle for the text signature to match the parquet-source
    * oracle. Schema is passed explicitly on read (CSV carries none).
    */
  val qCsvRoundtrip: QueryDef = QueryDef.sql("q_csv_roundtrip",
    s"""SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id,
       |  CAST(sum(${OracleSql.hash64("'cs'", "text")} % 1000003) AS BIGINT) AS text_sig
       |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, dir) =>
    graft.ops.TextOps.ensureFunctions(s)
    val src = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    val csvDir = graft.ops.Scratch.dir(s"q_csv_roundtrip_${Integer.toHexString(dir.hashCode)}")
    src.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").option("escape", "\"")
      .csv(csvDir)
    s.read.schema(src.schema)
      .option("header", "true").option("multiLine", "true").option("escape", "\"")
      .csv(csvDir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
        sum(expr(graft.ops.TextOps.portableHash64Sql("'cs'", "text")) % 1000003L).as("text_sig"))
      .orderBy(col("lang"), col("source"))
  }

  /** Holt's linear-trend (double exponential) smoothing per user over
    * active-day counts, α=β=0.5 — the forecasting tier's trend member
    * beside [[seriesEwma]] (level only), series_snaive (seasonal naive)
    * and series_trend (global OLS): level adapts to the recent series
    * while trend carries momentum into the one-step forecast. Init
    * l₁=y₁, b₁=y₂−y₁; update l_t = ½y_t + ½(l+b), b_t = ½(l_t−l) + ½b,
    * both ROUNDED to 6 per step — the embed_kmeans iterated-rounding
    * discipline, collapsing any cross-engine drift before it compounds
    * through the recursion.
    *
    * Execution: the update is inherently SEQUENTIAL per key, so it runs
    * as ONE higher-order `aggregate` fold over each user's sorted
    * day-count array — per-group linear work over a time-bounded series
    * (the 100 TB shape: billions of keys in parallel, never a long
    * series per key; the fold never shuffles). The oracle replays the
    * identical recursion as a recursive CTE advancing all users'
    * folds in lockstep.
    */
  val seriesHolt: QueryDef = QueryDef.sql("series_holt",
    """WITH RECURSIVE d AS (
      |  SELECT user_id, CAST(count(*) AS DOUBLE) AS c,
      |    row_number() OVER (PARTITION BY user_id ORDER BY date_trunc('day', ts)) AS rn
      |  FROM events WHERE user_id % 25 = 0
      |  GROUP BY user_id, date_trunc('day', ts)),
      |f AS (
      |  SELECT r1.user_id, CAST(1 AS BIGINT) AS rn, r1.c AS l, r2.c - r1.c AS b
      |  FROM d r1 JOIN d r2 ON r2.user_id = r1.user_id AND r1.rn = 1 AND r2.rn = 2
      |  UNION ALL
      |  SELECT r.user_id, r.rn,
      |    round(0.5e0 * r.c + 0.5e0 * (f.l + f.b), 6) AS l,
      |    round(0.5e0 * (round(0.5e0 * r.c + 0.5e0 * (f.l + f.b), 6) - f.l) + 0.5e0 * f.b, 6) AS b
      |  FROM f JOIN d r ON r.user_id = f.user_id AND r.rn = f.rn + 1)
      |SELECT user_id, CAST(rn AS BIGINT) AS n_days, l AS level, b AS trend,
      |  round(l + b, 6) AS forecast
      |FROM f
      |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY rn DESC) = 1
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val cs = Tables.events(s, dir).where(col("user_id") % 25 === 0)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("c"))
      .groupBy(col("user_id"))
      .agg(expr("transform(array_sort(collect_list(struct(d, c))), p -> p.c)").as("ys"))
      .where(size(col("ys")) >= 2)
    cs.select(col("user_id"), size(col("ys")).cast("long").as("n_days"),
        expr("""aggregate(
          |  slice(ys, 2, size(ys) - 1),
          |  named_struct('l', ys[0], 'b', ys[1] - ys[0]),
          |  (acc, y) -> named_struct(
          |    'l', round(0.5d * y + 0.5d * (acc.l + acc.b), 6),
          |    'b', round(0.5d * (round(0.5d * y + 0.5d * (acc.l + acc.b), 6) - acc.l) + 0.5d * acc.b, 6)))"""
          .stripMargin).as("st"))
      .select(col("user_id"), col("n_days"),
        col("st.l").as("level"), col("st.b").as("trend"),
        round(col("st.l") + col("st.b"), 6).as("forecast"))
      .orderBy(col("user_id"))
  }

  /** SCD-2 history build from the event changelog: each version row gets
    * its validity interval [valid_from, valid_to) via one lead() over
    * (key, ts, id) and an is_current flag — the temporal-table
    * construction that turns an append-only log into point-in-time
    * joinable history (the write-side complement of
    * `q_changelog_compact`'s read-side latest-snapshot).
    *
    * Scale: one exchange on the key, one pass; lead(1) holds one row of
    * state per partition stream. Versions-per-key skew is the same A5
    * hot-key class; intervals are emitted, never materialized as ranges.
    */
  val qScd2History: QueryDef = QueryDef.sql("q_scd2_history",
    """SELECT user_id, event_id, event_type, value, ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  CAST(lead(ts) OVER w IS NULL AS BIGINT) AS is_current
      |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id"))
  }

  /** SCD-2 APPLY — merge a change batch into an existing SCD-2
    * dimension in one pass: each batch key's CURRENT row is closed at
    * the batch's first timestamp (interval close), the batch's own
    * versions chain among themselves (newest stays open), closed
    * historical rows pass through untouched, and keys absent from the
    * batch keep their open row. The write-side completion of the
    * warehouse tier: [[qScd2History]] BUILDS history from a log,
    * q_changelog_compact reads latest state, q_merge_upsert produces a
    * next snapshot — this one EVOLVES a versioned dimension. Each row
    * carries its action (kept/closed/current/new), so the gate checks
    * the merge decisions, not just the final intervals.
    *
    * Correctness law (AnalyticsSpec differential): apply(dim(<cut),
    * batch(≥cut)) ≡ q_scd2_history over ALL events, modulo the action
    * tag — applying a batch IS the incremental form of rebuilding.
    *
    * Shape at 100 TB: the dim-from-events window here is FIXTURE
    * construction (a real warehouse reads the dimension table); the
    * APPLY itself is one broadcast-able join of the per-key
    * first-batch-ts table against the dimension scan (map-only over
    * the dimension — closed rows are never shuffled) plus one window
    * over the daily-sized batch. Nothing corpus-sized shuffles.
    */
  val qScd2Apply: QueryDef = {
    val cut = "2024-01-24 00:00:00"
    QueryDef.sql("q_scd2_apply",
      s"""WITH dim AS (
         |  SELECT user_id, event_id, event_type, value, ts AS valid_from,
         |    lead(ts) OVER w AS valid_to,
         |    CASE WHEN lead(ts) OVER w IS NULL THEN 1 ELSE 0 END AS cur
         |  FROM events WHERE ts < TIMESTAMP '$cut'
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |chg AS (SELECT user_id, event_id, event_type, value, ts
         |        FROM events WHERE ts >= TIMESTAMP '$cut'),
         |fb AS (SELECT user_id, min(ts) AS first_ts FROM chg GROUP BY user_id),
         |hist AS (
         |  SELECT d.user_id, d.event_id, d.event_type, d.value, d.valid_from,
         |    CASE WHEN d.cur = 1 AND fb.user_id IS NOT NULL THEN fb.first_ts
         |         ELSE d.valid_to END AS valid_to,
         |    CASE WHEN d.cur = 1 AND fb.user_id IS NULL THEN 1 ELSE 0 END AS is_current,
         |    CASE WHEN d.cur = 1 AND fb.user_id IS NOT NULL THEN 'closed'
         |         WHEN d.cur = 1 THEN 'current' ELSE 'kept' END AS action
         |  FROM dim d LEFT JOIN fb ON d.user_id = fb.user_id),
         |nw AS (
         |  SELECT user_id, event_id, event_type, value, ts AS valid_from,
         |    lead(ts) OVER w2 AS valid_to,
         |    CASE WHEN lead(ts) OVER w2 IS NULL THEN 1 ELSE 0 END AS is_current,
         |    'new' AS action
         |  FROM chg WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, event_id, event_type, value, valid_from, valid_to,
         |  CAST(is_current AS BIGINT) AS is_current, action
         |FROM (SELECT * FROM hist UNION ALL SELECT * FROM nw)
         |ORDER BY user_id, valid_from, event_id""".stripMargin) { (s, dir) =>
      scd2Apply(Tables.events(s, dir), lit(cut).cast("timestamp"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    }
  }

  /** POINT-IN-TIME lookup against the SCD-2 dimension — the read-side
    * completion of the versioned tier: each probe (user_id, pts)
    * retrieves the version whose validity interval
    * [valid_from, valid_to) contains pts. Executed as the NATIVE as-of
    * join (graft.plans.AsOfJoinExec): "latest valid_from ≤ pts" is
    * exactly interval containment once empty intervals (two versions at
    * one timestamp — the earlier one never valid) are dropped, which
    * also restores the operator's unique-(key, ts) precondition. The
    * oracle states the containment form directly (LEFT JOIN on the
    * interval predicate), so the gate proves as-of ≡ interval
    * containment on the whole corpus — the same law AsOfJoinSpec pins
    * on planted edges.
    *
    * Shape at 100 TB: the naive interval join is a per-key range scan;
    * AsOfJoinExec makes it two thin sorted exchanges + a two-pointer
    * merge with O(1) carry state — probes and versions each shuffle
    * once, no interval table is ever materialized per probe.
    */
  val qScd2PointInTime: QueryDef = QueryDef.sql("q_scd2_pointintime",
    """WITH dim0 AS (
      |  SELECT user_id, event_id AS ver_id, value AS ver_value, ts AS valid_from,
      |    lead(ts) OVER w AS valid_to
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |dim AS (SELECT * FROM dim0 WHERE valid_to IS NULL OR valid_from < valid_to),
      |p AS (SELECT event_id AS probe_id, user_id, ts + INTERVAL 30 MINUTE AS pts
      |      FROM events WHERE user_id % 10 = 0)
      |SELECT p.probe_id, p.user_id, d.ver_id, d.ver_value
      |FROM p LEFT JOIN dim d ON d.user_id = p.user_id AND d.valid_from <= p.pts
      |  AND (d.valid_to IS NULL OR p.pts < d.valid_to)
      |ORDER BY probe_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dim = ev.select(col("user_id"), col("event_id").as("ver_id"),
        col("value").as("ver_value"), col("ts").as("valid_from"),
        lead(col("ts"), 1).over(w).as("valid_to"))
      .where(col("valid_to").isNull || col("valid_from") < col("valid_to"))
      .drop("valid_to")
    val probes = ev.where(col("user_id") % 10 === 0)
      .select(col("event_id").as("probe_id"), col("user_id"),
        (col("ts") + expr("INTERVAL 30 MINUTE")).as("pts"))
    graft.ops.AsOfJoin.asofJoinNative(probes, "user_id", "pts",
        dim, "user_id", "valid_from", Seq("ver_id", "ver_value"))
      .select(col("probe_id"), col("user_id"),
        col("asof_ver_id").as("ver_id"), col("asof_ver_value").as("ver_value"))
      .orderBy(col("probe_id"))
  }

  /** The [[qScd2Apply]] body over an events frame with an explicit cut
    * — factored so the differential spec can drive the cut.
    */
  private[graft] def scd2Apply(ev0: org.apache.spark.sql.DataFrame,
      cut: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = ev0.select(col("user_id"), col("event_id"), col("event_type"),
      col("value"), col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val dim = ev.where(col("ts") < cut)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("ts").as("valid_from"), lead(col("ts"), 1).over(w).as("vt0"))
      .withColumn("cur", col("vt0").isNull)
    val chg = ev.where(col("ts") >= cut)
    val fb = chg.groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
    val hist = dim.join(broadcast(fb), Seq("user_id"), "left")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("valid_from"),
        when(col("cur") && col("first_ts").isNotNull, col("first_ts"))
          .otherwise(col("vt0")).as("valid_to"),
        when(col("cur") && col("first_ts").isNull, 1L).otherwise(0L).as("is_current"),
        when(col("cur") && col("first_ts").isNotNull, "closed")
          .when(col("cur"), "current").otherwise("kept").as("action"))
    val nw = chg
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("ts").as("valid_from"), lead(col("ts"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
      .withColumn("action", lit("new"))
    hist.unionByName(nw)
  }

  /** Rolling z-score anomaly detection over each user's event stream:
    * every event is scored against the trailing-24-event window's
    * sample mean/stddev (the event itself EXCLUDED — a self-including
    * frame dilutes its own anomaly), and rows with z ≥ 3 emit. The
    * monitoring primitive for drift/outlier gating a training-data
    * feed: per-key streaming stats with a warm-up floor (≥ 12 prior
    * events) so cold keys can't fire on noise.
    *
    * Scale: ONE exchange on user_id; both window aggregates share the
    * same frame, and the trailing ROWS frame is bounded state (24 rows)
    * per partition stream, skew class A5. The anomaly filter runs
    * map-side after the window — output is the (tiny) flagged set, not
    * the stream.
    *
    * Determinism: mean/stddev over a 24-row frame differ across engines
    * only by summation order (~1e-13 relative); the flag compares the
    * ROUND-3 z on both sides, so a row flips only if true z sits within
    * drift of a 0.0005 rounding boundary AND that boundary is 3.000 —
    * the pr_rel exposure argument, smaller (z spans [3, ~7] while the
    * cut sits at one point). stddev is SAMPLE (n−1) on both sides, and
    * the n ≥ 12, sd > 0 guards run on the unrounded value identically.
    */
  val seriesAnomaly: QueryDef = QueryDef.sql("series_anomaly",
    """WITH b AS (SELECT event_id, user_id, ts, value,
      |    avg(value) OVER w AS mu,
      |    stddev_samp(value) OVER w AS sd,
      |    count(*) OVER w AS n
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_id, user_id, ts, value,
      |  round(mu, 6) AS mu, round(sd, 6) AS sd,
      |  round((value - mu) / sd, 3) AS z
      |FROM b
      |WHERE n >= 12 AND sd > 0 AND round((value - mu) / sd, 3) >= 3.0
      |ORDER BY user_id, ts, event_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-24, -1)
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        avg(col("value")).over(w).as("mu"),
        stddev_samp(col("value")).over(w).as("sd"),
        count(lit(1)).over(w).as("n"))
      .where(col("n") >= 12 && col("sd") > 0 &&
        round((col("value") - col("mu")) / col("sd"), 3) >= 3.0)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        round(col("mu"), 6).as("mu"), round(col("sd"), 6).as("sd"),
        round((col("value") - col("mu")) / col("sd"), 3).as("z"))
      .orderBy(col("user_id"), col("ts"), col("event_id"))
  }

  /** Interval-union coverage per user: each event spans [ts, ts +
    * floor(value) seconds]; overlapping/touching spans merge, and the
    * query emits each user's merged-island count and total covered
    * time — the "how much wall clock does this key actually cover"
    * operator (audio/video segment coverage, session-time billing,
    * sensor uptime), distinct from gap-sessionization (`sessionize`
    * groups by inactivity gaps; this unions explicit durations).
    *
    * The classic sweep, shuffle-shaped: per key, order intervals by
    * (start, end); a row opens a NEW island iff its start exceeds the
    * running max end of everything earlier (touching merges); the
    * island id is the running sum of open flags; covered time is
    * Σ island (max end − min start). ONE exchange on user_id feeds
    * both windows and the island aggregation (same partitioning).
    * All-integer microsecond arithmetic — bit-exact cross-engine.
    * Duplicate (start, end) ties are island-stable under ANY tie
    * order, so the window's tie ambiguity can't leak into results.
    */
  val qIntervalCoverage: QueryDef = QueryDef.sql("q_interval_coverage",
    """WITH iv AS (SELECT user_id, ts AS s,
      |    ts + to_seconds(CAST(floor(value) AS BIGINT)) AS e FROM events),
      |m AS (SELECT user_id, s, e,
      |    max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
      |  FROM iv),
      |g AS (SELECT user_id, s, e,
      |    sum(CASE WHEN rm IS NULL OR s > rm THEN 1 ELSE 0 END)
      |      OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island
      |  FROM m),
      |isl AS (SELECT user_id, island, min(s) AS st, max(e) AS en FROM g GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(sum(epoch_us(en) - epoch_us(st)) AS BIGINT) AS covered_us
      |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val iv = Tables.events(s, dir).select(col("user_id"), col("ts").as("s"),
      expr("timestampadd(SECOND, CAST(floor(value) AS BIGINT), ts)").as("e"))
    val ord = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"))
    val g = iv
      .withColumn("rm", max(col("e")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island", sum(
        when(col("rm").isNull || col("s") > col("rm"), 1L).otherwise(0L))
        .over(ord.rowsBetween(Window.unboundedPreceding, 0)))
    g.groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("st"), max(col("e")).as("en"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(expr("unix_micros(en) - unix_micros(st)")).as("covered_us"))
      .orderBy(col("user_id"))
  }

  /** Lead-lag cross-correlation between the click and purchase hourly
    * series: Pearson corr of (clicks in hour h, purchases in hour h+L)
    * for L ∈ 0..3, over the DENSE hour spine (zero-filled — skipping
    * inactive hours would condition the estimate on activity and
    * overstate the coupling). The lag that maximizes xcorr is the
    * conversion latency estimate; the cross-family analog of
    * `series_seasonality`'s own-rhythm screen.
    *
    * Determinism: counts are integers, so for each lag ALL five moment
    * sums (Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs in both engines and
    * the single double division happens once, round-6 — no engine
    * corr() is trusted (same discipline as graph_assortativity).
    *
    * Shape at 100 TB: ONE exchange (the per-hour count over events);
    * the spine and the counts table are hours-sized, the lag pairing is
    * an integer-key equi-join between two tiny tables the optimizer
    * broadcasts, and the moments are a 4-group aggregate. Nothing
    * downstream of the first count is event-sized.
    */
  val seriesCrossCorr: QueryDef = QueryDef.sql("series_cross_corr",
    s"""WITH c AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr,
       |    CAST(count(*) FILTER (event_type = '$Rent') AS BIGINT) AS x,
       |    CAST(count(*) FILTER (event_type = '$Return') AS BIGINT) AS y
       |  FROM events GROUP BY 1),
       |b AS (SELECT min(hr) AS h0, max(hr) AS h1 FROM c),
       |sp AS (SELECT unnest(range(h0, h1 + 1)) AS hr FROM b),
       |s AS (SELECT sp.hr, coalesce(c.x, 0) AS x, coalesce(c.y, 0) AS y
       |      FROM sp LEFT JOIN c ON c.hr = sp.hr),
       |p AS (SELECT l.lag, a.x, b2.y
       |      FROM range(0, 4) l(lag)
       |      CROSS JOIN s a JOIN s b2 ON b2.hr = a.hr + l.lag),
       |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |        CAST(sum(x * y) AS BIGINT) AS sxy,
       |        CAST(sum(x * x) AS BIGINT) AS sxx,
       |        CAST(sum(y * y) AS BIGINT) AS syy
       |      FROM p GROUP BY lag)
       |SELECT CAST(lag AS BIGINT) AS lag, n,
       |  round((n * sxy - sx * sy) /
       |        nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
       |               sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0), 6) AS xcorr
       |FROM m ORDER BY lag""".stripMargin) { (s, dir) =>
    val (out, series) = crossCorrFrames(s, dir)
    val rows = out.transform(graft.ops.Ckpt.eager)
    series.unpersist(false)
    rows
  }

  /** (result, cached series) — split out so PlanSpec can assert on the
    * pre-checkpoint plan (localCheckpoint erases it to an RDD scan).
    */
  private[graft] def crossCorrFrames(s: org.apache.spark.sql.SparkSession,
                                     dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val c = Tables.events(s, dir)
      .groupBy(floor(unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("hr"))
      .agg(count(when(col("event_type") === Rent, 1)).as("x"),
        count(when(col("event_type") === Return, 1)).as("y"))
    val spine = c.agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("hr"))
    val series = spine.join(c, Seq("hr"), "left")
      .select(col("hr"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lags = s.range(0, 4).select(col("id").as("lag"))
    val paired = lags.crossJoin(series.select(col("hr").as("ah"), col("x")))
      .join(series.select(col("hr").as("bh"), col("y")),
        col("bh") === col("ah") + col("lag"))
    val out = paired.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")), lit(0.0)), 6)
          .as("xcorr"))
      .orderBy(col("lag"))
    (out, series)
  }

  /** CUSUM level-shift detection per user over the daily count series:
    * the cumulative sum of deviations from the user's mean daily volume,
    * S_t = Σ_{i≤t}(n_i − μ̂), peaks at the most likely change point —
    * the complement of `series_anomaly` (point outliers) for REGIME
    * changes (a user whose baseline volume stepped up/down mid-history,
    * the drift signal that invalidates a trained profile). Emits the
    * break date (first argmax of |S_t|) and the standardized statistic
    * max|S_t| / (σ̂·√N); ≳1.3 rejects "no change" at ~5% for a
    * Brownian-bridge null.
    *
    * Determinism: daily counts are integers, so the running sum, the
    * count and both moment sums are EXACT; μ̂ and σ̂² are single
    * divisions of exact ints (identical doubles in both engines), |S_t|
    * is one multiply-subtract per row from exact inputs, rounded to 6
    * before the argmax so the break-date pick can't straddle an ulp.
    *
    * Shape at 100 TB: one (user, date) count (THE event-sized shuffle),
    * then one user-keyed window pass over the user×days table and
    * user-sized joins — same exchange-reuse class as series_anomaly.
    */
  val seriesCusum: QueryDef = QueryDef.sql("series_cusum",
    """WITH c AS (SELECT user_id, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
      |           FROM events GROUP BY 1, 2),
      |u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS nd,
      |        CAST(sum(n) AS BIGINT) AS sx, CAST(sum(n * n) AS BIGINT) AS sxx
      |      FROM c GROUP BY 1),
      |r AS (SELECT user_id, d,
      |        row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn,
      |        sum(n) OVER (PARTITION BY user_id ORDER BY d
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
      |      FROM c),
      |x AS (SELECT r.user_id, d, round(abs(rs - rn * (sx * 1.0 / nd)), 6) AS cus
      |      FROM r JOIN u USING (user_id)),
      |m AS (SELECT user_id, max(cus) AS mx FROM x GROUP BY 1),
      |b AS (SELECT x.user_id, min(d) AS break_date
      |      FROM x JOIN m ON m.user_id = x.user_id AND x.cus = m.mx GROUP BY 1)
      |SELECT u.user_id, u.nd AS n_days, b.break_date,
      |  round(m.mx / sqrt(((sxx - sx * sx * 1.0 / nd) / (nd - 1)) * nd), 6) AS cusum_stat
      |FROM u JOIN m USING (user_id) JOIN b USING (user_id)
      |WHERE nd >= 14 AND (sxx - sx * sx * 1.0 / nd) > 0
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val u = c.groupBy(col("user_id")).agg(count(lit(1)).as("nd"),
      sum(col("n")).as("sx"), sum(col("n") * col("n")).as("sxx"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val r = c.select(col("user_id"), col("d"),
      row_number().over(wOrd).cast("long").as("rn"),
      sum(col("n")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)).as("rs"))
    val x = r.join(u, "user_id")
      .select(col("user_id"), col("d"),
        round(abs(col("rs") - col("rn") * (col("sx") * lit(1.0) / col("nd"))), 6).as("cus"))
    val m = x.groupBy(col("user_id")).agg(max(col("cus")).as("mx"))
    val b = x.join(m, Seq("user_id"))
      .where(col("cus") === col("mx"))
      .groupBy(col("user_id")).agg(min(col("d")).as("break_date"))
    u.join(m, "user_id").join(b, "user_id")
      .where(col("nd") >= 14 &&
        (col("sxx") - col("sx") * col("sx") * lit(1.0) / col("nd")) > 0)
      .select(col("user_id"), col("nd").as("n_days"), col("break_date"),
        round(col("mx") / sqrt(((col("sxx") - col("sx") * col("sx") * lit(1.0) / col("nd"))
          / (col("nd") - 1)) * col("nd")), 6).as("cusum_stat"))
      .orderBy(col("user_id"))
  }

  /** Seasonality strength per user: the share of hourly-count variance
    * explained by the hour-of-day profile, 1 − SSE/SST over the ACTIVE
    * (date, hour) cells (same no-zero-fill convention as the A2 series)
    * — SST around the user's grand mean, SSE around the user's per-hour
    * means. ≈1 means the user's volume is a pure daily rhythm (the hour
    * profile features will predict well); ≈0 means the profile explains
    * nothing. This is the eta-squared screen a pipeline runs before
    * paying for the W1 ring features.
    *
    * Shape at 100 TB: one (user, date, hour) count (THE shuffle), then
    * both mean tables roll up from it and join back keyed on the user —
    * profile tables are user×24-sized, never event-sized.
    */
  val seriesSeasonality: QueryDef = QueryDef.sql("series_seasonality",
    """WITH c AS (SELECT user_id, CAST(ts AS DATE) AS d, hour(ts) AS h, count(*) AS n
      |           FROM events GROUP BY 1, 2, 3),
      |m AS (SELECT user_id, avg(n) AS mu FROM c GROUP BY 1),
      |mh AS (SELECT user_id, h, avg(n) AS muh FROM c GROUP BY 1, 2),
      |x AS (SELECT c.user_id,
      |        CAST(count(*) AS BIGINT) AS n_cells,
      |        sum((n - mu) * (n - mu)) AS sst,
      |        sum((n - muh) * (n - muh)) AS sse
      |      FROM c JOIN m USING (user_id)
      |      JOIN mh ON mh.user_id = c.user_id AND mh.h = c.h
      |      GROUP BY c.user_id)
      |SELECT user_id, n_cells, round(1 - sse / sst, 6) AS strength
      |FROM x WHERE sst > 0 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val c = Tables.events(s, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"), hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val m = c.groupBy(col("user_id")).agg(avg(col("n")).as("mu"))
    val mh = c.groupBy(col("user_id"), col("h")).agg(avg(col("n")).as("muh"))
    c.join(m, "user_id")
      .join(mh, Seq("user_id", "h"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_cells"),
        sum((col("n") - col("mu")) * (col("n") - col("mu"))).as("sst"),
        sum((col("n") - col("muh")) * (col("n") - col("muh"))).as("sse"))
      .where(col("sst") > 0)
      .select(col("user_id"), col("n_cells"), round(lit(1) - col("sse") / col("sst"), 6).as("strength"))
      .orderBy(col("user_id"))
  }

  /** Autocorrelation function of the daily event-count series at lags
    * 1..7: Pearson corr of (count on day d, count on day d+L) over the
    * DENSE day spine (zero-filled, same conditioning argument as
    * `series_cross_corr`). The lag-7 peak is the weekly-rhythm
    * signature; a slow monotone decay instead flags trend
    * non-stationarity (difference before modeling). Complements
    * `series_cross_corr` (coupling BETWEEN two series) and
    * `series_seasonality` (variance decomposition by hour) with the
    * series' own temporal memory.
    *
    * Determinism: same discipline as series_cross_corr — daily counts
    * are integers, so for each lag all five moment sums are exact
    * BIGINTs in both engines; one double division per lag, round-6.
    *
    * Shape at 100 TB: ONE event-sized exchange (the per-day count);
    * the spine and lag pairing are days-sized broadcasts, the moments
    * a 7-group aggregate. Identical execution class to cross_corr.
    */
  val seriesAcf: QueryDef = QueryDef.sql("series_acf",
    """WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM c),
      |sp AS (SELECT unnest(range(d0, d1 + 1)) AS d FROM b),
      |s AS (SELECT sp.d, coalesce(c.n, 0) AS n FROM sp LEFT JOIN c ON c.d = sp.d),
      |p AS (SELECT l.lag, a.n AS x, b2.n AS y
      |      FROM range(1, 8) l(lag)
      |      CROSS JOIN s a JOIN s b2 ON b2.d = a.d + l.lag),
      |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |        CAST(sum(x * y) AS BIGINT) AS sxy,
      |        CAST(sum(x * x) AS BIGINT) AS sxx,
      |        CAST(sum(y * y) AS BIGINT) AS syy
      |      FROM p GROUP BY lag)
      |SELECT CAST(lag AS BIGINT) AS lag, n,
      |  round((n * sxy - sx * sy) /
      |        nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |               sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0), 6) AS acf
      |FROM m ORDER BY lag""".stripMargin) { (s, dir) =>
    val c = Tables.events(s, dir)
      .groupBy(floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("d"))
      .agg(count(lit(1)).as("n"))
    val spine = c.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    val series = spine.join(c, Seq("d"), "left")
      .select(col("d"), coalesce(col("n"), lit(0L)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = acfOf(s, series, 7).transform(graft.ops.Ckpt.eager)
    series.unpersist(false)
    rows
  }

  /** The ACF core over a DENSE integer series (d, n): per-lag Pearson
    * from exact BIGINT moments, lags 1..maxLag, round-6. Factored for
    * AnalyticsSpec's planted-rhythm pins; see [[seriesAcf]].
    */
  private[graft] def acfOf(s: org.apache.spark.sql.SparkSession,
                           series: org.apache.spark.sql.DataFrame,
                           maxLag: Int): org.apache.spark.sql.DataFrame = {
    val lags = s.range(1, maxLag + 1).select(col("id").as("lag"))
    val paired = lags.crossJoin(series.select(col("d").as("ad"), col("n").as("x")))
      .join(series.select(col("d").as("bd"), col("n").as("y")),
        col("bd") === col("ad") + col("lag"))
    paired.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("lag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          nullif(sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")), lit(0.0)), 6)
          .as("acf"))
      .orderBy(col("lag"))
  }

  /** Seasonal-naive forecast evaluation per user: forecast each day's
    * count with the SAME WEEKDAY LAST WEEK (f_d = n_{d-7}) over the
    * user's dense zero-filled day spine, and score it with MASE =
    * Σ|n−f| / Σ|n−n_{d-1}| — the scale-free standard (Hyndman &
    * Koehler 2006) that compares the weekly-seasonal baseline against
    * the one-day-naive baseline on the same eval rows. MASE < 1 means
    * the user's volume is weekly-rhythmic enough that the seasonal
    * forecast beats persistence — the go/no-go a pipeline checks
    * before paying for per-user models (the decision complement of
    * `series_seasonality`/`series_acf`'s descriptive scores).
    *
    * Determinism: counts, both lag differences and both error sums are
    * EXACT BIGINTs (the spine is dense, so lag-k is well-defined);
    * MASE is one double division of exact ints, round-6. Users whose
    * naive denominator is 0 (constant series) are filtered, as are
    * users with < 21 spine days (too little history for 7-lag eval).
    *
    * Shape at 100 TB: one (user, day) count — THE event-sized
    * exchange — then a user-keyed window pass over the users×days
    * spine for both lags (one partitioning serves both, the cusum
    * exchange-reuse class) and a per-user aggregate. Nothing after
    * the count is event-sized.
    */
  val seriesSnaiveEval: QueryDef = QueryDef.sql("series_snaive_eval",
    """WITH c AS (SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM c GROUP BY 1),
      |sp AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS d FROM b),
      |s AS (SELECT sp.user_id, sp.d, coalesce(c.n, 0) AS n
      |      FROM sp LEFT JOIN c ON c.user_id = sp.user_id AND c.d = sp.d),
      |l AS (SELECT user_id, d, n,
      |        row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn,
      |        lag(n, 7) OVER (PARTITION BY user_id ORDER BY d) AS f,
      |        lag(n, 1) OVER (PARTITION BY user_id ORDER BY d) AS p
      |      FROM s),
      |m AS (SELECT user_id,
      |        CAST(count(*) AS BIGINT) AS n_eval,
      |        CAST(sum(abs(n - f)) AS BIGINT) AS se,
      |        CAST(sum(abs(n - p)) AS BIGINT) AS sn
      |      FROM l WHERE rn > 7 GROUP BY 1)
      |SELECT m.user_id, n_eval, se AS snaive_abs_err, sn AS naive_abs_err,
      |  round(CAST(se AS DOUBLE) / sn, 6) AS mase
      |FROM m WHERE sn > 0 AND n_eval >= 14
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, dir)
      .groupBy(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("d"))
      .agg(count(lit(1)).as("n"))
    val b = c.groupBy(col("user_id")).agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val sp = b.select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val series = sp.join(c, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"), coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val l = series.select(col("user_id"), col("n"),
      row_number().over(w).as("rn"),
      lag(col("n"), 7).over(w).as("f"),
      lag(col("n"), 1).over(w).as("p"))
    l.where(col("rn") > 7)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_eval"),
        sum(abs(col("n") - col("f"))).as("se"),
        sum(abs(col("n") - col("p"))).as("sn"))
      .where(col("sn") > 0 && col("n_eval") >= 14)
      .select(col("user_id"), col("n_eval"),
        col("se").as("snaive_abs_err"), col("sn").as("naive_abs_err"),
        round(col("se").cast("double") / col("sn"), 6).as("mase"))
      .orderBy(col("user_id"))
  }

  /** M4 time-series downsampling (Jugel et al., VLDB 2014): per
    * (user, day) bucket emit min, max, first and last of the `value`
    * measure — the four points that make a downsampled line chart
    * pixel-identical to the full-resolution series at day granularity.
    * This is the dashboard-feeding reduction every monitoring pipeline
    * runs; unlike LTTB it has no sequential dependency between buckets,
    * so it parallelizes as a plain keyed aggregate.
    *
    * Determinism: min/max/first/last are SELECTIONS, not arithmetic —
    * the emitted doubles are bit-identical parquet inputs in both
    * engines; first/last resolve ts ties by event_id via explicit
    * row_number windows (no engine first()/arg_min tie luck).
    *
    * Shape at 100 TB: ONE (user, day) hash exchange serves both
    * row_number windows AND the final aggregate (same keys — Catalyst
    * reuses the partitioning; the windows add only per-partition
    * sorts). Output is buckets-sized.
    */
  val seriesM4Downsample: QueryDef = QueryDef.sql("series_m4_downsample",
    """WITH e AS (SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
      |    ts, event_id, value FROM events),
      |l AS (SELECT user_id, d, value,
      |        row_number() OVER (PARTITION BY user_id, d ORDER BY ts, event_id) AS ra,
      |        row_number() OVER (PARTITION BY user_id, d ORDER BY ts DESC, event_id DESC) AS rd
      |      FROM e)
      |SELECT user_id, d, CAST(count(*) AS BIGINT) AS n,
      |  min(value) AS vmin, max(value) AS vmax,
      |  max(CASE WHEN ra = 1 THEN value END) AS vfirst,
      |  max(CASE WHEN rd = 1 THEN value END) AS vlast
      |FROM l GROUP BY user_id, d
      |ORDER BY user_id, d""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(s, dir).select(col("user_id"),
      floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("d"),
      col("ts"), col("event_id"), col("value"))
    val wA = Window.partitionBy(col("user_id"), col("d"))
      .orderBy(col("ts"), col("event_id"))
    val wD = Window.partitionBy(col("user_id"), col("d"))
      .orderBy(col("ts").desc, col("event_id").desc)
    e.select(col("user_id"), col("d"), col("value"),
        row_number().over(wA).as("ra"), row_number().over(wD).as("rd"))
      .groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"),
        max(when(col("ra") === 1, col("value"))).as("vfirst"),
        max(when(col("rd") === 1, col("value"))).as("vlast"))
      .orderBy(col("user_id"), col("d"))
  }

  /** Per-user burstiness of the inter-event gap process: B = (σ−μ)/(σ+μ)
    * over microsecond gaps between consecutive events (Goh & Barabási
    * 2008) — B → −1 is clockwork, 0 is Poisson, → 1 is bursty. The
    * traffic-shape screen beside series_trend (level drift) and
    * series_cusum (regime change): bursty keys are the ones whose
    * rate-limit and session knobs actually bite, and a burstiness flip
    * without a volume change is a bot-behavior signature volume
    * monitors miss.
    *
    * Determinism: gaps are exact BIGINT microsecond differences over
    * the total (ts, event_id) order, so n, Σg, Σg² are exact; σ uses
    * the population form, one sqrt + one rounded division per user.
    *
    * Shape at 100 TB: one user-keyed window pass for the lag (the
    * cusum exchange class), then a per-user moment aggregate on the
    * same partitioning — Catalyst plans ONE exchange.
    */
  val seriesBurstiness: QueryDef = QueryDef.sql("series_burstiness",
    """WITH g AS (SELECT user_id,
      |    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gp
      |  FROM events),
      |m AS (SELECT user_id, CAST(count(gp) AS BIGINT) AS n,
      |        CAST(sum(gp) AS BIGINT) AS sg,
      |        sum(CAST(gp AS DECIMAL(19,0)) * CAST(gp AS DECIMAL(19,0))) AS sg2
      |      FROM g WHERE gp IS NOT NULL GROUP BY 1)
      |SELECT user_id, n AS n_gaps,
      |  round((sqrt((CAST(sg2 AS DOUBLE) - CAST(sg AS DOUBLE) * sg / n) / n) - CAST(sg AS DOUBLE) / n)
      |        / (sqrt((CAST(sg2 AS DOUBLE) - CAST(sg AS DOUBLE) * sg / n) / n) + CAST(sg AS DOUBLE) / n), 6) AS burstiness
      |FROM m WHERE n >= 20 AND sg > 0
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val g = Tables.events(s, dir).select(col("user_id"),
      (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gp"))
    val m = g.where(col("gp").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(col("gp")).as("n"), sum(col("gp")).as("sg"),
        // µs gaps square past Long range — exact DECIMAL, like the money sums
        sum(col("gp").cast("decimal(19,0)") * col("gp").cast("decimal(19,0)")).as("sg2"))
    val sd = sqrt((col("sg2").cast("double") - col("sg").cast("double") * col("sg") / col("n")) / col("n"))
    m.where(col("n") >= 20 && col("sg") > 0)
      .select(col("user_id"), col("n").as("n_gaps"),
        round((sd - col("sg").cast("double") / col("n")) /
          (sd + col("sg").cast("double") / col("n")), 6).as("burstiness"))
      .orderBy(col("user_id"))
  }

  /** Per-user OLS trend of the daily-count series: slope (events/day),
    * intercept and R² over the user's ACTIVE days, x = day − first day
    * (small exact integers). The volume-trajectory screen beside
    * series_cusum (abrupt regime change) and series_snaive_eval
    * (rhythm): a steep |slope| with high R² marks users whose level is
    * DRIFTING — the population a static profile model silently
    * mispredicts first.
    *
    * Determinism: x and y are BIGINTs, so all five regression moments
    * are exact; slope/intercept/R² are the same double expressions on
    * identical inputs in both engines, round-6. Users need ≥ 14 active
    * days and non-degenerate x/y variance (R²'s denominator).
    *
    * Shape at 100 TB: one (user, day) count — the event-sized
    * exchange — then a per-user moment aggregate; closed-form math on
    * the users-sized result. No window pass at all (the regression
    * needs only sums, not order).
    */
  val seriesTrend: QueryDef = QueryDef.sql("series_trend",
    """WITH c AS (SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |x AS (SELECT user_id, d - min(d) OVER (PARTITION BY user_id) AS x, y FROM c),
      |m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |        CAST(sum(x * y) AS BIGINT) AS sxy,
      |        CAST(sum(x * x) AS BIGINT) AS sxx,
      |        CAST(sum(y * y) AS BIGINT) AS syy
      |      FROM x GROUP BY 1)
      |SELECT user_id, n AS n_days,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6) AS slope,
      |  round((sy - CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) * sx) / n, 6) AS intercept,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy)
      |        / ((n * sxx - sx * sx) * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
      |FROM m
      |WHERE n >= 14 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, dir)
      .groupBy(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("d"))
      .agg(count(lit(1)).as("y"))
    val x = c.select(col("user_id"),
      (col("d") - min(col("d")).over(Window.partitionBy(col("user_id")))).as("x"), col("y"))
    val m = x.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy"))
    val dx = (col("n") * col("sxx") - col("sx") * col("sx"))
    val dy = (col("n") * col("syy") - col("sy") * col("sy"))
    m.where(col("n") >= 14 && dx > 0 && dy > 0)
      .select(col("user_id"), col("n").as("n_days"),
        round(num.cast("double") / dx, 6).as("slope"),
        round((col("sy") - num.cast("double") / dx * col("sx")) / col("n"), 6).as("intercept"),
        round(num.cast("double") * num / (dx * dy.cast("double")), 6).as("r2"))
      .orderBy(col("user_id"))
  }

  /** STL-style additive decomposition of the GLOBAL hourly volume series:
    * trend = centered 25-hour moving average over the dense zero-filled
    * hour spine, seasonal = the hour-of-day mean of the detrended
    * series, resid = what's left. The classic pre-modeling decomposition
    * (Cleveland's STL with the loess passes replaced by their moving-
    * average/seasonal-mean skeleton — the part that is exactly
    * expressible in both engines); complements series_seasonality
    * (variance share) with the actual per-hour components. Edge hours
    * without a full ±12 window are excluded (no partial-window bias).
    *
    * Determinism: counts are BIGINT, the MA is an exact BIGINT window
    * sum, and seasonal/resid are emitted from the common-denominator
    * integer forms — trend·25 = sw, seasonal·25·cntₕ = 25·snₕ − sswₕ —
    * so every output is ONE double division of exact integers, round-6.
    *
    * Scale: the only event-sized operation is the hour-count aggregate;
    * the spine, window and seasonal profile run over CALENDAR-sized
    * rows (hours in the time span — ~90k per decade, independent of
    * corpus size), so the single-partition ordered window is bounded by
    * the calendar, not the data (the series_acf argument).
    */
  val seriesStl: QueryDef = QueryDef.sql("series_stl",
    """WITH c AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hd,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(hd) AS d0, max(hd) AS d1 FROM c),
      |sp AS (SELECT unnest(range(d0, d1 + 1)) AS hd FROM b),
      |s AS (SELECT sp.hd, coalesce(c.n, 0) AS n FROM sp LEFT JOIN c ON c.hd = sp.hd),
      |w AS (SELECT hd, n,
      |        CAST(sum(n) OVER (ORDER BY hd ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT) AS sw
      |      FROM s),
      |i AS (SELECT w.hd, w.hd % 24 AS h, w.n, w.sw
      |      FROM w, b WHERE w.hd BETWEEN b.d0 + 12 AND b.d1 - 12),
      |g AS (SELECT h, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(n) AS BIGINT) AS sn,
      |        CAST(sum(sw) AS BIGINT) AS ssw
      |      FROM i GROUP BY h)
      |SELECT i.hd, i.h, i.n,
      |  round(i.sw / 25.0, 6) AS trend,
      |  round((25 * g.sn - g.ssw) / (25.0 * g.cnt), 6) AS seasonal,
      |  round((25 * g.cnt * i.n - g.cnt * i.sw - (25 * g.sn - g.ssw)) / (25.0 * g.cnt), 6) AS resid
      |FROM i JOIN g USING (h) ORDER BY hd""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, dir)
      .groupBy(floor(unix_micros(col("ts")) / lit(3600000000L)).cast("long").as("hd"))
      .agg(count(lit(1)).as("n"))
    val b = c.agg(min(col("hd")).as("d0"), max(col("hd")).as("d1"))
    val spine = b.select(explode(sequence(col("d0"), col("d1"))).as("hd"))
    val ser = spine.join(c, Seq("hd"), "left")
      .select(col("hd"), coalesce(col("n"), lit(0L)).as("n"))
    val ma = ser.withColumn("sw",
      sum(col("n")).over(Window.orderBy(col("hd")).rowsBetween(-12, 12)))
    val i = ma.crossJoin(broadcast(b))
      .where(col("hd").between(col("d0") + 12, col("d1") - 12))
      .select(col("hd"), (col("hd") % 24).as("h"), col("n"), col("sw"))
    val g = i.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"), sum(col("n")).as("sn"), sum(col("sw")).as("ssw"))
    i.join(broadcast(g), Seq("h"))
      .select(col("hd"), col("h"), col("n"),
        round(col("sw") / lit(25.0), 6).as("trend"),
        round((lit(25) * col("sn") - col("ssw")) / (lit(25.0) * col("cnt")), 6).as("seasonal"),
        round((lit(25) * col("cnt") * col("n") - col("cnt") * col("sw") -
          (lit(25) * col("sn") - col("ssw"))) / (lit(25.0) * col("cnt")), 6).as("resid"))
      .orderBy(col("hd"))
  }

  /** S5/S6 WRITE PATH under the oracle gate — the last spec-only sink op
    * gets a hard CORRECTNESS row. [[graft.core.Sinks.shardedParquet]]
    * writes the documents projection directory-partitioned by
    * (lang, source), sorted by doc_id, with an 8-row per-file cap (small
    * enough to force the cap to actually split files at gate scale);
    * the query then reads the shards BACK and emits a per-partition
    * census: counts, char mass, id bounds and a content signature over
    * the roundtripped TEXT. The oracle reproduces the census from the
    * same LOGICAL input — it never sees the files — so lost/duplicated
    * rows, mangled partition-directory values, or a broken text
    * roundtrip all break the hash. `files_ok` gates the
    * maxRecordsPerFile contract: the Spark side computes it from the
    * real file layout (max rows per written file ≤ cap — a files-sized
    * aggregate, S10-tiny), the oracle states it as the literal TRUE the
    * contract requires, so a cap violation fails the row.
    *
    * Shards land under a per-process [[graft.ops.Scratch]] path
    * (Overwrite mode — reruns replace; the shutdown hook cleans up, and
    * concurrent JVMs get disjoint trees); they must outlive this
    * function because the census plan is evaluated lazily by the
    * caller.
    */
  val qShardRoundtrip: QueryDef = QueryDef.sql("q_shard_roundtrip",
    s"""SELECT lang, source, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id,
       |  CAST(sum(${OracleSql.hash64("'rt'", "text")} % 1000003) AS BIGINT) AS text_sig,
       |  TRUE AS files_ok
       |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, dir) =>
    graft.ops.TextOps.ensureFunctions(s)
    val src = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
    // the cap scales with the corpus (n/100, floor 8) so the gate corpus
    // still forces real file splits while a 10x corpus doesn't explode
    // into 10x tiny files (the n/cap file-count floor is the cost knob;
    // a fixed cap made this query write-bound at bench SF)
    val cap = math.max(8L, src.count() / 100L)
    val shardDir = graft.ops.Scratch.dir(s"q_shard_roundtrip_${Integer.toHexString(dir.hashCode)}")
    graft.core.Sinks.shardedParquet(src, shardDir, Seq("lang", "source"), Seq("doc_id"), cap)
    // ONE read-back pass: per-file sub-aggregates roll up to the census
    // AND the per-group max-rows-per-file that gates the cap contract
    s.read.parquet(shardDir)
      .groupBy(col("lang"), col("source"), input_file_name().as("f"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"),
        min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"),
        sum(expr(graft.ops.TextOps.portableHash64Sql("'rt'", "text")) % 1000003L).as("sig"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n")).as("n_rows"), sum(col("sc")).as("sum_chars"),
        min(col("mn")).as("min_id"), max(col("mx")).as("max_id"),
        sum(col("sig")).as("text_sig"), (max(col("n")) <= cap).as("files_ok"))
      .select(col("lang"), col("source"), col("n_rows"), col("sum_chars"),
        col("min_id"), col("max_id"), col("text_sig"), col("files_ok"))
      .orderBy(col("lang"), col("source"))
  }

  /** Two-predicate census over a Z-ORDER-clustered rewrite of the
    * documents table — the multi-column layout gate: the Spark side
    * writes the table clustered by the Morton interleave of bucketized
    * (n_chars, doc_id) ([[graft.ops.Layout.zorderedParquet]] on the
    * native ZOrder64 kernel), reads it back, and answers a census
    * filtered on BOTH columns; the oracle is LAYOUT-INDEPENDENT (the
    * same census straight off the source), so a green row proves the
    * clustering rewrite loses nothing while ZOrderSpec measures what it
    * buys — per-file min/max boxes tight in both dims, so either
    * predicate (or both) prunes files, where a single-column sort
    * prunes on one. Bucket bounds are a one-row collect (S10-tiny, the
    * shard-cap precedent).
    */
  val qZorderCensus: QueryDef = QueryDef.sql("q_zorder_census",
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(min(doc_id) AS BIGINT) AS min_id, CAST(max(doc_id) AS BIGINT) AS max_id
      |FROM documents
      |WHERE n_chars BETWEEN 100 AND 300 AND doc_id BETWEEN 100 AND 350
      |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    val src = Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars"))
    val zdir = graft.ops.Scratch.dir(s"q_zorder_${Integer.toHexString(dir.hashCode)}")
    val b = src.agg(min(col("doc_id")).cast("long").as("i0"),
      max(col("doc_id")).cast("long").as("i1"),
      min(col("n_chars")).cast("long").as("c0"),
      max(col("n_chars")).cast("long").as("c1")).head()
    val zk = graft.ops.Layout.zorder(
      graft.ops.Layout.rangeBucket(col("n_chars"), b.getLong(2), b.getLong(3), 10),
      graft.ops.Layout.rangeBucket(col("doc_id"), b.getLong(0), b.getLong(1), 10))
    graft.ops.Layout.zorderedParquet(src, zdir, zk,
      numFiles = 8, maxRecordsPerFile = math.max(16L, src.count() / 64L))
    s.read.parquet(zdir)
      .where(col("n_chars").between(100, 300) && col("doc_id").between(100, 350))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      .orderBy(col("lang"))
  }

  /** One-way ANOVA of daily volume across ISO weekdays — the "does
    * day-of-week explain the variance" F-test read beside
    * series_seasonality's variance share: per-weekday moment vectors
    * (n, Σy, Σy²) are exact BIGINTs, and the between/within sums of
    * squares are computed from a PIVOTED one-row layout so the 7-term
    * Σs_g²/n_g chain is a FIXED-ORDER double expression (a cross-row
    * double sum would be association-ordered — the pivot is what makes
    * the statistic cross-engine bit-stable). Weekday comes from pure
    * integer day arithmetic ((day+3)%7+1 — epoch day 0 is a Thursday),
    * missing weekdays contribute zero via the coalesce guard.
    */
  val seriesAnova: QueryDef = {
    val termSql = (1 to 7).map(i =>
      s"coalesce(CAST(s$i AS DOUBLE) * s$i / n$i, 0)").mkString(" + ")
    val pivotSql = (1 to 7).flatMap(i => Seq(
      s"max(CASE WHEN wd = $i THEN n END) AS n$i",
      s"max(CASE WHEN wd = $i THEN s END) AS s$i")).mkString(",\n      |        ")
    QueryDef.sql("series_anova",
      s"""WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
         |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
         |g AS (SELECT (day + 3) % 7 + 1 AS wd, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
         |      FROM c GROUP BY 1),
         |p AS (SELECT $pivotSql,
         |        CAST(sum(n) AS BIGINT) AS nn, CAST(sum(s) AS BIGINT) AS ss,
         |        CAST(sum(q) AS BIGINT) AS qq, CAST(count(*) AS BIGINT) AS k FROM g),
         |e AS (SELECT nn, k, ($termSql) AS term, CAST(ss AS DOUBLE) * ss / nn AS grand, qq FROM p),
         |f AS (SELECT nn, k, term - grand AS ssb, qq - term AS ssw FROM e)
         |SELECT nn AS n_days, k, round(ssb, 6) AS ssb, round(ssw, 6) AS ssw,
         |  round((ssb / nullif(k - 1, 0)) / nullif(ssw / nullif(nn - k, 0), 0), 6) AS f_stat,
         |  round(ssb / nullif(ssb + ssw, 0), 6) AS eta2
         |FROM f""".stripMargin) { (s, dir) =>
      val c = Tables.events(s, dir)
        .groupBy(floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("day"))
        .agg(count(lit(1)).as("y"))
      val g = c.groupBy(((col("day") + 3) % 7 + 1).as("wd"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
          sum(col("y") * col("y")).as("q"))
      val pivotAggs = (1 to 7).flatMap(i => Seq(
        max(when(col("wd") === i, col("n"))).as(s"n$i"),
        max(when(col("wd") === i, col("s"))).as(s"s$i"))) ++ Seq(
        sum(col("n")).cast("long").as("nn"), sum(col("s")).cast("long").as("ss"),
        sum(col("q")).cast("long").as("qq"), count(lit(1)).cast("long").as("k"))
      val p = g.agg(pivotAggs.head, pivotAggs.tail: _*)
      val e = p.select(col("nn"), col("k"),
        expr(s"($termSql)").as("term"),
        (col("ss").cast("double") * col("ss") / col("nn")).as("grand"), col("qq"))
      val f = e.select(col("nn"), col("k"),
        (col("term") - col("grand")).as("ssb"), (col("qq") - col("term")).as("ssw"))
      f.select(col("nn").as("n_days"), col("k"),
        round(col("ssb"), 6).as("ssb"), round(col("ssw"), 6).as("ssw"),
        round((col("ssb") / nullif(col("k") - 1, lit(0L))) /
          nullif(col("ssw") / nullif(col("nn") - col("k"), lit(0L)), lit(0.0)), 6).as("f_stat"),
        round(col("ssb") / nullif(col("ssb") + col("ssw"), lit(0.0)), 6).as("eta2"))
    }
  }

  /** First/last-touch attribution: for every purchase, the earliest and
    * latest view by the same user within the preceding 7 days, plus the
    * touch count — the multi-touch attribution primitive (first =
    * demand creation, last = conversion credit). The pairing is a
    * USER-equi join with a time-band residual (never a cross); both
    * endpoints come from rank-1 rows of two windows sharing one pid
    * partitioning, tie-broken on (ts, event_id) so same-timestamp views
    * cannot flip credit between engines. Purchases with no view in the
    * window have no attribution row by definition (inner semantics).
    */
  val qAttribution: QueryDef = QueryDef.sql("q_attribution",
    """WITH v AS (SELECT user_id, event_id AS vid, ts AS vts FROM events
      |           WHERE event_type = 'view'),
      |p AS (SELECT user_id, event_id AS pid, ts AS pts FROM events
      |      WHERE event_type = 'purchase'),
      |j AS (SELECT p.pid, v.vid, v.vts
      |      FROM p JOIN v ON v.user_id = p.user_id
      |       AND v.vts <= p.pts AND v.vts >= p.pts - INTERVAL 7 DAYS),
      |r AS (SELECT pid, vid,
      |        row_number() OVER (PARTITION BY pid ORDER BY vts, vid) AS rf,
      |        row_number() OVER (PARTITION BY pid ORDER BY vts DESC, vid DESC) AS rl,
      |        CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS n FROM j)
      |SELECT pid, CAST(max(CASE WHEN rf = 1 THEN vid END) AS BIGINT) AS first_view,
      |  CAST(max(CASE WHEN rl = 1 THEN vid END) AS BIGINT) AS last_view,
      |  CAST(max(n) AS BIGINT) AS n_touch
      |FROM r GROUP BY pid ORDER BY pid""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val v = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("vid"), col("ts").as("vts"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts").as("pts"))
    val j = p.join(v, Seq("user_id"))
      .where(col("vts") <= col("pts") &&
        col("vts") >= col("pts") - expr("INTERVAL 7 DAYS"))
    val r = j.select(col("pid"), col("vid"),
      row_number().over(Window.partitionBy(col("pid"))
        .orderBy(col("vts"), col("vid"))).as("rf"),
      row_number().over(Window.partitionBy(col("pid"))
        .orderBy(col("vts").desc, col("vid").desc)).as("rl"),
      count(lit(1)).over(Window.partitionBy(col("pid"))).cast("long").as("n"))
    r.groupBy(col("pid"))
      .agg(max(when(col("rf") === 1, col("vid"))).cast("long").as("first_view"),
        max(when(col("rl") === 1, col("vid"))).cast("long").as("last_view"),
        max(col("n")).cast("long").as("n_touch"))
      .orderBy(col("pid"))
  }

  /** Bollinger bands over the dense daily volume series: trailing
    * 7-day moving average ± 2σ (population σ from the EXACT integer
    * window moments — sqrt((nΣy²−S²))/n, one double chain per row) with
    * the breach flag an unrounded comparison computed identically in
    * both engines. Rows without a full window are excluded (no
    * partial-window bias — the series_stl edge rule). The volume-
    * anomaly monitor ops teams actually run, as one calendar-bounded
    * window pass.
    */
  val seriesBollinger: QueryDef = QueryDef.sql("series_bollinger",
    """WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
      |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM c),
      |sp AS (SELECT unnest(range(d0, d1 + 1)) AS d FROM b),
      |s AS (SELECT sp.d, coalesce(c.y, 0) AS y FROM sp LEFT JOIN c ON c.d = sp.d),
      |w AS (SELECT d, y,
      |        CAST(sum(y) OVER win AS BIGINT) AS sy,
      |        CAST(sum(y * y) OVER win AS BIGINT) AS syy,
      |        CAST(count(*) OVER win AS BIGINT) AS k,
      |        row_number() OVER (ORDER BY d) AS rn
      |      FROM s WINDOW win AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT d, y, round(CAST(sy AS DOUBLE) / k, 6) AS ma,
      |  round(sqrt(CAST(k * syy - sy * sy AS DOUBLE)) / k, 6) AS sd,
      |  y > CAST(sy AS DOUBLE) / k + 2 * (sqrt(CAST(k * syy - sy * sy AS DOUBLE)) / k) AS breach_hi,
      |  y < CAST(sy AS DOUBLE) / k - 2 * (sqrt(CAST(k * syy - sy * sy AS DOUBLE)) / k) AS breach_lo
      |FROM w WHERE rn >= 7 ORDER BY d""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, dir)
      .groupBy(floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("d"))
      .agg(count(lit(1)).as("y"))
    val spine = c.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    val series = spine.join(c, Seq("d"), "left")
      .select(col("d"), coalesce(col("y"), lit(0L)).as("y"))
    val win = Window.orderBy(col("d")).rowsBetween(-6, Window.currentRow)
    val w = series.select(col("d"), col("y"),
      sum(col("y")).over(win).cast("long").as("sy"),
      sum(col("y") * col("y")).over(win).cast("long").as("syy"),
      count(lit(1)).over(win).cast("long").as("k"),
      row_number().over(Window.orderBy(col("d"))).as("rn"))
    val ma = col("sy").cast("double") / col("k")
    val sd = sqrt((col("k") * col("syy") - col("sy") * col("sy")).cast("double")) / col("k")
    w.where(col("rn") >= 7)
      .select(col("d"), col("y"), round(ma, 6).as("ma"), round(sd, 6).as("sd"),
        (col("y") > ma + lit(2) * sd).as("breach_hi"),
        (col("y") < ma - lit(2) * sd).as("breach_lo"))
      .orderBy(col("d"))
  }

  /** Per-user presence bitmasks: the hour-of-day and day-of-week sets a
    * user is active in, packed into single BIGINTs via bit_or(1 << k) —
    * the roaring-bitmap-style compact state trick: 24- and 7-slot SETS
    * ride the shuffle as 8 bytes each (map-side combinable, no
    * collect_set array state), with bit_count recovering the
    * cardinalities. All-integer output; one hash aggregate.
    */
  val qPresenceBitmask: QueryDef = QueryDef.sql("q_presence_bitmask",
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
    Tables.events(s, dir)
      .select(col("user_id"),
        (floor(unix_micros(col("ts")) / lit(3600000000L)) % 24).cast("int").as("h"),
        (floor(unix_micros(col("ts")) / lit(86400000000L)) % 7).cast("int").as("wd"))
      .groupBy(col("user_id"))
      .agg(expr("CAST(bit_or(shiftleft(CAST(1 AS BIGINT), h)) AS BIGINT)").as("hour_mask"),
        expr("CAST(bit_count(bit_or(shiftleft(CAST(1 AS BIGINT), h))) AS BIGINT)").as("n_hours"),
        expr("CAST(bit_or(shiftleft(CAST(1 AS BIGINT), wd)) AS BIGINT)").as("day_mask"),
        expr("CAST(bit_count(bit_or(shiftleft(CAST(1 AS BIGINT), wd))) AS BIGINT)").as("n_days"))
      .orderBy(col("user_id"))
  }

  /** Partial autocorrelation of the daily-count series at lags 1–3 via
    * the Durbin–Levinson recursion UNROLLED over the round-6 ACF values
    * (φ11 = r1; φ22 = (r2−r1²)/(1−r1²); φ33 from the order-2
    * coefficients) — the AR-order diagnostic read next to series_acf:
    * ACF says "correlated at lag k", PACF says "correlated at lag k
    * AFTER removing shorter lags". Starting from the ROUNDED r_k makes
    * both engines run the identical scalar double chain on identical
    * inputs (the recursion is division-heavy, so it must not start from
    * last-ulp-divergent moments); every stage is zero-denominator
    * guarded. Cost beyond the shared ACF moments: a 3-row pivot and
    * per-row arithmetic.
    */
  val seriesPacf: QueryDef = QueryDef.sql("series_pacf",
    """WITH c AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM c),
      |sp AS (SELECT unnest(range(d0, d1 + 1)) AS d FROM b),
      |s AS (SELECT sp.d, coalesce(c.n, 0) AS n FROM sp LEFT JOIN c ON c.d = sp.d),
      |p AS (SELECT l.lag, a.n AS x, b2.n AS y
      |      FROM range(1, 4) l(lag)
      |      CROSS JOIN s a JOIN s b2 ON b2.d = a.d + l.lag),
      |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |        CAST(sum(x * y) AS BIGINT) AS sxy,
      |        CAST(sum(x * x) AS BIGINT) AS sxx,
      |        CAST(sum(y * y) AS BIGINT) AS syy
      |      FROM p GROUP BY lag),
      |acf AS (SELECT lag,
      |  round((n * sxy - sx * sy) /
      |        nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |               sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0), 6) AS r
      |  FROM m),
      |a AS (SELECT max(CASE WHEN lag = 1 THEN r END) AS r1,
      |        max(CASE WHEN lag = 2 THEN r END) AS r2,
      |        max(CASE WHEN lag = 3 THEN r END) AS r3 FROM acf),
      |p2 AS (SELECT r1, r2, r3,
      |        (r2 - r1 * r1) / nullif(1 - r1 * r1, 0) AS f22,
      |        r1 * (1 - r2) / nullif(1 - r1 * r1, 0) AS f21 FROM a),
      |p3 AS (SELECT r1, r2, r3, f21, f22,
      |        (r3 - f21 * r2 - f22 * r1) /
      |          nullif(1 - f21 * r1 - f22 * r2, 0) AS f33 FROM p2)
      |SELECT CAST(1 AS BIGINT) AS lag, round(r1, 6) AS pacf FROM p3
      |UNION ALL SELECT 2, round(f22, 6) FROM p3
      |UNION ALL SELECT 3, round(f33, 6) FROM p3
      |ORDER BY lag""".stripMargin) { (s, dir) =>
    val c = Tables.events(s, dir)
      .groupBy(floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("d"))
      .agg(count(lit(1)).as("n"))
    val spine = c.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("d"))
    val series = spine.join(c, Seq("d"), "left")
      .select(col("d"), coalesce(col("n"), lit(0L)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = acfOf(s, series, 3)
      .agg(max(when(col("lag") === 1, col("acf"))).as("r1"),
        max(when(col("lag") === 2, col("acf"))).as("r2"),
        max(when(col("lag") === 3, col("acf"))).as("r3"))
    val den1 = nullif(lit(1) - col("r1") * col("r1"), lit(0.0))
    val p3 = a
      .withColumn("f22", (col("r2") - col("r1") * col("r1")) / den1)
      .withColumn("f21", col("r1") * (lit(1) - col("r2")) / den1)
      .withColumn("f33", (col("r3") - col("f21") * col("r2") - col("f22") * col("r1")) /
        nullif(lit(1) - col("f21") * col("r1") - col("f22") * col("r2"), lit(0.0)))
      .transform(graft.ops.Ckpt.eager)
    series.unpersist(false)
    p3.select(lit(1L).as("lag"), round(col("r1"), 6).as("pacf"))
      .unionAll(p3.select(lit(2L).as("lag"), round(col("f22"), 6).as("pacf")))
      .unionAll(p3.select(lit(3L).as("lag"), round(col("f33"), 6).as("pacf")))
      .orderBy(col("lag"))
  }

  /** Robust trend per user over the daily-count series: Mann–Kendall S
    * statistic and Kendall tau (pairwise sign agreement with time) plus
    * the Theil–Sen slope (median of all pairwise slopes — the
    * breakdown-resistant twin of series_trend's OLS slope, which a
    * single outlier day can drag arbitrarily). S and tau are exact
    * integer arithmetic; each pairwise slope is one BIGINT/BIGINT
    * double division (IEEE-identical cross-engine), and the median is
    * the LOWER median picked by rank (rn = (cnt+1) div 2) — selecting a
    * value rather than averaging two keeps it a single exact division,
    * and equal-valued boundary slopes make the row_number tiebreak
    * immaterial.
    *
    * Scale shape: the pairwise self-join is per-user and CALENDAR-
    * bounded (n_days^2 pairs per user, n_days <= the observation
    * window, never event-count-sized), one shuffle on user_id shared by
    * both sides; the ranking window rides the same partitioning. The
    * naive global form — cross-joining raw events — would be
    * event-quadratic; grouping to the day grain first is what makes
    * the test run at corpus scale.
    */
  val seriesMannKendall: QueryDef = QueryDef.sql("series_mann_kendall",
    """WITH c AS (SELECT user_id, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS d,
      |    CAST(count(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |p AS (SELECT a.user_id,
      |        CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sg,
      |        CAST(b.y - a.y AS DOUBLE) / (b.d - a.d) AS slope
      |      FROM c a JOIN c b ON a.user_id = b.user_id AND b.d > a.d),
      |n AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1),
      |s AS (SELECT user_id, CAST(sum(sg) AS BIGINT) AS s_stat FROM p GROUP BY 1),
      |med AS (SELECT user_id, slope FROM (
      |    SELECT user_id, slope,
      |      row_number() OVER (PARTITION BY user_id ORDER BY slope) AS rn,
      |      count(*) OVER (PARTITION BY user_id) AS cnt FROM p)
      |  WHERE rn = (cnt + 1) // 2)
      |SELECT n.user_id, n.n AS n_days, s.s_stat,
      |  round(CAST(s.s_stat AS DOUBLE) * 2 / (n.n * (n.n - 1)), 6) AS tau,
      |  round(med.slope, 6) AS ts_slope
      |FROM n JOIN s ON s.user_id = n.user_id JOIN med ON med.user_id = n.user_id
      |WHERE n.n >= 14 ORDER BY n.user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(s, dir)
      .groupBy(col("user_id"),
        floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long").as("d"))
      .agg(count(lit(1)).as("y"))
    val a = c.select(col("user_id"), col("d").as("d1"), col("y").as("y1"))
    val b = c.select(col("user_id"), col("d").as("d2"), col("y").as("y2"))
    val p = a.join(b, Seq("user_id")).where(col("d2") > col("d1"))
      .select(col("user_id"),
        when(col("y2") > col("y1"), 1).when(col("y2") < col("y1"), -1).otherwise(0).as("sg"),
        ((col("y2") - col("y1")).cast("double") / (col("d2") - col("d1"))).as("slope"))
    val n = c.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val st = p.groupBy(col("user_id")).agg(sum(col("sg")).cast("long").as("s_stat"))
    val med = p
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("slope"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .where(col("rn") === floor((col("cnt") + 1) / lit(2)).cast("int"))
      .select(col("user_id"), col("slope"))
    n.join(st, "user_id").join(med, "user_id")
      .where(col("n") >= 14)
      .select(col("user_id"), col("n").as("n_days"), col("s_stat"),
        round(col("s_stat").cast("double") * 2 / (col("n") * (col("n") - 1)), 6).as("tau"),
        round(col("slope"), 6).as("ts_slope"))
      .orderBy(col("user_id"))
  }

  val all: Seq[QueryDef] = Seq(qShardRoundtrip,
    seriesWeekday, seriesHour, seriesMonth, seriesWeekdayReturns,
    seriesMonthReturns, seriesJoin, stationHourPivot,
    nextWindowTarget, nextWindowTargetChunked, tumblingHour,
    splitTraining, splitValidation, splitTesting,
    sessionize, qSessionWindow, qUnifyParse,
    qConversionFunnel, qRetentionCohort, seriesEwma, qScd2History, qScd2Apply,
    qScd2PointInTime,
    seriesAnomaly, qIntervalCoverage, seriesSeasonality,
    seriesCrossCorr, seriesCusum, seriesAcf, seriesSnaiveEval,
    seriesM4Downsample, seriesTrend, seriesBurstiness, seriesHolt,
    qOrcRoundtrip, seriesStl, seriesMannKendall, seriesPacf, qPresenceBitmask,
    qJsonRoundtrip, qCsvRoundtrip, seriesBollinger, qAttribution, seriesAnova,
    qZorderCensus)

}
