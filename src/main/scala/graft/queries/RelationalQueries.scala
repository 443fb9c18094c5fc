package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational coverage over the TPC-H-ish tables. Sums over money columns
  * go through DECIMAL casts (exact, order-independent) and are emitted as
  * doubles; see QueryDef's determinism contract.
  */
object RelationalQueries {

  /** TPC-H Q1-shaped pricing summary (A2-free: one hash aggregate). */
  val q1Agg: QueryDef = QueryDef.sql("q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_extendedprice), 6) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    val tax = col("l_tax").cast("decimal(4,2)")
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  import graft.ops.Relational.{money, rate, revenue}
  import org.apache.spark.sql.expressions.Window

  /** Multi-way star join: revenue per region/nation (J2-style shuffle join
    * on the fact keys; dims broadcast).
    */
  val qJoinAgg: QueryDef = QueryDef.sql("q_join_agg",
    """SELECT r_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val joined = li
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
    joined.groupBy(col("r_name"), col("n_name"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Broadcast dimension join: no shuffle of the fact side (J4 analog). */
  val qBroadcastJoin: QueryDef = QueryDef.sql("q_broadcast_join",
    """SELECT p_brand,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("p_brand"))
  }

  /** Top-k with deterministic tiebreak (L-family; TakeOrderedAndProject). */
  val qTopk: QueryDef = QueryDef.sql("q_topk",
    """SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY o_custkey
      |ORDER BY revenue DESC, o_custkey LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(money(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_custkey"))
      .limit(10)
  }

  /** Ranking window functions (engine extension beyond the reference's W-ops). */
  val qWindowRank: QueryDef = QueryDef.sql("q_window_rank",
    """SELECT o_orderkey, o_custkey,
      |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
      |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS BIGINT) AS rk,
      |  lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS prev_price
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val wDet = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val wStatus = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderstatus"))
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"),
      row_number().over(wDet).cast("long").as("rn"),
      rank().over(wStatus).cast("long").as("rk"),
      lag(col("o_totalprice"), 1).over(wDet).as("prev_price"))
      .orderBy(col("o_orderkey"))
  }

  /** The array / higher-order-function surface in one gated result:
    * per customer, order prices collect into an array (in integer
    * CENTS — double→string rendering differs across engines, exact
    * cents do not), then array_sort, slice (top-3), filter (count over
    * threshold), transform+aggregate (sum of the sorted head) and
    * array_join exercise the HOF pipeline inside whole-stage codegen.
    * Arrays leave as joined strings so the gate hashes a stable
    * encoding; every number is an exact BIGINT.
    */
  val qArrayFuncs: QueryDef = QueryDef.sql("q_array_funcs",
    """WITH o AS (SELECT o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders),
      |a AS (SELECT o_custkey, list_sort(list(cents)) AS arr FROM o GROUP BY o_custkey)
      |SELECT o_custkey, CAST(len(arr) AS BIGINT) AS n_orders,
      |  array_to_string(arr[1:3], ',') AS low3,
      |  CAST(len(list_filter(arr, x -> x > 10000000)) AS BIGINT) AS n_over_100k,
      |  CAST(list_sum(arr[1:3]) AS BIGINT) AS low3_sum,
      |  CAST(arr[-1] AS BIGINT) AS max_cents
      |FROM a ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey"))
      .agg(array_sort(collect_list(col("cents"))).as("arr"))
      .select(col("o_custkey"),
        size(col("arr")).cast("long").as("n_orders"),
        array_join(expr("transform(slice(arr, 1, 3), x -> CAST(x AS STRING))"), ",")
          .as("low3"),
        size(expr("filter(arr, x -> x > 10000000)")).cast("long").as("n_over_100k"),
        expr("aggregate(slice(arr, 1, 3), 0L, (acc, x) -> acc + x)").as("low3_sum"),
        element_at(col("arr"), -1).cast("long").as("max_cents"))
      .orderBy(col("o_custkey"))
  }

  /** The conditional/selective aggregate surface in one gated result —
    * count_if, bool_and/bool_or, max_by/min_by, exact median — per
    * lang over documents. The arg-extrema ride a UNIQUE ordering key
    * (n_chars·2²⁰ + doc_id, doc_id < 2²⁰ guaranteed by the generator's
    * id density) so ties cannot flip the winner between engines, and
    * median's even-count interpolation is the same (a+b)/2 in both.
    */
  val qAggFuncs: QueryDef = QueryDef.sql("q_agg_funcs",
    """WITH w AS (SELECT max(doc_id) + 1 AS wd FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count_if(n_chars > 500) AS BIGINT) AS n_long,
      |  bool_and(n_chars > 0) AS all_pos,
      |  bool_or(n_chars > 3000) AS any_huge,
      |  CAST(arg_max(doc_id, n_chars * wd + doc_id) AS BIGINT) AS longest_doc,
      |  CAST(arg_min(doc_id, n_chars * wd + doc_id) AS BIGINT) AS shortest_doc,
      |  round(CAST(median(n_chars) AS DOUBLE), 6) AS med_chars
      |FROM documents, w GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    // arg-extrema ordering key packed at a DATA-DERIVED width (doc_id
    // fits under max(doc_id)+1 by construction, so the key is unique at
    // every SF — a fixed 2^20 width silently lost uniqueness past
    // doc_id 2^20) as a one-row broadcast; if n_chars·wd ever exceeds
    // BIGINT both engines fail LOUD (Spark ANSI / DuckDB overflow),
    // never with a wrong winner.
    val docs = Tables.documents(s, dir)
    val wd = docs.agg((max(col("doc_id")) + 1).as("wd"))
    docs.crossJoin(broadcast(wd))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        count_if(col("n_chars") > 500).cast("long").as("n_long"),
        bool_and(col("n_chars") > 0).as("all_pos"),
        bool_or(col("n_chars") > 3000).as("any_huge"),
        max_by(col("doc_id"), col("n_chars") * col("wd") + col("doc_id"))
          .cast("long").as("longest_doc"),
        min_by(col("doc_id"), col("n_chars") * col("wd") + col("doc_id"))
          .cast("long").as("shortest_doc"),
        round(median(col("n_chars")).cast("double"), 6).as("med_chars"))
      .orderBy(col("lang"))
  }

  /** The navigation/distribution window-function surface in one gated
    * result — lead/lag, first/last/nth over the full-partition frame,
    * ntile, percent_rank, cume_dist — per customer in (o_orderdate,
    * o_orderkey) order. The sort key is unique, so the distribution
    * functions are exact rationals (round-6) and every navigation value
    * is deterministic; all windows share ONE partitioning (a single
    * exchange + sort serves every function).
    */
  val qWindowNavigation: QueryDef = QueryDef.sql("q_window_navigation",
    """SELECT o_orderkey, o_custkey,
      |  lead(o_totalprice) OVER w AS next_price,
      |  lag(o_totalprice) OVER w AS prev_price,
      |  first_value(o_totalprice) OVER wf AS first_price,
      |  last_value(o_totalprice) OVER wf AS last_price,
      |  nth_value(o_totalprice, 2) OVER wf AS second_price,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  round(percent_rank() OVER w, 6) AS prank,
      |  round(cume_dist() OVER w, 6) AS cdist
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir).select(
      col("o_orderkey"), col("o_custkey"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      first(col("o_totalprice")).over(wf).as("first_price"),
      last(col("o_totalprice")).over(wf).as("last_price"),
      nth_value(col("o_totalprice"), 2).over(wf).as("second_price"),
      ntile(4).over(w).cast("long").as("quartile"),
      round(percent_rank().over(w), 6).as("prank"),
      round(cume_dist().over(w), 6).as("cdist"))
      .orderBy(col("o_orderkey"))
  }

  /** UNION / INTERSECT / EXCEPT in one tagged result (U-family + extensions). */
  val qSetops: QueryDef = QueryDef.sql("q_setops",
    """WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
      |b AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
      |SELECT 'except' AS op, k FROM (SELECT k FROM a EXCEPT SELECT k FROM b)
      |UNION ALL SELECT 'intersect' AS op, k FROM (SELECT k FROM a INTERSECT SELECT k FROM b)
      |UNION ALL SELECT 'union' AS op, k FROM (SELECT k FROM a UNION SELECT k FROM b)
      |ORDER BY op, k""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val a = o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("k")).distinct()
    val b = o.where(col("o_orderstatus") === "O").select(col("o_custkey").as("k")).distinct()
    a.except(b).select(lit("except").as("op"), col("k"))
      .unionAll(a.intersect(b).select(lit("intersect").as("op"), col("k")))
      .unionAll(a.union(b).distinct().select(lit("union").as("op"), col("k")))
      .orderBy(col("op"), col("k"))
  }

  /** ROLLUP grouping sets (free from Catalyst; NULL-marker rows pinned
    * NULLS FIRST on both sides).
    */
  val qRollup: QueryDef = QueryDef.sql("q_rollup",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Distinct aggregates (expand + two-phase agg under the hood). */
  val qDistinctAgg: QueryDef = QueryDef.sql("q_distinct_agg",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS nd_part,
      |  count(DISTINCT l_suppkey) AS nd_supp,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Left-semi join == EXISTS. */
  val qSemiJoin: QueryDef = QueryDef.sql("q_semi_join",
    """SELECT c_custkey FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).where(col("o_totalprice") > 100000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join == NOT EXISTS. */
  val qAntiJoin: QueryDef = QueryDef.sql("q_anti_join",
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  /** As-of join: each click matched to the user's latest prior (or
    * simultaneous) purchase. Spark side is the single-shuffle union+window
    * formulation (ops.AsOfJoin); oracle is DuckDB's native ASOF JOIN.
    */
  val qAsofJoin: QueryDef = QueryDef.sql("q_asof_join",
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS rts, max(value) AS rvalue
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, p.rts AS asof_ts, p.rvalue AS asof_rvalue
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.rts <= c.ts
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("rts"))
      .agg(max(col("value")).as("rvalue"))
    graft.ops.AsOfJoin.asofJoin(clicks, "user_id", "ts",
        purchases, "user_id", "rts", Seq("rvalue"))
      .select(col("event_id"), col("asof_ts"), col("asof_rvalue"))
      .orderBy(col("event_id"))
  }

  /** FORWARD as-of join (earliest purchase at/after each click) through
    * the NATIVE physical operator on the negated time axis
    * (AsOfJoin.asofJoinForward) — the next-event lookup every
    * time-to-conversion / next-arrival analysis runs, checked against
    * DuckDB's forward ASOF (`p.rts >= c.ts`). Same thin-exchange +
    * two-pointer-merge scale story as the backward native gate row;
    * AsOfJoinSpec pins forward-native ≡ forward-composed.
    */
  val qAsofForward: QueryDef = QueryDef.sql("q_asof_forward",
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS rts, max(value) AS rvalue
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, p.rts AS asof_ts, p.rvalue AS asof_rvalue
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.rts >= c.ts
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("rts"))
      .agg(max(col("value")).as("rvalue"))
    graft.ops.AsOfJoin.asofJoinForward(clicks, "user_id", "ts",
        purchases, "user_id", "rts", Seq("rvalue"), native = true)
      .select(col("event_id"), col("asof_ts"), col("asof_rvalue"))
      .orderBy(col("event_id"))
  }

  /** TOLERANCED as-of join (ops.AsOfJoin.asofJoinWithin over the NATIVE
    * operator): each click matched to the user's latest prior purchase
    * ONLY if it happened within the last 6 hours — staler matches null
    * out, row kept (the pandas `merge_asof(tolerance=...)` contract;
    * the feature-freshness guard every point-in-time training join
    * needs so a model never trains on months-old "latest" state).
    * Oracle: DuckDB ASOF LEFT JOIN + the same gap mask.
    */
  val qAsofTolerance: QueryDef = QueryDef.sql("q_asof_tolerance",
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS rts, max(value) AS rvalue
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |j AS (SELECT c.event_id, c.ts, p.rts, p.rvalue
      |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.rts <= c.ts)
      |SELECT event_id,
      |  CASE WHEN rts IS NOT NULL AND epoch_us(ts) - epoch_us(rts) <= 21600000000 THEN rts END AS asof_ts,
      |  CASE WHEN rts IS NOT NULL AND epoch_us(ts) - epoch_us(rts) <= 21600000000 THEN rvalue END AS asof_rvalue
      |FROM j ORDER BY event_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("rts"))
      .agg(max(col("value")).as("rvalue"))
    graft.ops.AsOfJoin.asofJoinWithin(clicks, "user_id", "ts",
        purchases, "user_id", "rts", Seq("rvalue"),
        toleranceMicros = 21600000000L, native = true)
      .select(col("event_id"), col("asof_ts"), col("asof_rvalue"))
      .orderBy(col("event_id"))
  }

  /** Exact percentiles (linear interpolation — identical definition in
    * both engines) and statistical aggregates. Rounding scaled to each
    * statistic's cross-engine numeric error (see QueryDef contract).
    */
  val qPercentileStats: QueryDef = QueryDef.sql("q_percentile_stats",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |  round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
      |  round(stddev_samp(l_quantity), 4) AS sd_qty,
      |  round(var_samp(l_quantity), 2) AS var_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 6).as("p90_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 2).as("var_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** CUBE grouping sets (all 4 combinations; NULL markers pinned). */
  val qCube: QueryDef = QueryDef.sql("q_cube",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(money(col("l_quantity"))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** ROWS-frame running aggregate (cumulative revenue per customer in
    * deterministic order) — decimal-exact so the running values match.
    */
  val qRunningSum: QueryDef = QueryDef.sql("q_running_sum",
    """SELECT o_orderkey, o_custkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_rev
      |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        sum(money(col("o_totalprice"))).over(w).cast("double").as("running_rev"))
      .orderBy(col("o_orderkey"))
  }

  /** Range join: clicks counted inside each purchase's 2-hour follow-up
    * window, per user. Spark side is the bucketed equi-join decomposition
    * (ops.RangeJoin); the oracle is a plain inequality join. Zero-match
    * intervals kept via the left join (count = 0).
    */
  val qRangeJoin: QueryDef = QueryDef.sql("q_range_join",
    """WITH p AS (SELECT event_id AS pid, user_id, ts FROM events WHERE event_type = 'click'),
      |r AS (SELECT event_id AS rid, user_id, ts AS start, ts + INTERVAL 2 HOUR AS fin
      |      FROM events WHERE event_type = 'purchase'),
      |m AS (SELECT r.rid, count(p.pid) AS n
      |      FROM r LEFT JOIN p ON p.user_id = r.user_id AND p.ts >= r.start AND p.ts < r.fin
      |      GROUP BY r.rid)
      |SELECT rid, n FROM m ORDER BY rid""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val points = e.where(col("event_type") === "click")
      .select(col("event_id").as("pid"), col("user_id"), col("ts"))
    val intervals = e.where(col("event_type") === "purchase")
      .select(col("event_id").as("rid"), col("user_id").as("ruser"),
        col("ts").as("start"), (col("ts") + expr("INTERVAL 2 HOURS")).as("fin"))
    val matched = graft.ops.RangeJoin.pointInInterval(
        points, "user_id", "ts", intervals.withColumnRenamed("ruser", "user_id"),
        "user_id", "start", "fin", 2L * 3600L * 1000000L)
      .groupBy(col("rid")).agg(count(lit(1)).as("n"))
    intervals.select(col("rid"))
      .join(matched, Seq("rid"), "left")
      .select(col("rid"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("rid"))
  }

  /** Data-quality profiling: per-column null/distinct/min/max stats for
    * the orders table in long form — the pre-training sanity pass a data
    * pipeline runs over every ingested source.
    */
  val qProfileStats: QueryDef = QueryDef.sql("q_profile_stats",
    """SELECT 'o_custkey' AS col, count(*) AS n,
      |  count(*) - count(o_custkey) AS n_null,
      |  count(DISTINCT o_custkey) AS n_distinct,
      |  CAST(min(o_custkey) AS VARCHAR) AS mn, CAST(max(o_custkey) AS VARCHAR) AS mx
      |FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
      |  count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
      |FROM orders
      |UNION ALL
      |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
      |  count(DISTINCT o_totalprice),
      |  CAST(round(min(o_totalprice), 2) AS VARCHAR), CAST(round(max(o_totalprice), 2) AS VARCHAR)
      |FROM orders
      |ORDER BY col""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    def prof(name: String, mn: org.apache.spark.sql.Column, mx: org.apache.spark.sql.Column) =
      o.agg(count(lit(1)).as("n"),
        (count(lit(1)) - count(col(name))).as("n_null"),
        countDistinct(col(name)).as("n_distinct"),
        mn.as("mn"), mx.as("mx"))
        .select(lit(name).as("col"), col("n"), col("n_null"), col("n_distinct"),
          col("mn"), col("mx"))
    prof("o_custkey", min(col("o_custkey")).cast("string"), max(col("o_custkey")).cast("string"))
      .unionByName(prof("o_orderstatus", min(col("o_orderstatus")), max(col("o_orderstatus"))))
      .unionByName(prof("o_totalprice",
        round(min(col("o_totalprice")), 2).cast("string"),
        round(max(col("o_totalprice")), 2).cast("string")))
      .orderBy(col("col"))
  }

  /** Correlated-subquery pattern: customers with balance above their
    * nation's average, decorrelated to groupBy-stats + broadcast join.
    * (A `Window.partitionBy(c_nationkey)` would cap parallelism at the
    * ~25 nations; the grouped aggregate partial-aggregates map-side and
    * the 25-row stats table broadcasts.)
    */
  /** The bal > avg threshold is evaluated in EXACT decimal arithmetic
    * (bal·n > Σbal, all DECIMAL): a double average is summation-order-
    * dependent, and a customer within last-ulp distance of the mean
    * would nondeterministically flip row membership between engines —
    * the one divergence round(,6) cannot absorb because it changes the
    * row SET, not a value.
    */
  val qAboveAvg: QueryDef = QueryDef.sql("q_above_avg",
    """WITH s AS (SELECT c_nationkey,
      |             sum(CAST(c_acctbal AS DECIMAL(12,2))) AS tot,
      |             count(*) AS cnt
      |           FROM customer GROUP BY c_nationkey)
      |SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS bal
      |FROM customer JOIN s USING (c_nationkey)
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * cnt > tot
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val stats = c.groupBy(col("c_nationkey"))
      .agg(sum(col("c_acctbal").cast("decimal(12,2)")).as("tot"),
        count(lit(1)).as("cnt"))
    c.join(broadcast(stats), Seq("c_nationkey"))
      .where(col("c_acctbal").cast("decimal(12,2)") * col("cnt") > col("tot"))
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("bal"))
      .orderBy(col("c_custkey"))
  }

  /** Hot-key-safe aggregation through ops.Skew.saltedCount: two-phase
    * salted count (partials on (key, salt) combine map-side, the first
    * shuffle spreads a hot key over `buckets` reducers). Result is
    * identical to a plain GROUP BY — which is exactly what the oracle
    * runs, proving the salting is semantics-free.
    */
  val qSaltedCount: QueryDef = QueryDef.sql("q_salted_count",
    """SELECT user_id AS k, count(*) AS n FROM events
      |GROUP BY 1 ORDER BY k""".stripMargin) { (s, dir) =>
    graft.ops.Skew.saltedCount(Tables.events(s, dir), col("user_id"), 8)
      .orderBy(col("k"))
  }

  /** The `spark.sql(...)` entry point, exercised with ONE SQL string that
    * parses identically in Spark and DuckDB (TPC-H Q6 shape): proves the
    * pure-SQL surface of the engine — temp view over the parquet scan,
    * ANSI predicates, decimal-exact aggregation — yields the same plan
    * quality (pushdown reaches the scan) as the DataFrame API.
    */
  val qSqlTpch6: QueryDef = {
    val sharedSql =
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin
    QueryDef.sql("q_sql_tpch6", sharedSql) { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql(sharedSql)
    }
  }

  /** Explicit GROUPING SETS (the general form ROLLUP/CUBE specialize):
    * an arbitrary set list — here (flag, status), (status), () — with
    * `grouping()` markers distinguishing aggregation NULLs from data
    * NULLs, which is what makes grouping-set output machine-consumable.
    * Same Expand-based two-phase aggregate under the hood as rollup;
    * one shuffle. SQL-first (the DataFrame API has no grouping-sets
    * verb; rollup/cube cover the common cases).
    */
  val qGroupingSets: QueryDef = {
    val sharedSql =
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
    QueryDef.sql("q_grouping_sets", sharedSql) { (s, dir) =>
      Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
      s.sql(sharedSql)
    }
  }

  /** Correlated scalar subqueries — orders priced above 1.5× THEIR
    * customer's own average. Catalyst decorrelates
    * (RewriteCorrelatedScalarSubquery) into aggregate + join, so the
    * declarative form costs the same plan as the hand-written
    * q_above_avg pattern; three correlated subqueries (predicate ×2 +
    * projection) prove multi-use decorrelation. The predicate is
    * DECIMAL-exact — `2·price·count > 3·sum` instead of a float-avg
    * comparison, whose boundary could flip rows between engines — and
    * only the DISPLAYED average divides (exact decimal → double, one
    * deterministic division) before round-6.
    */
  val qCorrSubquery: QueryDef = {
    val sharedSql =
      """SELECT o_orderkey, o_custkey,
        |  CAST(o_totalprice AS DOUBLE) AS price,
        |  round(CAST((SELECT sum(CAST(i.o_totalprice AS DECIMAL(12,2))) FROM orders i
        |              WHERE i.o_custkey = o.o_custkey) AS DOUBLE)
        |    / (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey), 6) AS cust_avg
        |FROM orders o
        |WHERE 2 * CAST(o_totalprice AS DECIMAL(12,2)) *
        |    (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |  > 3 * (SELECT sum(CAST(i.o_totalprice AS DECIMAL(12,2))) FROM orders i
        |         WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin
    QueryDef.sql("q_corr_subquery", sharedSql) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(sharedSql)
    }
  }

  /** Unpivot (A6/A7's inverse): wide measure columns to long
    * (key, measure, value) rows via the codegen'd `stack` generator — no
    * shuffle, one scan. Values rounded to the cross-engine granularity.
    */
  val qUnpivot: QueryDef = QueryDef.sql("q_unpivot",
    """SELECT p_partkey, measure, round(value, 2) AS value
      |FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
      |             p_retailprice AS retailprice FROM part)
      |UNPIVOT (value FOR measure IN (size, retailprice))
      |ORDER BY p_partkey, measure""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"), expr(
        """stack(2, 'size', CAST(p_size AS DOUBLE),
          |         'retailprice', p_retailprice) AS (measure, value)""".stripMargin))
      .select(col("p_partkey"), col("measure"), round(col("value"), 2).as("value"))
      .orderBy(col("p_partkey"), col("measure"))
  }

  /** Full outer join — the reconciliation shape (both sides keep their
    * unmatched rows): per-customer order counts against the filtered
    * customer dimension, so BOTH null sides occur (customers with no
    * orders; ordering customers outside the segment filter). Spark
    * plans a shuffled SMJ — full outer cannot broadcast either side.
    */
  val qFullOuter: QueryDef = QueryDef.sql("q_full_outer",
    """WITH a AS (SELECT o_custkey, count(*) AS n_ord FROM orders
      |           WHERE o_totalprice > 400000 GROUP BY o_custkey),
      |b AS (SELECT c_custkey, c_mktsegment FROM customer
      |      WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE'))
      |SELECT coalesce(a.o_custkey, b.c_custkey) AS custkey,
      |  coalesce(a.n_ord, 0) AS n_ord,
      |  coalesce(b.c_mktsegment, 'none') AS segment,
      |  CASE WHEN a.o_custkey IS NULL THEN 1 ELSE 0 END AS no_orders,
      |  CASE WHEN b.c_custkey IS NULL THEN 1 ELSE 0 END AS off_segment
      |FROM a FULL JOIN b ON a.o_custkey = b.c_custkey
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val a = Tables.orders(s, dir).where(col("o_totalprice") > 400000)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
    val b = Tables.customer(s, dir)
      .where(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey"), col("c_mktsegment"))
    a.join(b, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(
        coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
        coalesce(col("n_ord"), lit(0L)).as("n_ord"),
        coalesce(col("c_mktsegment"), lit("none")).as("segment"),
        when(col("o_custkey").isNull, 1).otherwise(0).as("no_orders"),
        when(col("c_custkey").isNull, 1).otherwise(0).as("off_segment"))
      .orderBy(col("custkey"))
  }

  /** Bloom-pruned semi-join calibration (functions/BloomSketch.scala):
    * build ONE 4096-bit/4-probe filter over the urgent-order custkeys
    * (512 B of mergeable bitset state — at 100 TB you build this over
    * the filtered-but-not-broadcastable join side and semi-prune the
    * fact scan BEFORE its shuffle, the persistable cross-job analog of
    * Spark's runtime bloom join), probe every customer against the
    * broadcast scalar with pure codegen'd integer ops, and emit the
    * calibration table next to the exact semi-join truth: per segment,
    * how many customers pass the filter, how many truly match, and how
    * many are false passes (the real join would drop them; there are
    * never false negatives — BloomSketchSpec pins that plus bitset
    * parity with the DuckDB mirror).
    */
  val qBloomPrune: QueryDef = {
    val (m, k) = (4096, 4)
    val hOrd = OracleSql.hash64("'bloom'", "o_custkey")
    val hCust = OracleSql.hash64("'bloom'", "c_custkey")
    QueryDef.sql("sketch_bloom_prune",
      s"""WITH j AS (SELECT unnest([0, 1, 2, 3]) AS j),
         |ord AS (SELECT DISTINCT o_custkey, $hOrd AS hv FROM orders
         |        WHERE o_orderpriority = '1-URGENT'),
         |bits AS (SELECT DISTINCT ((o.hv >> (12 * j.j)) & ${m - 1}) AS b
         |         FROM ord o CROSS JOIN j),
         |cust AS (SELECT c_custkey, c_mktsegment, $hCust AS hv FROM customer),
         |probe AS (SELECT c.c_custkey, c.c_mktsegment,
         |            count(*) FILTER (WHERE bt.b IS NULL) = 0 AS pass
         |          FROM cust c CROSS JOIN j
         |          LEFT JOIN bits bt ON bt.b = ((c.hv >> (12 * j.j)) & ${m - 1})
         |          GROUP BY 1, 2)
         |SELECT p.c_mktsegment, count(*) AS n_cust,
         |  CAST(sum(CASE WHEN p.pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST(sum(CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         |  CAST(sum(CASE WHEN p.pass AND o.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pass
         |FROM probe p
         |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders
         |           WHERE o_orderpriority = '1-URGENT') o
         |  ON o.o_custkey = p.c_custkey
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.ops.TextOps
      graft.functions.BloomSketch.register(s)
      TextOps.ensureFunctions(s)
      // persisted: the distinct key set feeds BOTH the bloom build and
      // the exact-truth join — unpersisted, the full orders scan +
      // filter + distinct exchange executes twice (the redundant pass is
      // exactly what the calibration would mis-measure). A few KB per
      // run; production analog: the materialized key table the filter is
      // built from.
      val urgent = Tables.orders(s, dir)
        .where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val bloom = urgent
        .select(expr(TextOps.portableHash64Sql("'bloom'", "o_custkey")).as("hv"))
        .agg(expr(s"bloom_sketch(hv, $m, $k)").as("bf"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          expr(TextOps.portableHash64Sql("'bloom'", "c_custkey")).as("hv"))
        .crossJoin(broadcast(bloom))
        .withColumn("pass",
          expr(graft.functions.BloomSketch.mightContainSql("bf", "hv", m, k)))
        .join(urgent.withColumnRenamed("o_custkey", "match_key"),
          col("c_custkey") === col("match_key"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(col("match_key").isNotNull, 1L).otherwise(0L)).as("n_match"),
          sum(when(col("pass") && col("match_key").isNull, 1L).otherwise(0L)).as("n_false_pass"))
        .orderBy(col("c_mktsegment"))
    }
  }

  /** Time-series gap fill + forward fill (densification): per user, an
    * hourly spine from first to last active hour (`sequence` + explode —
    * generated, never stored), left-joined against the hourly aggregate,
    * missing hours emitted with n_events = 0 and the value carried
    * forward by `last(ignoreNulls)` over one (user, hour) window. The
    * standard sensor/feature-store densification op the reference's
    * pivot-era dense fill (A7) only approximates per station-hour.
    *
    * Scale shape (observed plan, PlanSpec-pinned): ONE hash exchange on
    * user_id builds the span table; the spine explode (Generate) keeps
    * that partitioning, the hourly aggregate broadcasts into the left
    * join, and the forward-fill window reuses the spine's partitioning —
    * zero exchanges between join and window. The spine is proportional
    * to Σ per-key span, never wider than the output. At a scale where
    * the hourly aggregate outgrows a broadcast, the join becomes a SMJ
    * on (user_id, h) and the window re-exchanges on user_id — still one
    * pass of output-sized data. A key whose span explodes (years of
    * hours) is the same hot-key problem as A5 and takes the same chunked
    * decomposition; here spans are bounded by the corpus window. First
    * spine hour always has data (it IS min(h)), so the fill never emits
    * a leading null.
    */
  val qGapFill: QueryDef = QueryDef.sql("q_gap_fill",
    """WITH b AS (SELECT user_id, date_trunc('hour', ts) AS h,
      |             count(*) AS n_events, sum(value) AS v
      |           FROM events WHERE user_id % 25 = 0 GROUP BY 1, 2),
      |sp AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      |       FROM (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM b GROUP BY user_id)),
      |j AS (SELECT sp.user_id, sp.h, b.n_events, b.v
      |      FROM sp LEFT JOIN b ON b.user_id = sp.user_id AND b.h = sp.h)
      |SELECT user_id, h, CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
      |  round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY h
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v_ffill
      |FROM j ORDER BY user_id, h""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val b = Tables.events(s, dir).where(col("user_id") % 25 === 0)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("v"))
    val spine = b.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(b, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(last(col("v"), ignoreNulls = true).over(w), 6).as("v_ffill"))
      .orderBy(col("user_id"), col("h"))
  }

  /** Changelog compaction (CDC latest-snapshot / SCD-1 merge read side):
    * one row per key carrying the columns of its latest version, ordered
    * by (ts, event_id) — event_id breaks timestamp ties deterministically.
    * Implemented as a single `max(struct(ord..., payload...))` hash
    * aggregate, NOT a row_number window: the aggregate partial-combines
    * map-side (each task keeps one struct per local key, the shuffle
    * moves one row per key per task) where the window formulation must
    * shuffle EVERY version to its key's partition and sort — at 100 TB of
    * changelog with high version-to-key ratios the aggregate is the only
    * viable shape. Struct comparison is lexicographic, so leading
    * (ts, event_id) decides and the payload fields ride along.
    */
  val qChangelogCompact: QueryDef = QueryDef.sql("q_changelog_compact",
    """WITH r AS (SELECT user_id, ts, event_id, event_type, value,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
      |  count(*) OVER (PARTITION BY user_id) AS n_versions FROM events)
      |SELECT user_id, ts AS last_ts, event_id AS last_event_id,
      |  event_type AS last_type, value AS last_value, n_versions
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("ts"), col("event_id"), col("event_type"), col("value"))).as("m"),
        count(lit(1)).as("n_versions"))
      .select(col("user_id"), col("m.ts").as("last_ts"),
        col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_type"),
        col("m.value").as("last_value"), col("n_versions"))
      .orderBy(col("user_id"))
  }

  /** 2-D Pareto frontier (skyline) of customers by (total spend,
    * order count), both maximized: a customer emits iff no other
    * customer is >= on both measures with one strict (exact duplicates
    * keep the lowest key). The multi-criteria "best set" operator
    * (Börzsönyi et al. 2001) — top-k by any single score can't express
    * it, and the naive formulation is an O(n²) NOT EXISTS self-join.
    *
    * One sorted pass instead: order by (spend DESC, n DESC, key), keep
    * a row iff its n strictly exceeds the running max n of everything
    * earlier — earlier rows are exactly the potential dominators, so
    * the filter is provably the skyline (ties and duplicates fall out
    * of the order's tiebreak). The global sort is the scale hazard,
    * and the fix is the skyline's distributive law: a partition-local
    * skyline pass (same window keyed by spark_partition_id) can only
    * drop rows some partition-mate already dominates, so it preserves
    * the global skyline while shrinking the global pass's input from
    * n to Σ(per-partition frontier) — the local/global two-phase of
    * Börzsönyi's block-nested-loop made shuffle-shaped. The local
    * pass's partitioning dependence is immaterial: it is a FILTER
    * whose keep-set varies but whose downstream result is invariant
    * (oracle-checked either way).
    */
  val qSkyline: QueryDef = QueryDef.sql("q_skyline",
    """WITH s AS (SELECT c_mktsegment AS segment, o_custkey AS cust,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |  FROM orders JOIN customer ON c_custkey = o_custkey
      |  GROUP BY 1, 2),
      |r AS (SELECT segment, cust, n_orders, spend,
      |    max(n_orders) OVER (PARTITION BY segment
      |      ORDER BY spend DESC, n_orders DESC, cust
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
      |  FROM s)
      |SELECT segment, cust, n_orders, spend FROM r
      |WHERE rm IS NULL OR n_orders > rm
      |ORDER BY segment, spend DESC, cust""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val stats = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment").as("segment"))),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("segment"), col("o_custkey").as("cust"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("spend"))
    // local prune: per-(segment, input-partition) skyline — any row
    // dominated inside its own partition slice is dominated globally,
    // so this FILTER preserves the frontier while shrinking the sorted
    // pass's input from n to Σ(per-slice frontier)
    val lw = Window.partitionBy(col("segment"), spark_partition_id())
      .orderBy(col("spend").desc, col("n_orders").desc, col("cust"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pruned = stats.withColumn("__lrm", max(col("n_orders")).over(lw))
      .where(col("__lrm").isNull || col("n_orders") > col("__lrm"))
      .drop("__lrm")
    // exact pass per segment over the pruned candidates
    val gw = Window.partitionBy(col("segment"))
      .orderBy(col("spend").desc, col("n_orders").desc, col("cust"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pruned.withColumn("__rm", max(col("n_orders")).over(gw))
      .where(col("__rm").isNull || col("n_orders") > col("__rm"))
      .select(col("segment"), col("cust"), col("n_orders"), col("spend"))
      .orderBy(col("segment"), col("spend").desc, col("cust"))
  }

  /** Snapshot diff — the corpus-versioning audit between two dataset
    * versions: which keys were ADDED, REMOVED, or CHANGED (any payload
    * field differs), with unchanged rows never emitted. The shape every
    * periodic-recrawl / incremental-training pipeline needs before
    * deciding what to re-embed, re-dedup, or re-train on — and the
    * verification step after any migration. Versions are derived
    * deterministically from `events` (v1 = the table; v2 drops every
    * 11th key, doubles value on every 13th, appends a shifted copy of
    * every 17th as new keys) so both engines diff identical inputs.
    *
    * Execution: ONE full-outer join on the key, change detection via
    * null-safe payload comparison (`IS DISTINCT FROM` — NULL payloads
    * can't masquerade as equal or unequal), then a filter that keeps
    * only the three verdicts. At 100 TB both sides are parquet
    * snapshots bucketed/partitioned by the same key, so the join is
    * co-located; the emitted diff is change-volume-sized, not
    * corpus-sized. A hash-compare variant (digest the payload struct,
    * compare digests) halves the shuffled payload when rows are wide —
    * the same md5 machinery as `dedup_exact`; spelled here with the
    * raw columns because the gate compares payload semantics, not
    * digest plumbing.
    */
  val qSnapshotDiff: QueryDef = QueryDef.sql("q_snapshot_diff",
    """WITH v1 AS (SELECT event_id AS k, event_type, value FROM events),
      |v2 AS (SELECT event_id AS k, event_type,
      |         CASE WHEN event_id % 13 = 0 THEN value * 2 ELSE value END AS value
      |       FROM events WHERE event_id % 11 <> 0
      |       UNION ALL
      |       SELECT event_id + 1000000000 AS k, event_type, value
      |       FROM events WHERE event_id % 17 = 0)
      |SELECT coalesce(v1.k, v2.k) AS k,
      |  CASE WHEN v1.k IS NULL THEN 'added'
      |       WHEN v2.k IS NULL THEN 'removed'
      |       ELSE 'changed' END AS status,
      |  v1.value AS old_value, v2.value AS new_value
      |FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
      |WHERE v1.k IS NULL OR v2.k IS NULL
      |   OR (v1.value IS DISTINCT FROM v2.value)
      |   OR (v1.event_type IS DISTINCT FROM v2.event_type)
      |ORDER BY k""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val v1 = ev.select(col("event_id").as("k"), col("event_type"), col("value"))
    val v2 = ev.where(col("event_id") % 11 =!= 0)
      .select(col("event_id").as("k"), col("event_type"),
        when(col("event_id") % 13 === 0, col("value") * 2).otherwise(col("value")).as("value"))
      .unionAll(ev.where(col("event_id") % 17 === 0)
        .select((col("event_id") + 1000000000L).as("k"), col("event_type"), col("value")))
    v1.as("a").join(v2.as("b"), col("a.k") === col("b.k"), "full_outer")
      .where(col("a.k").isNull || col("b.k").isNull ||
        !(col("a.value") <=> col("b.value")) ||
        !(col("a.event_type") <=> col("b.event_type")))
      .select(coalesce(col("a.k"), col("b.k")).as("k"),
        when(col("a.k").isNull, "added")
          .when(col("b.k").isNull, "removed")
          .otherwise("changed").as("status"),
        col("a.value").as("old_value"), col("b.value").as("new_value"))
      .orderBy(col("k"))
  }

  /** Equi-width histogram of l_extendedprice in 16 bins between the
    * global min and max — the profiling primitive behind range-partition
    * sizing and skew diagnosis. Two passes: a scalar (min, max) agg
    * broadcast into a map-only binning scan + count; the bin id is
    * `least(floor((x - lo) / w), 15)` (the `least` folds the x == max
    * row into the last bin). Every arithmetic step is the same double
    * op in the same order on both engines, so bin edges are exact —
    * no rounding ambiguity at boundaries.
    */
  val qHistogram: QueryDef = QueryDef.sql("q_histogram",
    """WITH s AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem),
      |b AS (SELECT least(CAST(floor((l_extendedprice - s.lo) / ((s.hi - s.lo) / 16)) AS BIGINT), 15) AS bin
      |      FROM lineitem, s)
      |SELECT b.bin,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  round(s.lo + b.bin * (s.hi - s.lo) / 16, 6) AS bin_lo,
      |  round(s.lo + (b.bin + 1) * (s.hi - s.lo) / 16, 6) AS bin_hi
      |FROM b, s GROUP BY b.bin, s.lo, s.hi ORDER BY b.bin""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir).select(col("l_extendedprice").as("x"))
    val stats = li.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    li.crossJoin(broadcast(stats))
      .select(least(floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / 16)).cast("long"),
        lit(15L)).as("bin"), col("lo"), col("hi"))
      .groupBy(col("bin"), col("lo"), col("hi"))
      .agg(count(lit(1)).as("n_items"))
      .select(col("bin"), col("n_items"),
        round(col("lo") + col("bin") * (col("hi") - col("lo")) / 16, 6).as("bin_lo"),
        round(col("lo") + (col("bin") + 1) * (col("hi") - col("lo")) / 16, 6).as("bin_hi"))
      .orderBy(col("bin"))
  }

  /** Join-key skew census over the four hot fact keys — the pre-join
    * diagnosis a 100 TB planner runs BEFORE choosing salting factors,
    * AQE skew thresholds, or bucketing layouts (the q_salted_count /
    * Skew.saltedAgg knobs in this repo). Per key: row and distinct-key
    * counts, the share held by the heaviest key and the heaviest 10,
    * the top-1/mean ratio (the salting multiplier lower bound), and
    * normalized Shannon entropy H/ln(k) (1 = uniform, → 0 = one key
    * dominates).
    *
    * Determinism: every count is an exact BIGINT; the top-10 mass is
    * order-free even under count ties (tied keys contribute equal
    * counts). The single float accumulation is Σ cnt·ln cnt, whose
    * partition-order drift (~1e-9 absolute on an O(1e6) sum) is ~1e-14
    * after the /n normalization — round-6 safe (the text_kl_drift
    * argument). Shares are single divisions of exact ints.
    *
    * Shape at 100 TB: per key ONE count aggregate (map-side combined,
    * the shuffle carries one row per distinct key), then keys-sized
    * scalar rollups; the top-10 is TakeOrderedAndProject (a per-
    * partition heap + driver merge of 10-row heads), never a global
    * sort. Nothing after the first rollup is fact-sized.
    */
  val qSkewAudit: QueryDef = {
    val keys = Seq( // (label, table, column) — ordered by label for the output sort
      ("events.user_id", "events", "user_id"),
      ("lineitem.l_partkey", "lineitem", "l_partkey"),
      ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
      ("orders.o_custkey", "orders", "o_custkey"))
    val blocks = keys.map { case (label, tbl, c) =>
      s"""SELECT '$label' AS tbl_key, n_rows, n_keys,
         |  round(CAST(top1 AS DOUBLE) / n_rows, 6) AS top1_share,
         |  round(CAST(s10 AS DOUBLE) / n_rows, 6) AS top10_share,
         |  round(CAST(top1 * n_keys AS DOUBLE) / n_rows, 6) AS skew_ratio,
         |  round((ln(CAST(n_rows AS DOUBLE)) - sl / n_rows) / ln(CAST(n_keys AS DOUBLE)), 6) AS h_norm
         |FROM (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, CAST(count(*) AS BIGINT) AS n_keys,
         |        CAST(max(cnt) AS BIGINT) AS top1, sum(cnt * ln(cnt)) AS sl
         |      FROM (SELECT $c AS k, count(*) AS cnt FROM $tbl GROUP BY 1))
         |CROSS JOIN (SELECT CAST(sum(cnt) AS BIGINT) AS s10
         |      FROM (SELECT cnt FROM (SELECT $c AS k, count(*) AS cnt FROM $tbl GROUP BY 1)
         |            ORDER BY cnt DESC, k LIMIT 10))""".stripMargin
    }
    QueryDef.sql("q_skew_audit",
      blocks.mkString("", "\nUNION ALL\n", "\nORDER BY tbl_key")) { (s, dir) =>
      val (out, cached) = skewAuditFrames(s, dir)
      val rows = out.transform(graft.ops.Ckpt.eager)
      cached.foreach(_.unpersist(false))
      rows
    }
  }

  /** (result, cached per-key rollups) — split out so PlanSpec can assert
    * on the pre-checkpoint plan (localCheckpoint erases it to an RDD scan).
    */
  private[graft] def skewAuditFrames(s: org.apache.spark.sql.SparkSession,
                                     dir: String): (org.apache.spark.sql.DataFrame, Seq[org.apache.spark.sql.DataFrame]) = {
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def audit(df: org.apache.spark.sql.DataFrame, key: String, label: String) = {
      val c = df.groupBy(col(key).as("k")).agg(count(lit(1)).as("cnt")).persist(mem)
      val stats = c.agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("cnt")).as("top1"), sum(col("cnt") * log(col("cnt"))).as("sl"))
      val t10 = c.orderBy(col("cnt").desc, col("k")).limit(10)
        .agg(sum(col("cnt")).as("s10"))
      val out = stats.crossJoin(t10).select(lit(label).as("tbl_key"),
        col("n_rows"), col("n_keys"),
        round(col("top1").cast("double") / col("n_rows"), 6).as("top1_share"),
        round(col("s10").cast("double") / col("n_rows"), 6).as("top10_share"),
        round((col("top1") * col("n_keys")).cast("double") / col("n_rows"), 6).as("skew_ratio"),
        round((log(col("n_rows").cast("double")) - col("sl") / col("n_rows")) /
          log(col("n_keys").cast("double")), 6).as("h_norm"))
      (out, c)
    }
    val (a1, c1) = audit(Tables.events(s, dir), "user_id", "events.user_id")
    val (a2, c2) = audit(Tables.lineitem(s, dir), "l_partkey", "lineitem.l_partkey")
    val (a3, c3) = audit(Tables.lineitem(s, dir), "l_suppkey", "lineitem.l_suppkey")
    val (a4, c4) = audit(Tables.orders(s, dir), "o_custkey", "orders.o_custkey")
    (a1.unionAll(a2).unionAll(a3).unionAll(a4).orderBy(col("tbl_key")),
      Seq(c1, c2, c3, c4))
  }

  /** Incremental view maintenance (mergeable partial aggregates): the
    * orders pricing rollup is computed as per-priority ALGEBRAIC STATES
    * (n, Σ, Σ², min, max) over two disjoint date slices — the
    * "materialized history" and the "daily delta" — then combined with
    * the state-merge operator (sums add, extrema least/greatest) and
    * only THEN finalized into avg/stddev. The oracle computes the same
    * rollup in one direct pass, so the green hash is a machine-checked
    * proof of the merge law state(A ∪ B) = merge(state(A), state(B)) —
    * exactly because the money sums run in DECIMAL (associative and
    * exact; float sums would break the law at the 1e-16 level and flake
    * the hash). This is the pattern that lets a 100 TB nightly rollup
    * touch ONLY the new partition: per-slice states are partition-local
    * aggregates, the merge is keys-sized, and history is never
    * rescanned. Finalizers (two divisions, one sqrt per group) run on
    * exact merged inputs, round-6.
    */
  val qIvmMerge: QueryDef = {
    val cut = "1997-01-01 00:00:00"
    QueryDef.sql("q_ivm_merge",
      s"""WITH st AS (
         |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
         |    sum(CAST(o_totalprice AS DECIMAL(12,2))) AS s,
         |    sum(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(o_totalprice AS DECIMAL(12,2))) AS s2,
         |    min(CAST(o_totalprice AS DECIMAL(12,2))) AS mn,
         |    max(CAST(o_totalprice AS DECIMAL(12,2))) AS mx
         |  FROM orders GROUP BY 1)
         |SELECT o_orderpriority, n AS n_orders,
         |  CAST(s AS DOUBLE) AS sum_price,
         |  round(CAST(s AS DOUBLE) / n, 6) AS avg_price,
         |  round(sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)), 6) AS sd_price,
         |  CAST(mn AS DOUBLE) AS min_price, CAST(mx AS DOUBLE) AS max_price
         |FROM st ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val price = col("o_totalprice").cast("decimal(12,2)")
      def state(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(price).as("s"), sum(price * price).as("s2"),
            min(price).as("mn"), max(price).as("mx"))
      val orders = Tables.orders(s, dir)
      val history = state(orders.where(col("o_orderdate") < lit(cut).cast("timestamp")))
      val delta = state(orders.where(col("o_orderdate") >= lit(cut).cast("timestamp")))
      // the merge operator: states are rows, merging is itself an aggregate
      val merged = history.unionAll(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("n")).as("n"), sum(col("s")).as("s"), sum(col("s2")).as("s2"),
          min(col("mn")).as("mn"), max(col("mx")).as("mx"))
      merged.select(col("o_orderpriority"), col("n").as("n_orders"),
        col("s").cast("double").as("sum_price"),
        round(col("s").cast("double") / col("n"), 6).as("avg_price"),
        round(sqrt((col("s2").cast("double") - col("s").cast("double") * col("s").cast("double") / col("n"))
          / (col("n") - 1)), 6).as("sd_price"),
        col("mn").cast("double").as("min_price"), col("mx").cast("double").as("max_price"))
        .orderBy(col("o_orderpriority"))
    }
  }

  /** Customer spend deciles via `ntile(10)` — the L-tier window
    * primitive the suite lacked (rank/row_number/lag/running-sum are
    * covered; ntile's equal-height bucketing is its own operator with
    * its own remainder rule: the first n_rows mod 10 buckets get the
    * extra row). Per decile: customer count, total and fenceposts of
    * spend — the mailing-list segmentation / LTV-tier rollup.
    *
    * Determinism: the ntile ORDER BY is (spend desc, custkey) over
    * EXACT decimal spend — total order, no tie luck; per-decile sums
    * stay decimal until the final double cast.
    *
    * Shape at 100 TB: the window runs over the CUSTOMER ROLLUP (one
    * row per customer), never the order fact table — and the global
    * rank comes from [[graft.ops.PrefixSum]]'s two-level bucketed
    * prefix (tie-broken by custkey), so no single-partition sort even
    * at billions of customers; ntile is then the closed-form remainder
    * rule over (rank, n).
    */
  val qDecileProfile: QueryDef = QueryDef.sql("q_decile_profile",
    """WITH c AS (SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS spend,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY 1),
      |t AS (SELECT o_custkey, spend, n_orders,
      |        ntile(10) OVER (ORDER BY spend DESC, o_custkey) AS decile
      |      FROM c)
      |SELECT CAST(decile AS BIGINT) AS decile,
      |  CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(n_orders) AS BIGINT) AS n_orders,
      |  CAST(sum(spend) AS DOUBLE) AS total_spend,
      |  CAST(max(spend) AS DOUBLE) AS top_spend,
      |  CAST(min(spend) AS DOUBLE) AS floor_spend
      |FROM t GROUP BY decile ORDER BY decile""".stripMargin) { (s, dir) =>
    val c = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("spend"),
        count(lit(1)).as("n_orders"))
    // global rank = two-level prefix COUNT over (spend desc, custkey);
    // ntile(10) is then pure arithmetic on (rank, n): the first n%10
    // buckets take ceil(n/10) rows, the rest floor(n/10).
    val r = graft.ops.PrefixSum.running(
      c.withColumn("one", lit(1L)), Nil, "spend", Seq("one"),
      descending = true, withTotals = true, tieBreaks = Seq(col("o_custkey").asc))
    r.withColumn("decile", expr(
        """CASE WHEN one_cum <= (one_tot % 10) * (one_tot div 10 + 1)
          |THEN (one_cum - 1) div (one_tot div 10 + 1) + 1
          |ELSE (one_tot % 10) +
          |  (one_cum - (one_tot % 10) * (one_tot div 10 + 1) - 1) div (one_tot div 10) + 1
          |END""".stripMargin))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("n_orders")).as("n_orders"),
        sum(col("spend")).cast("double").as("total_spend"),
        max(col("spend")).cast("double").as("top_spend"),
        min(col("spend")).cast("double").as("floor_spend"))
      .select(col("decile").cast("long").as("decile"), col("n_customers"),
        col("n_orders"), col("total_spend"), col("top_spend"), col("floor_spend"))
      .orderBy(col("decile"))
  }

  /** Pairwise Welch's t-test over event-type groups on the `value`
    * measure — the experiment-analysis primitive (unequal variances,
    * unequal n): for every group pair, t = (m₁−m₂)/√(s₁²/n₁+s₂²/n₂)
    * and the Welch–Satterthwaite df, flagged at |t| > 1.96. The
    * data-pipeline use is drift triage: which feeds differ in level
    * beyond noise before anyone retrains on the mix.
    *
    * Determinism: `value` is cast to DECIMAL(12,2) — bit-identical in
    * both engines since the doubles carry 2 decimals — so Σx and Σx²
    * are EXACT decimal sums (the assortativity exact-moments
    * discipline, extended to a measure column); every derived double
    * is then the same arithmetic on identical inputs, round-6.
    *
    * Shape at 100 TB: ONE map-side-combined 5-row moment rollup; the
    * pairing is a self-join of a 5-row table. Nothing after the scan
    * is event-sized.
    */
  val qAbTest: QueryDef = QueryDef.sql("q_ab_test",
    """WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(value AS DECIMAL(12,2))) AS s,
      |    sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS s2
      |  FROM events GROUP BY 1),
      |p AS (SELECT a.event_type AS g1, b.event_type AS g2,
      |        a.n AS n1, b.n AS n2,
      |        CAST(a.s AS DOUBLE) / a.n AS m1, CAST(b.s AS DOUBLE) / b.n AS m2,
      |        (CAST(a.s2 AS DOUBLE) - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE) / a.n) / (a.n - 1) / a.n AS va,
      |        (CAST(b.s2 AS DOUBLE) - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE) / b.n) / (b.n - 1) / b.n AS vb
      |      FROM m a JOIN m b ON a.event_type < b.event_type)
      |SELECT g1, g2, n1, n2, round(m1, 6) AS mean1, round(m2, 6) AS mean2,
      |  round((m1 - m2) / sqrt(va + vb), 6) AS t_welch,
      |  round((va + vb) * (va + vb) / (va * va / (n1 - 1) + vb * vb / (n2 - 1)), 6) AS df,
      |  CAST(CASE WHEN abs((m1 - m2) / sqrt(va + vb)) > 1.96 THEN 1 ELSE 0 END AS BIGINT) AS significant
      |FROM p ORDER BY g1, g2""".stripMargin) { (s, dir) =>
    val v = col("value").cast("decimal(12,2)")
    val m = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(v).as("s"), sum(v * v).as("s2"))
    val a = m.select(col("event_type").as("g1"), col("n").as("n1"),
      col("s").as("sa"), col("s2").as("s2a"))
    val b = m.select(col("event_type").as("g2"), col("n").as("n2"),
      col("s").as("sb"), col("s2").as("s2b"))
    val p = a.join(b, col("g1") < col("g2"))
      .withColumn("m1", col("sa").cast("double") / col("n1"))
      .withColumn("m2", col("sb").cast("double") / col("n2"))
      .withColumn("va", (col("s2a").cast("double") -
        col("sa").cast("double") * col("sa").cast("double") / col("n1")) / (col("n1") - 1) / col("n1"))
      .withColumn("vb", (col("s2b").cast("double") -
        col("sb").cast("double") * col("sb").cast("double") / col("n2")) / (col("n2") - 1) / col("n2"))
    p.select(col("g1"), col("g2"), col("n1"), col("n2"),
        round(col("m1"), 6).as("mean1"), round(col("m2"), 6).as("mean2"),
        round((col("m1") - col("m2")) / sqrt(col("va") + col("vb")), 6).as("t_welch"),
        round((col("va") + col("vb")) * (col("va") + col("vb")) /
          (col("va") * col("va") / (col("n1") - 1) + col("vb") * col("vb") / (col("n2") - 1)), 6).as("df"),
        when(abs((col("m1") - col("m2")) / sqrt(col("va") + col("vb"))) > 1.96, 1L)
          .otherwise(0L).as("significant"))
      .orderBy(col("g1"), col("g2"))
  }

  /** The SAME as-of semantics as q_asof_join, executed by the CUSTOM
    * PHYSICAL OPERATOR (graft.plans.AsOfJoinExec: logical node +
    * planner strategy + two-pointer merge exec — the §7.4 tier-(c)
    * whole-operator extension). Identical oracle, so the gate proves
    * the exec path row-for-row against DuckDB's native ASOF JOIN;
    * AsOfJoinSpec additionally pins native ≡ composed on edge
    * fixtures and asserts AsOfJoinExec actually planned (no silent
    * fallback to the window form).
    */
  val qAsofJoinNative: QueryDef = QueryDef.sql("q_asof_join_native",
    """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |p AS (SELECT user_id, ts AS rts, max(value) AS rvalue
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, p.rts AS asof_ts, p.rvalue AS asof_rvalue
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.rts <= c.ts
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val e = Tables.events(s, dir)
    val clicks = e.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("rts"))
      .agg(max(col("value")).as("rvalue"))
    graft.ops.AsOfJoin.asofJoinNative(clicks, "user_id", "ts",
        purchases, "user_id", "rts", Seq("rvalue"))
      .select(col("event_id"), col("asof_ts"), col("asof_rvalue"))
      .orderBy(col("event_id"))
  }

  /** Chi-square independence test on the event_type × ISO-weekday
    * contingency table — the categorical sibling of q_ab_test's
    * mean test: does event mix depend on weekday? Emits the statistic,
    * degrees of freedom, and Cramér's V effect size (the scale-free
    * 0..1 association strength a dashboard thresholds on; chi² alone
    * grows with n and flags everything at 100 TB).
    *
    * Determinism: observed counts and marginals are exact BIGINTs from
    * ONE contingency rollup; each cell's (o−e)²/e is the same double
    * arithmetic on identical exact inputs, summed over 35 cells —
    * partition-order drift ~1e-12 of an O(1..100) statistic, round-6
    * safe.
    *
    * Shape at 100 TB: one map-side-combined (type, weekday) count is
    * the only event-sized stage; marginals roll up FROM it and join
    * back broadcast; the statistic is a one-row aggregate.
    */
  val qChi2Independence: QueryDef = QueryDef.sql("q_chi2_independence",
    """WITH o AS (SELECT event_type AS t, isodow(ts) AS d, CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT t, CAST(sum(o) AS BIGINT) AS rtot FROM o GROUP BY 1),
      |ct AS (SELECT d, CAST(sum(o) AS BIGINT) AS ctot FROM o GROUP BY 1),
      |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
      |cells AS (SELECT rt.t, ct.d, rt.rtot, ct.ctot, coalesce(o.o, 0) AS o
      |          FROM rt CROSS JOIN ct LEFT JOIN o ON o.t = rt.t AND o.d = ct.d),
      |x AS (SELECT sum((o - CAST(rtot AS DOUBLE) * ctot / (SELECT n FROM n))
      |               * (o - CAST(rtot AS DOUBLE) * ctot / (SELECT n FROM n))
      |               / (CAST(rtot AS DOUBLE) * ctot / (SELECT n FROM n))) AS chi2
      |      FROM cells)
      |SELECT (SELECT n FROM n) AS n,
      |  CAST(((SELECT count(*) FROM rt) - 1) * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof,
      |  round(chi2, 6) AS chi2,
      |  round(sqrt(chi2 / ((SELECT n FROM n) *
      |    least((SELECT count(*) FROM rt) - 1, (SELECT count(*) FROM ct) - 1))), 6) AS cramers_v
      |FROM x""".stripMargin) { (s, dir) =>
    val o = Tables.events(s, dir)
      .groupBy(col("event_type").as("t"),
        graft.core.TimeKeys.isoWeekday(col("ts")).as("d"))
      .agg(count(lit(1)).as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rt = o.groupBy(col("t")).agg(sum(col("o")).as("rtot"))
    val ct = o.groupBy(col("d")).agg(sum(col("o")).as("ctot"))
    val n = o.agg(sum(col("o")).as("n"))
    val dims = rt.agg(count(lit(1)).as("nr")).crossJoin(ct.agg(count(lit(1)).as("nc")))
    val e = col("rtot").cast("double") * col("ctot") / col("n")
    // DENSE the table: a structural-zero cell still contributes e to chi2
    // (summing only observed cells halves the statistic on sparse tables)
    val cells = rt.crossJoin(ct)
      .join(o, Seq("t", "d"), "left")
      .select(col("rtot"), col("ctot"), coalesce(col("o"), lit(0L)).as("o"))
    val x = cells.crossJoin(broadcast(n))
      .agg(sum((col("o") - e) * (col("o") - e) / e).as("chi2"), first(col("n")).as("n"))
    val rows = x.crossJoin(broadcast(dims))
      .select(col("n"),
        ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
        round(col("chi2"), 6).as("chi2"),
        round(sqrt(col("chi2") / (col("n") * least(col("nr") - 1, col("nc") - 1))), 6).as("cramers_v"))
      .transform(graft.ops.Ckpt.eager)
    o.unpersist(false)
    rows
  }

  /** TPC-H Q3 (shipping-priority) adapted to the synthetic schema
    * (o_orderpriority for the absent o_shippriority): top-10 unshipped
    * BUILDING orders by revenue as of the cutoff. Beside q_sql_tpch6's
    * single-scan filter this is the classic selective-dim 3-way join +
    * grouped top-k. Revenue is exact DECIMAL, so the top-10 ordering
    * (revenue desc, l_orderkey) cannot straddle an ulp; the limit plans
    * as TakeOrderedAndProject, never a global sort.
    *
    * Shape at 100 TB: the mktsegment filter prunes customers BEFORE the
    * join (broadcast dim), the o_orderdate/l_shipdate predicates push
    * to the fact scans, and the grouped top-k is per-partition heaps +
    * a 10-row driver merge.
    */
  val qSqlTpch3: QueryDef = QueryDef.sql("q_sql_tpch3",
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val cut = lit("1998-03-15 00:00:00").cast("timestamp")
    Tables.lineitem(s, dir).where(col("l_shipdate") > cut)
      .join(Tables.orders(s, dir).where(col("o_orderdate") < cut),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 (local-supplier volume): revenue per ASIA nation from
    * orders where the customer and the line's supplier share the
    * nation — the 6-table star-plus-theta classic, one year of orders.
    * All dims broadcast; the c_nationkey = s_nationkey conjunct rides
    * the hash join as a residual. Exact DECIMAL revenue; deterministic
    * (revenue desc, n_name) order.
    */
  val qSqlTpch5: QueryDef = QueryDef.sql("q_sql_tpch5",
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).where(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    li.groupBy(col("n_name"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** MERGE INTO semantics (SQL:2003 / Delta-style upsert) as one
    * full-outer join pass: a BASE snapshot (orders before the cut)
    * absorbs a CHANGE SET (orders at/after the cut carrying op codes
    * derived deterministically from o_orderstatus: F → D delete,
    * P → U update re-pricing ×1.1, O → I insert). Matched+U rewrites
    * the row, matched+D drops it, unmatched+I inserts, unmatched
    * U/D are no-ops (upsert leniency), untouched base rows pass
    * through — the CDC-APPLY operator that complements
    * q_changelog_compact (latest-state OF a log) and q_scd2_history
    * (versioned history): this one produces the NEXT SNAPSHOT.
    * Emits the per-row action tag so the gate checks the decision,
    * not just survivorship.
    *
    * Determinism: keys and statuses are exact; the one arithmetic
    * (price×1.1) runs in DECIMAL (exact in both engines). Output
    * orders by key.
    *
    * Shape at 100 TB: ONE full-outer hash join keyed on the snapshot
    * key — the change set is daily-sized, so AQE broadcasts it and
    * base partitions stream through untouched; nothing is rescanned
    * twice (the same single-pass law q_ivm_merge proves for
    * aggregates, here for row state).
    */
  val qMergeUpsert: QueryDef = {
    val cut = "1997-01-01 00:00:00"
    QueryDef.sql("q_merge_upsert",
      s"""WITH base AS (SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DECIMAL(12,2)) AS price
         |  FROM orders WHERE o_orderdate < TIMESTAMP '$cut'),
         |chg AS (SELECT o_orderkey - 1 AS o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS cprice,
         |    CASE o_orderstatus WHEN 'F' THEN 'D' WHEN 'P' THEN 'U' ELSE 'I' END AS op
         |  FROM orders WHERE o_orderdate >= TIMESTAMP '$cut'),
         |m AS (SELECT coalesce(base.o_orderkey, chg.o_orderkey) AS o_orderkey,
         |        base.o_orderkey IS NOT NULL AS in_base, base.price, chg.cprice, chg.op
         |      FROM base FULL OUTER JOIN chg ON base.o_orderkey = chg.o_orderkey),
         |a AS (SELECT o_orderkey,
         |    CASE WHEN in_base AND op = 'U' THEN 'updated'
         |         WHEN in_base AND op IS NULL THEN 'kept'
         |         WHEN NOT in_base AND op = 'I' THEN 'inserted' END AS action,
         |    CAST(CASE WHEN in_base AND op = 'U' THEN cprice * CAST(1.1 AS DECIMAL(3,1))
         |              WHEN in_base AND op IS NULL THEN price
         |              ELSE cprice END AS DOUBLE) AS price
         |  FROM m)
         |SELECT o_orderkey, action, price FROM a
         |WHERE action IS NOT NULL  -- matched-D, unmatched-U/D and colliding-I all fall out here
         |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val base = orders.where(col("o_orderdate") < lit(cut).cast("timestamp"))
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(12,2)").as("price"))
      val chg = orders.where(col("o_orderdate") >= lit(cut).cast("timestamp"))
        // key−1 remap: date-partitioned keys would never collide with the
        // base otherwise, leaving every MATCHED branch dead on the corpus
        .select((col("o_orderkey") - 1).as("ckey"),
          col("o_totalprice").cast("decimal(12,2)").as("cprice"),
          when(col("o_orderstatus") === "F", "D")
            .when(col("o_orderstatus") === "P", "U").otherwise("I").as("op"))
      val m = base.join(chg, col("o_orderkey") === col("ckey"), "full_outer")
        .select(coalesce(col("o_orderkey"), col("ckey")).as("k"),
          col("o_orderkey").isNotNull.as("in_base"),
          col("price"), col("cprice"), col("op"))
      // decide the action FIRST, then filter on it — a direct
      // NOT(in_base AND op = 'D') WHERE would go NULL (not true) for
      // every unmatched base row under three-valued logic and silently
      // drop the whole 'kept' class; BOTH engines share that semantic,
      // so only the planted spec (not the hash gate) can catch it
      m.select(col("k").as("o_orderkey"),
          when(col("in_base") && col("op") === "U", "updated")
            .when(col("in_base") && col("op").isNull, "kept")
            .when(!col("in_base") && col("op") === "I", "inserted").as("action"),
          when(col("in_base") && col("op") === "U",
              col("cprice") * lit("1.1").cast("decimal(3,1)"))
            .when(col("in_base") && col("op").isNull, col("price"))
            .otherwise(col("cprice")).cast("double").as("price"))
        .where(col("action").isNotNull)
        .orderBy(col("o_orderkey"))
    }
  }

  /** TPC-H Q18 (large-volume customers): orders whose total line
    * quantity clears 300, joined back to their customer and re-grouped
    * — the classic AGGREGATE-DRIVEN SEMI-JOIN (the IN subquery is a
    * HAVING set), distinct from Q3/Q5's selective-dim stars. Quantity
    * sums ride DECIMAL so both engines' HAVING cut and output sums are
    * exact; top-100 on (o_totalprice desc, o_orderkey) is
    * engine-stable (prices are the same parquet doubles).
    *
    * Shape at 100 TB: the HAVING set is a tiny fraction of orders
    * (runtime-sized — AQE broadcasts the agg result when it fits,
    * nothing is hinted), so the fact table is filtered by a hash
    * semi-join before the wide join; the top-100 compiles to
    * TakeOrderedAndProject, never a global sort.
    */
  val qSqlTpch18: QueryDef = QueryDef.sql("q_sql_tpch18",
    """WITH big AS (SELECT l_orderkey FROM lineitem
      |            GROUP BY 1 HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
      |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |JOIN big ON big.l_orderkey = lineitem.l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"))
    val big = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).as("q"))
      .where(col("q") > 300).select(col("l_orderkey").as("bigkey"))
    li.join(big, col("l_orderkey") === col("bigkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q10 (returned-item reporting): revenue lost to returns per
    * customer over one quarter, top-20 — the selective-fact + wide-dim
    * reporting star. Exact DECIMAL revenue (the Q3/Q5 discipline);
    * deterministic (revenue desc, c_custkey) cut.
    *
    * Shape: both fact filters (o_orderdate range, l_returnflag = 'R')
    * push to the scans; customer/nation broadcast; top-20 is
    * TakeOrderedAndProject.
    */
  val qSqlTpch10: QueryDef = QueryDef.sql("q_sql_tpch10",
    """SELECT c_custkey, c_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).where(col("l_returnflag") === "R")
      .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(graft.ops.Relational.revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q1 in FULL (pricing summary report): all eight aggregates
    * over the shipdate-bounded scan with the (returnflag, linestatus)
    * rollup — the canonical scan-dominated headline beside the reduced
    * `q1_agg`. Sums and the derived charge ride exact DECIMAL (charge
    * widens to DECIMAL(18,6): qty·price·(1−d)·(1+t) needs the extra
    * scale before the final double cast); averages are round-6.
    *
    * Shape: one pushed-filter scan, one 4-group map-side-combined
    * aggregate — pure whole-stage-codegen throughput, the query engines
    * advertise scan speed with.
    */
  val qSqlTpch1: QueryDef = QueryDef.sql("q_sql_tpch1",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,6))
      |        * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
      |  round(avg(l_quantity), 6) AS avg_qty,
      |  round(avg(l_extendedprice), 6) AS avg_price,
      |  round(avg(l_discount), 6) AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc = price * (lit(1) - col("l_discount").cast("decimal(4,2)"))
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") <= lit("2000-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(disc).cast("double").as("sum_disc_price"),
        // scale-8 exact sums carry 17 significant digits — past double's
        // 15 — so the engines' decimal->double conversions can differ by
        // 1 ulp; round(, 2) in the DECIMAL domain first (HALF_UP in BOTH
        // engines — DuckDB's decimal CAST truncates, its round() does
        // not), leaving a <=13-digit exactly-representable value
        round(sum(disc.cast("decimal(18,6)") * (lit(1) + col("l_tax").cast("decimal(4,2)"))), 2)
          .cast("double").as("sum_charge"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_extendedprice")), 6).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q7 (volume shipping): bilateral trade revenue between two
    * nations by (supplier nation, customer nation, ship year) — the
    * DIRECTIONAL-PAIR star: the same nation dim joins twice under two
    * roles, and the disjunctive pair predicate must keep both
    * directions distinct (a symmetric IN-list would double-count).
    * Exact DECIMAL volume, integer ship year.
    *
    * Shape: the two-year shipdate range pushes to the fact scan; both
    * nation-role dims pre-filter to the two names BEFORE joining, so
    * the fact stream thins at the earliest equi-join; all dims
    * broadcast; 4-group aggregate.
    */
  val qSqlTpch7: QueryDef = QueryDef.sql("q_sql_tpch7",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
    val pairNations = Tables.nation(s, dir)
      .where(col("n_name").isin("NATION_3", "NATION_7"))
    val n1 = pairNations.select(col("n_nationkey").as("k1"), col("n_name").as("supp_nation"))
    val n2 = pairNations.select(col("n_nationkey").as("k2"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("k1"))
      .join(broadcast(n2), col("c_nationkey") === col("k2"))
      .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(graft.ops.Relational.revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 (national market share): the target nation's share of
    * EUROPE's PROMO-part import volume per order year — the
    * share-of-aggregate star: one 8-table resolution feeds BOTH the
    * numerator (conditional) and denominator (total) sums, so the
    * division happens on two exact DECIMAL aggregates of the same
    * rows (never two separate query passes). Customer nation routes
    * through region (the market); supplier nation is the share key.
    *
    * Shape: part pre-filters to PROMO before joining (the strongest
    * selectivity), order-date range pushes to the orders scan, every
    * dim broadcasts, and the answer is a 2-group conditional aggregate.
    */
  val qSqlTpch8: QueryDef = QueryDef.sql("q_sql_tpch8",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  round(sum(CASE WHEN n2.n_name = 'NATION_3'
      |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |      ELSE 0 END)
      |    / sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 6) AS mkt_share
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY o_year""".stripMargin) { (s, dir) =>
    val rev = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1) - col("l_discount").cast("decimal(4,2)"))
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("k1"), col("n_regionkey"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("k2"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).where(col("p_type") === "PROMO")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("k1"))
      .join(broadcast(Tables.region(s, dir).where(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("k2"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", rev).otherwise(lit(0)))
          / sum(rev), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q14 (promotion effect): the share of one month's revenue
    * from PROMO-type parts — the conditional-aggregate-over-a-dim-join
    * classic. Both revenue sums are exact DECIMAL (the Q1/Q3/Q5
    * discipline), so the single rounded division is the only double op
    * and the one-row result is engine-stable.
    *
    * Shape: the shipdate month pushes to the fact scan; part broadcasts
    * (2-column projection); the answer is one map-side-combined
    * aggregate row — no shuffle beyond the final single-row combine.
    */
  val qSqlTpch14: QueryDef = QueryDef.sql("q_sql_tpch14",
    """SELECT
      |  CAST(sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |      ELSE 0 END) AS DOUBLE) AS promo_rev,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_rev,
      |  round(100.0 * sum(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |      ELSE 0 END)
      |    / sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 6) AS promo_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""".stripMargin) { (s, dir) =>
    val rev = col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1) - col("l_discount").cast("decimal(4,2)"))
    Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1997-06-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-07-01 00:00:00").cast("timestamp"))
      .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0))).cast("double").as("promo_rev"),
        sum(rev).cast("double").as("total_rev"),
        round(lit(100.0) * sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0)))
          / sum(rev), 6).as("promo_pct"))
  }

  /** TPC-H Q4 (order priority checking), adapted to the reduced schema:
    * the testdata carries no l_commitdate/l_receiptdate, so "late line"
    * becomes l_shipdate > o_orderdate + 60 days — same plan shape as the
    * original: a quarter of orders EXISTS-checked against lineitem.
    *
    * Shape: the quarter filter pushes to the orders scan; the EXISTS is
    * a LEFT SEMI hash join on orderkey with the non-equi lateness
    * conjunct riding as a residual — no row explosion, no distinct.
    */
  val qSqlTpch4: QueryDef = QueryDef.sql("q_sql_tpch4",
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .where(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q13 (customer order-count distribution), adapted: no
    * o_comment column to exclude, so the histogram runs over all orders.
    * The two-level aggregate classic — and the scale-critical plan
    * choice is explicit: orders pre-aggregate to (custkey, cnt) FIRST
    * (map-side combined), and only that id-sized count table left-joins
    * the customer spine (zero-order customers surface via coalesce) —
    * never a wide customer×orders join feeding a groupBy.
    */
  val qSqlTpch13: QueryDef = QueryDef.sql("q_sql_tpch13",
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
    val perCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q17 (small-quantity-order revenue): lines whose quantity is
    * below 20% of their part's average quantity, summed per brand. The
    * avg threshold is compared EXACTLY — `qty * 5 * n < sum_qty` with a
    * DECIMAL sum instead of `qty < 0.2 * avg` — so the boundary is
    * bit-identical across engines (a double avg is association-ordered
    * and would flap the gate).
    *
    * Shape: the brand filter broadcasts through the part join FIRST, so
    * the per-part rollup runs over the two brands' lines only (the
    * restriction is on a part attribute, so per-part stats are
    * unchanged); the rollup join is partkey-keyed — no scalar subquery
    * per row, no full-corpus second scan.
    */
  val qSqlTpch17: QueryDef = QueryDef.sql("q_sql_tpch17",
    """WITH pq AS (SELECT l_partkey AS ap, sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
      |            CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY l_partkey)
      |SELECT p_brand,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS small_qty_revenue,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey JOIN pq ON ap = l_partkey
      |WHERE p_brand IN ('Brand#4', 'Brand#17')
      |  AND CAST(l_quantity AS DECIMAL(12,2)) * 5 * n < sq
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, dir) =>
    import graft.ops.Relational.money
    val liB = Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .where(col("p_brand").isin("Brand#4", "Brand#17"))
          .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    val pq = liB.groupBy(col("l_partkey").as("ap"))
      .agg(sum(money(col("l_quantity"))).as("sq"), count(lit(1)).as("n"))
    liB.join(pq, col("l_partkey") === col("ap"))
      .where(money(col("l_quantity")) * lit(5) * col("n") < col("sq"))
      .groupBy(col("p_brand"))
      .agg(sum(money(col("l_extendedprice"))).cast("double").as("small_qty_revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q19 (discounted revenue, disjunctive predicates): the
    * OR-of-conjunction classic that stresses predicate handling — each
    * disjunct ties a brand to a size band AND a quantity band. The
    * part-only component (the brand IN-list) is pre-pushed into the
    * broadcast side, the canonical Q19 plan; the mixed disjunction rides
    * the joined scan as one codegen'd filter.
    */
  val qSqlTpch19: QueryDef = QueryDef.sql("q_sql_tpch19",
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  CAST(count(*) AS BIGINT) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 15 AND l_quantity BETWEEN 1  AND 20)
      |   OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_brand = 'Brand#7'  AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin) { (s, dir) =>
    import graft.ops.Relational.revenue
    def arm(brand: String, s0: Int, s1: Int, q0: Int, q1: Int) =
      col("p_brand") === brand &&
        col("p_size").between(s0, s1) && col("l_quantity").between(q0, q1)
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .where(col("p_brand").isin("Brand#4", "Brand#17", "Brand#7"))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .where(arm("Brand#4", 1, 15, 1, 20) ||
        arm("Brand#17", 10, 30, 10, 35) ||
        arm("Brand#7", 20, 50, 20, 50))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q9 (product-type profit), adapted: no partsupp table, so
    * supply cost proxies as `quantity × p_retailprice × 0.5` (a part
    * attribute — the join graph and the profit-arithmetic shape are the
    * original's). Profit per supplier nation per order year for parts
    * whose name contains 'red', all arithmetic DECIMAL-exact with the
    * 0.5 written identically in both engines.
    *
    * Shape: the LIKE filter prunes part BEFORE its broadcast; supplier
    * and nation broadcast; the only shuffle join is lineitem⋈orders on
    * the fact key — the canonical Q9 plan at scale.
    */
  val qSqlTpch9: QueryDef = QueryDef.sql("q_sql_tpch9",
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))
      |         - CAST(l_quantity AS DECIMAL(12,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * 0.5) AS DOUBLE) AS profit
      |FROM lineitem
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
    import graft.ops.Relational.{money, rate}
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .where(col("p_name").contains("red"))
          .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount")))
          - money(col("l_quantity")) * money(col("p_retailprice")) * lit(BigDecimal("0.5")))
        .cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q15 (top supplier): one quarter's revenue per supplier, then
    * the supplier(s) whose revenue EQUALS the maximum — the classic
    * aggregate-joined-against-its-own-max (the original's view). The
    * equality compares the DECIMAL sums directly (exact, so the tie
    * semantics are real, not float-lucky); the one-row max broadcasts.
    */
  val qSqlTpch15: QueryDef = QueryDef.sql("q_sql_tpch15",
    """WITH rev AS (SELECT l_suppkey AS supplier_no,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
      |FROM supplier JOIN rev ON s_suppkey = supplier_no,
      |  (SELECT max(total_rev) AS m FROM rev) t
      |WHERE total_rev = t.m
      |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
    import graft.ops.Relational.{money, rate}
    val rev = Tables.lineitem(s, dir)
      .where(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(money(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))
        .as("total_rev"))
    rev.crossJoin(broadcast(rev.agg(max(col("total_rev")).as("m"))))
      .where(col("total_rev") === col("m"))
      .join(broadcast(Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))),
        col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q22 (global sales opportunity), adapted: no c_phone, so the
    * country-code slice becomes the nation dim, and "never ordered"
    * (empty at this data's density) becomes "no order since 1998" —
    * rich idle accounts worth a sales call, grouped by nation. The
    * above-average-balance threshold compares EXACTLY
    * (`bal * n > sum_bal`, the Q17 discipline).
    *
    * Shape: one-row positive-balance stats broadcast into the customer
    * scan (allowlisted scalar cross); the NOT EXISTS is a LEFT ANTI
    * hash join against the date-filtered orders projection.
    */
  val qSqlTpch22: QueryDef = QueryDef.sql("q_sql_tpch22",
    """WITH t AS (SELECT sum(CAST(c_acctbal AS DECIMAL(12,2))) AS s, CAST(count(*) AS BIGINT) AS n
      |           FROM customer WHERE c_acctbal > 0.0)
      |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey, t
      |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * t.n > t.s
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
      |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, dir) =>
    import graft.ops.Relational.money
    val stats = Tables.customer(s, dir).where(col("c_acctbal") > 0.0)
      .agg(sum(money(col("c_acctbal"))).as("s"), count(lit(1)).as("n"))
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .where(col("o_orderdate") >= lit("1998-01-01 00:00:00").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(stats))
      .where(money(col("c_acctbal")) * col("n") > col("s"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        sum(money(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val all: Seq[QueryDef] = Seq(q1Agg, qJoinAgg, qBroadcastJoin, qTopk,
    qWindowRank, qSetops, qRollup, qDistinctAgg, qSemiJoin, qAntiJoin,
    qAsofJoin, qAsofForward, qPercentileStats, qCube, qRunningSum, qRangeJoin,
    qProfileStats, qAboveAvg, qSaltedCount, qSqlTpch6, qUnpivot,
    qGroupingSets, qCorrSubquery, qFullOuter, qBloomPrune, qGapFill,
    qChangelogCompact, qSkyline, qSnapshotDiff, qHistogram,
    qSkewAudit, qIvmMerge, qDecileProfile, qAbTest, qAsofJoinNative,
    qChi2Independence, qSqlTpch3, qSqlTpch5, qSqlTpch18, qSqlTpch10,
    qSqlTpch14, qSqlTpch1, qSqlTpch7, qSqlTpch8, qMergeUpsert,
    qSqlTpch4, qSqlTpch13, qSqlTpch17, qSqlTpch19, qSqlTpch22, qSqlTpch9,
    qSqlTpch15, qAsofTolerance, qWindowNavigation, qAggFuncs, qArrayFuncs)
}
