package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Scalar-function coverage: the reference's ingest-time projections (P1
  * multi-format timestamp parse, P2 duration parse, P3 derived return
  * date, P6 formatting, P10 duration seconds) plus string/json extensions.
  * Test strings are CONSTRUCTED from table columns identically in both
  * engines, then parsed back — exercising the parse logic end-to-end
  * without needing CSV fixtures in the oracle path.
  */
object ScalarQueries {

  /** P1: first-match-wins multi-format timestamp parsing
    * (bicis/lib/parse_raw_data.py:67-76). Format chosen per row; the
    * coalesce(try_parse...) chain preserves the reference's ordering
    * semantics; unparseable rows -> NULL (F4 row-skip is a `where` on top).
    */
  val qDateParse: QueryDef = QueryDef.sql("q_date_parse",
    """WITH f AS (SELECT event_id,
      |  CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%d/%m/%Y %H:%M')
      |       WHEN event_id % 3 = 1 THEN strftime(ts, '%d/%m/%Y %H:%M:%S')
      |       ELSE strftime(ts, '%Y-%m-%d %H:%M:%S.%f') END AS raw
      |  FROM events)
      |SELECT event_id, raw,
      |  coalesce(try_strptime(raw, '%d/%m/%Y %H:%M'),
      |           try_strptime(raw, '%d/%m/%Y %H:%M:%S'),
      |           try_strptime(raw, '%Y-%m-%d %H:%M:%S.%f')) AS parsed
      |FROM f ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("raw",
        when(col("event_id") % 3 === 0, date_format(col("ts"), "dd/MM/yyyy HH:mm"))
          .when(col("event_id") % 3 === 1, date_format(col("ts"), "dd/MM/yyyy HH:mm:ss"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")))
      .select(col("event_id"), col("raw"),
        coalesce(
          expr("try_to_timestamp(raw, 'dd/MM/yyyy HH:mm')"),
          expr("try_to_timestamp(raw, 'dd/MM/yyyy HH:mm:ss')"),
          expr("try_to_timestamp(raw, 'yyyy-MM-dd HH:mm:ss.SSSSSS')")).as("parsed"))
      .orderBy(col("event_id"))
  }

  /** P2: duration parse — bare int string means MINUTES (*60 s); otherwise
    * extract the first 3 ints as h/m/s; fewer than 3 parts -> NULL
    * (bicis/lib/parse_raw_data.py:55-64).
    */
  val qDurationParse: QueryDef = QueryDef.sql("q_duration_parse",
    """WITH f AS (SELECT event_id,
      |  CASE WHEN event_id % 7 = 0 THEN CAST(floor(value) AS BIGINT) || 'M ' || (event_id % 60) || 'S'
      |       WHEN event_id % 2 = 0 THEN CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
      |       ELSE '0H ' || CAST(floor(value) AS BIGINT) || 'M ' || (event_id % 60) || 'S' END AS raw
      |  FROM events)
      |SELECT event_id, raw,
      |  CASE WHEN regexp_full_match(raw, '[0-9]+') THEN CAST(raw AS BIGINT) * 60
      |       WHEN len(regexp_extract_all(raw, '([0-9]+)', 1)) >= 3 THEN
      |         CAST(regexp_extract_all(raw, '([0-9]+)', 1)[1] AS BIGINT) * 3600
      |         + CAST(regexp_extract_all(raw, '([0-9]+)', 1)[2] AS BIGINT) * 60
      |         + CAST(regexp_extract_all(raw, '([0-9]+)', 1)[3] AS BIGINT)
      |       ELSE NULL END AS dur_s
      |FROM f ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("raw",
        when(col("event_id") % 7 === 0,
          concat(floor(col("value")).cast("long").cast("string"), lit("M "),
            (col("event_id") % 60).cast("string"), lit("S")))
          .when(col("event_id") % 2 === 0, floor(col("value")).cast("long").cast("string"))
          .otherwise(concat(lit("0H "), floor(col("value")).cast("long").cast("string"),
            lit("M "), (col("event_id") % 60).cast("string"), lit("S"))))
      .select(col("event_id"), col("raw"),
        when(col("raw").rlike("^[0-9]+$"), col("raw").cast("long") * 60)
          .otherwise(expr(
            """CASE WHEN size(regexp_extract_all(raw, '([0-9]+)', 1)) >= 3 THEN
              |  CAST(regexp_extract_all(raw, '([0-9]+)', 1)[0] AS BIGINT) * 3600
              |  + CAST(regexp_extract_all(raw, '([0-9]+)', 1)[1] AS BIGINT) * 60
              |  + CAST(regexp_extract_all(raw, '([0-9]+)', 1)[2] AS BIGINT)
              |ELSE NULL END""".stripMargin)).as("dur_s"))
      .orderBy(col("event_id"))
  }

  /** P3 + P10: derived return timestamp (ts + duration) and recomputed
    * whole-second duration (bicis/lib/parse_raw_data.py:108-115; notebook
    * duration expr).
    */
  val qDerivedReturn: QueryDef = QueryDef.sql("q_derived_return",
    """SELECT event_id,
      |  ts + to_seconds(CAST(floor(value) AS BIGINT)) AS ret,
      |  (epoch_us(ts + to_seconds(CAST(floor(value) AS BIGINT))) - epoch_us(ts)) // 1000000 AS dur_s
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("ret", expr("timestampadd(SECOND, CAST(floor(value) AS BIGINT), ts)"))
      .select(col("event_id"), col("ret"),
        ((unix_micros(col("ret")) - unix_micros(col("ts"))) / lit(1000000L))
          .cast("long").as("dur_s"))
      .orderBy(col("event_id"))
  }

  /** String function battery over part names. */
  val qStringFuncs: QueryDef = QueryDef.sql("q_string_funcs",
    """SELECT p_partkey,
      |  upper(substr(p_name, 1, 5)) AS u5,
      |  CAST(length(p_name) AS BIGINT) AS len,
      |  concat_ws('-', p_brand, p_type) AS bt,
      |  regexp_replace(p_name, '[aeiou]', '', 'g') AS novowel,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS sz
      |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir).select(
      col("p_partkey"),
      upper(substring(col("p_name"), 1, 5)).as("u5"),
      length(col("p_name")).cast("long").as("len"),
      concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
      regexp_replace(col("p_name"), "[aeiou]", "").as("novowel"),
      lpad(col("p_size").cast("string"), 4, "0").as("sz"))
      .orderBy(col("p_partkey"))
  }

  /** JSON field extraction from the events props column. */
  val qJsonExtract: QueryDef = QueryDef.sql("q_json_extract",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy(col("event_id"))
  }

  /** F5: equality / OR predicate filter (notebook queries). */
  val qFilterOr: QueryDef = QueryDef.sql("q_filter_or",
    """SELECT event_id, user_id, event_type FROM events
      |WHERE user_id = 1 OR event_type = 'signup'
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .where(col("user_id") === 1 || col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))
  }

  /** NULL-handling functions: nullif/coalesce/nvl2-style branching. */
  val qNullFuncs: QueryDef = QueryDef.sql("q_null_funcs",
    """SELECT event_id,
      |  nullif(user_id % 5, 0) AS nz,
      |  coalesce(nullif(user_id % 5, 0), -1) AS filled,
      |  CASE WHEN nullif(user_id % 5, 0) IS NULL THEN 'none' ELSE 'some' END AS tag
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).select(
      col("event_id"),
      nullif(col("user_id") % 5, lit(0)).as("nz"),
      coalesce(nullif(col("user_id") % 5, lit(0)), lit(-1)).as("filled"),
      when(nullif(col("user_id") % 5, lit(0)).isNull, "none").otherwise("some").as("tag"))
      .orderBy(col("event_id"))
  }

  /** Date-part battery (P4 family breadth): all extraction functions. */
  val qDateParts: QueryDef = QueryDef.sql("q_date_parts",
    """SELECT event_id,
      |  CAST(year(ts) AS BIGINT) AS y, CAST(quarter(ts) AS BIGINT) AS q,
      |  CAST(month(ts) AS BIGINT) AS mo, CAST(day(ts) AS BIGINT) AS d,
      |  CAST(dayofyear(ts) AS BIGINT) AS doy, CAST(isodow(ts) AS BIGINT) AS dw,
      |  CAST(hour(ts) AS BIGINT) AS h, CAST(minute(ts) AS BIGINT) AS mi,
      |  CAST(second(ts) AS BIGINT) AS sec,
      |  date_trunc('day', ts) AS day_start
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).select(
      col("event_id"),
      year(col("ts")).cast("long").as("y"), quarter(col("ts")).cast("long").as("q"),
      month(col("ts")).cast("long").as("mo"), dayofmonth(col("ts")).cast("long").as("d"),
      dayofyear(col("ts")).cast("long").as("doy"),
      graft.core.TimeKeys.isoWeekday(col("ts")).cast("long").as("dw"),
      hour(col("ts")).cast("long").as("h"), minute(col("ts")).cast("long").as("mi"),
      second(col("ts")).cast("long").as("sec"),
      date_trunc("day", col("ts")).as("day_start"))
      .orderBy(col("event_id"))
  }

  val all: Seq[QueryDef] = Seq(qDateParse, qDurationParse, qDerivedReturn,
    qStringFuncs, qJsonExtract, qFilterOr, qNullFuncs, qDateParts)
}
