package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1/S6/U1: multi-dialect `;`-CSV ingest into the unified trips table.
  *
  * The reference parses 8 yearly CSVs with 4 header dialects via per-row
  * Python dicts (bicis/lib/parse_raw_data.py:13-52 field maps, 79-117
  * normalization, 126-143 year dispatch). Engine shape: one explicit
  * per-dialect projection to the common schema, then
  * `unionByName(allowMissingColumns)` — a single Catalyst plan, schema
  * known statically, no inference pass (the reference re-inferred schema
  * per read, utils.py:23).
  *
  * Semantics pinned to the reference:
  *  - P1 timestamp parse: first-match-wins across
  *    dd/MM/yyyy HH:mm, dd/MM/yyyy HH:mm:ss, yyyy-MM-dd HH:mm:ss.SSSSSS
  *    (parse_raw_data.py:67-76); unparseable -> null -> row dropped (F4)
  *  - P2 duration: bare int string = MINUTES (*60); else first 3 ints as
  *    h/m/s; fewer than 3 parts -> null (parse_raw_data.py:55-64)
  *  - P3: return_date derived as rent_date + duration when the dialect
  *    lacks it (parse_raw_data.py:108-115); duration dropped after
  *  - S6: rows missing either date dropped; ids assigned at unify
  *    (unify.py:40-50). We use monotonically_increasing_id — unique and
  *    partition-stable, NOT dense (documented difference; dense ids at
  *    scale would force a global sort or zipWithIndex pass).
  *  - F6: files whose year has no dialect are skipped at planning time.
  */
object Ingest {

  private val v1 = Map("origenfecha" -> "rent_date", "nombreorigen" -> "rent_station",
    "destinofecha" -> "return_date", "nombredestino" -> "return_station",
    "tiempouso" -> "duration")
  private val v2 = Map("origenfecha" -> "rent_date", "origennombre" -> "rent_station",
    "destinofecha" -> "return_date", "destinonombre" -> "return_station",
    "tiempouso" -> "duration")
  private val v3 = Map("origen_fecha" -> "rent_date", "destino_fecha" -> "return_date",
    "nombre_origen" -> "rent_station", "destino_estacion" -> "return_station")
  private val v4 = Map("fecha_hora_retiro" -> "rent_date", "tiempo_uso" -> "duration",
    "nombre_origen" -> "rent_station", "nombre_destino" -> "return_station")

  /** Year -> header dialect (parse_raw_data.py:43-52). */
  val fieldMaps: Map[Int, Map[String, String]] = Map(
    2010 -> v2, 2011 -> v1, 2012 -> v2, 2013 -> v3, 2014 -> v3,
    2015 -> v4, 2016 -> v4, 2017 -> v4)

  private val unifiedCols = Seq("rent_date", "rent_station", "return_date",
    "return_station", "duration")

  def yearOf(path: String): Option[Int] =
    "(\\d{4})".r.findFirstIn(new java.io.File(path).getName).map(_.toInt)

  /** P1: ordered multi-format parse; null when no format matches. */
  def parseTs(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("dd/MM/yyyy HH:mm")),
    try_to_timestamp(c, lit("dd/MM/yyyy HH:mm:ss")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss.SSSSSS")))

  /** P2: duration string -> seconds (int = minutes; else h/m/s; else
    * null). TRY_ arithmetic throughout: garbage like a 25-digit "number"
    * must follow the F4 unparseable→null→dropped contract, and under
    * Spark 4's default ANSI mode a plain CAST/multiply would instead
    * abort the whole ingest with CAST_OVERFLOW (parseTs already uses
    * try_to_timestamp for the same reason).
    */
  def parseDurationSeconds(name: String): Column =
    when(col(name).rlike("^[0-9]+$"),
        expr(s"try_multiply(try_cast($name AS BIGINT), 60L)"))
      .otherwise(expr(
        s"""CASE WHEN size(regexp_extract_all($name, '([0-9]+)', 1)) >= 3 THEN
           |  try_add(try_add(
           |    try_multiply(try_cast(regexp_extract_all($name, '([0-9]+)', 1)[0] AS BIGINT), 3600L),
           |    try_multiply(try_cast(regexp_extract_all($name, '([0-9]+)', 1)[1] AS BIGINT), 60L)),
           |    try_cast(regexp_extract_all($name, '([0-9]+)', 1)[2] AS BIGINT))
           |ELSE NULL END""".stripMargin))

  /** One dialect file -> unified string-typed projection (headers
    * lowercased/trimmed, unmapped columns pruned).
    */
  def readYear(spark: SparkSession, path: String, year: Int): DataFrame = {
    val map = fieldMaps(year)
    val raw = spark.read
      .option("sep", ";").option("header", "true")
      .csv(path)
    val byNorm = raw.columns.map(c => c.trim.toLowerCase -> c).toMap
    val projected = map.collect {
      case (src, dst) if byNorm.contains(src) => col(s"`${byNorm(src)}`").as(dst)
    }.toSeq
    raw.select(projected: _*)
  }

  /** U1 + S6: all files -> unified typed trips table. */
  def unify(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val frames = paths.flatMap { p =>
      yearOf(p).filter(fieldMaps.contains).map(y => readYear(spark, p, y))
    }
    require(frames.nonEmpty, "no ingestible files (unknown years?)")
    val union = frames.map { df =>
      // remember per-dialect whether the source HAD a return-date
      // column: P3 derives return_date from duration only then —
      // a dialect WITH the column whose value fails to parse must drop
      // the row (F4, parse_raw_data.py:108-115), not silently repair it
      val tagged = df.withColumn("__has_ret",
        lit(df.columns.contains("return_date")))
      unifiedCols.foldLeft(tagged)((d, c) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast("string")))
        .select((unifiedCols :+ "__has_ret").map(col): _*)
    }.reduce(_ unionByName _)
    union
      .withColumn("rent_date", parseTs(col("rent_date")))
      .withColumn("duration_s", parseDurationSeconds("duration"))
      .withColumn("return_date",
        when(col("__has_ret"), parseTs(col("return_date")))
          .otherwise(
            // sanity bound (10 years) keeps timestampadd inside the
            // timestamp range — an absurd parsed duration nulls the row
            // (F4) instead of throwing DATETIME_OVERFLOW under ANSI
            when(col("duration_s").between(0L, 315360000L),
              expr("timestampadd(SECOND, duration_s, rent_date)")))) // P3
      .where(col("rent_date").isNotNull && col("return_date").isNotNull) // F4/S6
      .withColumn("id", monotonically_increasing_id())
      .select(col("id"), col("rent_date"), col("rent_station"),
        col("return_date"), col("return_station"))
  }

  /** Exact-parity variant of unify: DENSE sequential ids like the
    * reference (unify.py:47-49), via zipWithIndex — one extra pass and a
    * driver-coordinated offset per partition; use only when downstream
    * consumers require gap-free ids.
    */
  def unifyDenseIds(spark: SparkSession, paths: Seq[String]): DataFrame = {
    val base = unify(spark, paths).drop("id")
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false) +: base.schema.fields)
    val rows = base.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(i +: row.toSeq)
    }
    spark.createDataFrame(rows, schema)
  }
}
