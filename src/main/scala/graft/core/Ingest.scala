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

  /** One dialect's raw string-typed frame -> unified projection (headers
    * lowercased/trimmed, unmapped columns pruned). Factored off the CSV
    * read so the driver's parquet-only oracle gate can push
    * deterministically-constructed raw frames through the REAL dialect
    * chain (queries.BicisQueries.qUnifyParse).
    */
  def projectDialect(raw: DataFrame, year: Int): DataFrame = {
    val map = fieldMaps(year)
    val byNorm = raw.columns.map(c => c.trim.toLowerCase -> c).toMap
    val projected = map.collect {
      case (src, dst) if byNorm.contains(src) => col(s"`${byNorm(src)}`").as(dst)
    }.toSeq
    raw.select(projected: _*)
  }

  /** One dialect file -> unified string-typed projection. */
  def readYear(spark: SparkSession, path: String, year: Int): DataFrame =
    projectDialect(
      spark.read.option("sep", ";").option("header", "true").csv(path), year)

  /** JSONL corpus reader — the de-facto LLM training-data interchange
    * format (one JSON document per line). Same posture as the parquet
    * scans (S4): an EXPLICIT schema, never inference — schema inference
    * reads the whole input once before the query even starts, and on a
    * 100 TB corpus that is a full extra pass; it also silently widens
    * types when one malformed line disagrees. PERMISSIVE mode routes
    * malformed lines into `_corrupt` instead of failing the job (the F4
    * skip-and-reconcile discipline; count them against the fails
    * sidecar, don't crash on line 3 billion).
    *
    * CAVEAT (SPARK-21610): Spark rejects a query over a raw JSON scan
    * that references ONLY the corrupt-record column —
    * `.where(col("_corrupt").isNotNull).count()` throws
    * AnalysisException unless the frame is cached (or a data column is
    * referenced too). Callers building the fails sidecar must
    * `.cache()` first, as IngestSpec's corrupt-line test does.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** U1 + S6: all files -> unified typed trips table. */
  def unify(spark: SparkSession, paths: Seq[String]): DataFrame =
    unifyFrames(paths.flatMap { p =>
      yearOf(p).filter(fieldMaps.contains)
        .map(y => spark.read.option("sep", ";").option("header", "true").csv(p) -> y)
    })

  /** U1 + S6 over pre-loaded (raw, year) dialect frames — the whole
    * parse/derive/drop chain behind [[unify]], CSV read excluded.
    */
  def unifyFrames(rawFrames: Seq[(DataFrame, Int)]): DataFrame = {
    val frames = rawFrames.map { case (raw, y) => projectDialect(raw, y) }
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

  /** Gap-free 0..n-1 ids in physical partition order, DataFrame-native
    * (no RDD drop-out, no shuffle of the data side).
    *
    * `monotonically_increasing_id` documents its layout as
    * `(partitionId << 33) | row-in-partition`, so a dense id is just
    * `global-offset(partition) + row-in-partition`: one aggregate over
    * the mid's high bits (map-side partial count; the shuffle carries
    * #partitions rows), a prefix-sum window over that tiny frame, a
    * broadcast join back, and arithmetic on the mid's low bits. Same
    * cost shape as RDD `zipWithIndex` — one extra counting pass, so
    * persist upstream if recompute is expensive — but the plan stays in
    * Catalyst/Tungsten end to end and the big side never moves. Like
    * zipWithIndex, ids follow physical partition order (deterministic
    * for deterministic inputs); both passes must observe the same
    * partitioning.
    *
    * AQE HAZARD (measured, guarded): if `df` sits directly on an
    * AQE-coalescable exchange (`repartition`/`repartitionByRange`
    * WITHOUT an explicit partition count, or a bare
    * ENSURE_REQUIREMENTS shuffle), adaptive execution may coalesce the
    * two passes DIFFERENTLY — the tiny offsets aggregate collapses to
    * one partition while the join pass keeps several, partition ids
    * diverge, and the join-back silently loses every row whose pid the
    * offsets pass never saw (measured: 125 of 500 rows survive at 4
    * shuffle partitions). A RANGE exchange is worse: it re-SAMPLES its
    * bounds on every execution with an rdd.id-derived seed, so the two
    * passes can assign rows to partitions DIFFERENTLY even with the
    * pid set identical (observed at sf0.1 in the SNM rank build).
    * Callers must pin the upstream exchange with an explicit count
    * (AQE preserves user-specified numbers) AND persist any
    * range-partitioned input so both passes read one materialized
    * assignment; the
    * join below LEFT-joins and raises when a pid has no offset OR a
    * row's in-partition index exceeds the count the offsets pass saw —
    * together those two checks catch EVERY divergence (see the inline
    * pigeonhole argument), so corruption fails loudly instead of
    * emitting colliding ids.
    */
  def denseIds(df: DataFrame, idCol: String = "id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.withColumn("__mid", monotonically_increasing_id())
    val offsets = base
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__offset"), col("__n"))
    // Divergence detection is COMPLETE for deterministic inputs: both
    // passes emit the same total row count, so any per-pid mismatch
    // either leaves a pid unmatched (null __offset) or, by pigeonhole,
    // overfills some pid past the count the offsets pass recorded
    // (row-in-partition index >= __n). If neither guard fires, every
    // per-pid count agrees and the emitted ids are exactly 0..n-1.
    base
      .join(broadcast(offsets), shiftright(col("__mid"), 33) === col("__pid"), "left")
      .withColumn("__rix", col("__mid") - shiftleft(col("__pid"), 33))
      .withColumn("__offset",
        when(col("__offset").isNull || col("__rix") >= col("__n"), expr(
          "raise_error('denseIds: the two passes observed different " +
            "partitionings (AQE coalescing, or a range exchange re-sampling " +
            "its bounds per execution); pin the upstream exchange with an " +
            "explicit partition count and persist range-partitioned inputs')"))
          .otherwise(col("__offset")))
      .withColumn(idCol, col("__offset") + col("__rix"))
      .select(col(idCol) +: df.columns.map(col): _*)
  }

  /** Exact-parity variant of unify: DENSE sequential ids like the
    * reference (unify.py:47-49), via [[denseIds]]; use only when
    * downstream consumers require gap-free ids — the default [[unify]]
    * keeps the one-pass partition-stable `monotonically_increasing_id`.
    */
  def unifyDenseIds(spark: SparkSession, paths: Seq[String]): DataFrame =
    denseIds(unify(spark, paths).drop("id"))
}
