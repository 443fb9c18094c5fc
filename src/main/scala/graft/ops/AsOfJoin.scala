package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key (LEFT semantics: unmatched left
  * rows keep nulls).
  *
  * Spark has no built-in as-of join. The naive encodings are a range
  * join (O(n*m) per key) or a per-key collect. This is the single-shuffle
  * formulation: union the two sides tagged, sort within each key by
  * (ts, rightFirst), and carry the right side forward with
  * `last(ignoreNulls)` over an unbounded-preceding row frame. One hash
  * exchange on the key, one sort, one WindowExec — the same shape as the
  * flagship A5, so the same scale story (AQE handles hot keys; state per
  * row is O(#carried columns)).
  *
  * Correctness details:
  *  - all carried values travel in ONE struct column, so a right row
  *    whose carried value is genuinely NULL still advances the as-of
  *    match (the struct itself is non-null) instead of letting
  *    last(ignoreNulls) reach back to a stale older row;
  *  - right rows with a NULL key or NULL timestamp are dropped up front
  *    — SQL equality never matches NULL keys, and `NULL <= ts` is never
  *    true, but the window partition/sort would otherwise admit them
  *    (a null ts sorts first and would become a spurious as-of match
  *    for left rows with no real predecessor);
  *  - ties at equal ts match (inclusive bound): the right row sorts
  *    before the left row at the same timestamp.
  *
  * Right rows must be unique per (key, ts) for determinism — pre-aggregate
  * if needed.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, leftKey: String, leftTs: String,
               right: DataFrame, rightKey: String, rightTs: String,
               carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = {
      val fields = org.apache.spark.sql.types.StructField("__ts0",
        org.apache.spark.sql.types.TimestampType) +:
        carry.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType))
      org.apache.spark.sql.types.StructType(fields)
    }

    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_r", lit(0))
      .withColumn("__k", col(leftKey))
      .withColumn("__payload", lit(null).cast(payloadType))
    val rTagged = right
      .where(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__is_r", lit(1))
      .withColumn("__k", col(rightKey))
      .withColumn("__payload",
        struct(col(rightTs).cast("timestamp").as("__ts0") +: carry.map(col): _*))
    val rAligned = leftCols.foldLeft(rTagged.drop(right.columns.filterNot(
      Seq("__ts", "__is_r", "__k", "__payload").contains).toIndexedSeq: _*)) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val cols = leftCols ++ Seq("__ts", "__is_r", "__k", "__payload")
    val unioned = lTagged.select(cols.map(col): _*)
      .unionByName(rAligned.select(cols.map(col): _*))

    // right rows sort before left rows at equal ts => inclusive <= bound
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__is_r") === 0)
      .select(leftCols.map(col) ++ Seq(col("__asof.__ts0").as("asof_ts")) ++
        carry.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** The NATIVE formulation: same semantics and output schema as
    * [[asofJoin]], executed by the custom physical operator
    * (graft.plans.AsOfJoinExec — two thin per-side exchanges + sorted
    * two-pointer merge, instead of one fat padded-union exchange + a
    * window carry; see the plan file's scaladoc for the 100 TB bytes
    * argument). Installs the planner strategy on the session lazily.
    * Both ts columns must be TIMESTAMP.
    *
    * PRECONDITION (both formulations): right-side (key, ts) pairs must
    * be unique. With duplicates at the same (key, ts), WHICH duplicate's
    * carry values are emitted is formulation- and partitioning-dependent
    * (the merge keeps the last in sort order, the window form an
    * arbitrary last(ignoreNulls)) — dedup the right side or add a
    * tie-break column to ts first, as DuckDB/pandas ASOF require.
    */
  def asofJoinNative(left: DataFrame, leftKey: String, leftTs: String,
                     right: DataFrame, rightKey: String, rightTs: String,
                     carry: Seq[String]): DataFrame = {
    import org.apache.spark.sql.GraftColumns
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val spark = left.sparkSession
    GraftColumns.installStrategy(spark, graft.plans.AsOfJoinStrategy)
    // Re-alias both inputs so the attributes this node anchors to carry
    // FRESH, non-conflicting exprIds. Without this, two sides scanning
    // the same base table share attribute ids; the analyzer's
    // DeduplicateRelations rewrites the right SUBTREE's ids but cannot
    // rewrite a custom node's captured key/ts/carry fields, leaving
    // them dangling (column pruning then drops the "unreferenced" key
    // and execution fails to bind). Alias outputs are fresh ids the
    // dedup pass never needs to touch.
    val lf = left.select(left.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val rf = right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
    val la = lf.queryExecution.analyzed
    val ra = rf.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asofJoinNative: no column '$n' in ${p.output.map(_.name)}"))
    val rts = attr(ra, rightTs)
    require(rts.dataType == org.apache.spark.sql.types.TimestampType &&
      attr(la, leftTs).dataType == org.apache.spark.sql.types.TimestampType,
      "asofJoinNative: both ts columns must be TIMESTAMP")
    val carryAttrs = carry.map(c => attr(ra, c))
    val matched = AttributeReference("asof_ts", rts.dataType, nullable = true)() +:
      carryAttrs.map(a => AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    GraftColumns.ofRows(spark, graft.plans.AsOfJoinPlan(
      la, ra, attr(la, leftKey), attr(la, leftTs), attr(ra, rightKey), rts,
      carryAttrs, matched))
  }

  /** TOLERANCED as-of join (pandas `merge_asof(tolerance=...)`): the
    * backward match only counts when the matched row is RECENT ENOUGH —
    * `left.ts - matched.ts <= toleranceMicros` — otherwise every asof_*
    * output nulls out (LEFT semantics keep the row). This is a pure
    * post-mask over [[asofJoin]]/[[asofJoinNative]]: the nearest
    * predecessor is already the window/merge result, so tolerance never
    * changes WHICH row matches, only whether the match stands. Costs one
    * extra projection — the exchange/merge shape (and the 100 TB story)
    * is exactly the underlying formulation's.
    */
  def asofJoinWithin(left: DataFrame, leftKey: String, leftTs: String,
                     right: DataFrame, rightKey: String, rightTs: String,
                     carry: Seq[String], toleranceMicros: Long,
                     native: Boolean = false): DataFrame = {
    require(toleranceMicros >= 0, "asofJoinWithin: tolerance must be >= 0")
    val joined =
      if (native) asofJoinNative(left, leftKey, leftTs, right, rightKey, rightTs, carry)
      else asofJoin(left, leftKey, leftTs, right, rightKey, rightTs, carry)
    val in = col("asof_ts").isNotNull &&
      unix_micros(col(leftTs)) - unix_micros(col("asof_ts")) <= toleranceMicros
    val masked = joined.withColumn("__in_tol", in)
    ("asof_ts" +: carry.map(c => s"asof_$c"))
      .foldLeft(masked)((df, c) => df.withColumn(c, when(col("__in_tol"), col(c))))
      .drop("__in_tol")
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row with
    * `right.ts >= left.ts` on the same key — pure REUSE of the backward
    * machinery on a NEGATED microsecond axis (latest −rts ≤ −ts is
    * exactly earliest rts ≥ ts), so both formulations, their specs and
    * the physical operator's scale story carry over unchanged. The
    * matched original right timestamp rides the carry set under a
    * RESERVED alias (`__fwd_rts`) and is emitted as `asof_ts`; the
    * negated-axis timestamp never escapes. The reserved alias matters:
    * carrying the ts under `asof_<rightTs>` collides with the
    * machinery's internal `asof_ts` whenever rightTs is itself named
    * "ts", and `drop("asof_ts")` then silently removes BOTH copies
    * (r9 ADVICE). Same unique-(key, ts) right-side precondition as the
    * backward forms. `native = true` routes through AsOfJoinExec.
    */
  def asofJoinForward(left: DataFrame, leftKey: String, leftTs: String,
                      right: DataFrame, rightKey: String, rightTs: String,
                      carry: Seq[String], native: Boolean = false): DataFrame = {
    def neg(c: org.apache.spark.sql.Column) = timestamp_micros(-unix_micros(c))
    val ln = left.withColumn("__nts", neg(col(leftTs)))
    val rn = right.withColumn("__nts", neg(col(rightTs)))
      .withColumn("__fwd_rts", col(rightTs))
    val joined =
      if (native) asofJoinNative(ln, leftKey, "__nts", rn, rightKey, "__nts", "__fwd_rts" +: carry)
      else asofJoin(ln, leftKey, "__nts", rn, rightKey, "__nts", "__fwd_rts" +: carry)
    joined.drop("__nts").drop("asof_ts")
      .withColumnRenamed("asof___fwd_rts", "asof_ts")
  }
}
