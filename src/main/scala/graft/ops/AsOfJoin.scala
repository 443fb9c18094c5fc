package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with
  * `right.ts <= left.ts` on the same key (LEFT semantics: unmatched left
  * rows keep nulls).
  *
  * Spark has no built-in as-of join. The naive encodings are a range
  * join (O(n*m) per key) or a per-key collect. This is the single-shuffle
  * formulation: union the two sides tagged, sort within each key by
  * (ts, rightFirst), and carry the right side's values forward with
  * `last(ignoreNulls)` over an unbounded-preceding row frame. One hash
  * exchange on the key, one sort, one WindowExec — the same shape as the
  * flagship A5, so the same scale story (AQE handles hot keys; state per
  * row is O(#carried columns)).
  *
  * Right rows must be unique per (key, ts) for determinism — pre-aggregate
  * if needed. Ties at equal ts match (inclusive bound): the right row
  * sorts before the left row at the same timestamp.
  */
object AsOfJoin {

  def asofJoin(left: DataFrame, leftKey: String, leftTs: String,
               right: DataFrame, rightKey: String, rightTs: String,
               carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_r", lit(0))
      .withColumn("__k", col(leftKey))
      .withColumn("__rts", lit(null).cast("timestamp"))
    val lAligned = carry.foldLeft(lTagged) { (df, c) =>
      df.withColumn(s"__carry_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rAligned = leftCols.foldLeft(
      right
        .withColumn("__ts", col(rightTs))
        .withColumn("__is_r", lit(1))
        .withColumn("__k", col(rightKey))
        .withColumn("__rts", col(rightTs).cast("timestamp"))
        .withColumns(carry.map(c => s"__carry_$c" -> col(c)).toMap)
        .drop(right.columns: _*)
    ) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }

    val unioned = lAligned.select(
      (leftCols ++ Seq("__ts", "__is_r", "__k", "__rts") ++ carry.map(c => s"__carry_$c"))
        .map(col): _*)
      .unionByName(rAligned.select(
        (leftCols ++ Seq("__ts", "__is_r", "__k", "__rts") ++ carry.map(c => s"__carry_$c"))
          .map(col): _*))

    // right rows sort before left rows at equal ts => inclusive <= bound
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = carry.foldLeft(
      unioned.withColumn("asof_ts", last(col("__rts"), ignoreNulls = true).over(w))
    ) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"__carry_$c"), ignoreNulls = true).over(w))
    }

    filled.where(col("__is_r") === 0)
      .select((leftCols ++ Seq("asof_ts") ++ carry.map(c => s"asof_$c")).map(col): _*)
  }
}
