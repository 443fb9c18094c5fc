package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: 64-bit Z-ORDER (Morton) key — the bit
  * interleave of 2–6 non-negative integral bucket columns (bit j of
  * child i lands at position j·k + i, LSB-first), the multi-column
  * clustering sort key classic warehouse layouts use for file skipping
  * (Morton 1966; the Delta/Iceberg OPTIMIZE ZORDER layout primitive).
  *
  * Sorting a write by this key gives every file/row-group a tight
  * bounding BOX over all k columns instead of a tight interval on one:
  * parquet min/max stats then prune multi-predicate scans on any
  * clustered column combination — the remaining classic 100 TB lever
  * after hive partitioning (low-cardinality dims) and single-column
  * sort (one range dim). Each child is clamped into its ⌊63/k⌋-bit
  * budget (callers pre-bucket real domains — ops.Layout.rangeBucket —
  * so the clamp is a guard, not the quantizer).
  *
  * Implemented at the preferred extension tier (custom `Expression`
  * with `doGenCode`, the RollingHash mold): the interleave compiles
  * into whole-stage codegen — no UDF boxing on the write path.
  */
case class ZOrder64(children: Seq[Expression]) extends Expression {

  private val k = children.size
  private val nb = 63 / math.max(k, 1)
  private val maxV = (1L << nb) - 1

  override def nullable: Boolean = children.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2 || k > 6)
      TypeCheckResult.TypeCheckFailure(s"zorder64 expects 2-6 columns, got $k")
    else if (!children.forall(c => c.dataType == LongType || c.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"zorder64 requires integral columns, got ${children.map(_.dataType.catalogString).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      if (v == null) return null
      var c = v match {
        case l: java.lang.Long    => l.longValue
        case n: java.lang.Integer => n.longValue
      }
      if (c < 0L) c = 0L
      if (c > maxV) c = maxV
      var j = 0
      while (j < nb) {
        z |= ((c >> j) & 1L) << (j * k + i)
        j += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val childCode = evals.map(_.code.toString).mkString("\n")
    val anyNull = evals.map(_.isNull).mkString(" || ")
    val blocks = evals.zipWithIndex.map { case (e, i) =>
      val v = ctx.freshName("zv")
      val j = ctx.freshName("zj")
      s"""
         |  long $v = (long) ${e.value};
         |  if ($v < 0L) $v = 0L;
         |  if ($v > ${maxV}L) $v = ${maxV}L;
         |  for (int $j = 0; $j < $nb; $j++) {
         |    ${ev.value} |= (($v >> $j) & 1L) << ($j * $k + $i);
         |  }""".stripMargin
    }.mkString("\n")
    val resultCode =
      code"""
        $childCode
        boolean ${ev.isNull} = ($anyNull);
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          $blocks
        }
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZOrder64 = copy(children = newChildren)
}
