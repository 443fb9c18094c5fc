package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The §7.4 tier-(c) WHOLE-OPERATOR extension: as-of join as a first-
  * class logical node + planner strategy + physical operator, beside
  * the composed union-and-window formulation (ops/AsOfJoin.scala).
  *
  * Why a physical operator when the composed form is already correct:
  * the composed plan UNIONS the two sides into one padded table — every
  * left row ships a null payload struct and every right row ships a
  * full set of null-padded left columns through ONE fat exchange, then
  * a WindowExec sorts and walks the union with a last(ignoreNulls)
  * carry. The native operator shuffles each side with ONLY ITS OWN
  * columns (two thin exchanges the optimizer can independently reuse),
  * sorts each side by (key, ts) — the SortMergeJoin machinery — and
  * streams a TWO-POINTER merge whose state is one buffered match per
  * key: no union, no padding, no window buffer. At 100 TB the padded
  * union is the cost: its exchange carries ~(|L|+|R|)·(wL+wR) bytes
  * where the merge form carries |L|·wL + |R|·wR.
  *
  * Semantics are IDENTICAL to ops/AsOfJoin.asofJoin (left as-of join,
  * inclusive `right.ts <= left.ts` bound, per-key latest match):
  *  - null left key or ts → null match (SQL equality / `<=` never true);
  *  - null right keys and timestamps are skipped in the merge;
  *  - a genuinely-NULL carried value still advances the match (the
  *    match is the right ROW, not a non-null value);
  *  - ties at equal ts match (inclusive bound);
  *  - PRECONDITION: right-side (key, ts) pairs must be unique. With
  *    duplicates, which duplicate wins is formulation-dependent (the
  *    merge takes the last in sort order, which is unstable across
  *    partitionings; the composed window form takes an arbitrary
  *    last(ignoreNulls)). Dedup or add a tie-break column first —
  *    same contract as DuckDB/pandas ASOF joins.
  * AsOfJoinSpec pins native ≡ composed on the edge fixtures and on
  * random data; the q_asof_join_native gate entry hash-checks it
  * against DuckDB's native ASOF JOIN.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    carry: Seq[Attribute],
    matchedOut: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ matchedOut
  // matchedOut is GENERATED here, not consumed from children — without
  // this CheckAnalysis flags the output attributes as missing inputs
  override def producedAttributes: AttributeSet = AttributeSet(matchedOut)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: AsOfJoinPlan → AsOfJoinExec. Installed per session
  * via `spark.experimental.extraStrategies` (done lazily by
  * ops/AsOfJoin.asofJoinNative) or globally via GraftExtensions.
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, carry, matched) =>
      AsOfJoinExec(lk, lt, rk, rt, carry, matched, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requires both children clustered on their key
  * (EnsureRequirements co-partitions them, exactly as for a sort-merge
  * join) and sorted by (key, ts); executes a per-partition two-pointer
  * merge with O(1) state — the latest in-bound right match per key.
  */
case class AsOfJoinExec(
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    carry: Seq[Attribute], matchedOut: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ matchedOut
  override def producedAttributes: AttributeSet = AttributeSet(matchedOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTsB = BindReferences.bindReference(leftTs: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTsB = BindReferences.bindReference(rightTs: Expression, right.output)
    // the match projection: (rightTs, carried...) in matchedOut order
    val matchB = (rightTs +: carry).map(a =>
      BindReferences.bindReference(a: Expression, right.output))
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val nMatched = matchedOut.size
    val schema = output
    val leftOutput = left.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(schema, leftOutput ++ matchedOut)
      val joined = new JoinedRow
      val nullMatch = new GenericInternalRow(nMatched)
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      def advance(): Unit = { rHead = if (rIter.hasNext) rIter.next() else null }
      var curKey: Any = null
      var curKeySet = false
      var cand: GenericInternalRow = null

      lIter.map { lRow =>
        val k = lKeyB.eval(lRow)
        val t = lTsB.eval(lRow)
        var matchRow: InternalRow = nullMatch
        if (k != null && t != null) {
          val tl = t.asInstanceOf[Long]
          if (!curKeySet || keyOrd.compare(curKey, k) != 0) {
            // COPY the key: for StringType/BinaryType/struct keys eval
            // returns a view into the upstream sort iterator's reused row
            // buffer; caching the alias would let curKey mutate under us
            // when the buffer is recycled (e.g. a spilled-sort reader),
            // suppressing the key-change reset and emitting a stale match.
            // Mirrors SortMergeJoinScanner's streamedRowKey.copy().
            curKey = InternalRow.copyValue(k); curKeySet = true; cand = null
          }
          var done = false
          while (!done && rHead != null) {
            val rk = rKeyB.eval(rHead)
            if (rk == null) advance() // null right keys never match; sort first
            else {
              val c = keyOrd.compare(rk, k)
              if (c < 0) advance()
              else if (c > 0) done = true
              else {
                val rt = rTsB.eval(rHead)
                if (rt == null) advance() // NULL <= ts is never true; sorts first
                else if (rt.asInstanceOf[Long] <= tl) {
                  // copy the match VALUES out of the (reused) right row
                  val vals = new GenericInternalRow(nMatched)
                  var i = 0
                  while (i < nMatched) {
                    vals.update(i, InternalRow.copyValue(matchB(i).eval(rHead)))
                    i += 1
                  }
                  cand = vals
                  advance()
                } else done = true
              }
            }
          }
          if (cand != null) matchRow = cand
        }
        proj(joined(lRow, matchRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
