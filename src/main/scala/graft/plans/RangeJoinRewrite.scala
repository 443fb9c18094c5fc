package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, EmptyBlock, FalseLiteral, TrueLiteral}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Constant-true predicate marking [[RangeJoinRewrite]]'s long-interval
  * fallback join so the rule recognizes its own output across optimizer
  * fixpoint iterations. The shape is load-bearing against the
  * operator-optimization batch it runs in when injected via
  * `spark.sql.extensions`:
  *  - `foldable = false` — ConstantFolding can't collapse it to TRUE
  *    even after FoldablePropagation substitutes literal children;
  *  - it carries one reference from EACH join side — an always-true
  *    conjunct referencing only one side (or none) would be pushed out
  *    of an inner-join condition by PushPredicateThroughJoin, and an
  *    unreferenced marker *column* is stripped by ColumnPruning (the
  *    round-2 non-convergence bug: the rule re-rewrote its own fallback
  *    branch every iteration until maxIterations).
  * Runtime cost is zero: codegen emits the literal `true`.
  */
case class RangeJoinFallbackMarker(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {
  override def foldable: Boolean = false
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(code = EmptyBlock, isNull = FalseLiteral, value = TrueLiteral)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule (the §7.4 tier-(c) extension): rewrites a naive
  * point-in-interval join —
  *
  *   points JOIN intervals ON ts >= start AND ts < end [AND ...]
  *
  * which Spark plans as a BroadcastNestedLoopJoin (O(|p|·|i|)) when no
  * equi-conjunct exists — into the bucketed formulation of
  * [[graft.ops.RangeJoin]]: intervals explode into the fixed-width time
  * chunks they overlap, points compute their single chunk, and the join
  * gains an EQUI-conjunct on the chunk id, turning it into a hash join
  * whose cost tracks true overlaps. The original predicates stay as the
  * residual filter, so output equality is exact: a matching pair
  * produces exactly one row (a point has one chunk; the interval's
  * duplicates are keyed by distinct chunks).
  *
  * Activation: `spark.experimental.extraOptimizations` in-process, or
  * `spark.sql.extensions=graft.functions.GraftExtensions` for SQL-only
  * sessions. Chunk width via `spark.graft.rangeJoin.chunkMicros`
  * (default 1h); disable with `spark.graft.rangeJoin.enabled=false`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def chunkMicros: Long =
    conf.getConfString("spark.graft.rangeJoin.chunkMicros", "3600000000").toLong
  private def enabled: Boolean =
    conf.getConfString("spark.graft.rangeJoin.enabled", "true").toBoolean
  /** Per-interval explode cap: intervals spanning more chunks than this
    * (open-ended sentinels, year-long rows) keep the nested-loop path in
    * a separate union branch instead of materializing a huge chunk array.
    */
  private def maxChunks: Long =
    conf.getConfString("spark.graft.rangeJoin.maxChunksPerInterval", "4096").toLong

  private val PointChunk = "__chunk_p"
  private val IntervalChunk = "__chunk_i"

  /** (ts, start, end, pointsOnLeft) when the condition contains the
    * half-open containment pattern with ts on one side and both bounds
    * on the other.
    */
  private def containment(conjs: Seq[Expression], left: LogicalPlan,
                          right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    def sideOf(e: Expression): Option[Boolean] = // true = left
      if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None
    val ges = conjs.collect {
      case GreaterThanOrEqual(a, b) if a.dataType == TimestampType => (a, b)
      case LessThanOrEqual(b, a) if a.dataType == TimestampType => (a, b)
    }
    val lts = conjs.collect {
      case LessThan(a, c) if a.dataType == TimestampType => (a, c)
      case GreaterThan(c, a) if a.dataType == TimestampType => (a, c)
    }
    (for {
      (ts, start) <- ges
      (ts2, end) <- lts if ts.semanticEquals(ts2)
      tsSide <- sideOf(ts)
      startSide <- sideOf(start) if startSide != tsSide
      endSide <- sideOf(end) if endSide != tsSide
      if start.dataType == TimestampType && end.dataType == TimestampType
    } yield (ts, start, end, tsSide)).headOption
  }

  private def alreadyRewritten(p: LogicalPlan): Boolean =
    p.output.exists(a => a.name == PointChunk || a.name == IntervalChunk)

  /** The fallback join carries an unremovable marker conjunct (see
    * [[RangeJoinFallbackMarker]]); an output-name probe is NOT enough
    * there because the fallback branch has no live chunk column.
    */
  private def isOwnFallback(cond: Expression): Boolean =
    cond.exists(_.isInstanceOf[RangeJoinFallbackMarker])

  /** A cross-side equality conjunct means Spark already plans a hash
    * join (key equi + range residual) — and covers manually-bucketed
    * plans like ops.RangeJoin's chunk equality. The rule targets only
    * joins that would otherwise be nested loops.
    */
  private def hasCrossSideEquality(conjs: Seq[Expression], left: LogicalPlan,
                                   right: LogicalPlan): Boolean =
    conjs.exists {
      case Equality(a, b) => // EqualTo and EqualNullSafe both plan as hash joins
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty) ||
        (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
          a.references.nonEmpty && b.references.nonEmpty)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !isOwnFallback(cond) &&
            !alreadyRewritten(left) && !alreadyRewritten(right) &&
            !hasCrossSideEquality(splitConjunctivePredicates(cond), left, right) =>
        containment(splitConjunctivePredicates(cond), left, right) match {
          case Some((ts, start, end, pointsOnLeft)) =>
            val chunk = Literal(chunkMicros)
            def chunkOf(e: Expression): Expression =
              IntegralDivide(UnixMicros(e), chunk)
            val (points, intervals) = if (pointsOnLeft) (left, right) else (right, left)

            val pChunk = Alias(chunkOf(ts), PointChunk)()
            val pointsPlan = Project(points.output :+ pChunk, points)

            // end is exclusive: an interval ending exactly on a chunk
            // boundary does not own that chunk (bound from end-1); the
            // guard filter keeps the ascending sequence well-defined
            // (empty/inverted intervals can't match the residual anyway)
            val endChunk = IntegralDivide(Subtract(UnixMicros(end), Literal(1L)), chunk)
            val spanOk = LessThan(Subtract(endChunk, chunkOf(start)), Literal(maxChunks))
            val seq = Sequence(chunkOf(start), endChunk,
              Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
            val iChunk = AttributeReference(IntervalChunk, LongType, nullable = false)()
            val shortIntervals = Generate(Explode(seq), Nil, outer = false, None,
              Seq(iChunk), Filter(And(GreaterThan(end, start), spanOk), intervals))

            val shortCond = And(cond, EqualTo(pChunk.toAttribute, iChunk))
            val shortJoin =
              if (pointsOnLeft) Join(pointsPlan, shortIntervals, Inner, Some(shortCond), hint)
              else Join(shortIntervals, pointsPlan, Inner, Some(shortCond), hint)

            // intervals longer than the cap (open-ended sentinels) keep
            // the nested-loop path — a bounded-memory union branch over
            // what is usually a tiny minority of rows — instead of
            // exploding a multi-million-element chunk array. The marker
            // conjunct (not a column: ColumnPruning strips unreferenced
            // columns, and single-sided constants get pushed out of the
            // condition) makes the rule recognize this branch on later
            // fixpoint iterations instead of re-rewriting it forever.
            val longIntervals =
              Filter(And(GreaterThan(end, start), Not(spanOk)), intervals)
            val longCond = And(cond, RangeJoinFallbackMarker(ts, end))
            val longJoin =
              if (pointsOnLeft) Join(points, longIntervals, Inner, Some(longCond), hint)
              else Join(longIntervals, points, Inner, Some(longCond), hint)

            Union(Seq(Project(j.output, shortJoin), Project(j.output, longJoin)))
          case None => j
        }
    }
  }
}
