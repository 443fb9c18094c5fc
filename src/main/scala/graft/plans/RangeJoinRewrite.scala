package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved && !alreadyRewritten(left) && !alreadyRewritten(right) =>
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
            val seq = Sequence(chunkOf(start),
              IntegralDivide(Subtract(UnixMicros(end), Literal(1L)), chunk),
              Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
            val iChunk = AttributeReference(IntervalChunk, LongType, nullable = false)()
            val intervalsPlan = Generate(Explode(seq), Nil, outer = false, None,
              Seq(iChunk), Filter(GreaterThan(end, start), intervals))

            val newCond = And(cond, EqualTo(pChunk.toAttribute, iChunk))
            val rewritten =
              if (pointsOnLeft) Join(pointsPlan, intervalsPlan, Inner, Some(newCond), hint)
              else Join(intervalsPlan, pointsPlan, Inner, Some(newCond), hint)
            Project(j.output, rewritten)
          case None => j
        }
    }
  }
}
