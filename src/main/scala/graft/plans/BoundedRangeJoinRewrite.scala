package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Catalyst optimizer rule: rewrite a bounded time-range theta-join
  * into a 2-bucket equi-join automatically.
  *
  * A join whose condition contains `r.ts >= l.ts - W AND r.ts < l.ts`
  * (W literal) has no equi-key on the time dimension, so Spark plans
  * a nested-loop join — O(|L|·|R|) per key group, the classic
  * event-correlation bottleneck. But the predicate implies
  * `floor(r.ts / W) ∈ {floor(l.ts / W), floor(l.ts / W) - 1}`: the
  * rule explodes each left row into those two bucket values and adds
  * `bucket = floor(r.ts / W)` as an equi-conjunct, which the planner
  * picks up as a hash-join key. Each right row lands in exactly one
  * bucket and the two probed buckets are distinct, so no duplicates
  * arise; the original range conjuncts stay for exactness. This is
  * [[graft.operators.TemporalJoins.priorCountInWindow]]'s manual
  * trick, applied transparently to any user query with the pattern —
  * registered via GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  *
  * Conservative by design: inner joins only, LongType timestamps,
  * literal window, attributes referenced directly (no casts), and it
  * skips joins it already rewrote (marker attribute).
  */
object BoundedRangeJoinRewrite extends Rule[LogicalPlan] {

  private val BucketCol = "__graft_range_bucket"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  private def windowLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Integer, _) => Some(v.toLong)
    case _ => None
  }

  /** floor(x / w) in exact integer arithmetic (sign-correct). */
  private def floorDiv(x: Expression, w: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(w))), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !conjuncts(cond).exists(_.exists {
          case a: AttributeReference => a.name == BucketCol
          case _ => false
        }) =>
      val cs = conjuncts(cond)
      // r.ts >= l.ts - W  (either side may own either attribute)
      val lower = cs.collectFirst {
        case GreaterThanOrEqual(r: AttributeReference,
            Subtract(l: AttributeReference, w, _))
            if right.outputSet.contains(r) && left.outputSet.contains(l) &&
              r.dataType == LongType && l.dataType == LongType &&
              windowLit(w).exists(_ > 0) =>
          (r, l, windowLit(w).get)
      }
      val rewritten = lower.flatMap { case (rts, lts, w) =>
        // ... AND r.ts < l.ts over the same attribute pair
        val upper = cs.exists {
          case LessThan(r: AttributeReference, l: AttributeReference) =>
            r.semanticEquals(rts) && l.semanticEquals(lts)
          case _ => false
        }
        if (!upper) None else {
          val bucket = AttributeReference(BucketCol, LongType, nullable = true)()
          val probes = Generate(
            Explode(CreateArray(Seq(
              floorDiv(lts, w), Subtract(floorDiv(lts, w), Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bucket), child = left)
          val newCond = And(cond, EqualTo(bucket, floorDiv(rts, w)))
          Some(Project(j.output, Join(probes, right, Inner, Some(newCond), hint)))
        }
      }
      rewritten.getOrElse(j)
  }
}
