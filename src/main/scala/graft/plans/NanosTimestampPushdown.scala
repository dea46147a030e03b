package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Derives parquet-pushable predicates through the nanos→timestamp
  * reconstruction used for the events table.
  *
  * events.ts is TIMESTAMP(NANOS) parquet, readable only as a raw
  * nanos long; Tables.events rebuilds a usable timestamp as
  * `timestamp_micros(ts DIV 1000)`. Any time-range operator then
  * filters on that *computed* column, which the parquet source cannot
  * push down — at 100 TB a sub-minute window scan would read the
  * whole fact table (caught by PlanAuditSpec).
  *
  * The conversion is monotonic, so every comparison against a
  * timestamp literal implies a raw-nanos bound. Care: Spark's
  * IntegralDivide (DIV) truncates TOWARD ZERO, not floor — for
  * negative ns (pre-1970), trunc(ns/1000) = ceil(ns/1000). With
  * t = trunc(ns/1000) and micros literal C, the implications that
  * hold for ALL signs of ns are:
  *   t <  C  ⇒  ns <  1000·C          (tight for C>0; still valid C≤0)
  *   t <= C  ⇒  ns <  1000·(C+1)
  *   t >= C  ⇒  ns >= lb(C)     where lb(C) = 1000·C       if C ≥ 1
  *                                           = 1000·C − 999 if C ≤ 0
  *   t >  C  ⇒  ns >= lb(C+1)
  *   t =  C  ⇒  lb(C) <= ns < 1000·(C+1)
  * (e.g. ns=−500 → t=0 satisfies t ≥ 0, so the lower bound for C=0
  * must admit ns=−999..0, not just ns ≥ 0 — ADVICE r2 #1.)
  * The rule CONJOINS the derived raw predicate (it never replaces the
  * original), so correctness never depends on the rewrite being tight —
  * the raw bound just reaches the scan as PushedFilters / row-group
  * pruning.
  */
object NanosTimestampPushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(attr DIV 1000) over a long column. */
  private object NanosToTs {
    def unapply(e: Expression): Option[Attribute] = e match {
      case MicrosToTimestamp(d: IntegralDivide) => (d.left, d.right) match {
        case (a: Attribute, Literal(1000L, LongType)) if a.dataType == LongType => Some(a)
        case _ => None
      }
      case _ => None
    }
  }

  private def micros(l: Literal): Long = l.value.asInstanceOf[Long]

  /** Top-level conjuncts only — deriving from inside an OR / NOT
    * branch and conjoining it would strengthen the filter incorrectly. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Micros literals whose ·1000 (and +1·1000) scaling cannot overflow. */
  private def inRange(c: Long): Boolean =
    c > Long.MinValue / 1000L + 1 && c < Long.MaxValue / 1000L - 1

  private def derive(cond: Expression): Seq[Expression] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Expression]
    def nsLit(v: Long): Literal = Literal(v, LongType)
    // Truncation-safe lower bound: t = trunc(ns/1000) >= C implies
    // ns >= 1000·C only when C ≥ 1; for C ≤ 0 trunc-toward-zero admits
    // ns down to 1000·C − 999 (ns=−500 has t=0).
    def lb(c: Long): Long = if (c >= 1) c * 1000L else c * 1000L - 999L
    conjuncts(cond).foreach {
      case LessThan(NanosToTs(a), l @ Literal(_, TimestampType)) if inRange(micros(l)) =>
        out += LessThan(a, nsLit(micros(l) * 1000L))
      case GreaterThanOrEqual(NanosToTs(a), l @ Literal(_, TimestampType)) if inRange(micros(l)) =>
        out += GreaterThanOrEqual(a, nsLit(lb(micros(l))))
      case LessThanOrEqual(NanosToTs(a), l @ Literal(_, TimestampType)) if inRange(micros(l)) =>
        out += LessThan(a, nsLit((micros(l) + 1) * 1000L))
      case GreaterThan(NanosToTs(a), l @ Literal(_, TimestampType)) if inRange(micros(l)) =>
        out += GreaterThanOrEqual(a, nsLit(lb(micros(l) + 1)))
      case EqualTo(NanosToTs(a), l @ Literal(_, TimestampType)) if inRange(micros(l)) =>
        out += GreaterThanOrEqual(a, nsLit(lb(micros(l))))
        out += LessThan(a, nsLit((micros(l) + 1) * 1000L))
      // literal-on-left variants
      case GreaterThan(l @ Literal(_, TimestampType), NanosToTs(a)) if inRange(micros(l)) =>
        out += LessThan(a, nsLit(micros(l) * 1000L))
      case LessThanOrEqual(l @ Literal(_, TimestampType), NanosToTs(a)) if inRange(micros(l)) =>
        out += GreaterThanOrEqual(a, nsLit(lb(micros(l))))
      case GreaterThanOrEqual(l @ Literal(_, TimestampType), NanosToTs(a)) if inRange(micros(l)) =>
        out += LessThan(a, nsLit((micros(l) + 1) * 1000L))
      case LessThan(l @ Literal(_, TimestampType), NanosToTs(a)) if inRange(micros(l)) =>
        out += GreaterThanOrEqual(a, nsLit(lb(micros(l) + 1)))
      case _ =>
    }
    out.toSeq
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = cond.collect { case e => e.canonicalized }.toSet
      val derived = derive(cond).filterNot(d => existing.contains(d.canonicalized))
      if (derived.isEmpty) f
      else Filter(derived.foldLeft(cond)(And(_, _)), child)
  }
}
