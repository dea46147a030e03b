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
  * timestamp literal implies an equivalent raw-nanos bound:
  *   floor(ns/1000) <  C  ⇔  ns <  1000·C
  *   floor(ns/1000) >= C  ⇔  ns >= 1000·C
  *   floor(ns/1000) <= C  ⇔  ns <  1000·(C+1)
  *   floor(ns/1000) >  C  ⇔  ns >= 1000·(C+1)
  *   floor(ns/1000) =  C  ⇔  1000·C <= ns < 1000·(C+1)
  * The rule CONJOINS the derived raw predicate (it never replaces the
  * original), so correctness never depends on the rewrite — the raw
  * bound just reaches the scan as PushedFilters / row-group pruning.
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

  private def derive(cond: Expression): Seq[Expression] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Expression]
    def nsLit(v: Long): Literal = Literal(v, LongType)
    conjuncts(cond).foreach {
      case LessThan(NanosToTs(a), l @ Literal(_, TimestampType)) =>
        out += LessThan(a, nsLit(micros(l) * 1000L))
      case GreaterThanOrEqual(NanosToTs(a), l @ Literal(_, TimestampType)) =>
        out += GreaterThanOrEqual(a, nsLit(micros(l) * 1000L))
      case LessThanOrEqual(NanosToTs(a), l @ Literal(_, TimestampType)) =>
        out += LessThan(a, nsLit((micros(l) + 1) * 1000L))
      case GreaterThan(NanosToTs(a), l @ Literal(_, TimestampType)) =>
        out += GreaterThanOrEqual(a, nsLit((micros(l) + 1) * 1000L))
      case EqualTo(NanosToTs(a), l @ Literal(_, TimestampType)) =>
        out += GreaterThanOrEqual(a, nsLit(micros(l) * 1000L))
        out += LessThan(a, nsLit((micros(l) + 1) * 1000L))
      // literal-on-left variants
      case GreaterThan(l @ Literal(_, TimestampType), NanosToTs(a)) =>
        out += LessThan(a, nsLit(micros(l) * 1000L))
      case LessThanOrEqual(l @ Literal(_, TimestampType), NanosToTs(a)) =>
        out += GreaterThanOrEqual(a, nsLit(micros(l) * 1000L))
      case GreaterThanOrEqual(l @ Literal(_, TimestampType), NanosToTs(a)) =>
        out += LessThan(a, nsLit((micros(l) + 1) * 1000L))
      case LessThan(l @ Literal(_, TimestampType), NanosToTs(a)) =>
        out += GreaterThanOrEqual(a, nsLit((micros(l) + 1) * 1000L))
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
