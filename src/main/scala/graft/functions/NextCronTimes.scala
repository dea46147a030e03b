package graft.functions

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** `cron_times(cron, start, end)` → array<timestamp>: every
  * activation of the cron expression (full cronexpr grammar —
  * 5/6/7-field, @macros, L/W/#; see CronSchedule) per the
  * reference's NextsBetween semantics
  * (gotimer_executor/pkg/cron/parser.go:40) — strictly after
  * `start`, plus the first activation >= `end` (see CronSchedule
  * doc).
  *
  * A native Catalyst expression (not a UDF): operates directly on
  * internal microsecond longs / UTF8String, no row encoding. Eval is
  * CodegenFallback — expansion is compute-light next to the explode +
  * shuffle that follows it, so codegen here buys nothing.
  *
  * Timestamps are interpreted in UTC, matching the engine's pinned
  * session timezone (Sessions.build).
  */
case class NextCronTimes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(TimestampType, containsNull = false)
  override def nullable: Boolean = first.nullable || second.nullable || third.nullable
  override def prettyName: String = "cron_times"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == StringType &&
      second.dataType == TimestampType && third.dataType == TimestampType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cron_times expects (string, timestamp, timestamp), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  // Parsed-schedule memo: timer tables repeat a handful of cron
  // strings across millions of rows; parsing each row would dominate.
  @transient private[this] var lastCron: UTF8String = _
  @transient private[this] var lastSchedule: CronSchedule = _

  private def scheduleFor(cron: UTF8String): CronSchedule = {
    if (lastCron == null || !lastCron.equals(cron)) {
      lastSchedule = CronSchedule.parse(cron.toString)
      lastCron = cron.clone()
    }
    lastSchedule
  }

  private def toLdt(micros: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      ZoneOffset.UTC)

  private def toMicros(t: LocalDateTime): Long =
    t.toEpochSecond(ZoneOffset.UTC) * 1000000L + t.getNano / 1000L

  override protected def nullSafeEval(cron: Any, start: Any, end: Any): Any = {
    val schedule = scheduleFor(cron.asInstanceOf[UTF8String])
    val times = schedule.nextsBetween(
      toLdt(start.asInstanceOf[Long]), toLdt(end.asInstanceOf[Long]))
    new GenericArrayData(times.map(toMicros).toArray)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
