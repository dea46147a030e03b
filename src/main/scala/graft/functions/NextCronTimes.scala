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
  // A MAP, not a last-seen slot: the derived timer table interleaves
  // several cron spellings in timer_id order, which drops a
  // single-entry memo's hit rate to ~0 (re-parsing the full grammar
  // per row). Vocabulary of distinct cron strings per task is tiny;
  // a defensive cap guards a pathological per-row-unique column.
  // Keyed by UTF8String (bytes-based equals/hashCode) so the hit path
  // probes with the incoming buffer-backed value directly — no per-row
  // UTF-8 decode; the String materializes only on a parse miss, and
  // the stored key is clone()d off the transient row buffer.
  @transient private[this] var cache: java.util.HashMap[UTF8String, CronSchedule] = _

  private def scheduleFor(cron: UTF8String): CronSchedule = {
    if (cache == null) cache = new java.util.HashMap[UTF8String, CronSchedule]()
    var s = cache.get(cron)
    if (s == null) {
      s = CronSchedule.parse(cron.toString)
      if (cache.size < 10000) cache.put(cron.clone(), s)
    }
    s
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
