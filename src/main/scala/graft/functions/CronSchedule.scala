package graft.functions

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import scala.collection.mutable.ArrayBuffer

/** A parsed 5-field cron expression (minute hour day-of-month month
  * day-of-week) with the semantics of the reference's cron engine
  * (gotimer_executor/pkg/cron/parser.go, which delegates to
  * gorhill/cronexpr):
  *
  *  - fields support `*`, `a`, `a-b`, lists, and `/step` on any of
  *    those (`*\/5`, `10-40/10`, `1,15`); month and day-of-week also
  *    accept 3-letter names; day-of-week 7 ≡ 0 ≡ Sunday.
  *  - standard dom/dow union rule: when BOTH are restricted a day
  *    matches if EITHER matches; otherwise the restricted one rules.
  *  - `next(t)` is strictly after `t`, at second 0.
  *  - `nextsBetween(start, end)` mirrors parser.go:40 NextsBetween
  *    exactly, INCLUDING its boundary quirk: activations are taken
  *    strictly after `start`, and because the loop appends before
  *    re-checking, the result also contains the first activation
  *    >= `end` (when one exists within the search horizon).
  */
final case class CronSchedule(
    minutes: Array[Int], hours: Array[Int], doms: Array[Int],
    months: Array[Int], dows: Array[Int],
    domStar: Boolean, dowStar: Boolean) {

  private def dayMatches(t: LocalDateTime): Boolean = {
    val domOk = java.util.Arrays.binarySearch(doms, t.getDayOfMonth) >= 0
    val dowOk = java.util.Arrays.binarySearch(dows, t.getDayOfWeek.getValue % 7) >= 0
    if (domStar && dowStar) true
    else if (domStar) dowOk
    else if (dowStar) domOk
    else domOk || dowOk
  }

  /** First activation strictly after `t` (or None beyond a 5-year
    * horizon — mirrors cronexpr giving up on unsatisfiable exprs). */
  def next(t: LocalDateTime): Option[LocalDateTime] = {
    var c = t.truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    var guard = 0
    while (guard < 366 * 5) {
      guard += 1
      if (java.util.Arrays.binarySearch(months, c.getMonthValue) < 0) {
        // jump to the 1st of the next month
        c = c.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1).plusMonths(1)
      } else if (!dayMatches(c)) {
        c = c.truncatedTo(ChronoUnit.DAYS).plusDays(1)
      } else {
        // scan matching (hour, minute) pairs from c's time of day
        var hi = 0
        while (hi < hours.length) {
          val h = hours(hi)
          if (h > c.getHour) {
            return Some(c.truncatedTo(ChronoUnit.DAYS).plusHours(h).plusMinutes(minutes(0)))
          } else if (h == c.getHour) {
            var mi = 0
            while (mi < minutes.length) {
              if (minutes(mi) >= c.getMinute)
                return Some(c.truncatedTo(ChronoUnit.DAYS).plusHours(h).plusMinutes(minutes(mi)))
              mi += 1
            }
          }
          hi += 1
        }
        c = c.truncatedTo(ChronoUnit.DAYS).plusDays(1)
      }
    }
    None
  }

  /** parser.go:40 NextsBetween — see class doc for the boundary
    * semantics being mirrored. */
  def nextsBetween(start: LocalDateTime, end: LocalDateTime): Seq[LocalDateTime] = {
    require(!end.isBefore(start), s"end $end earlier than start $start")
    val out = ArrayBuffer.empty[LocalDateTime]
    var s = start
    var continue = true
    while (continue && s.isBefore(end)) {
      next(s) match {
        case Some(n) => out += n; s = n
        case None => continue = false
      }
    }
    out.toSeq
  }
}

object CronSchedule {
  private val MonthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC").zip(1 to 12).toMap
  private val DowNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")
    .zip(0 to 6).toMap

  private def parseField(field: String, lo: Int, hi: Int,
      names: Map[String, Int]): (Array[Int], Boolean) = {
    val isStar = field == "*"
    def atom(s: String): Int = {
      val up = s.toUpperCase
      names.getOrElse(up,
        up.toIntOption.getOrElse(
          throw new IllegalArgumentException(s"bad cron atom '$s'")))
    }
    val vals = field.split(',').flatMap { part =>
      val (rangePart, step) = part.split('/') match {
        case Array(r) => (r, 1)
        case Array(r, st) => (r, st.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron part '$part'")
      }
      require(step >= 1, s"bad cron step in '$part'")
      val (a, b) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains('-') =>
          val Array(x, y) = r.split('-'); (atom(x), atom(y))
        // bare value with a step means "value to max" (cronexpr rule)
        case r if part.contains('/') => (atom(r), hi)
        case r => val v = atom(r); (v, v)
      }
      require(a >= lo && b <= hi && a <= b, s"cron range $a-$b out of [$lo,$hi]")
      a to b by step
    }
    (vals.distinct.sorted, isStar)
  }

  def parse(expr: String): CronSchedule = {
    val fields = expr.trim.split("\\s+")
    require(fields.length == 5, s"expected 5 cron fields, got ${fields.length} in '$expr'")
    val (minutes, _) = parseField(fields(0), 0, 59, Map.empty)
    val (hours, _) = parseField(fields(1), 0, 23, Map.empty)
    val (doms, domStar) = parseField(fields(2), 1, 31, Map.empty)
    val (months, _) = parseField(fields(3), 1, 12, MonthNames)
    // dow allows 0-7 with 7 ≡ 0 ≡ Sunday; fold AFTER range expansion
    // so "5-7" means FRI,SAT,SUN.
    val (dowsRaw, dowStar) = parseField(fields(4), 0, 7, DowNames)
    CronSchedule(minutes, hours, doms, months,
      dowsRaw.map(_ % 7).distinct.sorted, domStar, dowStar)
  }
}
