package graft.functions

import java.time.{DayOfWeek, LocalDate, LocalDateTime}
import java.time.temporal.ChronoUnit

import scala.collection.mutable.ArrayBuffer

/** A parsed cron expression with the full grammar of the reference's
  * cron engine (gotimer_executor/pkg/cron/parser.go, which delegates
  * to gorhill/cronexpr):
  *
  *  - 5, 6 or 7 whitespace-separated fields. 5 = standard
  *    `minute hour dom month dow` (seconds pinned to 0, any year);
  *    6 = `second` prepended; 7 = `year` (1970-2099) appended.
  *    Fields beyond the 7th are ignored, mirroring cronexpr's
  *    `fieldCount > 7 → 7` clamp.
  *  - macros: `@yearly`/`@annually`, `@monthly`, `@weekly`,
  *    `@daily`/`@midnight`, `@hourly` — each normalizes to its
  *    5-field equivalent before parsing.
  *  - fields support `*` (and `?` in dom/dow), `a`, `a-b`, lists,
  *    and `/step` on any of those (`*\/5`, `10-40/10`, `1,15`);
  *    month and day-of-week also accept 3-letter names; day-of-week
  *    7 ≡ 0 ≡ Sunday.
  *  - dom specials: `L` (last day of month), `nW` (nearest weekday
  *    Mon-Fri to day n, never crossing a month boundary), `LW`
  *    (last weekday of month).
  *  - dow specials: `xL` (last weekday-x of the month), `x#n`
  *    (n-th weekday-x of the month; no match when the month has
  *    fewer than n).
  *  - standard dom/dow union rule: when BOTH are restricted a day
  *    matches if EITHER matches; otherwise the restricted one rules.
  *  - `next(t)` is strictly after `t` at second granularity.
  *  - `nextsBetween(start, end)` mirrors parser.go:40 NextsBetween
  *    exactly, INCLUDING its boundary quirk: activations are taken
  *    strictly after `start`, and because the loop appends before
  *    re-checking, the result also contains the first activation
  *    >= `end` (when one exists within the search horizon).
  */
final case class CronSchedule(
    seconds: Array[Int], minutes: Array[Int], hours: Array[Int],
    doms: Array[Int], months: Array[Int], dows: Array[Int],
    years: Array[Int], // empty = unrestricted
    domStar: Boolean, dowStar: Boolean,
    domLast: Boolean, domLastWeekday: Boolean, domWeekdays: Array[Int],
    dowLast: Array[Int], dowNth: Array[(Int, Int)]) {

  /** Day n clamped into the month, shifted off Sat/Sun to the
    * nearest Mon-Fri without leaving the month (the `W` rule). */
  private def nearestWeekday(year: Int, month: Int, n: Int, lastDom: Int): Int = {
    if (n > lastDom) return -1 // e.g. 31W in February: no match
    val d = LocalDate.of(year, month, n)
    d.getDayOfWeek match {
      case DayOfWeek.SATURDAY => if (n - 1 >= 1) n - 1 else n + 2
      case DayOfWeek.SUNDAY => if (n + 1 <= lastDom) n + 1 else n - 2
      case _ => n
    }
  }

  private def dayMatches(t: LocalDateTime): Boolean = {
    val date = t.toLocalDate
    val dom = date.getDayOfMonth
    val lastDom = date.lengthOfMonth
    val w = date.getDayOfWeek.getValue % 7 // 0 = Sunday

    var domOk = java.util.Arrays.binarySearch(doms, dom) >= 0
    if (!domOk && domLast) domOk = dom == lastDom
    if (!domOk && domLastWeekday) {
      val lw = LocalDate.of(date.getYear, date.getMonthValue, lastDom).getDayOfWeek match {
        case DayOfWeek.SATURDAY => lastDom - 1
        case DayOfWeek.SUNDAY => lastDom - 2
        case _ => lastDom
      }
      domOk = dom == lw
    }
    if (!domOk && domWeekdays.nonEmpty)
      domOk = domWeekdays.exists(n =>
        nearestWeekday(date.getYear, date.getMonthValue, n, lastDom) == dom)

    var dowOk = java.util.Arrays.binarySearch(dows, w) >= 0
    if (!dowOk && dowLast.nonEmpty)
      dowOk = dowLast.contains(w) && dom + 7 > lastDom
    if (!dowOk && dowNth.nonEmpty)
      dowOk = dowNth.exists { case (x, n) => x == w && (dom - 1) / 7 + 1 == n }

    if (domStar && dowStar) true
    else if (domStar) dowOk
    else if (dowStar) domOk
    else domOk || dowOk
  }

  /** First activation strictly after `t` (or None beyond a ~5-year
    * scan horizon — mirrors cronexpr giving up on unsatisfiable
    * exprs; a restricted year field may jump directly past the
    * horizon since each year skip costs one iteration). */
  def next(t: LocalDateTime): Option[LocalDateTime] = {
    var c = t.truncatedTo(ChronoUnit.SECONDS).plusSeconds(1)
    var guard = 0
    while (guard < 366 * 5) {
      guard += 1
      if (years.nonEmpty && java.util.Arrays.binarySearch(years, c.getYear) < 0) {
        // jump to Jan 1 of the next allowed year (None when exhausted)
        val idx = years.indexWhere(_ > c.getYear)
        if (idx < 0) return None
        c = LocalDateTime.of(years(idx), 1, 1, 0, 0, 0)
      } else if (java.util.Arrays.binarySearch(months, c.getMonthValue) < 0) {
        // jump to the 1st of the next month
        c = c.truncatedTo(ChronoUnit.DAYS).withDayOfMonth(1).plusMonths(1)
      } else if (!dayMatches(c)) {
        c = c.truncatedTo(ChronoUnit.DAYS).plusDays(1)
      } else {
        // scan matching (hour, minute, second) triples from c's time
        val day = c.truncatedTo(ChronoUnit.DAYS)
        var hi = 0
        while (hi < hours.length) {
          val h = hours(hi)
          if (h > c.getHour) {
            return Some(day.plusHours(h).plusMinutes(minutes(0)).plusSeconds(seconds(0)))
          } else if (h == c.getHour) {
            var mi = 0
            while (mi < minutes.length) {
              val m = minutes(mi)
              if (m > c.getMinute) {
                return Some(day.plusHours(h).plusMinutes(m).plusSeconds(seconds(0)))
              } else if (m == c.getMinute) {
                var si = 0
                while (si < seconds.length) {
                  if (seconds(si) >= c.getSecond)
                    return Some(day.plusHours(h).plusMinutes(m).plusSeconds(seconds(si)))
                  si += 1
                }
              }
              mi += 1
            }
          }
          hi += 1
        }
        c = day.plusDays(1)
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

  /** cronexpr's predefined macros, normalized to 5-field form
    * (gorhill/cronexpr README "Predefined cron expressions"). */
  private val Macros = Map(
    "@yearly" -> "0 0 1 1 *", "@annually" -> "0 0 1 1 *",
    "@monthly" -> "0 0 1 * *", "@weekly" -> "0 0 * * 0",
    "@daily" -> "0 0 * * *", "@midnight" -> "0 0 * * *",
    "@hourly" -> "0 * * * *")

  /** Special atoms accumulated while parsing dom / dow. */
  private final class Specials {
    var domLast = false
    var domLastWeekday = false
    val domWeekdays = ArrayBuffer.empty[Int]
    val dowLast = ArrayBuffer.empty[Int]
    val dowNth = ArrayBuffer.empty[(Int, Int)]
  }

  /** Parse one field. `kind` enables the per-field special grammar:
    * 'D' = day-of-month (L / nW / LW / ?), 'W' = day-of-week
    * (xL / x#n / ?), ' ' = plain numeric field. */
  private def parseField(field: String, lo: Int, hi: Int,
      names: Map[String, Int], kind: Char, sp: Specials): (Array[Int], Boolean) = {
    val isStar = field == "*" || ((kind == 'D' || kind == 'W') && field == "?")
    def atom(s: String): Int = {
      val up = s.toUpperCase
      names.getOrElse(up,
        up.toIntOption.getOrElse(
          throw new IllegalArgumentException(s"bad cron atom '$s'")))
    }
    val vals = field.split(',').flatMap { part =>
      val up = part.toUpperCase
      // dom/dow specials consume the whole comma-atom
      if (kind == 'D' && up == "L") { sp.domLast = true; Nil }
      else if (kind == 'D' && up == "LW") { sp.domLastWeekday = true; Nil }
      else if (kind == 'D' && up.endsWith("W")) {
        val n = atom(up.dropRight(1))
        require(n >= 1 && n <= 31, s"bad W day '$part'")
        sp.domWeekdays += n; Nil
      } else if (kind == 'W' && up.endsWith("L")) {
        // the weekday atom obeys the field range (0–7, 7≡0) exactly as
        // plain atoms do — cronexpr rejects '9L', it does not wrap it
        val d = atom(up.dropRight(1))
        require(d >= lo && d <= hi, s"bad dow in '$part'")
        sp.dowLast += d % 7; Nil
      } else if (kind == 'W' && up.contains('#')) {
        // split('#') drops a TRAILING empty segment ("5#" → ["5"]),
        // so destructuring would MatchError instead of the grammar's
        // IllegalArgumentException — validate the shape explicitly
        val halves = up.split('#')
        require(halves.length == 2 && halves(1).nonEmpty, s"bad cron part '$part'")
        val nth = halves(1).toIntOption.getOrElse(
          throw new IllegalArgumentException(s"bad # ordinal in '$part'"))
        require(nth >= 1 && nth <= 5, s"bad # ordinal in '$part'")
        val d = atom(halves(0))
        require(d >= lo && d <= hi, s"bad dow in '$part'")
        sp.dowNth += ((d % 7, nth)); Nil
      } else {
        val (rangePart, step) = part.split('/') match {
          case Array(r) => (r, 1)
          case Array(r, st) => (r, st.toInt)
          case _ => throw new IllegalArgumentException(s"bad cron part '$part'")
        }
        require(step >= 1, s"bad cron step in '$part'")
        val (a, b) = rangePart match {
          case "*" => (lo, hi)
          // cronexpr permits '?' ONLY in dom/dow — elsewhere it is a
          // parse error, not a silent full-range wildcard
          case "?" if kind == 'D' || kind == 'W' => (lo, hi)
          case r if r.contains('-') =>
            val Array(x, y) = r.split('-'); (atom(x), atom(y))
          // bare value with a step means "value to max" (cronexpr rule)
          case r if part.contains('/') => (atom(r), hi)
          case r => val v = atom(r); (v, v)
        }
        require(a >= lo && b <= hi && a <= b, s"cron range $a-$b out of [$lo,$hi]")
        a to b by step
      }
    }
    (vals.distinct.sorted, isStar)
  }

  def parse(expr: String): CronSchedule = {
    val trimmed = expr.trim
    val normalized = Macros.getOrElse(trimmed.toLowerCase, trimmed)
    val all = normalized.split("\\s+")
    require(all.length >= 5, s"expected >= 5 cron fields, got ${all.length} in '$expr'")
    val fields = all.take(7) // cronexpr ignores fields beyond the 7th
    // 5 = m h dom mon dow; 6 = s + those; 7 = + year
    val hasSeconds = fields.length >= 6
    val hasYear = fields.length == 7
    val off = if (hasSeconds) 1 else 0
    val sp = new Specials
    val seconds =
      if (hasSeconds) parseField(fields(0), 0, 59, Map.empty, ' ', sp)._1
      else Array(0)
    val (minutes, _) = parseField(fields(off), 0, 59, Map.empty, ' ', sp)
    val (hours, _) = parseField(fields(off + 1), 0, 23, Map.empty, ' ', sp)
    val (doms, domStarRaw) = parseField(fields(off + 2), 1, 31, Map.empty, 'D', sp)
    val (months, _) = parseField(fields(off + 3), 1, 12, MonthNames, ' ', sp)
    // dow allows 0-7 with 7 ≡ 0 ≡ Sunday; fold AFTER range expansion
    // so "5-7" means FRI,SAT,SUN.
    val (dowsRaw, dowStarRaw) = parseField(fields(off + 4), 0, 7, DowNames, 'W', sp)
    val years =
      if (hasYear && fields(6) != "*")
        parseField(fields(6), 1970, 2099, Map.empty, ' ', sp)._1
      else Array.emptyIntArray
    require(seconds.nonEmpty && minutes.nonEmpty && hours.nonEmpty && months.nonEmpty,
      s"empty cron field in '$expr'")
    val domHasSpecial = sp.domLast || sp.domLastWeekday || sp.domWeekdays.nonEmpty
    val dowHasSpecial = sp.dowLast.nonEmpty || sp.dowNth.nonEmpty
    require(doms.nonEmpty || domStarRaw || domHasSpecial, s"empty dom field in '$expr'")
    require(dowsRaw.nonEmpty || dowStarRaw || dowHasSpecial, s"empty dow field in '$expr'")
    CronSchedule(seconds, minutes, hours, doms, months,
      dowsRaw.map(_ % 7).distinct.sorted, years,
      domStar = domStarRaw && !domHasSpecial,
      dowStar = dowStarRaw && !dowHasSpecial,
      domLast = sp.domLast, domLastWeekday = sp.domLastWeekday,
      domWeekdays = sp.domWeekdays.toArray.distinct.sorted,
      dowLast = sp.dowLast.toArray.distinct.sorted,
      dowNth = sp.dowNth.toArray.distinct)
  }
}
