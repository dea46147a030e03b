package graft.functions

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage of the full cron grammar — the oracle-checked
  * operators only exercise the restricted "*\/K * * * *" subset
  * (CronOps), so ranges/lists/names/dom-dow rules are pinned here. */
class CronScheduleSpec extends AnyFunSuite {

  private def t(s: String) = LocalDateTime.parse(s)

  test("*/15 minutes: strictly-after semantics at second granularity") {
    val c = CronSchedule.parse("*/15 * * * *")
    assert(c.next(t("2024-01-15T10:00:00")).get == t("2024-01-15T10:15:00"))
    assert(c.next(t("2024-01-15T10:14:59")).get == t("2024-01-15T10:15:00"))
    assert(c.next(t("2024-01-15T10:15:00")).get == t("2024-01-15T10:30:00"))
    assert(c.next(t("2024-01-15T10:46:00")).get == t("2024-01-15T11:00:00"))
  }

  test("fixed minute+hour rolls to next day") {
    val c = CronSchedule.parse("30 9 * * *")
    assert(c.next(t("2024-01-15T09:29:00")).get == t("2024-01-15T09:30:00"))
    assert(c.next(t("2024-01-15T09:30:00")).get == t("2024-01-16T09:30:00"))
  }

  test("lists and ranges with steps") {
    val c = CronSchedule.parse("5,35 8-17/3 * * *") // hours 8,11,14,17
    assert(c.next(t("2024-01-15T08:05:00")).get == t("2024-01-15T08:35:00"))
    assert(c.next(t("2024-01-15T08:35:00")).get == t("2024-01-15T11:05:00"))
    assert(c.next(t("2024-01-15T17:35:00")).get == t("2024-01-16T08:05:00"))
  }

  test("month names and day-of-month") {
    val c = CronSchedule.parse("0 0 1 MAR *")
    assert(c.next(t("2024-01-15T00:00:00")).get == t("2024-03-01T00:00:00"))
    assert(c.next(t("2024-03-01T00:00:00")).get == t("2025-03-01T00:00:00"))
  }

  test("day-of-week with 7=Sunday and names") {
    // 2024-01-15 is a Monday
    val mon = CronSchedule.parse("0 12 * * MON")
    assert(mon.next(t("2024-01-15T11:00:00")).get == t("2024-01-15T12:00:00"))
    assert(mon.next(t("2024-01-15T12:00:00")).get == t("2024-01-22T12:00:00"))
    val sun7 = CronSchedule.parse("0 0 * * 7")
    assert(sun7.next(t("2024-01-15T00:00:00")).get == t("2024-01-21T00:00:00"))
    val friSun = CronSchedule.parse("0 0 * * 5-7") // FRI,SAT,SUN
    assert(friSun.next(t("2024-01-15T00:00:00")).get == t("2024-01-19T00:00:00"))
    assert(friSun.next(t("2024-01-19T00:00:00")).get == t("2024-01-20T00:00:00"))
    assert(friSun.next(t("2024-01-20T00:00:00")).get == t("2024-01-21T00:00:00"))
  }

  test("dom/dow union rule: both restricted → either matches") {
    // 13th of the month OR a Friday. 2024-09: Fri 6th, Fri 13th...
    val c = CronSchedule.parse("0 0 13 * 5")
    assert(c.next(t("2024-09-01T00:00:00")).get == t("2024-09-06T00:00:00"))
    assert(c.next(t("2024-09-06T00:00:00")).get == t("2024-09-13T00:00:00"))
    assert(c.next(t("2024-09-13T00:00:00")).get == t("2024-09-20T00:00:00"))
    // dom restricted, dow star → dom rules
    val domOnly = CronSchedule.parse("0 0 13 * *")
    assert(domOnly.next(t("2024-09-06T00:00:00")).get == t("2024-09-13T00:00:00"))
  }

  test("NextsBetween mirrors parser.go:40 incl. trailing boundary activation") {
    val c = CronSchedule.parse("*/20 * * * *")
    val times = c.nextsBetween(t("2024-01-15T00:00:00"), t("2024-01-15T01:00:00"))
    // strictly after start; 01:00 (>= end) IS included — reference quirk
    assert(times == Seq(t("2024-01-15T00:20:00"), t("2024-01-15T00:40:00"),
      t("2024-01-15T01:00:00")))
    // empty window → no activations
    assert(c.nextsBetween(t("2024-01-15T00:00:00"), t("2024-01-15T00:00:00")).isEmpty)
  }

  test("invalid expressions are rejected") {
    assert(intercept[Exception](CronSchedule.parse("* * * *")) != null)
    assert(intercept[Exception](CronSchedule.parse("61 * * * *")) != null)
    assert(intercept[Exception](CronSchedule.parse("a * * * *")) != null)
  }

  test("? is rejected outside dom/dow (cronexpr permits it only there)") {
    // a typo'd '? ?' must NOT silently become an every-minute wildcard
    assert(intercept[IllegalArgumentException](
      CronSchedule.parse("? ? * * *")) != null)
    assert(intercept[IllegalArgumentException](
      CronSchedule.parse("? 0 * * * *")) != null) // 6-field seconds slot
    assert(intercept[IllegalArgumentException](
      CronSchedule.parse("0 0 1 ? *")) != null)   // month slot
  }

  test("malformed # atoms throw the grammar's IllegalArgumentException, not MatchError/NumberFormat") {
    // "5#" splits to a 1-element array (trailing empty dropped) —
    // destructuring would MatchError; "5#x" would NumberFormat
    assert(intercept[IllegalArgumentException](
      CronSchedule.parse("0 0 * * 5#")) != null)
    assert(intercept[IllegalArgumentException](
      CronSchedule.parse("0 0 * * 5#x")) != null)
    assert(intercept[IllegalArgumentException](
      CronSchedule.parse("0 0 * * 5#0")) != null)
    assert(intercept[IllegalArgumentException](
      CronSchedule.parse("0 0 * * 5#6")) != null)
  }

  test("xL / x#n weekday atoms obey the 0-7 field range like plain atoms") {
    // cronexpr rejects out-of-range weekdays — '9L' must NOT silently
    // wrap mod 7 and schedule the last Tuesday forever
    assert(intercept[IllegalArgumentException](
      CronSchedule.parse("0 0 * * 9L")) != null)
    assert(intercept[IllegalArgumentException](
      CronSchedule.parse("0 0 * * 12#3")) != null)
    // in-range forms still parse, with 7 ≡ 0 (Sunday)
    assert(CronSchedule.parse("0 0 * * 7L").dowLast.toSeq == Seq(0))
    assert(CronSchedule.parse("0 0 * * 7#2").dowNth.toSeq == Seq((0, 2)))
  }

  test("february 30 never fires within horizon") {
    val c = CronSchedule.parse("0 0 30 2 *")
    assert(c.next(t("2024-01-01T00:00:00")).isEmpty)
  }

  // ---- full cronexpr grammar (gorhill/cronexpr README) ----

  test("@macros normalize to their 5-field equivalents") {
    assert(CronSchedule.parse("@hourly").next(t("2024-01-15T10:37:22")).get ==
      t("2024-01-15T11:00:00"))
    assert(CronSchedule.parse("@daily").next(t("2024-01-15T10:00:00")).get ==
      t("2024-01-16T00:00:00"))
    assert(CronSchedule.parse("@midnight").next(t("2024-01-15T10:00:00")).get ==
      t("2024-01-16T00:00:00"))
    // 2024-01-15 is a Monday; @weekly fires Sundays
    assert(CronSchedule.parse("@weekly").next(t("2024-01-15T00:00:00")).get ==
      t("2024-01-21T00:00:00"))
    assert(CronSchedule.parse("@monthly").next(t("2024-01-15T00:00:00")).get ==
      t("2024-02-01T00:00:00"))
    assert(CronSchedule.parse("@yearly").next(t("2024-01-15T00:00:00")).get ==
      t("2025-01-01T00:00:00"))
    assert(CronSchedule.parse("@annually").next(t("2024-01-01T00:00:00")).get ==
      t("2025-01-01T00:00:00"))
  }

  test("6-field form: leading seconds field") {
    val c = CronSchedule.parse("*/15 * * * * *")
    assert(c.next(t("2024-01-15T10:00:00")).get == t("2024-01-15T10:00:15"))
    assert(c.next(t("2024-01-15T10:00:45")).get == t("2024-01-15T10:01:00"))
    val s30 = CronSchedule.parse("30 */5 * * * *")
    assert(s30.next(t("2024-01-15T10:00:00")).get == t("2024-01-15T10:00:30"))
    assert(s30.next(t("2024-01-15T10:00:30")).get == t("2024-01-15T10:05:30"))
    // 5-field exprs still fire at second 0 only
    assert(CronSchedule.parse("* * * * *").next(t("2024-01-15T10:00:00")).get ==
      t("2024-01-15T10:01:00"))
  }

  test("7-field form: trailing year field") {
    val c = CronSchedule.parse("0 0 0 1 1 * 2027")
    assert(c.next(t("2024-06-01T00:00:00")).get == t("2027-01-01T00:00:00"))
    assert(c.next(t("2027-01-01T00:00:00")).isEmpty) // years exhausted
    val range = CronSchedule.parse("0 30 9 15 * * 2024-2025")
    assert(range.next(t("2025-12-15T09:30:00")).isEmpty)
    assert(range.next(t("2024-12-15T09:30:00")).get == t("2025-01-15T09:30:00"))
    // fields beyond the 7th are ignored (cronexpr clamp)
    assert(CronSchedule.parse("0 0 12 * * * 2024 ignored junk")
      .next(t("2024-01-15T00:00:00")).get == t("2024-01-15T12:00:00"))
  }

  test("dom L: last day of month (incl. leap February)") {
    val c = CronSchedule.parse("0 0 L * *")
    assert(c.next(t("2024-02-01T00:00:00")).get == t("2024-02-29T00:00:00"))
    assert(c.next(t("2024-02-29T00:00:00")).get == t("2024-03-31T00:00:00"))
    assert(c.next(t("2023-02-01T00:00:00")).get == t("2023-02-28T00:00:00"))
  }

  test("dom LW: last weekday of month") {
    // 2024-03-31 is a Sunday → last weekday is Fri 2024-03-29
    val c = CronSchedule.parse("0 0 LW * *")
    assert(c.next(t("2024-03-01T00:00:00")).get == t("2024-03-29T00:00:00"))
    // 2024-01-31 is a Wednesday → itself
    assert(c.next(t("2024-01-01T00:00:00")).get == t("2024-01-31T00:00:00"))
  }

  test("dom nW: nearest weekday without leaving the month") {
    val c = CronSchedule.parse("0 0 15W * *")
    // 2024-06-15 is a Saturday → Fri 14th
    assert(c.next(t("2024-06-01T00:00:00")).get == t("2024-06-14T00:00:00"))
    // 2024-09-15 is a Sunday → Mon 16th
    assert(c.next(t("2024-09-01T00:00:00")).get == t("2024-09-16T00:00:00"))
    // 1W when the 1st is Saturday cannot cross back → Mon 3rd
    val first = CronSchedule.parse("0 0 1W 6 *")
    assert(first.next(t("2024-05-01T00:00:00")).get == t("2024-06-03T00:00:00"))
  }

  test("dow xL: last given weekday of month") {
    val c = CronSchedule.parse("0 0 * * 5L")
    assert(c.next(t("2024-01-01T00:00:00")).get == t("2024-01-26T00:00:00"))
    assert(c.next(t("2024-01-26T00:00:00")).get == t("2024-02-23T00:00:00"))
  }

  test("dow x#n: n-th given weekday of month; missing ordinal skips month") {
    // third Monday of Jan 2024 = Jan 15
    val c = CronSchedule.parse("0 0 * * 1#3")
    assert(c.next(t("2024-01-01T00:00:00")).get == t("2024-01-15T00:00:00"))
    // fifth Friday: Jan + Feb 2024 have only 4 → first hit Mar 29
    val fifth = CronSchedule.parse("0 0 * * 5#5")
    assert(fifth.next(t("2024-01-01T00:00:00")).get == t("2024-03-29T00:00:00"))
  }

  test("? is * in dom/dow; specials join the dom/dow union rule") {
    val q = CronSchedule.parse("0 12 ? * MON")
    assert(q.next(t("2024-01-15T11:00:00")).get == t("2024-01-15T12:00:00"))
    // L dom OR Monday dow: Mon Jan 29 fires before Wed Jan 31 (L)
    val union = CronSchedule.parse("0 0 L * 1")
    assert(union.next(t("2024-01-26T00:00:00")).get == t("2024-01-29T00:00:00"))
    assert(union.next(t("2024-01-29T00:00:00")).get == t("2024-01-31T00:00:00"))
  }
}
