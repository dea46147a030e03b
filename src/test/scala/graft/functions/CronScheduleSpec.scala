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

  test("february 30 never fires within horizon") {
    val c = CronSchedule.parse("0 0 30 2 *")
    assert(c.next(t("2024-01-01T00:00:00")).isEmpty)
  }
}
