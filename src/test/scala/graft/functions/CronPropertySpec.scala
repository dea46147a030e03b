package graft.functions

import java.time.LocalDateTime

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property check: CronSchedule.next agrees with an independent
  * brute-force matcher (minute-by-minute scan) on randomly generated
  * expressions across the full grammar. The brute force shares no
  * code with the engine — it re-implements field matching from the
  * cron definition directly. (Generators sampled directly with a
  * fixed seed — the scalatest/scalacheck bridge isn't in the offline
  * dependency set.) */
class CronPropertySpec extends AnyFunSuite {

  private def fieldGen(lo: Int, hi: Int): Gen[String] = Gen.oneOf(
    Gen.const("*"),
    Gen.choose(lo, hi).map(_.toString),
    for { a <- Gen.choose(lo, hi - 1); b <- Gen.choose(a, hi) } yield s"$a-$b",
    Gen.choose(2, 20).map(k => s"*/$k"),
    for { a <- Gen.choose(lo, hi - 1); b <- Gen.choose(a, hi); k <- Gen.choose(1, 9) }
      yield s"$a-$b/$k",
    for { n <- Gen.choose(2, 4); vs <- Gen.listOfN(n, Gen.choose(lo, hi)) }
      yield vs.distinct.mkString(","))

  private val cronGen: Gen[String] = for {
    m <- fieldGen(0, 59)
    h <- fieldGen(0, 23)
    dom <- fieldGen(1, 28) // stay in always-valid day range
    mon <- fieldGen(1, 12)
    dow <- fieldGen(0, 6)
  } yield s"$m $h $dom $mon $dow"

  private val startGen: Gen[LocalDateTime] = for {
    day <- Gen.choose(0, 365)
    minute <- Gen.choose(0, 1439)
  } yield LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(day).plusMinutes(minute)

  /** Independent matcher: straight re-reading of the cron contract. */
  private def matches(expr: String, t: LocalDateTime): Boolean = {
    val f = expr.split("\\s+")
    def fieldVals(s: String, lo: Int, hi: Int): Set[Int] =
      s.split(',').flatMap { part =>
        val (range, step) = part.split('/') match {
          case Array(r, st) => (r, st.toInt)
          case Array(r) => (r, 1)
        }
        val (a, b) = range match {
          case "*" => (lo, hi)
          case r if r.contains('-') => val Array(x, y) = r.split('-'); (x.toInt, y.toInt)
          case r if part.contains('/') => (r.toInt, hi)
          case r => (r.toInt, r.toInt)
        }
        (a to b by step)
      }.toSet
    val minuteOk = fieldVals(f(0), 0, 59)(t.getMinute)
    val hourOk = fieldVals(f(1), 0, 23)(t.getHour)
    val monthOk = fieldVals(f(3), 1, 12)(t.getMonthValue)
    val domOk = fieldVals(f(2), 1, 31)(t.getDayOfMonth)
    val dowOk = fieldVals(f(4), 0, 7).map(_ % 7)(t.getDayOfWeek.getValue % 7)
    val domStar = f(2) == "*"
    val dowStar = f(4) == "*"
    val dayOk =
      if (domStar && dowStar) true
      else if (domStar) dowOk
      else if (dowStar) domOk
      else domOk || dowOk
    minuteOk && hourOk && monthOk && dayOk
  }

  private def bruteNext(expr: String, start: LocalDateTime,
      horizonMinutes: Int): Option[LocalDateTime] = {
    var c = start.truncatedTo(java.time.temporal.ChronoUnit.MINUTES).plusMinutes(1)
    var i = 0
    while (i < horizonMinutes) {
      if (matches(expr, c)) return Some(c)
      c = c.plusMinutes(1)
      i += 1
    }
    None
  }

  // ---- 6-field (seconds) property: second-scan brute force ----

  private def matchesSec(expr: String, t: LocalDateTime): Boolean = {
    val f = expr.split("\\s+")
    // seconds field matched here; the remaining 5 reuse the
    // minute-grammar matcher above
    def fieldVals(s: String, lo: Int, hi: Int): Set[Int] =
      s.split(',').flatMap { part =>
        val (range, step) = part.split('/') match {
          case Array(r, st) => (r, st.toInt)
          case Array(r) => (r, 1)
        }
        val (a, b) = range match {
          case "*" => (lo, hi)
          case r if r.contains('-') => val Array(x, y) = r.split('-'); (x.toInt, y.toInt)
          case r if part.contains('/') => (r.toInt, hi)
          case r => (r.toInt, r.toInt)
        }
        (a to b by step)
      }.toSet
    fieldVals(f(0), 0, 59)(t.getSecond) && matches(f.drop(1).mkString(" "), t)
  }

  test("6-field next() agrees with second-scan brute force on 60 random crons") {
    val gen = for {
      sec <- fieldGen(0, 59)
      m <- fieldGen(0, 59)
      h <- fieldGen(0, 23)
      s <- startGen
      plusSec <- Gen.choose(0, 59)
    } yield (s"$sec $m $h * * *", s.plusSeconds(plusSec))
    var seed = Seed(271828L)
    (1 to 60).foreach { i =>
      val (expr, start) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      // horizon: 26 h of seconds — any (sec,min,hour) pattern with a
      // dom/dow/month of * fires at least daily
      var c = start.truncatedTo(java.time.temporal.ChronoUnit.SECONDS).plusSeconds(1)
      var brute: Option[LocalDateTime] = None
      var k = 0
      while (brute.isEmpty && k < 26 * 3600) {
        if (matchesSec(expr, c)) brute = Some(c)
        c = c.plusSeconds(1); k += 1
      }
      val engine = CronSchedule.parse(expr).next(start)
      assert(engine == brute, s"#$i cron '$expr' from $start")
    }
  }

  // ---- dom/dow specials property: independent calendar math ----

  test("L / LW / nW / xL / x#n match the independent TemporalAdjusters day set") {
    import java.time.{DayOfWeek, LocalDate}
    import java.time.temporal.TemporalAdjusters
    val caseGen: Gen[(Int, Int, String, LocalDate => Set[Int])] = for {
      y <- Gen.choose(2023, 2026)
      m <- Gen.choose(1, 12)
      pick <- Gen.choose(0, 4)
      n <- Gen.choose(1, 28)
      wd <- Gen.choose(0, 6) // cron dow, 0 = Sunday
      nth <- Gen.choose(1, 5)
    } yield {
      val jdow = DayOfWeek.of(if (wd == 0) 7 else wd) // java: 1=Mon..7=Sun
      pick match {
        case 0 => (y, m, "0 0 L * *",
          (first: LocalDate) => Set(first.`with`(TemporalAdjusters.lastDayOfMonth).getDayOfMonth))
        case 1 => (y, m, "0 0 LW * *", (first: LocalDate) => {
          // scan back from month end to the last Mon-Fri
          var d = first.`with`(TemporalAdjusters.lastDayOfMonth)
          while (d.getDayOfWeek == DayOfWeek.SATURDAY || d.getDayOfWeek == DayOfWeek.SUNDAY)
            d = d.minusDays(1)
          Set(d.getDayOfMonth)
        })
        case 2 => (y, m, s"0 0 ${n}W * *", (first: LocalDate) => {
          // nearest Mon-Fri to day n within the month = unique argmin of |d-n|
          val last = first.`with`(TemporalAdjusters.lastDayOfMonth).getDayOfMonth
          val weekdays = (1 to last).filter { d =>
            val w = LocalDate.of(first.getYear, first.getMonthValue, d).getDayOfWeek
            w != DayOfWeek.SATURDAY && w != DayOfWeek.SUNDAY
          }
          Set(weekdays.minBy(d => math.abs(d - n)))
        })
        case 3 => (y, m, s"0 0 * * ${wd}L",
          (first: LocalDate) => Set(first.`with`(TemporalAdjusters.lastInMonth(jdow)).getDayOfMonth))
        case _ => (y, m, s"0 0 * * $wd#$nth", (first: LocalDate) => {
          val d = first.`with`(TemporalAdjusters.dayOfWeekInMonth(nth, jdow))
          if (d.getMonthValue == first.getMonthValue) Set(d.getDayOfMonth) else Set.empty
        })
      }
    }
    var seed = Seed(314159L)
    (1 to 150).foreach { i =>
      val (y, m, expr, expected) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val first = LocalDate.of(y, m, 1)
      val sched = CronSchedule.parse(expr)
      // engine day set: walk next() through the month
      var t = first.atStartOfDay.minusSeconds(1)
      val got = scala.collection.mutable.Set.empty[Int]
      var go = true
      while (go) sched.next(t) match {
        case Some(nx) if nx.getYear == y && nx.getMonthValue == m =>
          got += nx.getDayOfMonth; t = nx
        case _ => go = false
      }
      assert(got == expected(first), s"#$i '$expr' over $y-$m")
    }
  }

  test("next() agrees with minute-scan brute force on 300 random crons") {
    val pairGen = for { c <- cronGen; s <- startGen } yield (c, s)
    var seed = Seed(42L)
    (1 to 300).foreach { i =>
      val (expr, start) = pairGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val horizon = 60 * 24 * 62 // two months of minutes
      val brute = bruteNext(expr, start, horizon)
      val engine = CronSchedule.parse(expr).next(start)
      (brute, engine) match {
        case (Some(b), Some(e)) => assert(e == b, s"#$i cron '$expr' from $start")
        case (None, Some(e)) =>
          // engine may find an activation beyond the brute horizon
          assert(e.isAfter(start.plusMinutes(horizon)), s"#$i cron '$expr' from $start → $e")
        case (Some(b), None) => fail(s"#$i engine found nothing, brute found $b for '$expr'")
        case (None, None) => ()
      }
    }
  }
}
