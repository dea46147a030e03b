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
