package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** t_session_window — the engine's NATIVE session_window() aggregate
  * against an independent naive recompute, plus the documented
  * semantic deltas vs the hand-rolled tSessionize (break at ≥ gap,
  * exclusive window end = last event + gap). */
class SessionWindowSpec extends SparkSpec {

  private val GapUs = 30L * 60 * 1000000

  private def toMicros(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  test("native session_window == naive ≥-gap recompute in exact micros") {
    val events = Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), toMicros(r.getTimestamp(1)), r.getDouble(2)))

    val naive = events.groupBy(_._1).flatMap { case (uid, es) =>
      val sorted = es.sortBy(_._2)
      // split at diff >= gap — session_window's [start, last + gap) rule
      val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Double)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._2 - cur.head._2 < GapUs => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }
      sessions.map { ses =>
        val ts = ses.map(_._2)
        val cents = ses.map(v => java.math.BigDecimal.valueOf(v._3 * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()).sum
        ((uid, ts.min, ts.max + GapUs),
          (ses.size.toLong, cents / 100.0))
      }
    }.toMap

    val got = TimerOps.tSessionWindow(spark, sfDir).collect().map { r =>
      ((r.getLong(0), toMicros(r.getTimestamp(1)), toMicros(r.getTimestamp(2))),
        (r.getLong(3), r.getDouble(4)))
    }.toMap
    assert(got.keySet == naive.keySet,
      s"sessions differ: got-only ${(got.keySet -- naive.keySet).take(3)}, " +
        s"naive-only ${(naive.keySet -- got.keySet).take(3)}")
    naive.foreach { case (k, (n, tot)) =>
      assert(got(k)._1 == n, s"session $k count")
      assert(math.abs(got(k)._2 - tot) < 1e-9, s"session $k total")
    }
  }

  test("session partition agrees with tSessionize; ends differ by exactly the gap") {
    // this corpus has no exact-30:00 inter-event gap, so the ≥ vs >
    // break rules produce the SAME partition — starts and counts
    // match 1:1, and the native end is the hand-rolled end + 30 min
    val native = TimerOps.tSessionWindow(spark, sfDir).collect()
      .map(r => (r.getLong(0), toMicros(r.getTimestamp(1))) ->
        (toMicros(r.getTimestamp(2)), r.getLong(3))).toMap
    val rolled = TimerOps.tSessionize(spark, sfDir).collect()
      .map(r => (r.getLong(0), toMicros(r.getTimestamp(2))) ->
        (toMicros(r.getTimestamp(3)), r.getLong(4))).toMap
    assert(native.keySet == rolled.keySet)
    native.foreach { case (k, (endUs, n)) =>
      assert(n == rolled(k)._2, s"session $k count")
      assert(endUs == rolled(k)._1 + GapUs, s"session $k end shift")
    }
  }
}
