package graft.operators

import graft.SparkSpec

/** t_backlog's two-level (day-partial + day-carry) prefix sum must
  * equal the single global running sum it replaced (VERDICT r9 #6) —
  * verified by re-accumulating the operator's own per-minute flows
  * in order, which is exactly the single-window semantics. */
class BacklogSpec extends SparkSpec {

  test("two-level day-carry decomposition equals the global running sum") {
    // minute is the oracle-parity STRING form — ISO order = time order
    val rows = TimerOps.tBacklog(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    var acc = 0L
    rows.foreach { case (m, arrived, completed, backlog) =>
      acc += arrived - completed
      assert(backlog == acc, s"minute $m: backlog $backlog, running sum $acc")
    }
    // the day-carry path must actually be exercised: > 1 distinct day
    val days = rows.map(_._1.take(10)).distinct
    assert(days.size > 1, s"corpus spans ${days.size} day(s) — carry untested")
  }
}
