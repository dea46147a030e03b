package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention guard (VERDICT r14 #1): a steady-state sample
  * whose measurement window saw >2× calibration-probe drift is
  * tainted and must be re-run, both numbers logged. Pure-function
  * tests over injected probe/run thunks — no Spark session; the
  * synthetic "load burst" is a probe sequence, exactly what a real
  * burst produces. */
class BenchGuardSpec extends AnyFunSuite {

  private def seq(vals: Double*): () => Double = {
    val it = vals.iterator
    () => it.next()
  }

  test("a load burst taints the first sample: it is logged and the " +
      "query re-runs; clean samples decide the result") {
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    // burst during run 1 (probe 0.5 vs baseline 0.1 → tainted), box
    // quiet for runs 2-3; the inflated 10.0 s sample must NOT win
    val got = Bench.steadyMin(
      run = seq(10.0, 1.2, 1.0),
      probe = seq(0.5, 0.1, 0.1),
      baseline = 0.1, log = logs += _)
    assert(got == 1.0)
    assert(logs.size == 1)
    // both numbers visible for the post-mortem
    assert(logs.head.contains("0.500") && logs.head.contains("0.100") &&
      logs.head.contains("10.000"))
  }

  test("a quiet box takes exactly `want` samples and their min") {
    var runs = 0
    val got = Bench.steadyMin(
      run = () => { runs += 1; if (runs == 1) 2.0 else 1.5 },
      probe = () => 0.1, baseline = 0.1, log = _ => ())
    assert(got == 1.5 && runs == 2) // no wasted re-runs
  }

  test("a box that never quiets down is bounded by maxRuns and " +
      "reports min over the tainted samples (diagnosable, not hung)") {
    var runs = 0
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    val got = Bench.steadyMin(
      run = () => { runs += 1; 5.0 + runs },
      probe = () => 1.0, // permanently 10× the baseline
      baseline = 0.1, maxRuns = 4, log = logs += _)
    assert(runs == 4 && got == 6.0 && logs.size == 4)
  }

  test("drift at exactly the factor is CLEAN (boundary), just above " +
      "is tainted") {
    assert(Bench.steadyMin(seq(1.0, 1.0), () => 0.2, baseline = 0.1,
      log = _ => ()) == 1.0) // 0.2 == 2.0 × 0.1 → clean
    val logs = scala.collection.mutable.ArrayBuffer.empty[String]
    Bench.steadyMin(seq(1.0, 1.0, 1.0, 1.0), () => 0.201, baseline = 0.1,
      maxRuns = 4, log = logs += _)
    assert(logs.nonEmpty)
  }

  test("a crashed query surfaces immediately as -1 — a crash is not " +
      "contention, so no retry burns the budget") {
    var runs = 0
    val got = Bench.steadyMin(
      run = () => { runs += 1; -1.0 },
      probe = () => sys.error("probe must not run after a crash"),
      baseline = 0.1, log = _ => ())
    assert(got == -1.0 && runs == 1)
  }
}
