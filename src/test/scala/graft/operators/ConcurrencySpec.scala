package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t_concurrency invariants: the distributed two-level prefix sum
  * (per-(app, day) windows + day-carry broadcast) must equal the
  * naive single global window, and the sweep must obey basic
  * interval-counting laws. */
class ConcurrencySpec extends SparkSpec {

  /** The scale-naive form: ONE window per app over the whole point
    * stream (what the oracle runs in DuckDB) — the SAME definition
    * Timeit measures as `t_concurrency_global`, so the equality pin
    * and the SCALING.md curve describe one baseline. */
  private def globalSweep() = TimerOps.tConcurrencyGlobal(spark, sfDir)

  test("two-level day-carry sweep == single global window sweep") {
    val twoLevel = TimerOps.tConcurrency(spark, sfDir)
    val global = globalSweep()
    assert(twoLevel.exceptAll(global).isEmpty && global.exceptAll(twoLevel).isEmpty)
  }

  test("sweep laws: peaks positive, bounded by in-hour start count + carry-in") {
    val rows = TimerOps.tConcurrency(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // every start adds exactly one in-flight task, so the peak can
    // never exceed the total number of starts anywhere
    val totalStarts = rows.map(_.getAs[Long]("n_starts")).sum
    rows.foreach { r =>
      val peak = r.getAs[Long]("peak_inflight")
      assert(peak >= 0L, s"negative concurrency at $r")
      assert(peak <= totalStarts)
    }
  }

  test("day/hour bucketing floors (== DuckDB //) for pre-1970 epochs too") {
    val s = spark
    import s.implicits._
    // ADVICE r8: Spark's bare `div` truncates toward zero, DuckDB's
    // `//` floors — the operator's bucketing must floor. Probe the
    // exact expressions tConcurrency compiles, across the sign change.
    val ts = Seq(-86400001L, -86400000L, -3600001L, -1L, 0L, 1L,
      3599999L, 3600000L, 86399999L, 86400000L)
    val got = ts.toDF("t")
      .selectExpr("t", "(t - pmod(t, 86400000)) div 86400000 AS day",
        "t - pmod(t, 3600000) AS hour_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (t, day, hourMs) =>
      assert(day == Math.floorDiv(t, 86400000L), s"day of $t")
      assert(hourMs == Math.floorDiv(t, 3600000L) * 3600000L, s"hour of $t")
    }
  }

  test("hand-computed micro case: overlap and end-exclusive tie") {
    val s = spark
    import s.implicits._
    // app 0, all on one day: [0,100), [50,150) overlap → peak 2;
    // [150, 200) starts exactly when the second ends → not 3
    val ev = Seq(
      (0L, 0L, 100L), (1L, 50L, 150L), (2L, 150L, 200L)
    ).toDF("event_id", "t0", "t1")
    val pts = ev.select(lit(0L).as("app"), col("t0").as("t"), lit(1L).as("delta"), col("event_id"))
      .unionAll(ev.select(lit(0L).as("app"), col("t1").as("t"), lit(-1L).as("delta"), col("event_id")))
    val w = Window.partitionBy(col("app"))
      .orderBy(col("t"), col("delta"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val peak = pts.withColumn("conc", sum(col("delta")).over(w))
      .agg(max(col("conc"))).head.getLong(0)
    assert(peak == 2L)
  }

  test("t_backlog: conservation, monotone consistency, non-negative") {
    val backlog = TimerOps.tBacklog(spark, sfDir).collect()
    // each row is one task with one status, so cumulative completions
    // can never exceed cumulative arrivals
    assert(backlog.forall(_.getLong(3) >= 0L), "negative backlog")
    // the final backlog equals total arrived − total completed
    val totalArrived = backlog.map(_.getLong(1)).sum
    val totalCompleted = backlog.map(_.getLong(2)).sum
    assert(backlog.last.getLong(3) == totalArrived - totalCompleted)
    // the running sum is internally consistent minute over minute
    backlog.sliding(2).foreach { case Array(prev, cur) =>
      assert(cur.getLong(3) ==
        prev.getLong(3) + cur.getLong(1) - cur.getLong(2))
    }
  }
}
