package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** t_next_fire invariants, independent of the DuckDB oracle: the
  * preview must produce exactly one strictly-future activation per
  * timer, aligned to the timer's own cron step, within the horizon
  * the largest step implies (gotimer_web/pkg/cron/parser.go:20
  * NextFromNow semantics). */
class NextFireSpec extends SparkSpec {

  private lazy val nf = CronOps.tNextFire(spark, sfDir).cache()

  test("one row per timer, covering every distinct timer id") {
    val timers = graft.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(nf.count() == timers, "a timer lost or duplicated its preview row")
    assert(nf.groupBy("timer_id").count().filter(col("count") > 1).count() == 0)
  }

  test("next fire is strictly future, step-aligned, and the EARLIEST such minute") {
    val now = java.sql.Timestamp.valueOf("2024-01-15 00:37:22")
    val bad = nf
      .withColumn("step", CronOps.stepMin(col("timer_id")))
      .filter(
        col("next_fire") <= lit(now) ||                         // not strictly after now
          pmod(minute(col("next_fire")), col("step")) =!= 0 ||  // off the cron grid
          second(col("next_fire")) =!= 0 ||                     // cron fires on the minute
          col("wait_sec") <= 0 ||
          col("wait_sec") > col("step") * 60 ||                 // within one own-step period
          // earliest: stepping BACK one step must land at or before now
          col("next_fire") - expr("make_interval(0,0,0,0,0,step,0)") > lit(now))
      .count()
    assert(bad == 0, s"$bad preview rows violate next-fire invariants")
  }

  test("wait_sec equals the second difference to next_fire") {
    val now = lit("2024-01-15 00:37:22").cast("timestamp")
    val bad = nf.filter(
      col("wait_sec") =!= (unix_timestamp(col("next_fire")) - unix_timestamp(now)))
      .count()
    assert(bad == 0)
  }
}
