package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** SCALING.md names two drop-in approximations for the 100 TB tier:
  * approx_percentile for the SLA quantiles and HLL
  * (approx_count_distinct) for the per-shard distinct-timer counts.
  * These specs prove the swaps hold their error bounds on real data —
  * so the claim in the scale doc is executable, not aspirational. */
class ApproxSwapSpec extends SparkSpec {

  test("approx_percentile tracks exact percentile within 5% relative error") {
    val exact = TimerOps.tSlaPercentile(spark, sfDir)
      .select(col("status"), col("p50_cost"), col("p95_cost"))
    val approx = Tables.events(spark, sfDir)
      .groupBy(TimerOps.statusCode.as("status"))
      .agg(
        expr("approx_percentile(value, 0.5, 1000)").as("a50"),
        expr("approx_percentile(value, 0.95, 1000)").as("a95"))
    val joined = exact.join(approx, "status").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (p50, p95, a50, a95) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(a50 - p50) / p50 <= 0.05, s"p50 $p50 vs approx $a50")
      assert(math.abs(a95 - p95) / p95 <= 0.05, s"p95 $p95 vs approx $a95")
    }
  }

  test("approx_count_distinct tracks exact distinct timers within 5%") {
    val exact = Tables.events(spark, sfDir)
      .groupBy(pmod(col("user_id"), lit(8)).as("bucket"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    val approx = Tables.events(spark, sfDir)
      .groupBy(pmod(col("user_id"), lit(8)).as("bucket"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("n_approx"))
    exact.join(approx, "bucket").collect().foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      assert(math.abs(a - e).toDouble / e <= 0.05, s"bucket ${r.get(0)}: $e vs $a")
    }
  }
}
