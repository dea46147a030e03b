package graft.operators

import org.apache.spark.sql.Column
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

  test("t_hist_quantile estimate stays inside its crossing bucket of the exact percentile") {
    val exact = TimerOps.tSlaPercentile(spark, sfDir)
      .select(col("status"), col("p50_cost"), col("p95_cost"))
    val hist = TimerOps.tHistQuantile(spark, sfDir)
    val joined = hist.join(exact, "status").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      // exactly one crossing bucket resolved per status and quantile
      assert(!r.isNullAt(r.fieldIndex("le_50")) && !r.isNullAt(r.fieldIndex("le_95")))
      Seq((50, "p50_cost"), (95, "p95_cost")).foreach { case (p, exCol) =>
        val le = r.getLong(r.fieldIndex(s"le_$p"))
        val lo = TimerOps.SlaHistLadder.takeWhile(_ < le).lastOption.getOrElse(0L)
        val lo2 = TimerOps.SlaHistLadder.takeWhile(_ < lo).lastOption.getOrElse(0L)
        val est = r.getDouble(r.fieldIndex(s"p${p}_est"))
        val ex = r.getDouble(r.fieldIndex(exCol))
        // the estimate lies in its crossing bucket by construction;
        // the exact percentile's rank ((n−1)·p vs the Prometheus p·n
        // target) can differ by < 1 rank, which at a cumulative
        // boundary puts the exact value in the bucket BELOW — so the
        // honest bound is the crossing bucket plus its predecessor
        // (review r9), not the crossing bucket alone
        assert(est > lo / 100.0 - 1e-9 && est <= le / 100.0 + 1e-9,
          s"status ${r.get(0)} p$p est $est outside bucket ($lo, $le]")
        assert(math.abs(est - ex) <= (le - lo2) / 100.0 + 0.01,
          s"status ${r.get(0)} p$p est $est vs exact $ex allowed ${(le - lo2) / 100.0}")
      }
    }
  }

  test("histogram is mergeable: partial histograms of disjoint slices sum to the full histogram") {
    // THE property that makes t_hist_quantile the 100 TB percentile
    // path (and what Prometheus relies on across scrapes): bucket
    // counts combine by addition, so executors partial-agg locally
    // and the shuffle carries ≤ |status|×|ladder| rows.
    import graft.operators.TimerOps.slaHistCaseSql
    def histOf(filter: Column): Map[(Int, Long), Long] =
      Tables.events(spark, sfDir)
        .filter(col("value").isNotNull).filter(filter)
        .select(TimerOps.statusCode.as("status"),
          ExactNum.cents(col("value")).as("vc"))
        .withColumn("le", expr(slaHistCaseSql))
        .groupBy(col("status"), col("le")).count()
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val even = histOf(pmod(col("event_id"), lit(2)) === 0)
    val odd = histOf(pmod(col("event_id"), lit(2)) === 1)
    val full = histOf(lit(true))
    assert(full.nonEmpty)
    val merged = (even.keySet ++ odd.keySet).map { k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))
    }.toMap
    assert(merged === full)
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
