package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Runtime bloom-filter join pruning — the 100 TB fact-fact join
  * optimization Spark ships but does not enable by default: when one
  * join side carries a selective filter, the optimizer builds a bloom
  * filter of its join keys at runtime and pushes a might_contain
  * probe into the OTHER side's scan, so the big side drops
  * non-matching rows BEFORE the shuffle (SPARK-32268
  * InjectRuntimeFilter). On a 100 TB lineitem⋈filtered-orders this
  * turns the dominant shuffle from full-table to matching-keys-only.
  * This spec pins that the optimization actually fires on our q4 join
  * shape with the documented configs, so the SCALING.md guidance
  * ("enable runtime bloom filters at scale") stays executable. */
class RuntimeFilterSpec extends SparkSpec {

  test("q4-shaped join: bloom filter injected into the fact scan when enabled") {
    val conf = spark.conf
    val key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
    val appKey = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    val bcastKey = "spark.sql.autoBroadcastJoinThreshold"
    val before = conf.get(key)
    val beforeBcast = conf.get(bcastKey)
    // the test tables are far below the 10 GB application-side default
    // threshold AND below the broadcast threshold (the optimizer only
    // injects for probably-shuffle joins) — lower/disable both to put
    // the tiny test join in the regime a 100 TB join occupies by size
    // alone; at real scale the defaults are the right guards
    conf.set(key, "true")
    conf.set(appKey, "1KB")
    conf.set(bcastKey, "-1")
    try {
      val orders = graft.Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = graft.Tables.lineitem(spark, sfDir)
      val j = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected:\n$p")
    } finally {
      conf.set(key, before)
      conf.set(bcastKey, beforeBcast)
      conf.unset(appKey)
    }
  }
}
