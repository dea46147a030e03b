package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The co-located join story, executable: two fact tables bucketed on
  * the join key must sort-merge join with ZERO Exchange — the layout
  * that turns the 100 TB orders⋈lineitem from a full double shuffle
  * into a local merge (SCALING.md §2b). */
class BucketedJoinSpec extends SparkSpec {

  test("same-bucketed fact tables join without any Exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bucket_spec " +
      "LOCATION '/tmp/graft_bucket_spec_db'")
    try {
      LakeLayout.writeBucketed(Tables.orders(spark, sfDir),
        "graft_bucket_spec.orders_b", "o_orderkey", 8)
      LakeLayout.writeBucketed(
        Tables.lineitem(spark, sfDir).withColumnRenamed("l_orderkey", "o_orderkey"),
        "graft_bucket_spec.lineitem_b", "o_orderkey", 8)

      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("graft_bucket_spec.orders_b")
          .join(spark.table("graft_bucket_spec.lineitem_b"), "o_orderkey")
          .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
        val plan = joined.queryExecution.sparkPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        // the whole join+groupBy pipeline rides the bucket layout:
        // no shuffle anywhere
        assert(!plan.contains("Exchange"), plan)

        // and it computes the same thing as the plain-parquet join
        val expected = Tables.orders(spark, sfDir)
          .join(Tables.lineitem(spark, sfDir),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == expected)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      }
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_bucket_spec CASCADE")
    }
  }
}
