package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB lake layout (SURVEY §5): the events fact table written
  * hive-partitioned by event date, so every time-range operator
  * prunes whole partitions BEFORE any file is opened — the lake
  * analog of the reference's per-day Redis key space
  * (dao/task/cache.go keys per minute-bucket, blooms per day).
  *
  * At 100 TB this layout is the difference between a scan of ~1/30th
  * of the table for a one-day query and a scan of everything;
  * LakeLayoutSpec asserts the pruning on the physical plan
  * (PartitionFilters, not just PushedFilters).
  */
object LakeLayout {

  /** Write events partitioned by event date (day=YYYY-MM-DD/...).
    * Sort within partitions by ts so parquet row-group min/max stats
    * make sub-day ranges cheap too. */
  def writePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("day"))
      .sortWithinPartitions(col("day"), col("ts"))
      .write
      .partitionBy("day")
      .mode("overwrite")
      .parquet(path)

  /** Read the partitioned lake back; `day` is a partition column —
    * filters on it become PartitionFilters (directory pruning). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** One day of events — the shape every per-day operator (bloom
    * build, minute monitoring) takes against the lake. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    read(spark, path).filter(col("day") === day)

  /** Write a fact table BUCKETED on its join key (hash-bucketed files
    * + catalog bucket spec). Two tables bucketed the same way on the
    * same key join WITHOUT any Exchange — the co-located fact-fact
    * join SCALING.md §2b promises for 100 TB (shuffle cost paid once
    * at write time, amortized over every subsequent join/groupBy on
    * that key). BucketedJoinSpec asserts the Exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
}
