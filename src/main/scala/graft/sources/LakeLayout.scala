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

  /** Small-file compaction — the lake-maintenance job every
    * streaming ingest needs: each micro-batch of the file-sink
    * (eventStream's drop directory, the lake's per-day partitions)
    * leaves one-file-per-trigger litter, and a 100 TB table read
    * through millions of kilobyte files is throttled by open()/footer
    * costs, not bandwidth. Rewrite a directory into
    * ⌈bytes / targetFileBytes⌉ similarly-sized files: size from the
    * FILESYSTEM (not row counts — row width varies), coalesce when
    * only merging (no shuffle), repartition when splitting. Content
    * equality and file-count bound are spec-pinned; at 100 TB this
    * runs per-partition (compact day=D after the day closes), never
    * against the whole table at once. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    // a quiet day / not-yet-committed drop dir is a NO-OP, not a
    // crashed maintenance job (review r8)
    val df =
      try spark.read.parquet(inDir)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Unable to infer schema") => return 0L
      }
    // size the COMMITTED data: inputFiles is what the read actually
    // honors (file-sink _spark_metadata, hidden files excluded) —
    // getContentSummary would count transaction logs and orphaned
    // parts into the target (review r8)
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    if (bytes == 0L) return 0L
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    // repartition takes an Int: past 2³¹ files the silent toInt wrap
    // would mis-size (or crash) the rewrite — fail with the real
    // numbers instead (ADVICE r8; a >2³¹-file rewrite means the
    // target size is wrong or the job should run per-partition)
    require(nFiles <= Int.MaxValue,
      s"compaction of $inDir needs $nFiles files ($bytes bytes at " +
        s"$targetFileBytes B/file) — exceeds Int.MaxValue; raise " +
        "targetFileBytes or compact per-partition")
    // repartition, NOT coalesce: coalesce pushes the partition cut
    // into the SCAN, so a 10k-file day would be read by nFiles tasks
    // (one, in the worst case); the round-robin shuffle costs one
    // pass over data that is being rewritten anyway and keeps the
    // read at full width (review r8)
    df.repartition(nFiles.toInt).write.mode("overwrite").parquet(outDir)
    nFiles
  }
}
