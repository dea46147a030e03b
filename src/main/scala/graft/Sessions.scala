package graft

import org.apache.spark.sql.SparkSession

/** One place for session defaults so Verify, Bench, and the test
  * suite run with identical semantics:
  *  - UTC session timezone → timestamp literals are timezone-free,
  *    matching DuckDB's naive TIMESTAMP (ADVICE r1).
  *  - nanosAsLong → the events table's TIMESTAMP(NANOS) parquet is
  *    readable (Tables.events converts back to TimestampType).
  *  - shuffle.partitions sized to the local core count, not 200 —
  *    on a real cluster this would be executors×cores×2-3.
  *  - AQE on (default) → runtime coalescing + skew-join splitting.
  */
object Sessions {
  def build(appName: String, cpus: String): SparkSession =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // r17: shuffled-hash-join preference (preferSortMergeJoin=false
      // + AQE maxShuffledHashJoinLocalMapThreshold) was MEASURED and
      // REJECTED — A/B Timeit showed the heavy dedup equi-joins
      // regress under SHJ (d_ngram_jaccard 5.80 -> 6.22 s,
      // d_minhash_lsh 1.26 -> 1.44 s: million-row per-partition hash
      // map builds lose to tungsten sort-merge) while the small-build
      // joins moved only noise-band. Defaults stay (OPTIMIZATION_r17).
      // NOTE: outputTimestampType stays INT96 (Spark's default): the
      // adjusted-to-UTC INT64 form reads back as TIMESTAMPTZ in
      // DuckDB, which would break the engine-wide naive-timestamp
      // oracle convention for every Verify dump. ManifestLake opts
      // into TIMESTAMP_MICROS around ITS writes only (footer stats).
      .config("spark.ui.enabled", "false")
      // NOTE: no spark.driver.memory here — in local mode the heap is
      // fixed by the already-running JVM; build.sbt sizes -Xmx from
      // SPARK_DRIVER_MEM. Setting the conf post-launch would silently
      // lie about the memory actually in use.
      .getOrCreate()
}
