package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC task-store sink/source — the reference persists timers and
  * tasks in MySQL (gotimer_web/dao/timer, dao/task over gorm;
  * BatchCreateRecords in the migrator); an analytics engine sitting
  * next to it reads/writes the same store over JDBC.
  *
  * Scale notes: reads accept a partitioning column + bounds so the
  * scan fans out across executors instead of one connection
  * (numPartitions × predicated selects — Spark's standard JDBC
  * parallel read); writes batch inserts per partition
  * (rewriteBatchedInserts-style batching is the driver's job). */
object TaskStore {

  private def props(extra: (String, String)*): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Append task rows (timer_id, run_timer, status...) to the store —
    * the migrator's BatchCreateRecords. */
  def writeTasks(tasks: DataFrame, url: String, table: String): Unit =
    tasks.write.mode(SaveMode.Append).jdbc(url, table, props())

  /** Serial read — small admin tables (the timer table). */
  def readTable(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.jdbc(url, table, props())

  /** Parallel read of a large task table, partitioned on a numeric
    * column — each executor issues its own bounded select. */
  def readTasksPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props())
}
