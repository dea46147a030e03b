package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.CronOps

/** JDBC round-trip against embedded Derby (on the Spark classpath):
  * the migrator's task batch lands in a real SQL store and comes back
  * identically, serially and via the partitioned parallel read. */
class TaskStoreSpec extends SparkSpec {

  private lazy val url = {
    val d = Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$d/taskdb;create=true"
  }

  test("migrator batch round-trips through the JDBC store") {
    val tasks = CronOps.tMigratorBatch(spark, sfDir)
    TaskStore.writeTasks(tasks, url, "task")

    val back = TaskStore.readTable(spark, url, "task")
    assert(back.count() == tasks.count())

    val a = tasks.collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2))).toSet
    val b = back.collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getInt(2))).toSet
    assert(a == b)
  }

  test("partitioned parallel read returns the same rows across partitions") {
    val tasks = CronOps.tMigratorBatch(spark, sfDir)
    val maxId = tasks.agg(org.apache.spark.sql.functions.max("timer_id")).head().getLong(0)
    val par = TaskStore.readTasksPartitioned(spark, url, "task",
      "timer_id", 0, maxId + 1, numPartitions = 4)
    assert(par.rdd.getNumPartitions == 4)
    assert(par.count() == tasks.count())
  }
}
