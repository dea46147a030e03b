package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** The production property behind the MQ-consumer analog: keyed
  * dedup state is checkpointed, so a QUERY RESTART resumes with the
  * same state — a task minute fired before the restart is still
  * suppressed after it (the reference gets this from Redis bloom +
  * the MySQL unique index surviving process restarts). */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, uid: Long): TaskEvent =
    TaskEvent(id, Timestamp.valueOf(t), uid, "click", 1.0)

  test("timerFiring dedup state survives a stop/restart via checkpoint") {
    val srcDir = Files.createTempDirectory("graft_ck_src").toString
    val ckDir = Files.createTempDirectory("graft_ck_state").toString
    val outDir = Files.createTempDirectory("graft_ck_out").toString

    def runOnce(): Unit = {
      val q = Streams.timerFiring(
          Streams.eventStream(spark, srcDir).as[TaskEvent])
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    // the file source wants a flat dir — single-part drops, moved in
    def drop(name: String, events: TaskEvent*): Unit = {
      val tmp = s"$srcDir/_$name"
      events.toDS().repartition(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }

    // run 1: minute 00:01 fires for timer 1
    drop("drop1", ev(1, "2024-01-15 00:01:10", 1))
    runOnce()

    // run 2 (fresh query, same checkpoint): replay of 00:01 + new 00:03
    drop("drop2", ev(2, "2024-01-15 00:01:40", 1), ev(3, "2024-01-15 00:03:00", 1))
    runOnce()

    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getTimestamp(1).toString, r.getBoolean(2), r.getInt(3)))
      .sortBy(_.toString)
    // 00:01 first firing (fired, 0 suppressed), 00:01 replay AFTER
    // RESTART recognized as duplicate (not fired, 1 suppressed),
    // 00:03 fresh firing
    assert(rows.toSeq == Seq(
      ("2024-01-15 00:01:00.0", false, 1),
      ("2024-01-15 00:01:00.0", true, 0),
      ("2024-01-15 00:03:00.0", true, 0)), rows.mkString(", "))
  }
}
