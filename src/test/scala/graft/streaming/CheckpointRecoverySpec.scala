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

  test("inflightGauge carry + pending buffer survive a stop/restart via checkpoint") {
    val srcDir = Files.createTempDirectory("graft_ckg_src").toString
    val ckDir = Files.createTempDirectory("graft_ckg_state").toString
    val outDir = Files.createTempDirectory("graft_ckg_out").toString

    def runOnce(): Unit = {
      val q = Streams.inflightGauge(
          Streams.eventStream(spark, srcDir).as[TaskEvent])
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    def drop(name: String, events: TaskEvent*): Unit = {
      val tmp = s"$srcDir/_$name"
      events.toDS().repartition(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }

    // run 1: two overlapping tasks in hour 00 (value 1.0 → 100 ms) —
    // nothing finalizes (watermark still inside hour 00)
    drop("g1", ev(1, "2024-01-15 00:10:00", 1), ev(2, "2024-01-15 00:10:00.050", 9))
    runOnce()
    assert(spark.read.parquet(outDir).count() == 0L)

    // run 2 (fresh query, same checkpoint): far-future events march
    // the watermark past hour 00 — the RESTARTED state must still
    // hold both tasks' points to produce peak 2
    drop("g2", ev(3, "2024-01-16 00:00:00", 1))
    runOnce()
    drop("g3", ev(4, "2024-01-17 00:00:00", 1))
    runOnce()

    val rows = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getLong(2), r.getLong(3)))
      .filter(_._2.startsWith("2024-01-15"))
      .sortBy(_.toString)
    // both tasks are app 1 (user 1 and user 9 → 9 % 8 = 1): the 50 ms
    // overlap inside hour 00 peaks at 2, with 2 starts — provable only
    // if the pre-restart pending points were recovered
    assert(rows.toSeq == Seq((1L, "2024-01-15 00:00:00.0", 2L, 2L)),
      rows.mkString(", "))
  }

  test("gapMonitor frontier and seen-set survive a stop/restart via checkpoint") {
    val srcDir = Files.createTempDirectory("graft_ckm_src").toString
    val ckDir = Files.createTempDirectory("graft_ckm_state").toString
    val outDir = Files.createTempDirectory("graft_ckm_out").toString

    def runOnce(): Unit = {
      val q = Streams.gapMonitor(
          Streams.eventStream(spark, srcDir).as[TaskEvent])
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode("append")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    def drop(name: String, events: TaskEvent*): Unit = {
      val tmp = s"$srcDir/_$name"
      events.toDS().repartition(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }

    // run 1: app 1 heartbeats at :00 and :03 — arms the monitor,
    // nothing finalized yet (watermark behind)
    drop("m1", ev(1, "2024-01-15 00:00:10", 1), ev(2, "2024-01-15 00:03:20", 1))
    runOnce()
    // run 2 (fresh query, same checkpoint): a far event marches the
    // watermark past :03 — the RESTARTED state must still know :00
    // and :03 were covered, and that the frontier starts at :00
    drop("m2", ev(3, "2024-01-15 01:00:00", 1))
    runOnce()
    drop("m3", ev(4, "2024-01-15 02:00:00", 1))
    runOnce()

    val gaps = spark.read.parquet(outDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString))
      .filter(_._2.startsWith("2024-01-15 00:0"))
      .sortBy(_._2)
    // in :00..:09 the gaps are :01,:02 (inside the active span) and
    // :04..:09 (silent until 01:00); :00 and :03 must NOT appear —
    // their coverage lived in the pre-restart state
    val want = Seq("01", "02", "04", "05", "06", "07", "08", "09")
      .map(m => (1L, s"2024-01-15 00:$m:00.0"))
    assert(gaps.toSeq == want, gaps.mkString(", "))
  }
}
