package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** The continuous-merge sink: the day-partitioned lake tracks the
  * task store's CURRENT state (latest-wins per key) across
  * micro-batches, and replaying a committed batch — foreachBatch's
  * at-least-once crash path — leaves the snapshot content unchanged
  * (merge idempotence, the state-side complement of the epoch sink's
  * log idempotence). */
class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val Key = Seq("user_id", "event_id")

  private def ev(id: Long, t: String, uid: Long, typ: String, v: Double): TaskEvent =
    TaskEvent(id, Timestamp.valueOf(t), uid, typ, v)

  private def snapshot(dir: String): Map[(Long, Long), (Timestamp, String, Double)] =
    spark.read.parquet(dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getTimestamp(2), r.getString(3), r.getDouble(4)))).toMap

  test("snapshot tracks latest-wins state across batches; replay is content-idempotent") {
    val target = Files.createTempDirectory("graft_merge_sink").toString

    // batch 0 creates two tasks — including an in-batch double write
    // of task 1 (the bootstrap must already collapse versions)
    val b0 = Seq(
      ev(1, "2024-01-15 00:01:10", 7, "click", 1.0),
      ev(1, "2024-01-15 00:02:10", 7, "view", 2.0),
      ev(2, "2024-01-15 00:01:40", 8, "click", 1.0)).toDF()
    Streams.applyBatchUpsert(b0, target, Key, "ts")
    assert(snapshot(target) == Map(
      (7L, 1L) -> ((Timestamp.valueOf("2024-01-15 00:02:10"), "view", 2.0)),
      (8L, 2L) -> ((Timestamp.valueOf("2024-01-15 00:01:40"), "click", 1.0))))

    // batch 1: the executor finishes task 1 (update) and creates
    // task 3 on ANOTHER day (bootstrapping a new partition)
    val b1 = Seq(
      ev(1, "2024-01-15 00:05:00", 7, "purchase", 3.5),
      ev(3, "2024-01-16 09:00:00", 9, "click", 1.0)).toDF()
    Streams.applyBatchUpsert(b1, target, Key, "ts")
    val after = snapshot(target)
    assert(after == Map(
      (7L, 1L) -> ((Timestamp.valueOf("2024-01-15 00:05:00"), "purchase", 3.5)),
      (8L, 2L) -> ((Timestamp.valueOf("2024-01-15 00:01:40"), "click", 1.0)),
      (9L, 3L) -> ((Timestamp.valueOf("2024-01-16 09:00:00"), "click", 1.0))))

    // crash path: batch 1 replays — the merge must be a content no-op
    Streams.applyBatchUpsert(b1, target, Key, "ts")
    assert(snapshot(target) == after, "replay changed the snapshot")

    // a stale update (older ord than the standing row) must lose
    val stale = Seq(ev(1, "2024-01-15 00:03:00", 7, "view", 9.9)).toDF()
    Streams.applyBatchUpsert(stale, target, Key, "ts")
    assert(snapshot(target)((7L, 1L)) ==
      ((Timestamp.valueOf("2024-01-15 00:05:00"), "purchase", 3.5)),
      "stale update overwrote a newer version")
  }

  test("end-to-end: stream of updates → merge sink → snapshot equals a batch latest-wins replay") {
    val srcDir = Files.createTempDirectory("graft_merge_src").toString
    val ckDir = Files.createTempDirectory("graft_merge_ck").toString
    val target = Files.createTempDirectory("graft_merge_tgt").toString

    def drop(name: String, events: TaskEvent*): Unit = {
      val tmp = s"$srcDir/_$name"
      events.toDS().repartition(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }
    def runOnce(): Unit = {
      val q = Streams.upsertSnapshotSink(
        Streams.eventStream(spark, srcDir), target, ckDir, Key, "ts")
      q.processAllAvailable()
      q.stop()
    }

    drop("d1",
      ev(1, "2024-01-15 00:01:10", 7, "click", 1.0),
      ev(2, "2024-01-15 00:01:40", 8, "click", 1.0))
    runOnce()
    drop("d2",
      ev(1, "2024-01-15 00:06:00", 7, "purchase", 4.0),
      ev(4, "2024-01-16 10:00:00", 9, "signup", 0.5))
    runOnce() // restart across batches: checkpoint resumes, merge applies

    assert(snapshot(target) == Map(
      (7L, 1L) -> ((Timestamp.valueOf("2024-01-15 00:06:00"), "purchase", 4.0)),
      (8L, 2L) -> ((Timestamp.valueOf("2024-01-15 00:01:40"), "click", 1.0)),
      (9L, 4L) -> ((Timestamp.valueOf("2024-01-16 10:00:00"), "signup", 0.5))))
  }
}
