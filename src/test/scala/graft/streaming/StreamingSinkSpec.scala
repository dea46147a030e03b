package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Exactly-once delivery through the idempotent epoch-partitioned
  * sink: foreachBatch is at-least-once, so the property under test is
  * that REPLAYING a committed (batch, batchId) — the crash-recovery
  * path — leaves the target byte-identical instead of appending
  * duplicates. */
class StreamingSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, t: String, uid: Long): TaskEvent =
    TaskEvent(id, Timestamp.valueOf(t), uid, "click", 1.0)

  test("replaying a committed batchId is a no-op; distinct batches coexist") {
    val target = Files.createTempDirectory("graft_sink").toString
    val b0 = Seq(ev(1, "2024-01-15 00:01:10", 1), ev(2, "2024-01-15 00:01:40", 2)).toDF()
    val b1 = Seq(ev(3, "2024-01-15 00:02:10", 1)).toDF()

    Streams.applyBatchIdempotent(b0, 0L, target)
    Streams.applyBatchIdempotent(b1, 1L, target)
    val once = spark.read.parquet(target).collect().map(_.toString).sorted
    assert(once.length == 3)

    // the crash-replay path: epoch 1 runs again after a restart
    Streams.applyBatchIdempotent(b1, 1L, target)
    val replayed = spark.read.parquet(target).collect().map(_.toString).sorted
    assert(replayed.toSeq == once.toSeq, "replay changed the target")

    // dynamic overwrite must not clobber other epochs' partitions
    assert(spark.read.parquet(target)
      .where("batch_id = 0").count() == 2L)
  }

  test("end-to-end: stream → idempotent sink → restart delivers each event exactly once") {
    val srcDir = Files.createTempDirectory("graft_sink_src").toString
    val ckDir = Files.createTempDirectory("graft_sink_ck").toString
    val target = Files.createTempDirectory("graft_sink_tgt").toString

    def drop(name: String, events: TaskEvent*): Unit = {
      val tmp = s"$srcDir/_$name"
      events.toDS().repartition(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    }
    def runOnce(): Unit = {
      val q = Streams.idempotentSink(
        Streams.eventStream(spark, srcDir), target, ckDir)
      q.processAllAvailable()
      q.stop()
    }

    drop("d1", ev(1, "2024-01-15 00:01:10", 1), ev(2, "2024-01-15 00:01:40", 2))
    runOnce()
    drop("d2", ev(3, "2024-01-15 00:02:10", 1))
    runOnce() // fresh query, same checkpoint — no reprocessing of d1

    val ids = spark.read.parquet(target).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }
}
