package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.sources.{GraftLakeSink, ManifestLake}

/** Native `writeStream.format("graft-lake")` (VERDICT r13 #3): the
  * sink half of the format symmetry. Exactly-once across a
  * checkpoint restart, replayed-batch skip at the sink layer (the
  * crash window between the lake commit and the engine's offset
  * log), and the option/mode guards. */
class LakeFormatSinkSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def mk(ids: Range, day: Int) =
    ids.map(i => (i.toLong, ts(f"2024-05-$day%02d 10:00:00"), s"v$i"))
      .toDF("id", "ts", "v")
  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_lfs_$tag").toString

  test("lake→lake streaming pipe via format sink: exactly-once across a checkpoint restart") {
    val src = tmp("pipe_src")
    val dst = tmp("pipe_dst") + "/lake"
    val cp = tmp("pipe_cp")
    ManifestLake.create(spark, src, mk(0 until 25, 1), "ts")
    def run(): Unit = {
      val q = ManifestLake.changeStream(spark, src)
        .writeStream.format("graft-lake")
        .option("ordCol", "ts")
        .option("checkpointLocation", cp)
        .start(dst)
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(ManifestLake.read(spark, dst).count() == 25L)
    ManifestLake.appendBatch(spark, src, mk(100 until 140, 2), "ts", 0L)
    // restart from the same checkpoint: only the new window lands —
    // a sink that replayed the bootstrap would double the count
    run()
    val d = ManifestLake.read(spark, dst)
    assert(d.count() == 65L, "restart duplicated or lost a window")
    assert(d.select("id").collect().map(_.getLong(0)).toSet ==
      ManifestLake.read(spark, src).select("id").collect()
        .map(_.getLong(0)).toSet)
    // the dst is a REAL lake: day partitioning derived from ordCol
    assert(ManifestLake.snapshot(spark, dst).days.keySet ==
      Set("2024-05-01", "2024-05-02"))
  }

  test("a replayed micro-batch id is skipped by the lake's own cursor (crash between lake commit and offset log)") {
    val dst = tmp("replay") + "/lake"
    // drive the Sink directly (the engine-made streaming frame is
    // exercised end-to-end by the pipe test above; asBatch is a no-op
    // wrap on a batch frame, so the batch-id contract is what's under
    // test here)
    val sink = new GraftLakeSink(dst, "ts", 1, Seq.empty)
    sink.addBatch(0L, mk(0 until 10, 1))
    // the engine crashed before writing offset 0 to its log: the SAME
    // batch id replays with identical content — must be a no-op
    sink.addBatch(0L, mk(0 until 10, 1))
    assert(ManifestLake.read(spark, dst).count() == 10L)
    sink.addBatch(1L, mk(50 until 55, 2))
    assert(ManifestLake.read(spark, dst).count() == 15L)
  }

  test("guards: ordCol required, append-only output mode, no partitionBy") {
    val dst = tmp("guards") + "/lake"
    val boom = intercept[Exception] {
      spark.readStream.format("rate").load()
        .writeStream.format("graft-lake")
        .option("checkpointLocation", tmp("g_cp1")).start(dst)
    }
    assert(boom.getMessage.contains("ordCol"), boom.getMessage)
    val modes = intercept[Exception] {
      spark.readStream.format("rate").load()
        .groupBy(col("value") % 10).count()
        .writeStream.format("graft-lake").outputMode(OutputMode.Complete())
        .option("ordCol", "timestamp")
        .option("checkpointLocation", tmp("g_cp2")).start(dst)
    }
    assert(modes.getMessage.contains("Append output mode only"),
      modes.getMessage)
  }
}
