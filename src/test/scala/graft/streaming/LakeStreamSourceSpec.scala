package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec
import graft.sources.ManifestLake

/** The lake as a Structured Streaming SOURCE (VERDICT r12 #1): a live
  * `readStream` over appendBatch commits with manifest-version
  * offsets. Pins the full contract: full-snapshot bootstrap + live
  * tail, exactly-once continuation across a query restart from the
  * engine checkpoint, deterministic window replay (the property
  * exactly-once rests on), rewrite refusal vs skipRewrites, the
  * schema-change restart rule, admission control via
  * maxDirsPerTrigger, and stream ≡ pollChanges on the same window. */
class LakeStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def mk(ids: Range, day: Int) =
    ids.map(i => (i.toLong, ts(f"2024-02-$day%02d 10:00:00"), s"v$i"))
      .toDF("id", "ts", "v")
  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_lss_$tag").toString

  private def idsOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("bootstrap emits the full snapshot, then tails live appends") {
    val src = tmp("tail")
    ManifestLake.create(spark, src, mk(0 until 40, 1), "ts")
    val q = ManifestLake.changeStream(spark, src)
      .writeStream.format("memory").queryName("lss_tail").start()
    try {
      q.processAllAvailable()
      assert(spark.table("lss_tail").count() == 40L)
      ManifestLake.appendBatch(spark, src, mk(100 until 120, 2), "ts", 0L)
      ManifestLake.appendBatch(spark, src, mk(200 until 210, 3), "ts", 1L)
      q.processAllAvailable()
      val got = spark.table("lss_tail")
      assert(got.count() == 70L)
      assert(idsOf(got) == idsOf(ManifestLake.read(spark, src)))
      // schema parity with the batch read (incl. the day column)
      assert(got.schema == ManifestLake.read(spark, src).schema)
    } finally q.stop()
  }

  test("exactly-once across a restart: offsets resume from the checkpoint, sink converges") {
    val src = tmp("eo_src")
    val dst = tmp("eo_dst") + "/mirror"
    val cp = tmp("eo_cp")
    ManifestLake.create(spark, src, mk(0 until 30, 1), "ts")
    def run(): Unit = {
      val q = ManifestLake.changeStream(spark, src)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch(ManifestLake.sink(dst, "ts"))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(ManifestLake.read(spark, dst).count() == 30L)
    ManifestLake.appendBatch(spark, src, mk(100 until 150, 2), "ts", 0L)
    // a second query on the SAME checkpoint must continue from the
    // committed offset — a source that re-emitted from version 0
    // would land the bootstrap AGAIN under fresh batch ids and the
    // count would double
    run()
    val d = ManifestLake.read(spark, dst)
    assert(d.count() == 80L, "restart duplicated or lost a window")
    assert(idsOf(d) == idsOf(ManifestLake.read(spark, src)))
  }

  test("a rewritten day fails the query loudly; skipRewrites rides past it") {
    val src = tmp("rw")
    val cp = tmp("rw_cp")
    ManifestLake.create(spark, src, mk(0 until 20, 1), "ts")
    val seen = mutable.ArrayBuffer.empty[(Long, String)]
    val sinkTo: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (df, _) => {
        val rows = df.select("id", "v").collect()
          .map(r => (r.getLong(0), r.getString(1)))
        seen.synchronized { seen ++= rows }
        ()
      }
    val q = ManifestLake.changeStream(spark, src)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch(sinkTo).start()
    try {
      q.processAllAvailable()
      assert(seen.synchronized(seen.size) == 20)
      // an upsert rewrites day 1 — an append feed cannot represent it
      ManifestLake.upsert(spark, src,
        Seq((5L, ts("2024-02-01 11:00:00"), "changed")).toDF("id", "ts", "v"),
        Seq("id"), "ts")
      ManifestLake.appendBatch(spark, src, mk(300 until 310, 3), "ts", 0L)
      val boom = intercept[StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(boom.getCause.getMessage.contains("skipRewrites"),
        boom.getCause.getMessage)
    } finally q.stop()
    // same checkpoint, skipRewrites on: the rewritten day is passed
    // over WITHOUT being emitted, appends keep flowing
    val q2 = ManifestLake.changeStream(spark, src, skipRewrites = true)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch(sinkTo).start()
    try {
      q2.processAllAvailable()
      val later = seen.synchronized(seen.drop(20).toVector)
      // only the post-rewrite append arrives; the upsert's change is
      // knowingly not mirrored (skipChangeCommits semantics)
      assert(later.map(_._1).toSet == (300L until 310L).toSet, later)
      assert(!later.exists(_._2 == "changed"))
    } finally q2.stop()
  }

  test("schema change mid-query fails with the restart rule; a restarted query re-pins") {
    val src = tmp("sc")
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts")
    val q = ManifestLake.changeStream(spark, src)
      .writeStream.format("memory").queryName("lss_sc").start()
    try {
      q.processAllAvailable()
      ManifestLake.renameColumn(spark, src, "v", "val")
      ManifestLake.appendBatch(spark, src,
        mk(50 until 55, 2).withColumnRenamed("v", "val"), "ts", 0L)
      val boom = intercept[StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(boom.getCause.getMessage.contains("restart the query"),
        boom.getCause.getMessage)
    } finally q.stop()
    // a fresh query pins the NEW schema and reads the whole table
    val q2 = ManifestLake.changeStream(spark, src)
      .writeStream.format("memory").queryName("lss_sc2").start()
    try {
      q2.processAllAvailable()
      val got = spark.table("lss_sc2")
      assert(got.columns.contains("val") && !got.columns.contains("v"))
      assert(got.count() == 15L)
    } finally q2.stop()
  }

  test("maxDirsPerTrigger bounds each micro-batch's window (admission control)") {
    val src = tmp("adm")
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts")
    // four more single-day commits while no query is running
    (0 until 4).foreach { b =>
      ManifestLake.appendBatch(spark, src,
        mk(100 + b * 10 until 110 + b * 10, b + 2), "ts", b.toLong)
    }
    val batches = mutable.ArrayBuffer.empty[Long]
    val q = ManifestLake.changeStream(spark, src, maxDirsPerTrigger = 1)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count() }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val counts = batches.synchronized(batches.toVector)
      // one dir per commit → the backlog drains one version per
      // trigger: five non-empty windows, none larger than one commit
      assert(counts.filter(_ > 0).size == 5, counts)
      assert(counts.max <= 10L, counts)
      assert(counts.sum == 50L, counts)
    } finally q.stop()
  }

  test("maxBytesPerTrigger (r15): a catch-up stream's per-trigger " +
      "bytes never exceed the cap except the documented last-commit " +
      "rounding; AvailableNow composes") {
    val src = tmp("madm")
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts")
    // four more single-day commits while no query runs; each commit's
    // single dir is a few KB of parquet
    (0 until 4).foreach { b =>
      ManifestLake.appendBatch(spark, src,
        mk(100 + b * 10 until 110 + b * 10, b + 2), "ts", b.toLong)
    }
    // the manifest-carried sizes ARE the admission currency — read
    // one commit's real footprint and cap at 1.5× it, so exactly one
    // commit fits per trigger (two would bust the budget)
    val perCommit = ManifestLake.snapshot(spark, src).fileBytes.values.sum / 5
    assert(perCommit > 0L, "size sidecars missing — bytes admission dead")
    val cap = (perCommit * 3) / 2
    val batches = mutable.ArrayBuffer.empty[Long]
    val q = ManifestLake.changeStream(spark, src,
      maxBytesPerTrigger = cap)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count() }
        ()
      }
      .start()
    try assert(q.awaitTermination(120000), "AvailableNow did not finish")
    finally q.stop()
    val counts = batches.synchronized(batches.toVector)
    // full drain, paced one commit per trigger: no window carries two
    // commits (2 × perCommit > cap), and nothing is lost or doubled
    assert(counts.sum == 50L, s"backlog not drained exactly: $counts")
    assert(counts.filter(_ > 0).size == 5, s"byte cap not pacing: $counts")
    assert(counts.max <= 10L, s"a window exceeded one commit: $counts")
  }

  test("maxBytesPerTrigger rounding: one commit larger than the cap " +
      "still lands whole (a version offset cannot split), and both " +
      "caps compose when set together") {
    val src = tmp("madm2")
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts")
    ManifestLake.appendBatch(spark, src, mk(100 until 130, 2), "ts", 0L)
    val batches = mutable.ArrayBuffer.empty[Long]
    // cap of ONE byte: every commit is oversized — each trigger still
    // advances exactly one version (the soft-max rounding), never zero
    val q = ManifestLake.changeStream(spark, src,
      maxDirsPerTrigger = 8, maxBytesPerTrigger = 1L)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count() }
        ()
      }
      .start()
    try assert(q.awaitTermination(120000), "AvailableNow did not finish")
    finally q.stop()
    val counts = batches.synchronized(batches.toVector).filter(_ > 0)
    assert(counts == Vector(10L, 30L), s"oversized commits must land " +
      s"whole, one per trigger: $counts")
  }

  test("Trigger.AvailableNow with a dir cap drains the FULL backlog (review r13)") {
    val src = tmp("anow")
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts")
    (0 until 3).foreach { b =>
      ManifestLake.appendBatch(spark, src,
        mk(100 + b * 10 until 110 + b * 10, b + 2), "ts", b.toLong)
    }
    val batches = mutable.ArrayBuffer.empty[Long]
    // ReadAllAvailable (the AvailableNow wrapper's target capture and
    // Trigger.Once) must see the TRUE head — the first cut mapped it
    // back to the cap, and a one-shot query terminated with backlog
    val q = ManifestLake.changeStream(spark, src, maxDirsPerTrigger = 1)
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count() }
        ()
      }
      .start()
    try assert(q.awaitTermination(120000), "AvailableNow did not finish")
    finally q.stop()
    val counts = batches.synchronized(batches.toVector)
    assert(counts.sum == 40L, s"backlog not drained: $counts")
    assert(counts.count(_ > 0) == 4, s"cap not honored: $counts")
  }

  test("startingTimestamp tails from the first commit at-or-after the instant") {
    val src = tmp("sts")
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts")
    Thread.sleep(1100)
    val between = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(1100)
    ManifestLake.appendBatch(spark, src, mk(50 until 60, 2), "ts", 0L)
    val q = ManifestLake.changeStream(spark, src,
      startingTimestamp = between.toString)
      .writeStream.format("memory").queryName("lss_sts").start()
    try {
      q.processAllAvailable()
      // only the post-instant commit is delivered, not the bootstrap
      assert(idsOf(spark.table("lss_sts")) == (50L until 60L).toSet)
    } finally q.stop()
  }

  test("changeStream composes with stateful ops: watermarked windowed agg over the lake tail") {
    val src = tmp("agg")
    val rows = (0 until 60).map(i =>
      (i.toLong, ts(f"2024-02-01 ${10 + i % 3}%02d:${i % 60}%02d:00"),
        s"v$i"))
      .toDF("id", "ts", "v")
    ManifestLake.create(spark, src, rows, "ts")
    // the per-batch plan splices into IncrementalExecution under a
    // stateful aggregate — this is what a consumer actually runs on
    // the tail, and it only works if the isStreaming mark flows
    // through watermark assignment and state planning
    val q = ManifestLake.changeStream(spark, src)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("h"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("lss_agg").start()
    try {
      q.processAllAvailable()
      ManifestLake.appendBatch(spark, src,
        (100 until 130).map(i =>
          (i.toLong, ts(f"2024-02-01 ${14 + i % 2}%02d:05:00"), s"v$i"))
          .toDF("id", "ts", "v"), "ts", 0L)
      q.processAllAvailable()
      val got = spark.table("lss_agg")
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1))
        .toMap
      val want = ManifestLake.read(spark, src)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("h"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1))
        .toMap
      assert(got == want, s"stream agg diverged: $got vs $want")
      assert(want.values.sum == 90L)
    } finally q.stop()
  }

  test("stream ≡ pollChanges on the same window (twin consistency)") {
    val src = tmp("twin")
    ManifestLake.create(spark, src, mk(0 until 15, 1), "ts")
    ManifestLake.appendBatch(spark, src, mk(40 until 55, 2), "ts", 0L)
    val q = ManifestLake.changeStream(spark, src)
      .writeStream.format("memory").queryName("lss_twin").start()
    try q.processAllAvailable() finally q.stop()
    val cursor = tmp("twin_cur") + "/c"
    val Some((win, fromV, toV)) = ManifestLake.pollChanges(spark, src, cursor)
    assert(fromV == 0L && toV == ManifestLake.snapshot(spark, src).version)
    val pulled = win.filter(col("_change_type") === "insert")
    assert(idsOf(spark.table("lss_twin")) == idsOf(pulled))
    assert(spark.table("lss_twin").count() == pulled.count())
  }
}
