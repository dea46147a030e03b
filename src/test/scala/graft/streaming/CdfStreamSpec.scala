package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ManifestLake

/** changeStream CDF mode (VERDICT r13 #2 — Delta's streaming
  * `readChangeFeed`): rewritten days stream as delete+insert
  * `_change_type` rows instead of refusing, so the feed can maintain
  * a LIVE materialized view. Pins: stream ≡ readChanges twin
  * consistency on the same window, live-MV equivalence with a batch
  * recompute across an upsert + DV-delete + append window,
  * sequential-application convergence across capped triggers with a
  * checkpoint restart in the middle, and the option guards. */
class CdfStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def mk(ids: Range, day: Int) =
    ids.map(i => (i.toLong, ts(f"2024-04-$day%02d 10:00:00"), s"v$i",
      (i % 7).toLong))
      .toDF("id", "ts", "v", "grp")
  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_cdf_$tag").toString

  private def keyed(df: DataFrame): Set[(Long, String, String)] =
    df.select("id", "v", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("a rewritten day streams as delete+insert; batch window ≡ readChanges (twin consistency)") {
    val src = tmp("twin")
    ManifestLake.create(spark, src, mk(0 until 20, 1), "ts") // v1
    val batches = mutable.ArrayBuffer.empty[Set[(Long, String, String)]]
    val cp = tmp("twin_cp")
    def run(): Unit = {
      val q = ManifestLake.changeStream(spark, src, readChangeFeed = true)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (df: DataFrame, _: Long) =>
          val k = keyed(df)
          batches.synchronized { batches += k }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // bootstrap: the full snapshot as inserts (pollChanges' contract)
    assert(batches.synchronized(batches.head) ==
      (0 until 20).map(i => (i.toLong, s"v$i", "insert")).toSet)
    // now a mixed mutation window while the query is down: an upsert
    // that rewrites day 1, a DV delete, and a plain append
    ManifestLake.upsert(spark, src,
      Seq((5L, ts("2024-04-01 11:00:00"), "changed", 5L))
        .toDF("id", "ts", "v", "grp"), Seq("id"), "ts")        // v2
    ManifestLake.deleteWhereDV(spark, src, col("id").isin(3L, 7L)) // v3
    ManifestLake.appendBatch(spark, src, mk(100 until 110, 2), "ts", 0L) // v4
    run()
    val win = batches.synchronized(batches.toVector).drop(1)
      .filter(_.nonEmpty)
    assert(win.size == 1, s"expected one catch-up window, got $win")
    // the stream's window (1, head] must equal the batch PER-COMMIT
    // CDC read of the same window — same diff code, same rows (r15:
    // the stream walks the window version by version)
    val want = keyed(ManifestLake.readChangesPerCommit(spark, src, 1L,
      ManifestLake.snapshot(spark, src).version))
    assert(win.head == want, s"stream=${win.head}\nbatch=$want")
    // and the rewrite really is its delete+insert pair
    assert(win.head.contains((5L, "v5", "delete")) &&
      win.head.contains((5L, "changed", "insert")))
    assert(win.head.contains((3L, "v3", "delete")) &&
      win.head.contains((7L, "v7", "delete")))
  }

  test("LIVE incremental MV: applying the CDF feed per trigger ≡ batch recompute, across a checkpoint restart") {
    val src = tmp("mv")
    ManifestLake.create(spark, src, mk(0 until 30, 1), "ts") // v1
    // the MV: per-grp (count, sum of id) maintained by +insert/−delete
    val cntM = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val sumM = mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cp = tmp("mv_cp")
    def run(): Unit = {
      val q = ManifestLake.changeStream(spark, src, readChangeFeed = true,
        maxDirsPerTrigger = 1)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (df: DataFrame, _: Long) =>
          val delta = df.groupBy(col("grp"))
            .agg(
              sum(when(col("_change_type") === "insert", 1L)
                .otherwise(-1L)).as("dc"),
              sum(when(col("_change_type") === "insert", col("id"))
                .otherwise(-col("id"))).as("ds"))
            .collect()
          cntM.synchronized {
            delta.foreach { r =>
              val g = r.getLong(0)
              cntM(g) += r.getLong(1); sumM(g) += r.getLong(2)
            }
          }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // bootstrap
    ManifestLake.upsert(spark, src,
      Seq((4L, ts("2024-04-02 09:00:00"), "moved", 4L))
        .toDF("id", "ts", "v", "grp"), Seq("id"), "ts")          // v2
    ManifestLake.appendBatch(spark, src, mk(200 until 220, 3), "ts", 0L) // v3
    run() // catch-up, capped triggers
    ManifestLake.deleteWhereDV(spark, src, col("grp") === 2L)     // v4
    ManifestLake.appendBatch(spark, src, mk(300 until 305, 4), "ts", 1L) // v5
    run() // second restart from the same checkpoint
    val want = ManifestLake.read(spark, src).groupBy(col("grp"))
      .agg(count(lit(1)).as("c"), sum(col("id")).as("s"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val got = cntM.synchronized {
      cntM.keys.filter(cntM(_) != 0L)
        .map(g => g -> (cntM(g), sumM(g))).toMap
    }
    assert(got == want, s"MV diverged:\n got=$got\nwant=$want")
  }

  test("readChangeFeed + skipRewrites refused; CDF schema carries " +
      "_change_type + commit metadata") {
    val src = tmp("guard")
    ManifestLake.create(spark, src, mk(0 until 5, 1), "ts")
    val boom = intercept[IllegalArgumentException] {
      ManifestLake.changeStream(spark, src, readChangeFeed = true,
        skipRewrites = true)
        .writeStream.format("memory").queryName("cdf_boom").start()
    }
    assert(boom.getMessage.contains("contradictory"), boom.getMessage)
    val df = ManifestLake.changeStream(spark, src, readChangeFeed = true)
    assert(df.schema.fieldNames.takeRight(3).toSeq ==
      Seq("_change_type", "_commit_version", "_commit_timestamp"))
    assert(df.schema.fieldNames.dropRight(3).toSeq ==
      ManifestLake.read(spark, src).schema.fieldNames.toSeq)
  }

  test("per-trigger commit attribution: every CDF row names the " +
      "commit that produced it, timestamps ≡ history()'s instants") {
    val src = tmp("attr")
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts")        // v1
    ManifestLake.upsert(spark, src,
      Seq((2L, ts("2024-04-01 11:00:00"), "changed", 2L))
        .toDF("id", "ts", "v", "grp"), Seq("id"), "ts")             // v2
    ManifestLake.appendBatch(spark, src, mk(50 until 55, 2), "ts", 0L) // v3
    val rows = mutable.ArrayBuffer.empty[(Long, String, Long,
      java.sql.Timestamp)]
    val q = ManifestLake.changeStream(spark, src, readChangeFeed = true,
      startingVersion = "1")
      .writeStream.option("checkpointLocation", tmp("attr_cp"))
      .foreachBatch { (df: DataFrame, _: Long) =>
        val r = df.select("id", "_change_type", "_commit_version",
          "_commit_timestamp").collect()
          .map(x => (x.getLong(0), x.getString(1), x.getLong(2),
            x.getTimestamp(3)))
        rows.synchronized { rows ++= r }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = rows.synchronized(rows.toVector)
    // the upsert's pair attributes to v2, the append's inserts to v3 —
    // even though one trigger may cover both commits
    assert(got.filter(_._1 == 2L).map(r => (r._2, r._3)).toSet ==
      Set(("delete", 2L), ("insert", 2L)))
    assert(got.filter(_._1 >= 50L).forall(r =>
      r._2 == "insert" && r._3 == 3L))
    // _commit_timestamp is the SAME adjusted instant history() shows
    // (so it round-trips through readAsOf to exactly that version)
    val hist = ManifestLake.history(spark, src).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(2)).toMap
    assert(got.forall(r => hist(r._3) == r._4),
      s"feed stamps diverged from history: $got vs $hist")
  }

  test("update images stream (r16): updateKeys pairs a commit's delete+insert into update_pre/postimage; unpaired rows keep plain types") {
    val src = tmp("updimg")
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts")        // v1
    // ONE upsert: id 5 updated (pair) + id 200 brand-new (plain insert)
    ManifestLake.upsert(spark, src,
      Seq((5L, ts("2024-04-01 11:00:00"), "changed", 5L),
        (200L, ts("2024-04-02 09:00:00"), "fresh", 4L))
        .toDF("id", "ts", "v", "grp"), Seq("id"), "ts")             // v2
    ManifestLake.deleteWhere(spark, src, col("id") === 6L)          // v3
    val rows = mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    val q = ManifestLake.changeStream(spark, src, readChangeFeed = true,
      startingVersion = "1", updateKeys = Seq("id"))
      .writeStream.option("checkpointLocation", tmp("updimg_cp"))
      .foreachBatch { (df: DataFrame, _: Long) =>
        val r = df.select("id", "v", "_change_type", "_commit_version")
          .collect()
          .map(x => (x.getLong(0), x.getString(1), x.getString(2),
            x.getLong(3)))
        rows.synchronized { rows ++= r }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = rows.synchronized(rows.toSet)
    assert(got == Set(
      (5L, "v5", "update_preimage", 2L),
      (5L, "changed", "update_postimage", 2L),
      (200L, "fresh", "insert", 2L),
      (6L, "v6", "delete", 3L)), got)
    // guard: updateKeys without readChangeFeed refuses up front
    val boom = intercept[IllegalArgumentException] {
      ManifestLake.changeStream(spark, src, updateKeys = Seq("id"))
        .writeStream.format("memory").queryName("updimg_boom").start()
    }
    assert(boom.getMessage.contains("readChangeFeed"), boom.getMessage)
  }

  test("maxVersionsPerTrigger (r16): a deep CDF catch-up drains in bounded per-trigger windows; CDF defaults the cap on") {
    val src = tmp("vcap")
    ManifestLake.create(spark, src, mk(0 until 4, 1), "ts")         // v1
    (0 until 5).foreach(i =>                                        // v2..v6
      ManifestLake.appendBatch(spark, src, mk(10 * (i + 1) until
        10 * (i + 1) + 2, 2), "ts", batchId = i.toLong))
    val perBatch = mutable.ArrayBuffer.empty[Set[Long]]
    val q = ManifestLake.changeStream(spark, src, readChangeFeed = true,
      startingVersion = "1", maxVersionsPerTrigger = 2)
      .writeStream.option("checkpointLocation", tmp("vcap_cp"))
      .foreachBatch { (df: DataFrame, _: Long) =>
        val vs = df.select("_commit_version").distinct().collect()
          .map(_.getLong(0)).toSet
        perBatch.synchronized { if (vs.nonEmpty) perBatch += vs }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = perBatch.synchronized(perBatch.toVector)
    assert(got.forall(_.size <= 2),
      s"a trigger window exceeded the 2-commit cap: $got")
    assert(got.size >= 3 && got.flatten.toSet == (2L to 6L).toSet,
      s"catch-up did not drain in bounded windows: $got")
    // CDF mode defaults the cap ON (128); an explicit 0 disables it;
    // the append feed has no default (its plan width is O(added dirs))
    import graft.sources.LakeStreamSource
    def srcWith(cdf: Boolean, cap: Option[Int]): LakeStreamSource =
      new LakeStreamSource(spark, src,
        LakeStreamSource.pinnedSchema(spark, src, cdf), 0L, false, None,
        cdf, None, cap)
    assert(srcWith(cdf = true, None).effectiveVersionCap ==
      Some(LakeStreamSource.DefaultCdfVersionsPerTrigger))
    assert(srcWith(cdf = true, Some(0)).effectiveVersionCap.isEmpty)
    assert(srcWith(cdf = false, None).effectiveVersionCap.isEmpty)
  }
}
