package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The head-hint floor (VERDICT r15 #1 — the `_last_checkpoint`
  * design, pointer-only because every manifest already checkpoints
  * the full day map). Contracts pinned:
  *   - steady-state head resolution pays ZERO log-dir listings and a
  *     bounded number of existence probes (the structural fix: a
  *     30-day per-minute lake would otherwise pay a ~43k-entry
  *     listStatus per streaming trigger poll);
  *   - the hint is ADVISORY: stale, regressed, missing, corrupt, and
  *     ahead-of-head hints all still resolve the true head (forward
  *     probing over dense versions, full-listing fallback);
  *   - concurrent writers racing commits + hint writes lose nothing:
  *     the hint rides AFTER the fail-if-exists publish, so a racy
  *     hint can only lag, never invent a version;
  *   - the capped streaming admission walk stays listing-free for
  *     small windows.
  * The 20k-commit soak (SCALING.md §r16) measures the flat per-poll
  * cost this spec pins the mechanism of. */
class LogCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkBase() = Seq(
    (1L, 10L, ts("2024-01-01 23:59:00"), "click", 1.0),
    (2L, 20L, ts("2024-01-02 10:00:00"), "click", 1.0))
    .toDF("user_id", "event_id", "ts", "event_type", "value")

  private def row(id: Long) =
    Seq((9L, id, ts("2024-01-03 09:00:00"), "click", 2.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")

  private def hintPath(dir: String) =
    new Path(dir, "_graft_log/_head_hint")

  private def fs(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeHint(dir: String, v: String): Unit = {
    val out = fs(dir).create(hintPath(dir), true)
    try out.write(v.getBytes("UTF-8")) finally out.close()
  }

  test("steady-state head resolution: zero listings, ≤2 probes; snapshot too") {
    val dir = Files.createTempDirectory("graft_hint_steady").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.append(spark, dir, row(100L), "ts")
    ManifestLake.append(spark, dir, row(101L), "ts")
    ManifestLake.LogMetrics.reset()
    assert(ManifestLake.headVersion(spark, dir) == 3L)
    assert(ManifestLake.LogMetrics.listings.get() == 0L,
      s"head resolution listed the log dir " +
        s"(${ManifestLake.LogMetrics.listings.get()} listings)")
    assert(ManifestLake.LogMetrics.probes.get() <= 2L,
      s"${ManifestLake.LogMetrics.probes.get()} probes for a fresh hint")
    ManifestLake.LogMetrics.reset()
    assert(ManifestLake.snapshot(spark, dir).version == 3L)
    assert(ManifestLake.LogMetrics.listings.get() == 0L,
      "snapshot() fell back to the full listing under a fresh hint")
  }

  test("stale and regressed hints resolve the true head by forward probing") {
    val dir = Files.createTempDirectory("graft_hint_stale").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    (0 until 4).foreach(i => ManifestLake.append(spark, dir, row(200L + i), "ts"))
    writeHint(dir, "2") // a lagging writer's racy last write
    ManifestLake.LogMetrics.reset()
    assert(ManifestLake.headVersion(spark, dir) == 5L)
    assert(ManifestLake.LogMetrics.listings.get() == 0L,
      "a stale hint should cost probes, not a listing")
  }

  test("missing, corrupt, and ahead-of-head hints fall back to the full listing") {
    val dir = Files.createTempDirectory("graft_hint_bad").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.append(spark, dir, row(300L), "ts")
    fs(dir).delete(hintPath(dir), false) // pre-hint lake
    assert(ManifestLake.headVersion(spark, dir) == 2L)
    writeHint(dir, "not-a-number")
    assert(ManifestLake.headVersion(spark, dir) == 2L)
    writeHint(dir, "99") // no manifest 99: corrupt/foreign pointer
    assert(ManifestLake.headVersion(spark, dir) == 2L)
    // the next commit self-heals the hint
    ManifestLake.append(spark, dir, row(301L), "ts")
    ManifestLake.LogMetrics.reset()
    assert(ManifestLake.headVersion(spark, dir) == 3L)
    assert(ManifestLake.LogMetrics.listings.get() == 0L, "hint did not self-heal")
  }

  test("racing writers: hint never invents a version, and every commit stays resolvable") {
    val dir = Files.createTempDirectory("graft_hint_race").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val futs = (0 until 8).map { i =>
      scala.concurrent.Future {
        // a writer that exhausts its bounded rebases re-runs from a
        // fresh snapshot — the documented remedy (OccSpec's stress
        // convention); the assertion is system-level exactly-once
        var landed = false
        while (!landed) {
          try { ManifestLake.append(spark, dir, row(400L + i), "ts")
            landed = true }
          catch { case _: java.util.ConcurrentModificationException => () }
        }
      }
    }
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futs),
      scala.concurrent.duration.Duration.Inf)
    finally pool.shutdown()
    // all 8 appends committed: head = 9, and the hint-resolved head
    // equals the listing-resolved head (no invented, no lost version)
    val byHint = ManifestLake.headVersion(spark, dir)
    assert(byHint == 9L, s"head $byHint after 8 racing appends")
    fs(dir).delete(hintPath(dir), false)
    assert(ManifestLake.headVersion(spark, dir) == byHint)
    assert(ManifestLake.read(spark, dir).count() == 10L)
  }

  test("vacuum interplay: expiry keeps the hint valid (prefix-only), resolution stays listing-free") {
    val dir = Files.createTempDirectory("graft_hint_vac").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    (0 until 3).foreach(i => ManifestLake.append(spark, dir, row(600L + i), "ts"))
    // force-expire everything but the latest: the expired set is a
    // PREFIX, so density above the hint (== head) is untouched
    ManifestLake.vacuum(spark, dir, retentionMs = 0L, force = true)
    ManifestLake.LogMetrics.reset()
    assert(ManifestLake.headVersion(spark, dir) == 4L)
    assert(ManifestLake.LogMetrics.listings.get() == 0L,
      "post-vacuum head resolution fell back to the listing")
    assert(ManifestLake.read(spark, dir).count() == 5L)
    // and a commit after the vacuum keeps the floor rolling
    ManifestLake.append(spark, dir, row(699L), "ts")
    ManifestLake.LogMetrics.reset()
    assert(ManifestLake.headVersion(spark, dir) == 5L &&
      ManifestLake.LogMetrics.listings.get() == 0L)
  }

  test("capped streaming admission: small-window target walk pays zero listings") {
    val dir = Files.createTempDirectory("graft_hint_cap").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    (0 until 3).foreach(i => ManifestLake.append(spark, dir, row(500L + i), "ts"))
    ManifestLake.LogMetrics.reset()
    val target = ManifestLake.cappedStreamTarget(spark, dir, 1L, 4L, Some(1))
    assert(target == 2L, s"cap=1 dir should admit exactly one commit, got $target")
    assert(ManifestLake.LogMetrics.listings.get() == 0L,
      "small-window admission walk listed the log dir")
  }
}
