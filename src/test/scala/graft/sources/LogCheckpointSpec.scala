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

  // ---- in-commit timestamps (r17, VERDICT r16 #2: the `#ts` header,
  // running-max enforced at commit and mirrored onto the manifest
  // mtime) ----

  private def manifestFile(dir: String, v: Long) =
    new java.io.File(dir, f"_graft_log/$v%08d.manifest")

  private def manifestLines(dir: String, v: Long): Seq[String] = {
    val src = scala.io.Source.fromFile(manifestFile(dir, v), "UTF-8")
    try src.getLines().toVector finally src.close()
  }

  private def stampOf(dir: String, v: Long): Long =
    manifestLines(dir, v).collectFirst {
      case l if l.startsWith("#ts\t") => l.stripPrefix("#ts\t").toLong
    }.getOrElse(fail(s"manifest $v carries no #ts stamp"))

  /** Turn manifest v into a PRE-STAMP one: drop the #ts line and
    * restore the mtime to the old stamp, so the listing tier resolves
    * the same instant — only the zero-listing tier loses it. */
  private def stripStamp(dir: String, v: Long): Unit = {
    val orig = stampOf(dir, v)
    val f = manifestFile(dir, v)
    java.nio.file.Files.writeString(f.toPath,
      manifestLines(dir, v).filterNot(_.startsWith("#ts\t"))
        .mkString("\n"))
    assert(f.setLastModified(orig), "test fs refused setLastModified")
  }

  /** Overwrite manifest v's stamp (and its mtime mirror) — the
    * skewed-clock writer simulation. */
  private def setStamp(dir: String, v: Long, t: Long): Unit = {
    val f = manifestFile(dir, v)
    java.nio.file.Files.writeString(f.toPath,
      manifestLines(dir, v).map(l =>
        if (l.startsWith("#ts\t")) s"#ts\t$t" else l).mkString("\n"))
    assert(f.setLastModified(t), "test fs refused setLastModified")
  }

  private def histStamps(dir: String): Map[Long, Long] =
    ManifestLake.history(spark, dir)
      .select("version", "committed_at").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap

  private def feedStamps(dir: String, fromV: Long,
      toV: Long): Map[Long, Long] =
    ManifestLake.readChangesPerCommit(spark, dir, fromV, toV)
      .select("_commit_version", "_commit_timestamp").distinct()
      .collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).getTime).toMap

  test("in-commit stamps: a stamped CDF window pays zero listings; stamps ≡ history ≡ versionAt") {
    val dir = Files.createTempDirectory("graft_ts_stamped").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    (0 until 3).foreach(i =>
      ManifestLake.append(spark, dir, row(700L + i), "ts"))
    ManifestLake.LogMetrics.reset()
    val feed = feedStamps(dir, 1L, 4L)
    assert(ManifestLake.LogMetrics.listings.get() == 0L,
      s"stamped CDF window listed the log " +
        s"(${ManifestLake.LogMetrics.listings.get()}×)")
    val hist = histStamps(dir)
    (2L to 4L).foreach(v => assert(feed(v) == hist(v),
      s"v$v: feed ${feed(v)} != history ${hist(v)}"))
    // strictly increasing, and every displayed instant round-trips
    // through versionAt to exactly its version (the l_asof_travel
    // resolution contract, now stamp-backed)
    val ordered = hist.toSeq.sortBy(_._1).map(_._2)
    assert(ordered == ordered.sorted && ordered.distinct.size ==
      ordered.size, s"history stamps not strictly increasing: $hist")
    hist.foreach { case (v, t) =>
      assert(ManifestLake.versionAt(spark, dir,
        new java.sql.Timestamp(t)) == v)
    }
    // and the raw #ts headers ARE those instants (mtime mirror held)
    (1L to 4L).foreach(v => assert(stampOf(dir, v) == hist(v)))
  }

  test("mixed old/new logs: a pre-stamp manifest in the window falls back to ONE listing, identical stamps") {
    val dir = Files.createTempDirectory("graft_ts_mixed").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    (0 until 3).foreach(i =>
      ManifestLake.append(spark, dir, row(710L + i), "ts"))
    val before = histStamps(dir)
    stripStamp(dir, 2L) // v2 becomes a pre-stamp manifest
    ManifestLake.LogMetrics.reset()
    val feed = feedStamps(dir, 1L, 4L)
    assert(ManifestLake.LogMetrics.listings.get() >= 1L,
      "a mixed window must take the listing fallback")
    val hist = histStamps(dir)
    assert(hist == before,
      s"stripping a stamp changed the resolved instants: $hist vs $before")
    (2L to 4L).foreach(v => assert(feed(v) == hist(v),
      s"v$v: mixed-window feed ${feed(v)} != history ${hist(v)}"))
    hist.foreach { case (v, t) =>
      assert(ManifestLake.versionAt(spark, dir,
        new java.sql.Timestamp(t)) == v)
    }
  }

  test("running-max enforcement: a future-stamped parent cannot regress the next commit's stamp") {
    val dir = Files.createTempDirectory("graft_ts_skew").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.append(spark, dir, row(720L), "ts") // v2
    val future = System.currentTimeMillis() + 3600L * 1000
    setStamp(dir, 2L, future) // a writer with a fast clock committed v2
    ManifestLake.append(spark, dir, row(721L), "ts") // v3: must not regress
    assert(stampOf(dir, 3L) == future + 1L,
      s"v3 stamp ${stampOf(dir, 3L)} != parent+1 (${future + 1L})")
    val hist = histStamps(dir)
    assert(hist(2L) == future && hist(3L) == future + 1L)
    ManifestLake.LogMetrics.reset()
    val feed = feedStamps(dir, 2L, 3L)
    assert(feed(3L) == future + 1L &&
      ManifestLake.LogMetrics.listings.get() == 0L)
  }

  test("CDF-mode trigger loop over stamped history: zero log listings end-to-end") {
    val dir = Files.createTempDirectory("graft_ts_cdftrig").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    (0 until 3).foreach(i =>
      ManifestLake.append(spark, dir, row(800L + i), "ts"))
    val cp = Files.createTempDirectory("graft_ts_cdftrig_cp").toString
    val n = new java.util.concurrent.atomic.AtomicLong(0L)
    ManifestLake.LogMetrics.reset()
    val q = ManifestLake.changeStream(spark, dir, readChangeFeed = true)
      .writeStream.option("checkpointLocation", cp)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        n.addAndGet(df.count()); ()
      }.start()
    try {
      q.processAllAvailable()
      // live commits between triggers — the steady tail of the loop
      // (each append itself resolves its parent stamp from ONE
      // manifest read, listing-free)
      ManifestLake.append(spark, dir, row(900L), "ts")
      q.processAllAvailable()
      ManifestLake.append(spark, dir, row(901L), "ts")
      q.processAllAvailable()
    } finally q.stop()
    assert(n.get() == 7L, s"expected 7 feed rows, got ${n.get()}")
    assert(ManifestLake.LogMetrics.listings.get() == 0L,
      s"the CDF trigger loop listed the log " +
        s"${ManifestLake.LogMetrics.listings.get()}× (VERDICT r16 #2's " +
        "zero-listing contract)")
  }
}
