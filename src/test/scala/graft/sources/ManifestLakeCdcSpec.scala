package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The net-effect change feed (readChanges) and the exactly-once
  * incremental mirror built on it (replicateOnce). The contracts
  * pinned here:
  *   - changes are computed from the MANIFESTS day-by-day: untouched
  *     days contribute zero IO, append-only days are read without any
  *     diff shuffle, and a rewritten-but-identical row never appears
  *     in the feed;
  *   - an update surfaces as its delete+insert pair, a takedown as
  *     deletes, a compaction as nothing;
  *   - the mirror applies each source version window exactly once
  *     (cursor committed atomically WITH the data), converges across
  *     mid-commit crashes, and refuses a rewritten source instead of
  *     silently duplicating it.
  * The oracled twin is l_cdf (LakeOps): the same feed hash-compared
  * against DuckDB's EXCEPT ALL diff of the two snapshot states. */
class ManifestLakeCdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkBase() = Seq(
    (1L, 10L, ts("2024-01-01 23:59:00"), "click", 1.0),
    (2L, 20L, ts("2024-01-02 10:00:00"), "click", 1.0),
    (3L, 30L, ts("2024-01-02 11:00:00"), "click", 1.0),
    (4L, 40L, ts("2024-01-03 09:00:00"), "click", 1.0))
    .toDF("user_id", "event_id", "ts", "event_type", "value")

  private def changeSet(dir: String, fromV: Long, toV: Long) =
    ManifestLake.readChanges(spark, dir, fromV, toV)
      .select("_change_type", "user_id", "event_id", "event_type", "value", "day")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))
      .toSet

  test("seed read: changes from version 0 are the full snapshot as inserts") {
    val dir = Files.createTempDirectory("graft_cdc_seed").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val ch = changeSet(dir, 0L, 1L)
    assert(ch.size == 4 && ch.forall(_._1 == "insert"), ch)
  }

  test("append window: inserts only, and ONLY the appended generation is read") {
    val dir = Files.createTempDirectory("graft_cdc_app").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val b = Seq((11L, 101L, ts("2024-01-02 12:00:00"), "click", 7.0),
      (12L, 102L, ts("2024-01-04 09:00:00"), "click", 8.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L)
    val ch = changeSet(dir, 1L, 2L)
    assert(ch == Set(
      ("insert", 11L, 101L, "click", 7.0, "2024-01-02"),
      ("insert", 12L, 102L, "click", 8.0, "2024-01-04")), ch)
    // append fast path: the feed's scan opens nothing from gen 1 —
    // existing data is never re-read to compute an append window
    val gen1Dirs = ManifestLake.readVersion(spark, dir, 1L)
      .inputFiles.filter(_.contains("/data/")).map(_.split("/data/")(1)
        .split('/').head).toSet
    val opened = ManifestLake.readChanges(spark, dir, 1L, 2L)
      .inputFiles.filter(_.contains("/data/"))
    assert(opened.nonEmpty &&
      opened.forall(f => !gen1Dirs.exists(g => f.contains(s"/data/$g/"))),
      s"append window re-read the base generation: ${opened.mkString(",")}")
  }

  test("upsert window: delete+insert pair for the changed key, nothing for rewritten-identical rows, zero IO for untouched days") {
    val dir = Files.createTempDirectory("graft_cdc_ups").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    // rewrites day 2 (key 20 updated; key 30 rewritten identically)
    val upd = Seq((2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, dir, upd, Seq("user_id", "event_id"), "ts")
    val ch = changeSet(dir, 1L, 2L)
    assert(ch == Set(
      ("delete", 2L, 20L, "click", 1.0, "2024-01-02"),
      ("insert", 2L, 20L, "purchase", 3.0, "2024-01-02")), ch)
    // day-level skip: days 1 and 3 were untouched — their directories
    // must not appear in the feed's scan at all
    val opened = ManifestLake.readChanges(spark, dir, 1L, 2L)
      .inputFiles.filter(_.contains("/data/"))
    assert(opened.nonEmpty && opened.forall(_.contains("pday=2024-01-02")),
      s"untouched days were read: ${opened.mkString(",")}")
  }

  test("takedown window: deletes only; a drained day's rows all surface") {
    val dir = Files.createTempDirectory("graft_cdc_del").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.deleteWhere(spark, dir, col("day") === "2024-01-02")
    val ch = changeSet(dir, 1L, 2L)
    assert(ch == Set(
      ("delete", 2L, 20L, "click", 1.0, "2024-01-02"),
      ("delete", 3L, 30L, "click", 1.0, "2024-01-02")), ch)
  }

  test("compaction nets to zero changes; cross-window net effect collapses") {
    val dir = Files.createTempDirectory("graft_cdc_net").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val b = Seq((11L, 101L, ts("2024-01-02 12:00:00"), "click", 7.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L) // v2
    ManifestLake.compactDay(spark, dir, "2024-01-02") // v3
    assert(changeSet(dir, 2L, 3L).isEmpty, "compaction leaked into the feed")
    // v1→v3 net effect: just the appended row (the compaction rewrite
    // of day 2 cancels row-for-row in the diff)
    assert(changeSet(dir, 1L, 3L) ==
      Set(("insert", 11L, 101L, "click", 7.0, "2024-01-02")))
    // insert-then-delete within one window nets out: v1 and v4 hold
    // the same rows, so the feed across them is empty — while the
    // narrower v2→v4 window correctly reports the delete of the row
    // that existed at its start
    ManifestLake.deleteWhere(spark, dir, col("event_id") === 101L) // v4
    assert(changeSet(dir, 1L, 4L).isEmpty,
      "a row appended and deleted inside the window must cancel")
    assert(changeSet(dir, 2L, 4L) ==
      Set(("delete", 11L, 101L, "click", 7.0, "2024-01-02")))
  }

  test("per-commit feed (r15): intra-window changes do NOT cancel, " +
      "each row names its commit, stamps ≡ history(), compaction " +
      "steps contribute nothing") {
    val dir = Files.createTempDirectory("graft_cdc_pc").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")                 // v1
    val b = Seq((11L, 101L, ts("2024-01-02 12:00:00"), "click", 7.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L)     // v2
    ManifestLake.compactDay(spark, dir, "2024-01-02")               // v3
    ManifestLake.deleteWhere(spark, dir, col("event_id") === 101L)  // v4
    val pc = ManifestLake.readChangesPerCommit(spark, dir, 1L, 4L)
      .select("_change_type", "event_id", "_commit_version",
        "_commit_timestamp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3)))
    // the NET feed over the same window is EMPTY (spec above); the
    // per-commit feed reports both sides with attribution instead
    assert(pc.map(r => (r._1, r._2, r._3)).toSet == Set(
      ("insert", 101L, 2L), ("delete", 101L, 4L)), pc.toSeq)
    // v3 (pure compaction) truly contributes zero rows
    assert(!pc.exists(_._3 == 3L))
    // _commit_timestamp is the adjusted monotone stamp history()
    // displays — the instant readAsOf resolves back to that version
    val hist = ManifestLake.history(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getTimestamp(2)).toMap
    assert(pc.forall(r => hist(r._3) == r._4), pc.toSeq)
    // empty window: zero rows, full feed schema
    val empty = ManifestLake.readChangesPerCommit(spark, dir, 4L, 4L)
    assert(empty.count() == 0L &&
      empty.columns.takeRight(3).toSeq ==
        Seq("_change_type", "_commit_version", "_commit_timestamp"))
  }

  test("schema evolution across the window: old-side rows read the new column as NULL") {
    val dir = Files.createTempDirectory("graft_cdc_schema").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val extra = Seq((9L, 90L, ts("2024-01-05 08:00:00"), "click", 1.0, "eu-w1"))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "region")
    ManifestLake.appendBatch(spark, dir, extra, "ts", batchId = 0L)
    val ch = ManifestLake.readChanges(spark, dir, 1L, 2L)
    assert(ch.columns.contains("region"))
    assert(ch.count() == 1)
    assert(ch.head().getAs[String]("region") == "eu-w1")
  }

  test("legacy (pre-checkpoint) manifests: a feed window spanning a column add still diffs, old side reads NULL") {
    val dir = Files.createTempDirectory("graft_cdc_legacy").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    // evolve: append a batch carrying a NEW column (v2), then rewrite
    // a day (v3) so the diff path must read old and new sides
    val extra = Seq((9L, 90L, ts("2024-01-02 12:00:00"), "click", 1.0, "eu-w1"))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "region")
    ManifestLake.appendBatch(spark, dir, extra, "ts", batchId = 0L)
    val upd = Seq((2L, 20L, ts("2024-01-02 13:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, dir, upd, Seq("user_id", "event_id"), "ts")
    // devolve EVERY manifest to the pre-checkpoint format
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (1L to 3L).foreach { v =>
      val mf = new org.apache.hadoop.fs.Path(f"$dir/_graft_log/$v%08d.manifest")
      val txt = {
        val in = fs.open(mf)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      val out = fs.create(mf, true)
      try out.write(txt.split('\n').filterNot(_.startsWith("#schema"))
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
    }
    assert(ManifestLake.snapshot(spark, dir).schemaJson.isEmpty)
    // the diff window crosses the column add AND the rewrite: both
    // sides must resolve ONE union schema (old files read region as
    // NULL) instead of failing exceptAll on a column-count mismatch
    val ch = ManifestLake.readChanges(spark, dir, 1L, 3L)
      .select("_change_type", "event_id", "event_type", "region").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(ch == Set(
      ("insert", 90L, "click", Some("eu-w1")),
      ("insert", 20L, "purchase", None),
      ("delete", 20L, "click", None)), ch)
  }

  test("pollChanges/ackChanges: at-least-once consumption — unacked windows re-deliver, acked advance") {
    val dir = Files.createTempDirectory("graft_cdc_poll").toString
    val cursor = s"${Files.createTempDirectory("graft_cdc_cur")}/cursor"
    ManifestLake.create(spark, dir, mkBase(), "ts")
    // first poll bootstraps: full snapshot as inserts, window (0, 1]
    val Some((w1, f1, t1)) = ManifestLake.pollChanges(spark, dir, cursor)
    assert((f1, t1) == ((0L, 1L)))
    assert(w1.count() == 4 &&
      w1.filter(col("_change_type") =!= "insert").count() == 0)
    // CRASH before ack (processing not durable): the SAME window
    // re-delivers — at-least-once, never a lost window
    val Some((w1b, f1b, t1b)) = ManifestLake.pollChanges(spark, dir, cursor)
    assert((f1b, t1b) == ((0L, 1L)) && w1b.count() == 4, "unacked window lost")
    ManifestLake.ackChanges(spark, cursor, t1)
    assert(ManifestLake.pollChanges(spark, dir, cursor).isEmpty, "caught up")
    // a mutation opens the next window: the upsert's delete+insert pair
    val upd = Seq((2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, dir, upd, Seq("event_id"), "ts")
    val Some((w2, f2, t2)) = ManifestLake.pollChanges(spark, dir, cursor)
    assert((f2, t2) == ((1L, 2L)))
    val types = w2.filter(col("event_id") === 20L)
      .select("_change_type").collect().map(_.getString(0)).sorted.toSeq
    assert(types == Seq("delete", "insert"), types)
    ManifestLake.ackChanges(spark, cursor, t2)
    // two source commits between polls collapse into ONE net window
    ManifestLake.deleteWhere(spark, dir, col("event_id") === 30L)
    ManifestLake.deleteWhere(spark, dir, col("event_id") === 40L)
    val Some((w3, _, t3)) = ManifestLake.pollChanges(spark, dir, cursor)
    assert(t3 == 4L)
    assert(w3.filter(col("_change_type") === "delete").count() == 2)
    ManifestLake.ackChanges(spark, cursor, t3)
    assert(ManifestLake.pollChanges(spark, dir, cursor).isEmpty)
  }

  test("incremental MV: folding each version window's deltas into the aggregate equals recompute at EVERY version") {
    // the l_incr_mv contract exercised version-BY-version (the oracle
    // covers one 1→head window; this drives the fold through a mixed
    // append/upsert/DV/takedown history where each step must land
    // exactly on the from-scratch aggregate of that snapshot)
    val dir = Files.createTempDirectory("graft_cdc_mv").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")                    // v1
    ManifestLake.appendBatch(spark, dir, Seq(
      (1L, 50L, ts("2024-01-02 12:00:00"), "click", 2.5),
      (5L, 60L, ts("2024-01-04 09:00:00"), "click", 4.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value"),
      "ts", batchId = 0L)                                              // v2
    ManifestLake.upsert(spark, dir, Seq(
      (2L, 20L, ts("2024-01-02 13:00:00"), "purchase", 9.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value"),
      Seq("user_id", "event_id"), "ts")                                // v3
    ManifestLake.deleteWhereDV(spark, dir, col("user_id") === 1L)      // v4
    ManifestLake.deleteWhere(spark, dir, col("day") === "2024-01-03")  // v5

    def aggOf(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.groupBy("user_id")
        .agg(count(lit(1)).as("cnt"),
          coalesce(sum(graft.operators.ExactNum.cents(col("value"))), lit(0L))
            .as("units"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    var mv = aggOf(ManifestLake.readVersion(spark, dir, 1L))
    val head = ManifestLake.snapshot(spark, dir).version
    (1L until head).foreach { v =>
      val delta = ManifestLake.readChanges(spark, dir, v, v + 1)
        .select(col("user_id"),
          when(col("_change_type") === "insert", 1L).otherwise(-1L).as("sgn"),
          graft.operators.ExactNum.cents(col("value")).as("cents"))
        .groupBy("user_id")
        .agg(sum(col("sgn")).as("d"),
          coalesce(sum(col("sgn") * col("cents")), lit(0L)).as("du"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      mv = (mv.keySet ++ delta.keySet).flatMap { k =>
        val (c0, u0) = mv.getOrElse(k, (0L, 0L))
        val (dc, du) = delta.getOrElse(k, (0L, 0L))
        if (c0 + dc > 0) Some(k -> (c0 + dc, u0 + du)) else None
      }.toMap
      val expect = aggOf(ManifestLake.readVersion(spark, dir, v + 1))
      assert(mv == expect, s"MV drifted from recompute at v${v + 1}: " +
        s"mv=$mv expect=$expect")
    }
    assert(head == 5L && mv.contains(5L) && !mv.contains(4L),
      s"history shape drifted: head=$head mv=$mv")
  }

  test("replicateOnce: incremental mirror converges, replays are no-ops, crash mid-commit is exactly-once") {
    val src = Files.createTempDirectory("graft_cdc_src").toString
    val dst = Files.createTempDirectory("graft_cdc_dst").toString + "/mirror"
    ManifestLake.create(spark, src, mkBase(), "ts")
    def table(d: String) = ManifestLake.read(spark, d)
      .select("user_id", "event_id", "ts", "event_type", "value", "day")
      .collect().map(_.toString).sorted.toSeq

    // seed: the full snapshot arrives as the first batch
    ManifestLake.replicateOnce(spark, src, dst, "ts")
    assert(table(dst) == table(src))
    // caught up: version unchanged, no empty commits
    val v = ManifestLake.snapshot(spark, dst).version
    assert(ManifestLake.replicateOnce(spark, src, dst, "ts") == v)
    assert(ManifestLake.snapshot(spark, dst).version == v)

    // two source appends, one replication round carries both
    val b0 = Seq((11L, 101L, ts("2024-01-02 12:00:00"), "click", 7.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val b1 = Seq((12L, 102L, ts("2024-01-04 09:00:00"), "click", 8.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, src, b0, "ts", batchId = 0L)
    ManifestLake.appendBatch(spark, src, b1, "ts", batchId = 1L)

    // crash between the mirror's data write and its cursor commit:
    // nothing lands…
    intercept[RuntimeException] {
      ManifestLake.replicateOnce(spark, src, dst, "ts",
        beforeCommit = () => throw new RuntimeException("kill -9"))
    }
    assert(ManifestLake.read(spark, dst).count() == 4, "crashed round leaked")
    // …and the re-run applies the window exactly once
    ManifestLake.replicateOnce(spark, src, dst, "ts")
    assert(table(dst) == table(src))
    assert(ManifestLake.read(spark, dst).count() == 6)
  }

  test("mirror backpressure: maxDirsPerRound chunks a lagging catch-up into bounded exactly-once rounds") {
    val src = Files.createTempDirectory("graft_cdc_bp_src").toString
    val dst = Files.createTempDirectory("graft_cdc_bp_dst").toString + "/m"
    // v1 = 1 dir (one day), then four appends on four fresh days —
    // 5 commits, 5 dirs, a mirror that never ran is 5 dirs behind
    ManifestLake.create(spark, src,
      Seq((1L, 10L, ts("2024-01-01 12:00:00"), "click", 1.0))
        .toDF("user_id", "event_id", "ts", "event_type", "value"), "ts")
    (0 until 4).foreach { i =>
      val b = Seq((10L + i, 100L + i,
        ts(f"2024-01-${2 + i}%02d 12:00:00"), "click", 1.0))
        .toDF("user_id", "event_id", "ts", "event_type", "value")
      ManifestLake.appendBatch(spark, src, b, "ts", batchId = i.toLong)
    }
    def round(): Long = ManifestLake.replicateOnce(spark, src, dst, "ts",
      maxDirsPerRound = 2)
    def dstRows() = ManifestLake.read(spark, dst).count()
    def cursor() = ManifestLake.snapshot(spark, dst).lastBatch
    round() // ≤ 2 dirs: src v1 (1 dir) + v2 (1 more) = exactly the budget
    assert(dstRows() == 2 && cursor() == 2L, s"${dstRows()} rows @ ${cursor()}")
    round()
    assert(dstRows() == 4 && cursor() == 4L, s"${dstRows()} rows @ ${cursor()}")
    round() // the 1-dir tail
    assert(dstRows() == 5 && cursor() == 5L)
    round() // caught up: no-op, cursor stays
    assert(dstRows() == 5 && cursor() == 5L)
    assert(ManifestLake.read(spark, dst).select("event_id").collect()
      .map(_.getLong(0)).toSet ==
      ManifestLake.read(spark, src).select("event_id").collect()
        .map(_.getLong(0)).toSet)
    // atomicity floor: ONE commit carrying 3 days (3 dirs > budget 2)
    // still lands whole — per-commit atomicity beats the budget,
    // exactly like maxFilesPerTrigger admitting one oversized file
    val wide = Seq.tabulate(3)(i => (50L + i, 500L + i,
      ts(f"2024-02-${1 + i}%02d 12:00:00"), "click", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, src, wide, "ts", batchId = 9L)
    round()
    assert(dstRows() == 8 && cursor() == 6L, s"${dstRows()} rows @ ${cursor()}")
  }

  test("mirrorStream: a live streaming query keeps the mirror converged; restart resumes from the mirror's own cursor") {
    val src = Files.createTempDirectory("graft_cdc_ms_src").toString
    val dst = Files.createTempDirectory("graft_cdc_ms_dst").toString + "/m"
    val cp = Files.createTempDirectory("graft_cdc_ms_cp").toString
    ManifestLake.create(spark, src, mkBase(), "ts")
    def rows(d: String): Long =
      try ManifestLake.read(spark, d).count() catch { case _: Throwable => -1L }
    def awaitRows(n: Long): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (rows(dst) != n && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(rows(dst) == n, s"mirror stuck at ${rows(dst)}, want $n")
    }
    val q = ManifestLake.mirrorStream(spark, src, dst, "ts", cp,
      intervalMs = 200L)
    try {
      awaitRows(4) // seed round
      val b = Seq((11L, 101L, ts("2024-01-04 12:00:00"), "click", 7.0))
        .toDF("user_id", "event_id", "ts", "event_type", "value")
      ManifestLake.appendBatch(spark, src, b, "ts", batchId = 0L)
      awaitRows(5) // caught the append
    } finally q.stop()
    // restart with a FRESH checkpoint: the rate offsets are gone but
    // exactly-once never lived there — the mirror's own cursor is in
    // its commit log, so nothing replays and new appends still flow
    val cp2 = Files.createTempDirectory("graft_cdc_ms_cp2").toString
    val b2 = Seq((12L, 102L, ts("2024-01-05 09:00:00"), "click", 8.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, src, b2, "ts", batchId = 1L)
    val q2 = ManifestLake.mirrorStream(spark, src, dst, "ts", cp2,
      intervalMs = 200L)
    try awaitRows(6) finally q2.stop()
    assert(ManifestLake.read(spark, dst).select("event_id").collect()
      .map(_.getLong(0)).toSet ==
      Set(10L, 20L, 30L, 40L, 101L, 102L))
  }

  test("replicateOnce: a rewritten source day is refused, never silently duplicated") {
    val src = Files.createTempDirectory("graft_cdc_rw_src").toString
    val dst = Files.createTempDirectory("graft_cdc_rw_dst").toString + "/mirror"
    ManifestLake.create(spark, src, mkBase(), "ts")
    ManifestLake.replicateOnce(spark, src, dst, "ts")
    val upd = Seq((2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, src, upd, Seq("user_id", "event_id"), "ts")
    val e = intercept[IllegalStateException] {
      ManifestLake.replicateOnce(spark, src, dst, "ts")
    }
    assert(e.getMessage.contains("rewritten"), e.getMessage)
    // the mirror is intact at its pre-refusal state
    assert(ManifestLake.read(spark, dst).count() == 4)

    // the skipChangeCommits analog: skipRewrites advances PAST the
    // rewritten day without emitting it (knowing divergence), and
    // subsequent appends flow again
    ManifestLake.replicateOnce(spark, src, dst, "ts", skipRewrites = true)
    assert(ManifestLake.read(spark, dst).count() == 4, "rewrite leaked")
    val b = Seq((11L, 101L, ts("2024-01-04 12:00:00"), "click", 7.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, src, b, "ts", batchId = 0L)
    ManifestLake.replicateOnce(spark, src, dst, "ts")
    assert(ManifestLake.read(spark, dst).count() == 5,
      "appends after a skipped rewrite did not replicate")
    assert(ManifestLake.read(spark, dst)
      .filter(col("event_id") === 101L).count() == 1)
  }

  test("update images (r16): paired delete+insert retag as update_pre/postimage; unpaired keep plain types") {
    val dir = Files.createTempDirectory("graft_cdc_upd_img").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    // ONE upsert commit: key 20 updated (pair), key 55 brand-new
    // (unpaired insert) — v2
    val batch = Seq(
      (2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0),
      (5L, 55L, ts("2024-01-05 08:00:00"), "click", 9.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, dir, batch, Seq("event_id"), "ts")
    ManifestLake.deleteWhere(spark, dir, col("event_id") === 40L) // v3
    val feed = ManifestLake.readChangesPerCommit(spark, dir, 1L, 3L,
        updateKeys = Seq("event_id"))
      .select("_commit_version", "_change_type", "event_id", "event_type",
        "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))
      .toSet
    assert(feed == Set(
      (2L, "update_preimage", 20L, "click", 1.0),
      (2L, "update_postimage", 20L, "purchase", 3.0),
      (2L, "insert", 55L, "click", 9.0),
      (3L, "delete", 40L, "click", 1.0)), feed)
    // pairing is PER COMMIT: the same key deleted in a LATER commit
    // must not pair with its v2 insert across commits
    ManifestLake.deleteWhere(spark, dir, col("event_id") === 55L) // v4
    val later = ManifestLake.readChangesPerCommit(spark, dir, 3L, 4L,
        updateKeys = Seq("event_id"))
      .select("_change_type").collect().map(_.getString(0)).toSet
    assert(later == Set("delete"), later)
  }

  test("per-commit window spanning an additive schema change NULL-fills under toV's schema (ADVICE r15 #1)") {
    val dir = Files.createTempDirectory("graft_cdc_evo").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.addColumns(spark, dir, // v2: metadata-only ADD
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("score",
          org.apache.spark.sql.types.DoubleType))))
    val b = Seq((11L, 101L, ts("2024-01-04 12:00:00"), "click", 7.0, 0.5))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "score")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L) // v3
    val feed = ManifestLake.readChangesPerCommit(spark, dir, 0L, 3L)
    // window schema = toV's column ORDER (plus the feed tags)
    val head = ManifestLake.read(spark, dir).columns
    assert(feed.columns.toSeq ==
      head.toSeq ++ Seq("_change_type", "_commit_version",
        "_commit_timestamp"), feed.columns.mkString(","))
    // pre-add steps read score as NULL; the post-add append carries it
    val rows = feed.select("_commit_version", "event_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)))).toSet
    assert(rows.contains((3L, 101L, Some(0.5))), rows)
    assert(rows.filter(_._1 == 1L).forall(_._3.isEmpty), rows)
  }

  test("per-commit window spanning a rename refuses with the split-window remedy") {
    val dir = Files.createTempDirectory("graft_cdc_ren").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.renameColumn(spark, dir, "value", "score") // v2
    val b = Seq((11L, 101L, ts("2024-01-04 12:00:00"), "click", 7.0))
      .toDF("user_id", "event_id", "ts", "event_type", "score")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L) // v3
    val e = intercept[IllegalStateException] {
      ManifestLake.readChangesPerCommit(spark, dir, 0L, 3L).collect()
    }
    assert(e.getMessage.contains("rename"), e.getMessage)
    // sub-windows split at the rename commit still walk clean
    assert(ManifestLake.readChangesPerCommit(spark, dir, 0L, 1L)
      .count() == 4)
    assert(ManifestLake.readChangesPerCommit(spark, dir, 2L, 3L)
      .count() == 1)
  }
}
