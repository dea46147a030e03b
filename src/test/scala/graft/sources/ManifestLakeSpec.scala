package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cross-partition atomicity contract (VERDICT r10 #2): a merge
  * or takedown that dies between writing its new data and committing
  * its manifest leaves readers on the wholly-OLD snapshot for every
  * day; after the commit they see the wholly-new one; no interleaving
  * exists. LakeLayoutSpec's crash tests prove per-day atomicity and
  * convergence under the directory layout; this suite proves the
  * stronger all-or-nothing the manifest buys. */
class ManifestLakeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkBase() = Seq(
    (1L, 10L, ts("2024-01-01 23:59:00"), "click", 1.0),
    (2L, 20L, ts("2024-01-02 10:00:00"), "click", 1.0),
    (3L, 30L, ts("2024-01-02 11:00:00"), "click", 1.0),
    (4L, 40L, ts("2024-01-03 09:00:00"), "click", 1.0))
    .toDF("user_id", "event_id", "ts", "event_type", "value")

  private def content(dir: String): Seq[String] =
    ManifestLake.read(spark, dir)
      .select("user_id", "event_id", "ts", "event_type", "value", "day")
      .collect().map(_.toString).sorted.toSeq

  test("create + read roundtrip; day column materialized; no pday leakage") {
    val dir = Files.createTempDirectory("graft_ml_rt").toString
    assert(ManifestLake.create(spark, dir, mkBase(), "ts") == 1L)
    val df = ManifestLake.read(spark, dir)
    assert(!df.columns.contains("pday"), df.columns.mkString(","))
    assert(df.count() == 4)
    assert(df.filter(col("day") === "2024-01-02").count() == 2)
    // manifest-level pruning opens only the kept day's directory
    val oneDay = ManifestLake.readDays(spark, dir, _ == "2024-01-02")
    assert(oneDay.count() == 2)
    val opened = oneDay.inputFiles.filter(_.contains("/data/"))
    assert(opened.nonEmpty && opened.forall(_.contains("pday=2024-01-02")),
      opened.mkString(","))
  }

  test("upsert crash between data write and commit: readers see the wholly-old snapshot") {
    val dir = Files.createTempDirectory("graft_ml_crash").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val before = content(dir)
    // a cross-day merge: moves key (1,10) from day 1 to day 3 (drains
    // day 1) AND rewrites day 2's key (2,20) — the multi-day commit
    // whose sequential form had the vulnerability window
    val updates = Seq(
      (1L, 10L, ts("2024-01-03 00:10:00"), "purchase", 2.0),
      (2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val boom = intercept[RuntimeException] {
      ManifestLake.upsert(spark, dir, updates,
        keyCols = Seq("user_id", "event_id"), ordCol = "ts",
        beforeCommit = () => throw new RuntimeException("kill -9"))
    }
    assert(boom.getMessage == "kill -9")
    // the new generation's data IS on disk (the crash hit after the
    // write)… — this pins that the crash point sits inside the
    // formerly-vulnerable window, not before the work happened
    val gens = new java.io.File(s"$dir/data").listFiles().filter(_.isDirectory)
    assert(gens.length == 2, s"expected orphaned gen next to v1's: ${gens.length}")
    // …and yet every reader still sees the old snapshot for ALL days:
    // not the old/new mix the sequential commit could expose
    assert(content(dir) == before, "crashed commit leaked into readers")
    assert(ManifestLake.snapshot(spark, dir).version == 1L)

    // RECOVERY = re-run (idempotent latest-wins); now it commits
    val v = ManifestLake.upsert(spark, dir, updates,
      keyCols = Seq("user_id", "event_id"), ordCol = "ts")
    assert(v == 2L)
    val got = ManifestLake.read(spark, dir)
      .select("user_id", "event_id", "event_type", "value", "day")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getDouble(3), r.getString(4)))).toMap
    assert(got((1L, 10L)) == (("purchase", 2.0, "2024-01-03")))
    assert(got((2L, 20L)) == (("purchase", 3.0, "2024-01-02")))
    assert(got((3L, 30L)) == (("click", 1.0, "2024-01-02")))
    assert(got((4L, 40L)) == (("click", 1.0, "2024-01-03")))
    // drained day 1 is gone from the committed view
    assert(ManifestLake.read(spark, dir).filter(col("day") === "2024-01-01").count() == 0)
    // time travel: v1 still shows the pre-merge table
    assert(ManifestLake.readVersion(spark, dir, 1L)
      .select("user_id", "event_id", "ts", "event_type", "value", "day")
      .collect().map(_.toString).sorted.toSeq == before)
  }

  test("takedown crash: either every matching row is visible or none (no half-applied delete)") {
    val dir = Files.createTempDirectory("graft_ml_takedown").toString
    // matching rows span two days — the compliance case
    val base = Seq(
      (1L, ts("2024-01-01 10:00:00"), "evil"),
      (2L, ts("2024-01-01 11:00:00"), "fine"),
      (3L, ts("2024-01-02 10:00:00"), "evil"),
      (4L, ts("2024-01-02 11:00:00"), "fine"))
      .toDF("doc_id", "ts", "tag")
    ManifestLake.create(spark, dir, base, "ts")
    def docs() = ManifestLake.read(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    intercept[RuntimeException] {
      ManifestLake.deleteWhere(spark, dir, col("tag") === "evil",
        beforeCommit = () => throw new RuntimeException("kill -9"))
    }
    // stale-but-CONSISTENT: both evil rows still visible (the old
    // sequential commit could show {2,3,4} — one day applied)
    assert(docs() == Set(1L, 2L, 3L, 4L), "half-applied takedown exposed")
    assert(ManifestLake.deleteWhere(spark, dir, col("tag") === "evil") == 2L)
    assert(docs() == Set(2L, 4L))
    // NULL-predicate rows survive; no-match is a no-op at the same version
    val v = ManifestLake.snapshot(spark, dir).version
    assert(ManifestLake.deleteWhere(spark, dir, col("tag") === "nope") == 0L)
    assert(ManifestLake.snapshot(spark, dir).version == v)
  }

  test("day-bounded takedown prunes discovery to the bound and never deletes outside it") {
    val dir = Files.createTempDirectory("graft_ml_bound").toString
    val base = Seq(
      (1L, ts("2024-01-01 10:00:00"), "evil"),
      (2L, ts("2024-01-02 10:00:00"), "evil"),
      (3L, ts("2024-01-02 11:00:00"), "fine"))
      .toDF("doc_id", "ts", "tag")
    ManifestLake.create(spark, dir, base, "ts")
    // the bound is a promise: day 1's matching row is OUTSIDE it and
    // must survive — only day 2's evil row goes
    val n = ManifestLake.deleteWhere(spark, dir, col("tag") === "evil",
      dayBound = Some(_ == "2024-01-02"))
    assert(n == 1L)
    assert(ManifestLake.read(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // day 1's directory is physically untouched (same manifest entry)
    assert(ManifestLake.snapshot(spark, dir).days.contains("2024-01-01"))
  }

  test("null event time lands in the null partition and deletes like any row") {
    val dir = Files.createTempDirectory("graft_ml_null").toString
    val base = Seq((1L, Some("2024-01-01 10:00:00")), (2L, None), (3L, None))
      .toDF("doc_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    ManifestLake.create(spark, dir, base, "ts")
    val df = ManifestLake.read(spark, dir)
    assert(df.filter(col("day").isNull).count() == 2)
    assert(ManifestLake.deleteWhere(spark, dir, col("doc_id") === 2L) == 1L)
    assert(ManifestLake.read(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    // drain the whole null partition: manifest entry vanishes
    assert(ManifestLake.deleteWhere(spark, dir, col("doc_id") === 3L) == 1L)
    assert(!ManifestLake.snapshot(spark, dir).days.contains("__HIVE_DEFAULT_PARTITION__"))
    assert(ManifestLake.read(spark, dir).count() == 1L)
  }

  test("time travel to a version that never existed names the real problem (ADVICE r12)") {
    val dir = Files.createTempDirectory("graft_ml_nover").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    // a future / typo'd version must NOT get the "vacuum expired it —
    // re-seed" diagnosis: nothing was ever committed there
    val e = intercept[IllegalArgumentException] {
      ManifestLake.readVersion(spark, dir, 99L)
    }
    assert(e.getMessage.contains("does not exist") &&
      e.getMessage.contains("head is 1"), e.getMessage)
  }

  test("concurrent writers: second commit of the same version is refused") {
    val dir = Files.createTempDirectory("graft_ml_conc").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val upd = Seq((2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    // writer A snapshots v1 but stalls before committing; writer B
    // lands v2 in the meantime → A must fail, not silently clobber
    intercept[java.util.ConcurrentModificationException] {
      ManifestLake.upsert(spark, dir, upd,
        keyCols = Seq("user_id", "event_id"), ordCol = "ts",
        beforeCommit = () => {
          ManifestLake.upsert(spark, dir, upd,
            keyCols = Seq("user_id", "event_id"), ordCol = "ts")
        })
    }
    // B's commit stands; the table is at v2 exactly once
    assert(ManifestLake.snapshot(spark, dir).version == 2L)
  }

  test("compactDay: atomic swap, content identical, file count bounded") {
    val dir = Files.createTempDirectory("graft_ml_compact").toString
    val wide = spark.range(2000)
      .withColumn("user_id", col("id")).withColumn("event_id", col("id"))
      .withColumn("ts", lit(ts("2024-01-05 10:00:00")))
      .withColumn("event_type", lit("click")).withColumn("value", lit(1.0))
      .drop("id")
    ManifestLake.create(spark, dir, wide, "ts")
    val rel1 = ManifestLake.snapshot(spark, dir).days("2024-01-05").head
    // plant streaming-sink-style litter INSIDE the committed day's
    // generation (writeGen itself packs a day into few files, so the
    // 40-file state must be built the way it arises in production:
    // many small appended files accumulating under one day)
    val littered = spark.read.parquet(s"$dir/$rel1").repartition(40)
    val tmp = Files.createTempDirectory("graft_ml_litter").toString
    littered.write.mode("overwrite").parquet(tmp)
    val leaf = new java.io.File(s"$dir/$rel1")
    leaf.listFiles().foreach(_.delete())
    new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => Files.move(f.toPath,
        new java.io.File(leaf, f.getName).toPath))
    val before = content(dir)
    def files(rel: String) = new java.io.File(s"$dir/$rel").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val totalBytes = new java.io.File(s"$dir/$rel1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    assert(files(rel1) >= 30, s"precondition: litter expected, got ${files(rel1)}")
    assert(ManifestLake.compactDay(spark, dir, "2024-01-05", totalBytes / 4) == 2L)
    val rel2 = ManifestLake.snapshot(spark, dir).days("2024-01-05").head
    assert(rel2 != rel1, "compaction must write a NEW generation")
    assert(files(rel2) <= 5, s"still ${files(rel2)} files")
    assert(content(dir) == before, "compaction changed the data")
    // the old generation is untouched on disk until vacuumed (time travel)
    assert(new java.io.File(s"$dir/$rel1").exists())
    // compacting a nonexistent day is a no-op at the same version
    assert(ManifestLake.compactDay(spark, dir, "1999-01-01") == 2L)
  }

  test("filesPerDay spreads a big day across write tasks, content preserved") {
    val dir = Files.createTempDirectory("graft_ml_spread").toString
    val oneDay = spark.range(2000)
      .withColumn("user_id", col("id")).withColumn("event_id", col("id"))
      .withColumn("ts", lit(ts("2024-01-05 10:00:00")))
      .withColumn("event_type", lit("click")).withColumn("value", lit(1.0))
      .drop("id")
    ManifestLake.create(spark, dir, oneDay, "ts", filesPerDay = 4)
    val rel = ManifestLake.snapshot(spark, dir).days("2024-01-05").head
    val nFiles = new java.io.File(s"$dir/$rel").listFiles()
      .count(_.getName.endsWith(".parquet"))
    // the hash-spread puts the day's rows through up to 4 tasks (≥2
    // proves it is no longer single-task; ≤4 proves the bound)
    assert(nFiles >= 2 && nFiles <= 4, s"expected 2..4 files, got $nFiles")
    assert(ManifestLake.read(spark, dir).count() == 2000L)
  }

  test("appendBatch: exactly-once under replay and under mid-commit crash; compaction folds the batches") {
    val dir = Files.createTempDirectory("graft_ml_append").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    def total() = ManifestLake.read(spark, dir).count()
    val b0 = Seq((10L, 100L, ts("2024-01-03 10:00:00"), "click", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val b1 = Seq((11L, 101L, ts("2024-01-03 11:00:00"), "click", 1.0),
      (12L, 102L, ts("2024-01-04 09:00:00"), "click", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")

    assert(ManifestLake.appendBatch(spark, dir, b0, "ts", batchId = 0L) == 2L)
    assert(total() == 5L)
    // REPLAY of a committed batch (Spark's restart path): skipped, no dupes
    assert(ManifestLake.appendBatch(spark, dir, b0, "ts", batchId = 0L) == 2L)
    assert(total() == 5L)

    // crash between data write and cursor commit: invisible…
    intercept[RuntimeException] {
      ManifestLake.appendBatch(spark, dir, b1, "ts", batchId = 1L,
        beforeCommit = () => throw new RuntimeException("kill -9"))
    }
    assert(total() == 5L, "crashed append leaked")
    // …and the re-run of the SAME batchId lands it exactly once
    assert(ManifestLake.appendBatch(spark, dir, b1, "ts", batchId = 1L) == 3L)
    assert(total() == 7L)
    assert(ManifestLake.snapshot(spark, dir).lastBatch == 1L)

    // day 3 now holds base + two appended generations → 3 dirs;
    // compaction folds them to one, content preserved
    val before = ManifestLake.snapshot(spark, dir).days("2024-01-03")
    assert(before.size == 3, s"expected 3 dirs for the appended day: $before")
    val all = ManifestLake.read(spark, dir).collect().map(_.toString).sorted.toSeq
    ManifestLake.compactDay(spark, dir, "2024-01-03")
    assert(ManifestLake.snapshot(spark, dir).days("2024-01-03").size == 1)
    assert(ManifestLake.read(spark, dir).collect().map(_.toString).sorted.toSeq == all)
    // the batch cursor survives non-append commits
    assert(ManifestLake.snapshot(spark, dir).lastBatch == 1L)
  }

  test("sink: a real streaming query lands micro-batches transactionally") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ml_sink").toString
    val mem = MemoryStream[graft.streaming.TaskEvent]
    val q = mem.toDS().toDF()
      .writeStream.foreachBatch(ManifestLake.sink(dir, "ts"))
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ml_sink_cp").toString)
      .start()
    try {
      mem.addData(graft.streaming.TaskEvent(1L, ts("2024-01-15 00:01:00"), 1L, "click", 1.0),
        graft.streaming.TaskEvent(2L, ts("2024-01-16 00:02:00"), 2L, "view", 2.0))
      q.processAllAvailable()
      mem.addData(graft.streaming.TaskEvent(3L, ts("2024-01-15 00:03:00"), 3L, "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = ManifestLake.read(spark, dir)
      .select("event_id", "day").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "2024-01-15", 2L -> "2024-01-16", 3L -> "2024-01-15"),
      s"got $got")
    assert(ManifestLake.snapshot(spark, dir).lastBatch >= 1L)
  }

  test("vacuum: reclaims orphaned generations + expired manifests, keeps the live set") {
    val dir = Files.createTempDirectory("graft_ml_vacuum").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    // orphan a generation via a crashed upsert
    val upd = Seq((2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    intercept[RuntimeException] {
      ManifestLake.upsert(spark, dir, upd, Seq("user_id", "event_id"), "ts",
        beforeCommit = () => throw new RuntimeException("kill -9"))
    }
    // then a committed one (v2), superseding v1's day-2 directory
    ManifestLake.upsert(spark, dir, upd, Seq("user_id", "event_id"), "ts")
    val before = content(dir)
    // inside retention: nothing reclaimed (in-flight guard)
    assert(ManifestLake.vacuum(spark, dir, retentionMs = 3600 * 1000L).isEmpty)
    // past retention: the crashed gen goes; v1's manifest expires, so
    // its superseded day-2 leaf goes too; the live set survives
    val deleted = ManifestLake.vacuum(spark, dir, retentionMs = 0L, force = true)
    assert(deleted.nonEmpty, "nothing reclaimed")
    assert(content(dir) == before, "vacuum changed the committed view")
    assert(ManifestLake.snapshot(spark, dir).version == 2L)
    // a second pass finds nothing
    assert(ManifestLake.vacuum(spark, dir, retentionMs = 0L, force = true).isEmpty)
  }

  test("compactWhere: picks only multi-dir / DV-touched / small-file days, bounded and idempotent") {
    val dir = Files.createTempDirectory("graft_ml_optimize").toString
    ManifestLake.create(spark, dir, mkBase(), "ts") // 3 days × 1 dir
    // day 1 accumulates streaming-append residue (3 dirs total)
    (0 until 2).foreach { i =>
      val b = Seq((100L + i, 1000L + i, ts("2024-01-01 10:00:00"), "click", 1.0))
        .toDF("user_id", "event_id", "ts", "event_type", "value")
      ManifestLake.appendBatch(spark, dir, b, "ts", batchId = i.toLong)
    }
    // day 2 carries merge-on-read debt (an active deletion vector)
    ManifestLake.deleteWhereDV(spark, dir,
      col("event_id") === 20L && col("user_id") === 2L)
    val before = content(dir)
    // min-file threshold low, so single-file day 3 does NOT qualify
    // on the small-file rule (one small file = churn, skipped)
    val picked = ManifestLake.compactWhere(spark, dir, minFileBytes = 1L)
    assert(picked == Seq("2024-01-01", "2024-01-02"), picked.mkString(","))
    val snap = ManifestLake.snapshot(spark, dir)
    assert(snap.days("2024-01-01").size == 1 &&
      snap.days("2024-01-02").size == 1)
    assert(snap.dvs.isEmpty, "compaction did not retire the DV")
    assert(content(dir) == before, "compactWhere changed the committed view")
    // idempotent: a second sweep finds nothing
    assert(ManifestLake.compactWhere(spark, dir, minFileBytes = 1L).isEmpty)
    // bounded sweep: with fresh residue on two days, maxDays = 1
    // compacts exactly the first and leaves the second for next round
    (0 until 2).foreach { i =>
      val b = Seq((200L + i, 2000L + i,
        ts(f"2024-01-0${2 + i}%d 10:00:00"), "click", 1.0))
        .toDF("user_id", "event_id", "ts", "event_type", "value")
      ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 10L + i)
    }
    val first = ManifestLake.compactWhere(spark, dir, minFileBytes = 1L,
      maxDays = 1)
    assert(first == Seq("2024-01-02"), first.mkString(","))
    val rest = ManifestLake.compactWhere(spark, dir, minFileBytes = 1L)
    assert(rest == Seq("2024-01-03"), rest.mkString(","))
  }

  test("vacuum dry run: reports exactly the real run's reclaim set, deletes nothing") {
    val dir = Files.createTempDirectory("graft_ml_dry").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val upd = Seq((2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    // one crash orphan + one committed rewrite = manifest, leaf, and
    // orphan-generation garbage all present
    intercept[RuntimeException] {
      ManifestLake.upsert(spark, dir, upd, Seq("user_id", "event_id"), "ts",
        beforeCommit = () => throw new RuntimeException("kill -9"))
    }
    ManifestLake.upsert(spark, dir, upd, Seq("user_id", "event_id"), "ts")
    val before = content(dir)
    val plan = ManifestLake.vacuum(spark, dir, retentionMs = 0L,
      force = true, dryRun = true)
    assert(plan.nonEmpty, "dry run found nothing to reclaim")
    // nothing deleted: every reported path still exists, content intact
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    plan.foreach { p =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(p)), s"dry run deleted $p")
    }
    assert(content(dir) == before, "dry run changed the committed view")
    // the real run reclaims EXACTLY the dry run's set
    val real = ManifestLake.vacuum(spark, dir, retentionMs = 0L, force = true)
    assert(real.toSet == plan.toSet,
      s"dry=${plan.toSet -- real.toSet} real-only=${real.toSet -- plan.toSet}")
    assert(content(dir) == before)
    // and a post-reclaim dry run is clean
    assert(ManifestLake.vacuum(spark, dir, retentionMs = 0L, force = true,
      dryRun = true).isEmpty)
  }

  test("vacuum retention contract: covered readers survive; sub-floor refused; " +
       "expired cursor explains itself (VERDICT r11 #8, ADVICE #2)") {
    val dir = Files.createTempDirectory("graft_ml_retain").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val upd = Seq((2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, dir, upd, Seq("user_id", "event_id"), "ts")
    val v1 = ManifestLake.readVersion(spark, dir, 1L).count()
    // 1) retention covering v1 (manifests are seconds old, retention
    //    an hour): vacuum reclaims nothing and v1 stays readable —
    //    a reader of version v survives any vacuum whose retention
    //    covers v.
    assert(ManifestLake.vacuum(spark, dir,
      retentionMs = ManifestLake.MinRetentionMs).isEmpty)
    assert(ManifestLake.readVersion(spark, dir, 1L).count() == v1)
    // 2) sub-floor retention without force is refused up front —
    //    nothing deleted, reader untouched.
    val refusal = intercept[IllegalArgumentException] {
      ManifestLake.vacuum(spark, dir, retentionMs = 1000L)
    }
    assert(refusal.getMessage.contains("floor"))
    assert(ManifestLake.readVersion(spark, dir, 1L).count() == v1)
    // 3) forced teardown expires v1; a changes consumer whose cursor
    //    still points there gets the retention + re-seed story, not a
    //    raw FileNotFoundException.
    ManifestLake.vacuum(spark, dir, retentionMs = 0L, force = true)
    val gone = intercept[IllegalStateException] {
      ManifestLake.readChanges(spark, dir, fromV = 1L,
        toV = ManifestLake.snapshot(spark, dir).version)
    }
    assert(gone.getMessage.contains("retention") &&
      gone.getMessage.contains("re-seed"), gone.getMessage)
  }

  test("upsert ≡ LakeLayout full-merge semantics on a shared scenario") {
    // the cross-day chain scenario LakeLayoutSpec pins — same inputs,
    // same final table through the manifest path
    val dir = Files.createTempDirectory("graft_ml_equiv").toString
    val base = Seq(
      (1L, 10L, ts("2024-01-01 23:59:00"), "click", 1.0),
      (2L, 20L, ts("2024-01-02 10:00:00"), "click", 1.0),
      (3L, 30L, ts("2024-01-02 11:00:00"), "click", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.create(spark, dir, base, "ts")
    val updates = Seq((1L, 10L, ts("2024-01-03 00:10:00"), "purchase", 2.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, dir, updates, Seq("user_id", "event_id"), "ts")
    val got = ManifestLake.read(spark, dir)
      .select("user_id", "event_id", "ts", "event_type", "value", "day")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getTimestamp(2), r.getString(3), r.getDouble(4), r.getString(5))))
      .toMap
    assert(got.size == 3)
    assert(got((1L, 10L)) ==
      ((ts("2024-01-03 00:10:00"), "purchase", 2.0, "2024-01-03")))
    assert(got((2L, 20L))._2 == "click" && got((3L, 30L))._2 == "click")
    // untouched day 2's directory is the SAME path across the commit
    // (no rewrite of unaffected data — the LakeLayout mtime argument,
    // strengthened to identity)
    assert(ManifestLake.snapshot(spark, dir).days("2024-01-02")
      .exists(_.contains("g-")), "day 2 entry malformed")
  }

  test("two-writer race: the loser's commit is rejected, a retry from the fresh snapshot converges") {
    val dir = Files.createTempDirectory("graft_ml_race").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val updA = Seq((2L, 20L, ts("2024-01-02 12:00:00"), "a-wins", 5.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val updB = Seq((3L, 30L, ts("2024-01-02 12:30:00"), "b-wins", 6.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    // writer A pauses between its data write and its commit; writer B
    // commits the SAME base version in that window — the no-overwrite
    // manifest create must reject A
    val boom = intercept[java.util.ConcurrentModificationException] {
      ManifestLake.upsert(spark, dir, updA, Seq("user_id", "event_id"), "ts",
        beforeCommit = () => {
          ManifestLake.upsert(spark, dir, updB, Seq("user_id", "event_id"), "ts")
          ()
        })
    }
    assert(boom.getMessage.contains("already committed"), boom.getMessage)
    // B's commit is the visible one; A's generation is invisible garbage
    val afterRace = ManifestLake.read(spark, dir)
      .filter(col("event_type") === "a-wins").count()
    assert(afterRace == 0, "loser's data leaked into the table")
    assert(ManifestLake.read(spark, dir)
      .filter(col("event_type") === "b-wins").count() == 1)
    // the standard OCC loop: re-read the snapshot, reapply, commit
    ManifestLake.upsert(spark, dir, updA, Seq("user_id", "event_id"), "ts")
    val finalState = ManifestLake.read(spark, dir)
    assert(finalState.filter(col("event_type") === "a-wins").count() == 1)
    assert(finalState.filter(col("event_type") === "b-wins").count() == 1)
    assert(finalState.count() == 4)
  }

  test("schema checkpoint: additive evolution via append; old files read NULL; time travel keeps the old schema") {
    val dir = Files.createTempDirectory("graft_ml_schema").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val v1 = ManifestLake.snapshot(spark, dir)
    assert(v1.schemaJson.isDefined, "create did not checkpoint a schema")
    // append a batch that carries a NEW column
    val extra = Seq((9L, 90L, ts("2024-01-05 08:00:00"), "click", 1.0, "eu-w1"))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "region")
    ManifestLake.appendBatch(spark, dir, extra, "ts", batchId = 0L)
    val df = ManifestLake.read(spark, dir)
    assert(df.columns.contains("region"), df.columns.mkString(","))
    assert(df.count() == 5)
    // pre-evolution rows surface the new column as NULL
    assert(df.filter(col("region").isNull).count() == 4)
    assert(df.filter(col("region") === "eu-w1").count() == 1)
    // time travel to v1 reads the ORIGINAL schema (no region)
    val old = ManifestLake.readVersion(spark, dir, 1L)
    assert(!old.columns.contains("region"), old.columns.mkString(","))
    assert(old.count() == 4)
  }

  test("schema checkpoint: a pre-checkpoint manifest falls back to footers and self-upgrades on the next commit") {
    val dir = Files.createTempDirectory("graft_ml_legacy").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    // simulate a legacy manifest: strip the #schema line in place
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(s"$dir/_graft_log/00000001.manifest")
    val txt = {
      val in = fs.open(mf)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val stripped = txt.split('\n').filterNot(_.startsWith("#schema"))
      .mkString("\n")
    val out = fs.create(mf, true)
    try out.write(stripped.getBytes("UTF-8")) finally out.close()
    assert(ManifestLake.snapshot(spark, dir).schemaJson.isEmpty)
    // legacy read path (mergeSchema) still answers
    assert(ManifestLake.read(spark, dir).count() == 4)
    // any write re-checkpoints
    val upd = Seq((1L, 10L, ts("2024-01-01 23:59:30"), "purchase", 2.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, dir, upd, Seq("user_id", "event_id"), "ts")
    assert(ManifestLake.snapshot(spark, dir).schemaJson.isDefined,
      "upsert did not re-checkpoint the schema")
    assert(ManifestLake.read(spark, dir).count() == 4)
  }

  test("upsert schema evolution both ways: a narrower batch writes NULL, a wider batch widens the table") {
    val dir = Files.createTempDirectory("graft_ml_upsevo").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    // widen via append (region), then upsert WITHOUT region: the
    // update must land with region NULL, not fail resolution
    val extra = Seq((9L, 90L, ts("2024-01-05 08:00:00"), "click", 1.0, "eu-w1"))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "region")
    ManifestLake.appendBatch(spark, dir, extra, "ts", batchId = 0L)
    val narrow = Seq((2L, 20L, ts("2024-01-02 12:00:00"), "purchase", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, dir, narrow, Seq("user_id", "event_id"), "ts")
    val got = ManifestLake.read(spark, dir)
      .filter(col("event_id") === 20L)
      .select("event_type", "region").head()
    assert(got.getString(0) == "purchase" && got.isNullAt(1))
    assert(ManifestLake.read(spark, dir)
      .filter(col("region") === "eu-w1").count() == 1)
    // and the reverse: an upsert CARRYING a new column widens
    val wide = Seq((3L, 30L, ts("2024-01-02 13:00:00"), "click", 1.0, "mobile"))
      .toDF("user_id", "event_id", "ts", "event_type", "value", "channel")
    ManifestLake.upsert(spark, dir, wide, Seq("user_id", "event_id"), "ts")
    val df = ManifestLake.read(spark, dir)
    assert(df.columns.contains("channel"), df.columns.mkString(","))
    assert(df.filter(col("channel") === "mobile").count() == 1)
    assert(df.filter(col("channel").isNull).count() == df.count() - 1)
  }

  test("schema checkpoint: a type-changing column is rejected, not silently widened") {
    val dir = Files.createTempDirectory("graft_ml_conflict").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val bad = Seq((9L, "ninety", ts("2024-01-05 08:00:00"), "click", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val e = intercept[IllegalArgumentException] {
      ManifestLake.appendBatch(spark, dir, bad, "ts", batchId = 0L)
    }
    assert(e.getMessage.contains("event_id"), e.getMessage)
    // the failed append left no committed trace
    assert(ManifestLake.snapshot(spark, dir).version == 1L)
    assert(ManifestLake.read(spark, dir).count() == 4)
  }
}
