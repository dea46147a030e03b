package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The partition-pruning proof: a day filter on the lake must become
  * a PartitionFilter (directory-level pruning — zero files of other
  * days opened), not merely a row filter. */
class LakeLayoutSpec extends SparkSpec {

  private lazy val lakeDir = {
    val d = Files.createTempDirectory("graft_lake").toString
    LakeLayout.writePartitioned(Tables.events(spark, sfDir), d)
    d
  }

  test("layout: one directory per day, hive-style") {
    val days = new java.io.File(lakeDir).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("day="))
    assert(days.length >= 25, s"expected ~30 day dirs, got ${days.length}")
  }

  test("day filter prunes partitions at plan time, and data round-trips") {
    val df = LakeLayout.readDay(spark, lakeDir, "2024-01-10")
    val scan = df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }.head
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("day"), s"no partition filter: $pf")
    // the data agrees with the unpartitioned source...
    val expected = Tables.events(spark, sfDir)
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-10").count()
    assert(df.collect().length == expected) // collect: executes df's own plan
    // ...and after execution the scan metrics show exactly ONE
    // partition's file was opened (directory-level pruning, not a
    // read-everything-then-filter)
    val executedScan = df.queryExecution.executedPlan
      .collect { case f: FileSourceScanExec => f }.head
    assert(executedScan.metrics("numFiles").value == 1,
      s"files read: ${executedScan.metrics("numFiles").value}")
  }

  test("vacuum: reclaims uncommitted orphans only, keeps metadata, honors retention") {
    val dir = Files.createTempDirectory("graft_vacuum").toString
    Tables.events(spark, sfDir).limit(100).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    // plant the canonical orphans: crashed-committer staging litter
    // (a visible orphan can only exist under a _spark_metadata sink —
    // in a plain dir every visible file IS the committed set, and a
    // stray visible non-parquet file would break the readers
    // themselves, which no vacuum can fix)
    val staged = new java.io.File(s"$dir/_temporary/0/task_123/part-00000.parquet")
    staged.getParentFile.mkdirs()
    Files.write(staged.toPath, Array[Byte](1, 2, 3))
    val stray = new java.io.File(s"$dir/_temporary/part-xyz.parquet.tmp")
    Files.write(stray.toPath, Array[Byte](4, 5))
    // a generous retention keeps even orphans (they might be in-flight)
    assert(LakeLayout.vacuum(spark, dir, retentionMs = 3600 * 1000L).isEmpty)
    assert(staged.exists() && stray.exists())
    // retention 0: both orphans reclaimed, nothing else touched
    val deleted = LakeLayout.vacuum(spark, dir, retentionMs = 0L, force = true)
    assert(deleted.size == 2, s"deleted: $deleted")
    assert(!staged.exists() && !stray.exists())
    assert(new java.io.File(s"$dir/_SUCCESS").exists(), "_SUCCESS must survive")
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted.toSeq
    assert(after == before, "vacuum changed the committed data")
    // a second pass is a no-op; a missing dir is a no-op
    assert(LakeLayout.vacuum(spark, dir, 0L, force = true).isEmpty)
    assert(LakeLayout.vacuum(spark, s"$dir/never_written", 0L, force = true).isEmpty)
  }

  test("vacuum: a lake under a dot-dir ancestor still reclaims orphans") {
    // only segments BELOW the table root are metadata-judged: a root
    // like /root/.cache/lake must not no-op every file
    val parent = Files.createTempDirectory("graft_vac_parent")
    val dir = parent.resolve(".hidden_cache").resolve("lake")
    Files.createDirectories(dir)
    Tables.events(spark, sfDir).limit(10).write
      .mode("overwrite").parquet(dir.toString)
    val orphan = new java.io.File(s"$dir/_temporary/part-0.parquet.tmp")
    orphan.getParentFile.mkdirs()
    Files.write(orphan.toPath, Array[Byte](1))
    val deleted = LakeLayout.vacuum(spark, dir.toString, retentionMs = 0L, force = true)
    assert(deleted.size == 1 && !orphan.exists(),
      s"orphan under dot-ancestor root not reclaimed: $deleted")
    assert(new java.io.File(s"$dir/_SUCCESS").exists())
  }

  test("upsert: latest-wins merge ≡ full recompute; untouched days physically unmodified") {
    // fresh lake (lakeDir is shared with the pruning tests)
    val dir = Files.createTempDirectory("graft_upsert").toString
    val events = Tables.events(spark, sfDir)
    LakeLayout.writePartitioned(events, dir)

    // updates: re-fire half the tasks of ONE day with a bumped ts
    // (+1h inside the same day) and mutated status/cost — the
    // executor's post-firing Updates batch
    val day = "2024-01-10"
    val updates = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day &&
        col("event_id") % 2 === 0)
      .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
      .filter(date_format(col("ts"), "yyyy-MM-dd") === day)
      .withColumn("event_type", lit("purchase"))
      .withColumn("value", round(col("value") + 1.0, 2))

    val before = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day=") &&
        f.getName != s"day=$day")
      .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap

    val rewritten = LakeLayout.upsert(spark, dir, updates,
      keyCols = Seq("user_id", "event_id"), ordCol = "ts")
    assert(rewritten == 1L, s"expected 1 rewritten partition, got $rewritten")

    // untouched day directories: same files, same mtimes
    val after = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day=") &&
        f.getName != s"day=$day")
      .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
    assert(after == before, "untouched partitions were modified")

    // content ≡ full recompute: every key appears once; updated keys
    // carry the update's row, others the base row
    val got = LakeLayout.read(spark, dir)
      .select("user_id", "event_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getTimestamp(2), r.getString(3), r.getDouble(4)))).toMap
    val updKeys = updates.select("user_id", "event_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getTimestamp(2), r.getString(3), r.getDouble(4)))).toMap
    val baseKeys = events.select("user_id", "event_id", "ts", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getTimestamp(2), r.getString(3), r.getDouble(4)))).toMap
    assert(got.size == baseKeys.size, s"row count ${got.size} != ${baseKeys.size}")
    assert(updKeys.nonEmpty)
    (baseKeys.keySet ++ updKeys.keySet).foreach { k =>
      val exp = updKeys.getOrElse(k, baseKeys(k))
      assert(got(k) == exp, s"key $k: got ${got(k)} want $exp")
    }
  }

  test("upsert: cross-day version chain moves the key, drains emptied days, leaves others untouched") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = Files.createTempDirectory("graft_upsert_xday").toString
    // key (1,10) alone on day 1; keys (2,20)/(3,30) on day 2
    val base = Seq(
      (1L, 10L, ts("2024-01-01 23:59:00"), "click", 1.0),
      (2L, 20L, ts("2024-01-02 10:00:00"), "click", 1.0),
      (3L, 30L, ts("2024-01-02 11:00:00"), "click", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    LakeLayout.writePartitioned(base, dir)
    val day2Before = new java.io.File(s"$dir/day=2024-01-02").listFiles()
      .map(f => f.getPath -> f.lastModified()).toMap

    // the executor updates key (1,10) ten minutes past midnight on
    // day 3: the standing row lives in day 1, the update in day 3
    val updates = Seq((1L, 10L, ts("2024-01-03 00:10:00"), "purchase", 2.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val affected = LakeLayout.upsert(spark, dir, updates,
      keyCols = Seq("user_id", "event_id"), ordCol = "ts")
    assert(affected == 2L, s"expected day1+day3 affected, got $affected")

    // the key moved WITH its latest version; the drained day-1 dir is
    // gone (dynamic overwrite cannot delete, so upsert must); day 2 is
    // byte-untouched
    assert(!new java.io.File(s"$dir/day=2024-01-01").exists(),
      "drained day=2024-01-01 should be deleted")
    val day2After = new java.io.File(s"$dir/day=2024-01-02").listFiles()
      .map(f => f.getPath -> f.lastModified()).toMap
    assert(day2After == day2Before, "untouched day 2 was modified")
    val got = LakeLayout.read(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"), col("day").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getTimestamp(2), r.getString(3), r.getDouble(4), r.getString(5))))
      .toMap
    assert(got.size == 3, s"one row per key expected, got ${got.size}")
    assert(got((1L, 10L)) ==
      ((ts("2024-01-03 00:10:00"), "purchase", 2.0, "2024-01-03")))
    assert(got((2L, 20L))._2 == "click" && got((3L, 30L))._2 == "click")
  }

  test("compact: many small files merge to the computed count, content identical") {
    import spark.implicits._
    val litterDir = Files.createTempDirectory("graft_litter").toString
    val outDir = Files.createTempDirectory("graft_compacted").toString
    // simulate streaming-sink litter: 40 single-row-ish files
    spark.range(2000).toDF("id")
      .withColumn("payload", concat_ws("-", lit("x"), col("id")))
      .repartition(40)
      .write.mode("overwrite").parquet(litterDir)
    def parquetFiles(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(litterDir).length == 40)
    val totalBytes = parquetFiles(litterDir).map(_.length).sum
    // target ≈ a quarter of the data → expect ~4 files, far below 40
    val n = LakeLayout.compact(spark, litterDir, outDir, totalBytes / 4)
    assert(parquetFiles(outDir).length == n, "file count != computed target")
    assert(n <= 5 && n >= 4, s"unexpected target $n")
    // content identical (same rows, nothing lost or duplicated)
    val a = spark.read.parquet(litterDir).collect().map(_.toString).sorted.toSeq
    val b = spark.read.parquet(outDir).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("compact: empty partition is a no-op, not a crash") {
    val emptyDir = Files.createTempDirectory("graft_empty_day").toString
    val outDir = Files.createTempDirectory("graft_empty_out").toString
    assert(LakeLayout.compact(spark, emptyDir, outDir) == 0L)
  }

  test("readEvolved: additive schema change — old days NULL-backfill, pruning/pushdown intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    // day 1 written before the `quality` column existed; day 2 after
    Seq((1L, "2024-01-01T10:00:00"), (2L, "2024-01-01T11:00:00"))
      .toDF("doc_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("day").parquet(dir)
    Seq((3L, "2024-01-02T10:00:00", 0.9), (4L, "2024-01-02T11:00:00", 0.2))
      .toDF("doc_id", "ts_s", "quality")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("day").parquet(dir)

    val df = LakeLayout.readEvolved(spark, dir)
    // union schema: the new column is visible table-wide
    assert(df.columns.contains("quality"), df.columns.mkString(","))
    // old partition rows back-fill NULL
    val day1 = df.filter(col("day") === "2024-01-01").collect()
    assert(day1.length == 2 && day1.forall(_.isNullAt(day1.head.fieldIndex("quality"))))
    // a filter on the NEW column still prunes and pushes down
    val q = df.filter(col("day") === "2024-01-02" && col("quality") > 0.5)
    val scan = q.queryExecution.sparkPlan
      .collect { case f: FileSourceScanExec => f }.head
    assert(scan.metadata.getOrElse("PartitionFilters", "").contains("day"),
      scan.metadata.toString)
    assert(scan.metadata.getOrElse("PushedFilters", "").contains("GreaterThan(quality"),
      scan.metadata.toString)
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // NULL-quality (pre-evolution) rows are NOT matched by the filter
    assert(df.filter(col("quality") > 0.5).count() == 1L)
  }

  test("deleteWhere: takedown removes matching rows, touches only their partitions") {
    val dir = Files.createTempDirectory("graft_delete").toString
    val events = Tables.events(spark, sfDir)
    LakeLayout.writePartitioned(events, dir)
    val day = "2024-01-10"
    val totalBefore = LakeLayout.read(spark, dir).count()
    val expectDeleted = LakeLayout.read(spark, dir)
      .filter(col("day") === day && col("user_id") % 7 === 3).count()
    assert(expectDeleted > 0, "takedown predicate matched nothing — test is vacuous")

    val before = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day=") &&
        f.getName != s"day=$day")
      .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap

    val deleted = LakeLayout.deleteWhere(spark, dir,
      col("day") === day && col("user_id") % 7 === 3)
    assert(deleted == expectDeleted, s"deleted $deleted want $expectDeleted")

    // untouched day directories: same files, same mtimes
    val after = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day=") &&
        f.getName != s"day=$day")
      .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
    assert(after == before, "untouched partitions were modified")

    // survivors: nothing matches the predicate; everything else intact
    val lake = LakeLayout.read(spark, dir)
    assert(lake.filter(col("day") === day && col("user_id") % 7 === 3).count() == 0)
    assert(lake.count() == totalBefore - expectDeleted)

    // a no-match predicate is a zero-cost no-op
    val allBefore = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
    assert(LakeLayout.deleteWhere(spark, dir, col("user_id") === -1L) == 0L)
    val allAfter = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("day="))
      .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
    assert(allAfter == allBefore, "no-op delete modified the lake")
  }

  test("deleteWhere on a schema-evolved lake preserves late-added columns (review r9)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_delete_evolve").toString
    Seq((1L, "2024-01-01T10:00:00"), (2L, "2024-01-01T11:00:00"))
      .toDF("doc_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("day").parquet(dir)
    Seq((3L, "2024-01-02T10:00:00", 0.9), (4L, "2024-01-02T11:00:00", 0.2))
      .toDF("doc_id", "ts_s", "quality")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("append").partitionBy("day").parquet(dir)
    // delete one old-schema row: the rewrite of day 1 must NOT drop
    // the quality column day 2 carries (single-footer read would)
    assert(LakeLayout.deleteWhere(spark, dir, col("doc_id") === 1L) == 1L)
    val after = LakeLayout.readEvolved(spark, dir)
    assert(after.columns.contains("quality"))
    val q3 = after.filter(col("doc_id") === 3L).select("quality").collect()
    assert(q3.length == 1 && math.abs(q3.head.getDouble(0) - 0.9) < 1e-9,
      "late-added column data lost by the rewrite")
    assert(after.count() == 3L)
    // and the evolved column is usable IN the delete predicate
    // (fresh read — `after`'s file listing predates this rewrite)
    assert(LakeLayout.deleteWhere(spark, dir, col("quality") < 0.5) == 1L)
    assert(LakeLayout.readEvolved(spark, dir).count() == 2L)
  }

  test("deleteWhere reaches the null partition (review r9)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_delete_nullday").toString
    // a null event time lands in day=__HIVE_DEFAULT_PARTITION__ — a
    // takedown must not silently skip it
    Seq((1L, Some("2024-01-01T10:00:00")), (2L, None: Option[String]),
      (3L, None: Option[String]))
      .toDF("doc_id", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    assert(LakeLayout.deleteWhere(spark, dir, col("doc_id") === 2L) == 1L)
    val left = LakeLayout.read(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(left == Set(1L, 3L), s"survivors $left")
    // draining the whole null partition removes its directory
    assert(LakeLayout.deleteWhere(spark, dir, col("doc_id") === 3L) == 1L)
    assert(!new java.io.File(s"$dir/day=__HIVE_DEFAULT_PARTITION__").exists(),
      "drained null-partition directory still present")
  }

  test("deleteWhere: drains a fully-matched day; NULL predicate keeps the row") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_delete_drain").toString
    // day 1: all rows match (drained); day 2: quality NULL rows must
    // survive a quality-threshold takedown (SQL DELETE semantics)
    Seq(
      (1L, "2024-01-01T10:00:00", Some(0.1)),
      (2L, "2024-01-01T11:00:00", Some(0.2)),
      (3L, "2024-01-02T10:00:00", Some(0.9)),
      (4L, "2024-01-02T11:00:00", None: Option[Double]),
      (5L, "2024-01-02T12:00:00", Some(0.05)))
      .toDF("doc_id", "ts_s", "quality")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(dir)

    val deleted = LakeLayout.deleteWhere(spark, dir, col("quality") < 0.5)
    assert(deleted == 3L, s"deleted $deleted want 3 (ids 1, 2, 5)")
    // day 1 fully drained: directory physically gone
    assert(!new java.io.File(s"$dir/day=2024-01-01").exists(),
      "drained day directory still present")
    val left = LakeLayout.read(spark, dir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // doc 4 (NULL quality) survives: the predicate is not TRUE for it
    assert(left == Set(3L, 4L), s"survivors $left")
  }

  // ------------------------------------------------------------------
  // Crash-safety (the overwriteAffected contract, VERDICT r9 #8): an
  // interrupted copy-on-write rewrite leaves every affected day either
  // wholly old or wholly new, staging litter is invisible and
  // reclaimable, and re-running the same merge from the worst
  // intermediate states converges to the full-merge result.
  // ------------------------------------------------------------------

  /** Recursive dir copy — builds simulated mid-crash lake states. */
  private def copyTree(from: java.io.File, to: java.io.File): Unit = {
    if (from.isDirectory) {
      to.mkdirs()
      from.listFiles().foreach(f => copyTree(f, new java.io.File(to, f.getName)))
    } else Files.copy(from.toPath, to.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  test("crash before commit: staging litter is invisible to readers, vacuum reclaims it") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = Files.createTempDirectory("graft_crash_staging").toString
    val base = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (2L, 20L, ts("2024-01-02 10:00:00"), "click", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    LakeLayout.writePartitioned(base, dir)
    val before = LakeLayout.read(spark, dir).collect().map(_.toString).sorted.toSeq
    // plant what a crashed dynamic-overwrite commit leaves behind:
    // task output staged under .spark-staging-<jobId>, plus committer
    // _temporary litter — both at the table root
    val staged = new java.io.File(
      s"$dir/.spark-staging-9f1c/day=2024-01-02/part-00000.parquet")
    staged.getParentFile.mkdirs()
    Files.write(staged.toPath, Array[Byte](1, 2, 3))
    val tmp = new java.io.File(s"$dir/_temporary/0/task_7/part-00001.parquet")
    tmp.getParentFile.mkdirs()
    Files.write(tmp.toPath, Array[Byte](4))
    // readers see the OLD content exactly — the crash is invisible
    val seen = LakeLayout.read(spark, dir).collect().map(_.toString).sorted.toSeq
    assert(seen == before, "staging litter leaked into the committed read")
    // inside retention the litter is kept (might be an in-flight job)…
    assert(LakeLayout.vacuum(spark, dir, retentionMs = 3600 * 1000L).isEmpty)
    // …past retention BOTH staging families are reclaimed
    val deleted = LakeLayout.vacuum(spark, dir, retentionMs = 0L, force = true)
    assert(deleted.size == 2, s"deleted: $deleted")
    assert(!staged.exists() && !tmp.exists())
    val after = LakeLayout.read(spark, dir).collect().map(_.toString).sorted.toSeq
    assert(after == before, "vacuum changed the committed data")
  }

  test("upsert crash recovery: re-run from the worst intermediate state converges") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def lakeContent(d: String) = LakeLayout.read(spark, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"), col("day").cast("string"))
      .collect().map(_.toString).sorted.toSeq
    val base = Seq(
      (1L, 10L, ts("2024-01-01 23:59:00"), "click", 1.0),
      (2L, 20L, ts("2024-01-02 10:00:00"), "click", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val updates = Seq((1L, 10L, ts("2024-01-03 00:10:00"), "purchase", 2.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    // the reference run: what a crash-free merge produces
    val dirFinal = Files.createTempDirectory("graft_crash_final").toString
    LakeLayout.writePartitioned(base, dirFinal)
    LakeLayout.upsert(spark, dirFinal, updates,
      keyCols = Seq("user_id", "event_id"), ordCol = "ts")
    val want = lakeContent(dirFinal)
    // the worst intermediate state the contract admits: day 3's new
    // content committed (clause 1 — per-day swap done), but the crash
    // hit before the drained day-1 removal (clause 2), so the stale
    // pre-merge version of key (1,10) is still visible next to its
    // newer self
    val dirCrash = Files.createTempDirectory("graft_crash_mid").toString
    LakeLayout.writePartitioned(base, dirCrash)
    copyTree(new java.io.File(s"$dirFinal/day=2024-01-03"),
      new java.io.File(s"$dirCrash/day=2024-01-03"))
    assert(new java.io.File(s"$dirCrash/day=2024-01-01").exists(),
      "precondition: the stale drained day must still be present")
    // RECOVERY = re-run the same merge: latest-wins is idempotent, so
    // the stale day drains again and the committed day rewrites to
    // identical content
    LakeLayout.upsert(spark, dirCrash, updates,
      keyCols = Seq("user_id", "event_id"), ordCol = "ts")
    assert(!new java.io.File(s"$dirCrash/day=2024-01-01").exists(),
      "recovery run did not drain the stale day")
    assert(lakeContent(dirCrash) == want,
      "recovery run did not converge to the full-merge result")
  }

  test("deleteWhere crash recovery: partially-committed takedown re-run converges") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def docs(d: String) = LakeLayout.read(spark, d).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // two affected days, each with a matching + a surviving row
    val base = Seq(
      (1L, ts("2024-01-01 10:00:00"), "evil"),
      (2L, ts("2024-01-01 11:00:00"), "fine"),
      (3L, ts("2024-01-02 10:00:00"), "evil"),
      (4L, ts("2024-01-02 11:00:00"), "fine"))
      .toDF("doc_id", "ts", "tag")
    val dirFinal = Files.createTempDirectory("graft_tdcrash_final").toString
    LakeLayout.writePartitioned(base, dirFinal)
    assert(LakeLayout.deleteWhere(spark, dirFinal, col("tag") === "evil") == 2L)
    // intermediate state: day 1's rewrite committed, day 2 still old
    // (the sequential cross-day commit's clause-1 crash)
    val dirCrash = Files.createTempDirectory("graft_tdcrash_mid").toString
    LakeLayout.writePartitioned(base, dirCrash)
    val d1 = new java.io.File(s"$dirCrash/day=2024-01-01")
    d1.listFiles().foreach(_.delete()); d1.delete()
    copyTree(new java.io.File(s"$dirFinal/day=2024-01-01"), d1)
    assert(docs(dirCrash) == Set(2L, 3L, 4L), "bad intermediate state")
    // recovery: the same predicate finds only day 2's leftovers and
    // touches only that day
    assert(LakeLayout.deleteWhere(spark, dirCrash, col("tag") === "evil") == 1L)
    assert(docs(dirCrash) == Set(2L, 4L),
      "recovery run did not converge to the takedown result")
  }
}
