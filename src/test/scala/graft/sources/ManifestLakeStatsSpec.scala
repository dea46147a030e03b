package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Data skipping over the manifest's per-file footer stats (the
  * Delta/Iceberg design): every test pins BOTH halves of the
  * contract — readWhere ≡ read().filter (pruning never changes the
  * answer) AND the PruneReport shows the files it promised to skip
  * actually skipped. Soundness is by construction (a file is dropped
  * only when a conjunct of the predicate can match no row of its
  * min/max/nullCount envelope), so the tests concentrate on the
  * envelope arithmetic: numeric/string/date domains, all-null
  * columns, unsupported conjuncts degrading to no-pruning, and the
  * clusterBy compaction that makes intra-day skipping possible at
  * all (ingest is hash-spread).
  */
class ManifestLakeStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** 4 days × 100 uids, uid range disjoint per day (day k holds
    * uids [100k, 100k+100)); cat cycles a/b/c; day 3's cat is NULL. */
  private def mkBase(): DataFrame =
    (0 until 400).map { i =>
      val d = i / 100
      (i.toLong, ts(f"2024-01-${d + 1}%02d 12:00:00"),
        if (d == 3) null else Seq("a", "b", "c")(i % 3),
        (i % 50) / 10.0)
    }.toDF("uid", "ts", "cat", "amount")

  private def agree(dir: String, pred: String): Unit = {
    val viaStats = ManifestLake.readWhere(spark, dir, pred)
      .collect().map(_.toString).sorted.toSeq
    val full = ManifestLake.read(spark, dir).filter(pred)
      .collect().map(_.toString).sorted.toSeq
    assert(viaStats == full, s"pred [$pred]: stats-pruned read diverged")
  }

  test("file skipping on a day-disjoint uid: point and range predicates") {
    val dir = Files.createTempDirectory("graft_mls_uid").toString
    ManifestLake.create(spark, dir, mkBase(), "ts",
      statsCols = Seq("uid", "cat", "amount"))
    val rep = ManifestLake.candidateFiles(spark, dir, "uid = 150")
    assert(rep.totalFiles == 4 && rep.keptFiles.size == 1,
      s"kept ${rep.keptFiles.size}/${rep.totalFiles}")
    agree(dir, "uid = 150")
    val range = ManifestLake.candidateFiles(spark, dir,
      "uid >= 250 AND uid < 320")
    assert(range.keptFiles.size == 2, range.keptFiles.mkString(","))
    agree(dir, "uid >= 250 AND uid < 320")
    // literal-first flip and a double-domain predicate
    agree(dir, "100 > uid")
    assert(ManifestLake.candidateFiles(spark, dir, "100 > uid")
      .keptFiles.size == 1)
    agree(dir, "amount <= 0.5")
  }

  test("day conjuncts prune at the directory level without file stats") {
    val dir = Files.createTempDirectory("graft_mls_day").toString
    // stats DISABLED: day pruning must still work off the manifest keys
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val rep = ManifestLake.candidateFiles(spark, dir, "day = '2024-01-02'")
    assert(rep.totalFiles == 0 && rep.keptDirs.size == 1,
      s"dirs ${rep.keptDirs.size}/${rep.totalDirs}")
    agree(dir, "day = '2024-01-02'")
    agree(dir, "day >= '2024-01-03'")
    agree(dir, "day IN ('2024-01-01', '2024-01-04')")
    // and the pruned read really opens only the kept directory
    val opened = ManifestLake.readWhere(spark, dir, "day = '2024-01-02'")
      .inputFiles.filter(_.contains("/data/"))
    assert(opened.nonEmpty && opened.forall(_.contains("pday=2024-01-02")))
  }

  test("all-null column: IS NULL / IS NOT NULL / comparisons prune correctly") {
    val dir = Files.createTempDirectory("graft_mls_null").toString
    ManifestLake.create(spark, dir, mkBase(), "ts",
      statsCols = Seq("uid", "cat"))
    // day 4's cat is entirely NULL → 'cat IS NOT NULL' prunes its file,
    // 'cat IS NULL' prunes the other three, and an equality can never
    // match the all-null file
    val notNull = ManifestLake.candidateFiles(spark, dir, "cat IS NOT NULL")
    assert(notNull.keptFiles.size == 3, notNull.keptFiles.mkString(","))
    val isNull = ManifestLake.candidateFiles(spark, dir, "cat IS NULL")
    assert(isNull.keptFiles.size == 1, isNull.keptFiles.mkString(","))
    val eq = ManifestLake.candidateFiles(spark, dir, "cat = 'b'")
    assert(eq.keptFiles.size == 3)
    agree(dir, "cat IS NOT NULL")
    agree(dir, "cat IS NULL")
    agree(dir, "cat = 'b'")
    agree(dir, "cat IN ('a', 'zzz')")
  }

  test("unsupported conjuncts degrade to no pruning, never a wrong prune") {
    val dir = Files.createTempDirectory("graft_mls_resid").toString
    ManifestLake.create(spark, dir, mkBase(), "ts", statsCols = Seq("uid"))
    // OR at the top: nothing extractable → keep everything, stay correct
    val or = ManifestLake.candidateFiles(spark, dir, "uid = 1 OR uid = 399")
    assert(or.keptFiles.size == or.totalFiles)
    agree(dir, "uid = 1 OR uid = 399")
    // AND of (supported, unsupported): the supported half still prunes
    val mixed = ManifestLake.candidateFiles(spark, dir,
      "uid < 100 AND (cat = 'a' OR amount > 1.0)")
    assert(mixed.keptFiles.size == 1)
    agree(dir, "uid < 100 AND (cat = 'a' OR amount > 1.0)")
    // a string literal against the numeric column coerces the engine
    // comparison into DOUBLE space — the pruner deliberately refuses
    // to model that (keeps every file) rather than risk an unsound
    // exact-decimal prune at representability boundaries
    val strLit = ManifestLake.candidateFiles(spark, dir, "uid = '150'")
    assert(strLit.keptFiles.size == strLit.totalFiles)
    agree(dir, "uid = '150'")
  }

  test("upsert and append keep stats fresh; carried days keep theirs") {
    val dir = Files.createTempDirectory("graft_mls_upsert").toString
    ManifestLake.create(spark, dir, mkBase(), "ts",
      statsCols = Seq("uid", "cat"))
    // rewrite day 2 only: uid 150 moves to 1150
    val upd = Seq((150L, ts("2024-01-02 13:00:00"), "z", 9.9))
      .toDF("uid", "ts", "cat", "amount")
    ManifestLake.upsert(spark, dir, upd, Seq("uid"), "ts")
    val rep = ManifestLake.candidateFiles(spark, dir, "cat = 'z'")
    // only the rewritten day-2 file can hold 'z'
    assert(rep.totalFiles == 4 && rep.keptFiles.size == 1,
      s"kept ${rep.keptFiles.size}/${rep.totalFiles}")
    assert(rep.keptFiles.head.contains("pday=2024-01-02"))
    agree(dir, "cat = 'z'")
    agree(dir, "uid = 399") // untouched day's stats carried forward
    assert(ManifestLake.candidateFiles(spark, dir, "uid = 399")
      .keptFiles.size == 1)
    // streaming-style append registers its files too
    val extra = Seq((9999L, ts("2024-01-05 08:00:00"), "q", 1.0))
      .toDF("uid", "ts", "cat", "amount")
    ManifestLake.appendBatch(spark, dir, extra, "ts", batchId = 0L)
    val rep2 = ManifestLake.candidateFiles(spark, dir, "uid >= 9000")
    assert(rep2.totalFiles == 5 && rep2.keptFiles.size == 1)
    agree(dir, "uid >= 9000")
  }

  test("clusterBy compaction earns intra-day skipping that hash-spread ingest cannot") {
    val dir = Files.createTempDirectory("graft_mls_cluster").toString
    val oneDay = (0 until 40000).map { i =>
      (i.toLong, ts("2024-02-01 06:00:00"), s"doc-$i", i / 100.0)
    }.toDF("uid", "ts", "cat", "amount")
    ManifestLake.create(spark, dir, oneDay, "ts", filesPerDay = 4,
      statsCols = Seq("uid"))
    val before = ManifestLake.candidateFiles(spark, dir,
      "uid >= 1000 AND uid < 1100")
    // hash-spread ingest: every file covers ~the full uid range, so
    // nothing skips (file COUNT is ≤ filesPerDay — spread values that
    // hash-collide into one shuffle partition share a file)
    assert(before.totalFiles >= 2 &&
      before.keptFiles.size == before.totalFiles)
    agree(dir, "uid >= 1000 AND uid < 1100")
    ManifestLake.compactDay(spark, dir, "2024-02-01",
      targetFileBytes = 64 * 1024, clusterBy = Seq("uid"))
    val after = ManifestLake.candidateFiles(spark, dir,
      "uid >= 1000 AND uid < 1100")
    assert(after.totalFiles >= 3, s"compaction produced ${after.totalFiles}")
    assert(after.keptFiles.size * 2 <= after.totalFiles,
      s"kept ${after.keptFiles.size}/${after.totalFiles} after clustering")
    agree(dir, "uid >= 1000 AND uid < 1100")
    // the pruned read's actual file set matches the report
    val opened = ManifestLake.readWhere(spark, dir,
      "uid >= 1000 AND uid < 1100").inputFiles.filter(_.contains("/data/"))
    assert(opened.length == after.keptFiles.size)
  }

  test("zOrder compaction keeps both cluster columns prunable") {
    val dir = Files.createTempDirectory("graft_mls_z").toString
    // two independent uniform dims on one day (the ZOrderSpec grid)
    val grid = (0 until 20000).map { i =>
      (i.toLong, (i % 141).toLong, ((i / 141) % 141).toLong,
        ts("2024-03-01 00:00:00"))
    }.toDF("id", "a", "b", "ts")
    ManifestLake.create(spark, dir, grid, "ts", filesPerDay = 4,
      statsCols = Seq("a", "b"))
    ManifestLake.compactDay(spark, dir, "2024-03-01",
      targetFileBytes = 24 * 1024, clusterBy = Seq("a", "b"), zOrder = true)
    val onA = ManifestLake.candidateFiles(spark, dir, "a >= 10 AND a < 20")
    val onB = ManifestLake.candidateFiles(spark, dir, "b >= 10 AND b < 20")
    assert(onA.totalFiles >= 4, s"only ${onA.totalFiles} files")
    assert(onA.keptFiles.size < onA.totalFiles, "a-dim did not prune")
    assert(onB.keptFiles.size < onB.totalFiles, "b-dim did not prune")
    agree(dir, "a >= 10 AND a < 20")
    agree(dir, "b >= 10 AND b < 20")
  }

  test("timestamp and date literals prune in their own domains") {
    val dir = Files.createTempDirectory("graft_mls_ts").toString
    ManifestLake.create(spark, dir, mkBase(), "ts", statsCols = Seq("ts"))
    val rep = ManifestLake.candidateFiles(spark, dir,
      "ts >= TIMESTAMP '2024-01-03 00:00:00'")
    assert(rep.totalFiles == 4 && rep.keptFiles.size == 2,
      s"kept ${rep.keptFiles.size}/${rep.totalFiles}")
    agree(dir, "ts >= TIMESTAMP '2024-01-03 00:00:00'")
    // a bare string literal against the timestamp column prunes too
    val str = ManifestLake.candidateFiles(spark, dir,
      "ts < '2024-01-02 00:00:00'")
    assert(str.keptFiles.size == 1)
    agree(dir, "ts < '2024-01-02 00:00:00'")
  }

  test("string-vs-timestamp prune is sound on a non-UTC session (ADVICE r11)") {
    // Spark casts a string literal against a timestamp column in
    // spark.sql.session.timeZone; the prune used to render it at a
    // hardcoded UTC, shifting the boundary by the zone offset. With
    // America/New_York (UTC-5 in January), '2024-01-02 04:00:00'
    // casts to 09:00Z — day 2's rows at 06:00Z MATCH, but the old
    // UTC-rendered boundary (04:00Z) pruned their file: wrong rows.
    val dir = Files.createTempDirectory("graft_mls_tz").toString
    val rows = (0 until 400).map { i =>
      val d = i / 100
      (i.toLong, ts(f"2024-01-${d + 1}%02d ${if (d == 0) "12" else "06"}:00:00"),
        "c", 1.0)
    }.toDF("uid", "ts", "cat", "amount")
    ManifestLake.create(spark, dir, rows, "ts", statsCols = Seq("ts"))
    val zoneKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(zoneKey)
    try {
      spark.conf.set(zoneKey, "America/New_York")
      val pred = "ts < '2024-01-02 04:00:00'"
      agree(dir, pred) // pruned read ≡ full-scan filter (the bug diverged here)
      val rep = ManifestLake.candidateFiles(spark, dir, pred)
      // day 2 (06:00Z < 09:00Z boundary) must be KEPT; days 3-4
      // (Jan 3/4 06:00Z ≥ boundary) still prune — soundness did not
      // cost the skip.
      assert(rep.keptFiles.size == 2 && rep.totalFiles == 4,
        s"kept ${rep.keptFiles.size}/${rep.totalFiles}")
    } finally spark.conf.set(zoneKey, saved)
  }

  test("prefix LIKE prunes string files and day directories") {
    val dir = Files.createTempDirectory("graft_mls_prefix").toString
    // cat carries a per-day prefix: day k's values are pk-<uid>
    val rows = (0 until 400).map { i =>
      val d = i / 100
      (i.toLong, ts(f"2024-01-${d + 1}%02d 12:00:00"), s"p$d-$i", 1.0)
    }.toDF("uid", "ts", "cat", "amount")
    ManifestLake.create(spark, dir, rows, "ts", statsCols = Seq("cat"))
    val rep = ManifestLake.candidateFiles(spark, dir, "cat LIKE 'p2-%'")
    assert(rep.totalFiles == 4 && rep.keptFiles.size == 1,
      s"kept ${rep.keptFiles.size}/${rep.totalFiles}")
    agree(dir, "cat LIKE 'p2-%'")
    // day-key prefixes prune directories too
    val dayRep = ManifestLake.candidateFiles(spark, dir, "day LIKE '2024-01-0%'")
    assert(dayRep.keptFiles.size == 4) // all 4 days share the prefix
    agree(dir, "day LIKE '2024-01-0%'")
    // non-prefix patterns are residue: kept, correct
    val residue = ManifestLake.candidateFiles(spark, dir, "cat LIKE '%-250'")
    assert(residue.keptFiles.size == residue.totalFiles)
    agree(dir, "cat LIKE '%-250'")
    agree(dir, "cat LIKE 'p_-250'") // _ wildcard → residue
  }

  test("streaming-shape appends: a time-range predicate opens only the covering batches' files") {
    val dir = Files.createTempDirectory("graft_mls_stream").toString
    // seed the table (day 1) with ts indexed, then 5 batch appends
    // with advancing timestamps — the sink layout before compaction
    val seed = Seq((0L, ts("2024-06-01 00:00:30"), 0.0))
      .toDF("uid", "ts", "value")
    ManifestLake.create(spark, dir, seed, "ts", statsCols = Seq("ts", "uid"))
    (0 until 5).foreach { b =>
      val batch = (0 until 100).map { i =>
        (100L * b + i, ts(f"2024-06-01 0$b:${i % 60}%02d:00"), i.toDouble)
      }.toDF("uid", "ts", "value")
      ManifestLake.appendBatch(spark, dir, batch, "ts", batchId = b.toLong)
    }
    // one day directory, 6 files (seed + 5 batches); a predicate on
    // the last hour must open only the file whose ts range covers it
    val pred = "ts >= TIMESTAMP '2024-06-01 04:00:00'"
    val rep = ManifestLake.candidateFiles(spark, dir, pred)
    assert(rep.totalFiles == 6, s"${rep.totalFiles} files")
    assert(rep.keptFiles.size == 1, s"kept ${rep.keptFiles.mkString(",")}")
    agree(dir, pred)
    agree(dir, "ts < TIMESTAMP '2024-06-01 01:00:00'")
    assert(ManifestLake.candidateFiles(spark, dir,
      "ts < TIMESTAMP '2024-06-01 01:00:00'").keptFiles.size == 2)
  }

  test("double boundary literals prune in Spark's coercion space, not exact-decimal space") {
    val dir = Files.createTempDirectory("graft_mls_dbl").toString
    // day 1's amounts start at exactly 0.1d; day 2's at 1.1d. The
    // decimal literal 0.1 ≠ double 0.1 in exact-decimal space, so an
    // exact-space pruner would wrongly drop day 1 for `amount <= 0.1`
    // (the r11 review finding); the 'F' domain compares as doubles,
    // the space Spark's filter actually evaluates in.
    val rows =
      (0 until 50).map(i => (i.toLong, ts("2024-07-01 10:00:00"), 0.1 + i / 10.0)) ++
      (0 until 50).map(i => (100L + i, ts("2024-07-02 10:00:00"), 1.1 + i / 10.0))
    ManifestLake.create(spark, dir, rows.toDF("uid", "ts", "amount"), "ts",
      statsCols = Seq("amount"))
    val rep = ManifestLake.candidateFiles(spark, dir, "amount <= 0.1")
    assert(rep.totalFiles == 2 && rep.keptFiles.size == 1,
      s"kept ${rep.keptFiles.size}/${rep.totalFiles} — day 1 holds matches")
    agree(dir, "amount <= 0.1")
    // a literal past day 1's whole range prunes it; day 2 stays
    agree(dir, "amount > 5.5")
    assert(ManifestLake.candidateFiles(spark, dir, "amount > 5.5")
      .keptFiles.size == 1)
  }

  test("bloom index prunes equality on UNclustered ingest where min/max cannot") {
    val dir = Files.createTempDirectory("graft_mls_bloom").toString
    // one day, 8 hash-spread files: every file spans ~the full uid
    // range, so the min/max envelope keeps everything — the exact
    // case the bloom index exists for
    val rows = (0 until 4000).map { i =>
      (i.toLong, ts("2024-05-01 06:00:00"), s"c${i % 3}", i / 10.0)
    }.toDF("uid", "ts", "cat", "amount")
    ManifestLake.create(spark, dir, rows, "ts", filesPerDay = 8,
      statsCols = Seq("uid"), bloomCols = Seq("uid", "cat"))
    val stats = ManifestLake.candidateFiles(spark, dir, "uid = 1234")
    assert(stats.totalFiles >= 4, s"${stats.totalFiles} files")
    // the uid lives in exactly ONE file; blooms find it (≤1 fp slack)
    assert(stats.keptFiles.size <= 2,
      s"bloom kept ${stats.keptFiles.size}/${stats.totalFiles}")
    agree(dir, "uid = 1234")
    // IN-list: union of the members' files
    val in = ManifestLake.candidateFiles(spark, dir, "uid IN (7, 1234, 3999)")
    assert(in.keptFiles.size <= 4, s"kept ${in.keptFiles.size}")
    agree(dir, "uid IN (7, 1234, 3999)")
    // absent key: nothing to open (deterministic corpus+hashes)
    val absent = ManifestLake.candidateFiles(spark, dir, "uid = 999999")
    assert(absent.keptFiles.isEmpty, absent.keptFiles.mkString(","))
    agree(dir, "uid = 999999")
    // string column: low-cardinality cat is in EVERY file — blooms
    // honestly keep everything, and the answer stays right
    val catEq = ManifestLake.candidateFiles(spark, dir, "cat = 'c1'")
    assert(catEq.keptFiles.size == catEq.totalFiles)
    agree(dir, "cat = 'c1'")
    // range conjuncts don't consult blooms — still correct via stats
    agree(dir, "uid >= 100 AND uid < 200")
  }

  test("bloom-only table registers files; blooms survive upsert and compaction rebuilds") {
    val dir = Files.createTempDirectory("graft_mls_bloom2").toString
    ManifestLake.create(spark, dir, mkBase(), "ts",
      bloomCols = Seq("uid"))
    val rep = ManifestLake.candidateFiles(spark, dir, "uid = 150")
    assert(rep.totalFiles == 4 && rep.keptFiles.size == 1,
      s"kept ${rep.keptFiles.size}/${rep.totalFiles}")
    agree(dir, "uid = 150")
    // upsert rewrites day 2 → its new generation gets a fresh sidecar
    val upd = Seq((150L, ts("2024-01-02 13:00:00"), "z", 9.9))
      .toDF("uid", "ts", "cat", "amount")
    ManifestLake.upsert(spark, dir, upd, Seq("uid"), "ts")
    assert(ManifestLake.candidateFiles(spark, dir, "uid = 150")
      .keptFiles.size == 1)
    agree(dir, "uid = 150")
    ManifestLake.compactDay(spark, dir, "2024-01-02")
    assert(ManifestLake.candidateFiles(spark, dir, "uid = 150")
      .keptFiles.size == 1)
    agree(dir, "uid = 150")
    // kind-mismatched literals must SKIP the bloom entirely (keep all
    // files) — probing with the literal's own rendering against a
    // bloom built over cast-to-string of the column would miss files
    // holding matching rows under Spark's coercion (review finding)
    val dbl = ManifestLake.candidateFiles(spark, dir, "uid = 150.0")
    assert(dbl.keptFiles.size == dbl.totalFiles, "double literal probed bloom")
    agree(dir, "uid = 150.0")
    val strLit = ManifestLake.candidateFiles(spark, dir, "uid = '150'")
    assert(strLit.keptFiles.size == strLit.totalFiles,
      "string literal probed the integral bloom")
    agree(dir, "uid = '150'")
  }

  test("crash between data write and commit leaves old stats and old answer") {
    val dir = Files.createTempDirectory("graft_mls_crash").toString
    ManifestLake.create(spark, dir, mkBase(), "ts", statsCols = Seq("cat"))
    val before = ManifestLake.readWhere(spark, dir, "cat = 'a'")
      .collect().map(_.toString).sorted.toSeq
    val upd = Seq((1L, ts("2024-01-01 23:00:00"), "CRASHED", 0.0))
      .toDF("uid", "ts", "cat", "amount")
    intercept[RuntimeException] {
      ManifestLake.upsert(spark, dir, upd, Seq("uid"), "ts",
        beforeCommit = () => throw new RuntimeException("die"))
    }
    assert(ManifestLake.readWhere(spark, dir, "cat = 'CRASHED'").count() == 0)
    assert(ManifestLake.readWhere(spark, dir, "cat = 'a'")
      .collect().map(_.toString).sorted.toSeq == before)
  }

  test("stats live in per-generation sidecars: the manifest stays O(dirs) across commits") {
    val dir = Files.createTempDirectory("graft_mls_side").toString
    ManifestLake.create(spark, dir, mkBase(), "ts",
      statsCols = Seq("uid", "cat"))
    def manifestStatLines(v: Long): Int = {
      val src = scala.io.Source.fromFile(
        f"$dir/_graft_log/$v%08d.manifest", "UTF-8")
      try src.getLines().count(l => l.startsWith("#f") || l.startsWith("#c"))
      finally src.close()
    }
    assert(manifestStatLines(1L) == 0,
      "a sidecar-era manifest must carry no per-file stat lines")
    // sidecar written for the create generation; pruning works off it
    assert(new java.io.File(s"$dir/_graft_log/stats").listFiles()
      .count(_.getName.endsWith(".idx")) == 1)
    assert(ManifestLake.candidateFiles(spark, dir, "uid = 150")
      .keptFiles.size == 1)
    // an append adds ONE sidecar and zero manifest stat lines — the
    // commit's metadata cost is O(new files), not O(table files)
    val extra = Seq((9999L, ts("2024-01-05 08:00:00"), "q", 1.0))
      .toDF("uid", "ts", "cat", "amount")
    ManifestLake.appendBatch(spark, dir, extra, "ts", batchId = 0L)
    assert(manifestStatLines(2L) == 0)
    assert(new java.io.File(s"$dir/_graft_log/stats").listFiles()
      .count(_.getName.endsWith(".idx")) == 2)
    val rep = ManifestLake.candidateFiles(spark, dir, "uid >= 9000")
    assert(rep.totalFiles == 5 && rep.keptFiles.size == 1)
    agree(dir, "uid >= 9000")
    // an upsert retires the rewritten generation's entries by liveness
    // (the dropped dir no longer appears in the manifest) — files from
    // a PARTIALLY superseded generation must not resurface
    val upd = Seq((150L, ts("2024-01-02 13:00:00"), "z", 9.9))
      .toDF("uid", "ts", "cat", "amount")
    ManifestLake.upsert(spark, dir, upd, Seq("uid"), "ts")
    val rep2 = ManifestLake.candidateFiles(spark, dir, "cat = 'z'")
    assert(rep2.totalFiles == 5 && rep2.keptFiles.size == 1, rep2.keptFiles)
    agree(dir, "cat = 'z'")
    // a PARTIALLY superseded generation keeps its sidecar (days 1/3/4
    // still live in it); compacting the single-day append generation
    // makes THAT one fully unreferenced, and vacuum reclaims its
    // sidecar together with the data
    ManifestLake.compactDay(spark, dir, "2024-01-05")
    val statsBefore = new java.io.File(s"$dir/_graft_log/stats")
      .listFiles().count(_.getName.endsWith(".idx"))
    ManifestLake.vacuum(spark, dir, retentionMs = 0L, force = true)
    val statsAfter = new java.io.File(s"$dir/_graft_log/stats")
      .listFiles().count(_.getName.endsWith(".idx"))
    assert(statsAfter < statsBefore, "orphan sidecar not reclaimed")
    agree(dir, "cat = 'z'")
    agree(dir, "uid >= 9000")
  }

  test("pre-sidecar manifests: legacy stat lines prune, carry across commits, and retire via compaction") {
    val dir = Files.createTempDirectory("graft_mls_legacy").toString
    ManifestLake.create(spark, dir, mkBase(), "ts",
      statsCols = Seq("uid", "cat"))
    // devolve to the pre-sidecar format: fold every sidecar's lines
    // into the manifest body and delete the sidecar dir — the on-disk
    // state an upgrading deployment starts from
    val statsDir = new java.io.File(s"$dir/_graft_log/stats")
    val sideLines = statsDir.listFiles().filter(_.getName.endsWith(".idx"))
      .flatMap { f =>
        val src = scala.io.Source.fromFile(f, "UTF-8")
        try src.getLines().toArray finally src.close()
      }
    assert(sideLines.nonEmpty)
    // rewrite through the Hadoop FS so the local checksum sidecar
    // stays consistent (a raw java.io write would poison the .crc)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = new org.apache.hadoop.fs.Path(s"$dir/_graft_log/00000001.manifest")
    val txt = {
      val in = fs.open(mf)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    val out = fs.create(mf, true)
    try out.write((txt.split('\n').filter(_.nonEmpty) ++ sideLines)
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    statsDir.listFiles().foreach(_.delete()); statsDir.delete()
    // legacy lines prune exactly as sidecar entries did
    assert(ManifestLake.candidateFiles(spark, dir, "uid = 150")
      .keptFiles.size == 1)
    agree(dir, "uid = 150")
    // a new commit CARRIES the legacy stats (manifest-resident) while
    // registering its own generation via sidecar — both prune
    val extra = Seq((9999L, ts("2024-01-05 08:00:00"), "q", 1.0))
      .toDF("uid", "ts", "cat", "amount")
    ManifestLake.appendBatch(spark, dir, extra, "ts", batchId = 0L)
    val rep = ManifestLake.candidateFiles(spark, dir, "uid = 150")
    assert(rep.totalFiles == 5 && rep.keptFiles.size == 1)
    agree(dir, "uid = 150")
    assert(ManifestLake.candidateFiles(spark, dir, "uid >= 9000")
      .keptFiles.size == 1)
    // compacting a legacy day rewrites it WITH a sidecar and retires
    // its manifest-resident lines — the upgrade completes day by day
    ManifestLake.compactDay(spark, dir, "2024-01-02")
    val v = ManifestLake.snapshot(spark, dir).version
    val mfN = new java.io.File(f"$dir/_graft_log/$v%08d.manifest")
    val srcN = scala.io.Source.fromFile(mfN, "UTF-8")
    val legacyLeft = try srcN.getLines()
      .count(l => l.startsWith("#f") && l.contains("2024-01-02"))
    finally srcN.close()
    assert(legacyLeft == 0, "compacted day's legacy stat lines survived")
    assert(ManifestLake.candidateFiles(spark, dir, "uid = 150")
      .keptFiles.size == 1)
    agree(dir, "uid = 150")
  }
}
