package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Merge-on-read deletes (deletion vectors): the contract is
  *   - a DV delete removes rows from EVERY read path while touching
  *     zero data files (the day→dir map is bit-identical across the
  *     commit),
  *   - time travel still shows the pre-delete rows,
  *   - the next copy-on-write pass over a covered day applies the DV
  *     physically and retires the ref by manifest arithmetic,
  *   - the change feed reports DV deletes exactly once, reading only
  *     the covered days,
  *   - crash/replay behaves like every other commit (invisible until
  *     the rename, idempotent re-run),
  *   - stats/bloom pruning composes (pruning keeps a candidate file,
  *     the DV anti-join still removes its dead rows). */
class ManifestLakeDvSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkBase() = Seq(
    (1L, 10L, ts("2024-01-01 23:59:00"), "evil", 1.0),
    (2L, 20L, ts("2024-01-02 10:00:00"), "fine", 1.0),
    (3L, 30L, ts("2024-01-02 11:00:00"), "evil", 1.0),
    (4L, 40L, ts("2024-01-03 09:00:00"), "fine", 1.0))
    .toDF("user_id", "event_id", "ts", "event_type", "value")

  private def ids(dir: String): Set[Long] =
    ManifestLake.read(spark, dir).select("event_id")
      .collect().map(_.getLong(0)).toSet

  test("DV delete: rows vanish from every read, zero data files touched, time travel intact") {
    val dir = Files.createTempDirectory("graft_dv_basic").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val daysBefore = ManifestLake.snapshot(spark, dir).days
    assert(ManifestLake.deleteWhereDV(spark, dir,
      col("event_type") === "evil") == 2L)
    assert(ids(dir) == Set(20L, 40L))
    // the day→dir map is IDENTICAL — no generation was written
    val snap = ManifestLake.snapshot(spark, dir)
    assert(snap.days == daysBefore, "DV delete rewrote data")
    assert(snap.dvs.size == 1 && snap.dvs.head._2.toSet.size == 2,
      s"expected one ref covering two dirs: ${snap.dvs}")
    // readDays and readVersion agree with their contracts
    assert(ManifestLake.readDays(spark, dir, _ == "2024-01-02")
      .select("event_id").collect().map(_.getLong(0)).toSet == Set(20L))
    assert(ManifestLake.readVersion(spark, dir, 1L).count() == 4)
    // NULL-predicate rows survive; zero matches commit nothing
    val v = snap.version
    assert(ManifestLake.deleteWhereDV(spark, dir,
      col("event_type") === "nope") == 0L)
    assert(ManifestLake.snapshot(spark, dir).version == v)
  }

  test("DV delete crash between sidecar write and commit: invisible, re-run applies once") {
    val dir = Files.createTempDirectory("graft_dv_crash").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    intercept[RuntimeException] {
      ManifestLake.deleteWhereDV(spark, dir, col("event_type") === "evil",
        beforeCommit = () => throw new RuntimeException("kill -9"))
    }
    assert(ids(dir) == Set(10L, 20L, 30L, 40L), "crashed DV leaked")
    // the orphan sidecar is on disk and vacuum reclaims it
    assert(new java.io.File(s"$dir/_graft_log/dv").listFiles().nonEmpty)
    assert(ManifestLake.deleteWhereDV(spark, dir,
      col("event_type") === "evil") == 2L)
    assert(ids(dir) == Set(20L, 40L))
    val deleted = ManifestLake.vacuum(spark, dir, retentionMs = 0L, force = true)
    assert(deleted.exists(_.contains("/dv/")), "orphan DV not reclaimed")
    assert(ids(dir) == Set(20L, 40L), "vacuum touched the live DV")
  }

  test("second DV delete sees the first (no double positions); dayBound is a promise") {
    val dir = Files.createTempDirectory("graft_dv_second").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.deleteWhereDV(spark, dir, col("event_id") === 10L)
    // value > 0 matches everything still visible — but only day 2's
    // rows are inside the bound
    assert(ManifestLake.deleteWhereDV(spark, dir, col("value") > 0.0,
      dayBound = Some(_ == "2024-01-02")) == 2L)
    assert(ids(dir) == Set(40L))
    assert(ManifestLake.snapshot(spark, dir).dvs.size == 2)
  }

  test("copy-on-write passes retire DVs: compaction applies them physically, refs shrink then vanish") {
    val dir = Files.createTempDirectory("graft_dv_retire").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.deleteWhereDV(spark, dir, col("event_type") === "evil")
    // the ref covers days 1 and 2; compacting day 1 shrinks it
    ManifestLake.compactDay(spark, dir, "2024-01-01")
    val afterOne = ManifestLake.snapshot(spark, dir)
    assert(afterOne.dvs.size == 1 &&
      afterOne.dvs.head._2.forall(_.contains("2024-01-02")),
      s"ref should cover only day 2 now: ${afterOne.dvs}")
    assert(ids(dir) == Set(20L, 40L))
    // the rewritten day no longer holds the row PHYSICALLY: reading
    // its directory raw shows only the survivor
    val day1Dir = afterOne.days("2024-01-01").head
    assert(spark.read.parquet(s"$dir/$day1Dir").count() == 0 ||
      spark.read.parquet(s"$dir/$day1Dir")
        .filter(col("event_id") === 10L).count() == 0,
      "compaction did not apply the DV")
    // compacting day 2 retires the ref entirely
    ManifestLake.compactDay(spark, dir, "2024-01-02")
    assert(ManifestLake.snapshot(spark, dir).dvs.isEmpty,
      "fully-rewritten DV ref survived")
    assert(ids(dir) == Set(20L, 40L))
  }

  test("upsert over a DV-covered day applies the DV and can legitimately re-insert the key") {
    val dir = Files.createTempDirectory("graft_dv_upsert").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.deleteWhereDV(spark, dir, col("event_id") === 30L)
    assert(ids(dir) == Set(10L, 20L, 40L))
    // re-insert the deleted key with fresh data: the upsert rewrite is
    // DV-aware (old row stays dead) and the new row is in a NEW file
    // no DV covers
    val upd = Seq((3L, 30L, ts("2024-01-02 12:00:00"), "reborn", 2.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.upsert(spark, dir, upd, Seq("user_id", "event_id"), "ts")
    val got = ManifestLake.read(spark, dir)
      .filter(col("event_id") === 30L)
      .select("event_type").collect().map(_.getString(0)).toSeq
    assert(got == Seq("reborn"), s"got $got")
    // day 2 was the only covered dir and it was rewritten → ref gone
    assert(ManifestLake.snapshot(spark, dir).dvs.isEmpty)
  }

  test("change feed across a DV window: exactly the deleted rows, only covered days read") {
    val dir = Files.createTempDirectory("graft_dv_feed").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.deleteWhereDV(spark, dir, col("event_type") === "evil") // v2
    val ch = ManifestLake.readChanges(spark, dir, 1L, 2L)
      .select("_change_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ch == Set(("delete", 10L), ("delete", 30L)), ch)
    // day 3 (uncovered) is never opened
    val opened = ManifestLake.readChanges(spark, dir, 1L, 2L)
      .inputFiles.filter(_.contains("/data/"))
    assert(opened.nonEmpty && opened.forall(f =>
      f.contains("pday=2024-01-01") || f.contains("pday=2024-01-02")),
      s"uncovered day read: ${opened.mkString(",")}")
    // a later window that only appends does not re-report the DV
    val b = Seq((9L, 90L, ts("2024-01-04 08:00:00"), "fine", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L) // v3
    val ch2 = ManifestLake.readChanges(spark, dir, 2L, 3L)
      .select("_change_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ch2 == Set(("insert", 90L)), ch2)
    // net effect v1→v3: the two DV deletes and the append
    val ch3 = ManifestLake.readChanges(spark, dir, 1L, 3L)
      .select("_change_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ch3 == Set(("delete", 10L), ("delete", 30L), ("insert", 90L)), ch3)
  }

  test("mirror: a DV window is refused like any rewrite; skipRewrites advances past it") {
    val src = Files.createTempDirectory("graft_dv_mir_src").toString
    val dst = Files.createTempDirectory("graft_dv_mir_dst").toString + "/m"
    ManifestLake.create(spark, src, mkBase(), "ts")
    ManifestLake.replicateOnce(spark, src, dst, "ts")
    ManifestLake.deleteWhereDV(spark, src, col("event_type") === "evil")
    val e = intercept[IllegalStateException] {
      ManifestLake.replicateOnce(spark, src, dst, "ts")
    }
    assert(e.getMessage.contains("DV delete"), e.getMessage)
    ManifestLake.replicateOnce(spark, src, dst, "ts", skipRewrites = true)
    assert(ManifestLake.read(spark, dst).count() == 4) // knowingly diverged
  }

  test("DV positions survive a table root that URL-encodes (space, percent): refs retire correctly, rows never resurface") {
    // _metadata.file_path percent-encodes ('a b' → 'a%20b') while the
    // manifest stores plain dirs — a length-shifted derivation here
    // silently drops DV refs at the next commit and resurrects every
    // deleted row (the review-found failure mode, pinned)
    val dir = Files.createTempDirectory("graft dv%enc").toString + "/my lake"
    ManifestLake.create(spark, dir, mkBase(), "ts")
    assert(ManifestLake.deleteWhereDV(spark, dir,
      col("event_type") === "evil") == 2L)
    assert(ids(dir) == Set(20L, 40L))
    // covered dirs must equal MANIFEST dir strings exactly
    val snap = ManifestLake.snapshot(spark, dir)
    val live = snap.days.values.flatten.toSet
    assert(snap.dvs.head._2.forall(live.contains),
      s"derived dirs ${snap.dvs.head._2} not in manifest dirs $live")
    // an append commit must CARRY the ref (prune-by-liveness keeps it)
    val b = Seq((9L, 90L, ts("2024-01-04 08:00:00"), "fine", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L)
    assert(ManifestLake.snapshot(spark, dir).dvs.nonEmpty,
      "DV ref dropped by the commit — deleted rows resurface")
    assert(ids(dir) == Set(20L, 40L, 90L))
    // and compaction of a covered day retires it for real
    ManifestLake.compactDay(spark, dir, "2024-01-01")
    ManifestLake.compactDay(spark, dir, "2024-01-02")
    assert(ManifestLake.snapshot(spark, dir).dvs.isEmpty)
    assert(ids(dir) == Set(20L, 40L, 90L))
  }

  test("maintain: one pass folds appended days, retires active DVs, touches nothing else") {
    val dir = Files.createTempDirectory("graft_dv_maint").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val b = Seq((11L, 101L, ts("2024-01-02 12:00:00"), "fine", 7.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L)
    ManifestLake.deleteWhereDV(spark, dir, col("event_type") === "evil")
    val before = ids(dir)
    val days = ManifestLake.maintain(spark, dir)
    // day 1 (DV-covered) and day 2 (two dirs AND covered) compact;
    // day 3 is single-dir and uncovered — untouched
    assert(days == Seq("2024-01-01", "2024-01-02"), days)
    val snap = ManifestLake.snapshot(spark, dir)
    assert(snap.days.values.forall(_.size == 1), snap.days)
    assert(snap.dvs.isEmpty, "maintain left an active DV")
    assert(ids(dir) == before && before == Set(20L, 40L, 101L))
    // a second pass finds nothing to do
    assert(ManifestLake.maintain(spark, dir).isEmpty)
  }

  test("readWhereAt: pruned time travel — the pre-delete snapshot answers with the deleted rows") {
    val dir = Files.createTempDirectory("graft_dv_twa").toString
    val wide = (0 until 400).map { i =>
      (i.toLong, ts(f"2024-01-${i / 100 + 1}%02d 12:00:00"), i % 7)
    }.toDF("uid", "ts", "tag")
    ManifestLake.create(spark, dir, wide, "ts", statsCols = Seq("uid"))
    // cluster so uid actually prunes, then DV-delete tag 3 (v-head)
    ManifestLake.snapshot(spark, dir).days.keys.foreach(d =>
      ManifestLake.compactDay(spark, dir, d, targetFileBytes = 4 * 1024,
        clusterBy = Seq("uid")))
    val preDelete = ManifestLake.snapshot(spark, dir).version
    ManifestLake.deleteWhereDV(spark, dir, col("tag") === 3)
    // uid 3 has tag 3: gone at head, present at the audit version
    assert(ManifestLake.readWhere(spark, dir, "uid = 3").count() == 0)
    val audit = ManifestLake.readWhereAt(spark, dir, preDelete, "uid = 3")
    assert(audit.count() == 1)
    // and the audit read PRUNED: it opened a strict subset of files
    val opened = audit.inputFiles.filter(_.contains("/data/")).length
    val total = ManifestLake.readVersion(spark, dir, preDelete)
      .inputFiles.count(_.contains("/data/"))
    assert(opened < total, s"no pruning: opened $opened of $total")
  }

  test("DV composes with stats/bloom pruning: readWhere stays exact on an indexed lake") {
    val dir = Files.createTempDirectory("graft_dv_stats").toString
    val wide = (0 until 400).map { i =>
      (i.toLong, ts(f"2024-01-${i / 100 + 1}%02d 12:00:00"), i % 7)
    }.toDF("uid", "ts", "tag")
    ManifestLake.create(spark, dir, wide, "ts",
      statsCols = Seq("uid"), bloomCols = Seq("uid"))
    ManifestLake.deleteWhereDV(spark, dir, col("tag") === 3)
    def agree(pred: String): Unit = {
      val pruned = ManifestLake.readWhere(spark, dir, pred)
        .collect().map(_.toString).sorted.toSeq
      val full = ManifestLake.read(spark, dir).filter(pred)
        .collect().map(_.toString).sorted.toSeq
      assert(pruned == full, s"pred [$pred] diverged under DV")
    }
    agree("uid >= 250 AND uid < 320")
    agree("uid = 150")
    // a DV-deleted row must not resurface through the pruned path
    assert(ManifestLake.readWhere(spark, dir, "uid = 3").count() == 0,
      "uid 3 has tag 3 and is DV-deleted")
    assert(ManifestLake.read(spark, dir).count() == 343) // 400 − 57 tag-3 rows
  }
}
