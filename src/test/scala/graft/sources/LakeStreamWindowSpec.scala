package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming source's window primitives, driven directly (the
  * engine-level contract lives in LakeStreamSourceSpec): replay
  * determinism — the property exactly-once rests on — and the
  * admission-control walk. */
class LakeStreamWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def mk(ids: Range, day: Int) =
    ids.map(i => (i.toLong, ts(f"2024-02-$day%02d 10:00:00"), s"v$i"))
      .toDF("id", "ts", "v")

  test("window replay is deterministic: same offsets, identical rows") {
    val src = Files.createTempDirectory("graft_lsw_det").toString
    ManifestLake.create(spark, src, mk(0 until 25, 1), "ts")
    ManifestLake.appendBatch(spark, src, mk(50 until 60, 2), "ts", 0L)
    // a crash between the sink's commit and the engine's offset-log
    // write re-runs the SAME (from, to] window — immutable manifests
    // must return the same rows, or "exactly-once" quietly isn't
    val head = ManifestLake.snapshot(spark, src).version
    val want = ManifestLake.read(spark, src).schema
    def window(): Set[(Long, String)] =
      ManifestLake.streamWindowBatch(spark, src, 0L, head, want,
        skipRewrites = false)
        .select("id", "v").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
    val a = window()
    val b = window()
    assert(a == b && a.size == 35)
    // and a mid-history window excludes both earlier and later commits
    val mid = ManifestLake.streamWindowBatch(spark, src, 1L, head, want,
      skipRewrites = false)
    assert(mid.select("id").collect().map(_.getLong(0)).toSet ==
      (50L until 60L).toSet)
  }

  test("a rename CYCLE inside one window (column swap) is refused, never transposed (review r13)") {
    val src = Files.createTempDirectory("graft_lsw_swap").toString
    val df = (0 until 10)
      .map(i => (i.toLong, ts("2024-02-01 10:00:00"), s"a$i", s"b$i"))
      .toDF("id", "ts", "c1", "c2")
    ManifestLake.create(spark, src, df, "ts")
    // activate mapping so the logical names diverge from the stored
    // names (while logical == physical the shadow guard already
    // refuses any swap attempt — that path is spec-pinned in
    // ManifestLakeMappingSpec); AFTER divergence a swap becomes
    // expressible through three legal renames
    ManifestLake.renameColumn(spark, src, "c1", "ca") // stored 'c1'
    ManifestLake.renameColumn(spark, src, "c2", "cb") // stored 'c2'
    val pinV = ManifestLake.snapshot(spark, src).version
    val want = ManifestLake.read(spark, src).schema
    // swap ca↔cb through a temp name: THREE metadata commits whose
    // net effect keeps the logical name SET identical while every
    // shared name now resolves to the other column's stored bytes —
    // a set-equality guard alone would let the batch flow transposed
    ManifestLake.renameColumn(spark, src, "ca", "tmp0")
    ManifestLake.renameColumn(spark, src, "cb", "ca")
    ManifestLake.renameColumn(spark, src, "tmp0", "cb")
    ManifestLake.appendBatch(spark, src,
      Seq((99L, ts("2024-02-02 10:00:00"), "a99", "b99"))
        .toDF("id", "ts", "ca", "cb"), "ts", 0L)
    val head = ManifestLake.snapshot(spark, src).version
    val boom = intercept[IllegalStateException] {
      ManifestLake.streamWindowBatch(spark, src, pinV, head, want,
        skipRewrites = false)
    }
    assert(boom.getMessage.contains("restart the query") &&
      boom.getMessage.contains("remapped"), boom.getMessage)
  }

  test("timestamp addressing: readAsOf resolves to the latest commit at-or-before; startingTimestamp includes at-or-after") {
    val src = Files.createTempDirectory("graft_lsw_ts").toString
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts") // v1
    Thread.sleep(1100)
    val between = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(1100)
    ManifestLake.appendBatch(spark, src, mk(50 until 60, 2), "ts", 0L) // v2
    // TIMESTAMP AS OF between the commits answers v1
    assert(ManifestLake.versionAt(spark, src, between) == 1L)
    assert(ManifestLake.readAsOf(spark, src, between).count() == 10L)
    // after the head: resolves to head; before the table: refused
    val now = new java.sql.Timestamp(System.currentTimeMillis() + 1000)
    assert(ManifestLake.versionAt(spark, src, now) == 2L)
    val boom = intercept[IllegalArgumentException] {
      ManifestLake.versionAt(spark, src,
        java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
    }
    assert(boom.getMessage.contains("retention"), boom.getMessage)
    // the streaming cursor rule is at-or-AFTER: `between` must start
    // right below v2 (delivering v2's rows, not v1's), an instant past
    // head tails only, one before everything bootstraps fully
    assert(ManifestLake.startVersionForTimestamp(spark, src, between) == 1L)
    assert(ManifestLake.startVersionForTimestamp(spark, src, now) == 2L)
    assert(ManifestLake.startVersionForTimestamp(spark, src,
      java.sql.Timestamp.valueOf("2000-01-01 00:00:00")) == 0L)
  }

  test("tied / skewed commit mtimes: adjusted stamps stay strictly increasing, so each version's own instant resolves to ITSELF (ADVICE r13 #1-2)") {
    val src = Files.createTempDirectory("graft_lsw_tie").toString
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts") // v1
    ManifestLake.appendBatch(spark, src, mk(50 until 55, 2), "ts", 0L) // v2
    ManifestLake.appendBatch(spark, src, mk(60 until 65, 3), "ts", 1L) // v3
    // Force the pathological clocks: v1 and v2 share one mtime tick,
    // v3's clock runs BEHIND (OCC writer skew / a copied manifest).
    val base = System.currentTimeMillis() - 60000
    def stamp(v: Long, t: Long): Unit = assert(
      new java.io.File(src, f"_graft_log/$v%08d.manifest")
        .setLastModified(t))
    stamp(1L, base); stamp(2L, base); stamp(3L, base - 5000)
    // A non-strict running max would stamp v1 and v2 identically and
    // versionAt(v1's instant) — latest at-or-before — would answer v2.
    assert(ManifestLake.versionAt(spark, src,
      new java.sql.Timestamp(base)) == 1L)
    // history's displayed committed_at must round-trip through
    // versionAt to exactly its own version (the l_asof_travel path)
    val hist = ManifestLake.history(spark, src)
      .select("version", "committed_at").collect()
    assert(hist.length == 3)
    hist.foreach { r =>
      assert(ManifestLake.versionAt(spark, src,
        r.getTimestamp(1)) == r.getLong(0))
    }
    // adjusted instants are strictly increasing in version order even
    // though the raw mtimes tie then go backwards
    val stamps = hist.sortBy(_.getLong(0)).map(_.getTimestamp(1).getTime)
    assert(stamps.sliding(2).forall { case Array(a, b) => a < b })
    // and the readAsOf at v2's displayed instant sees v2's rows
    val atV2 = hist.find(_.getLong(0) == 2L).get.getTimestamp(1)
    assert(ManifestLake.readAsOf(spark, src, atV2).count() == 15L)
  }

  test("cappedStreamTarget: bounded budget advances at least one version, full budget reaches head") {
    val src = Files.createTempDirectory("graft_lsw_cap").toString
    ManifestLake.create(spark, src, mk(0 until 10, 1), "ts") // v1: 1 dir
    // v2 adds TWO days (two dirs in one commit)
    ManifestLake.appendBatch(spark, src,
      mk(100 until 105, 2).union(mk(110 until 115, 3)), "ts", 0L)
    ManifestLake.appendBatch(spark, src, mk(200 until 205, 4), "ts", 1L) // v3
    val head = ManifestLake.snapshot(spark, src).version
    assert(head == 3L)
    // budget 1 from v1: v2 alone exceeds it, but one oversized commit
    // still lands whole (per-commit atomicity is the floor)
    assert(ManifestLake.cappedStreamTarget(spark, src, 1L, head,
      Some(1)) == 2L)
    // budget 2 from v1: v2 fits exactly, v3 would exceed
    assert(ManifestLake.cappedStreamTarget(spark, src, 1L, head,
      Some(2)) == 2L)
    // budget 3 from v1: the whole window fits
    assert(ManifestLake.cappedStreamTarget(spark, src, 1L, head,
      Some(3)) == 3L)
    // unbounded reaches head
    assert(ManifestLake.cappedStreamTarget(spark, src, 0L, head,
      Some(Int.MaxValue)) == head)
    // byte budgets walk the SAME boundary rule off the size sidecars
    // (r15): a cap below v2's two-dir footprint stops at v2 (oversized
    // lands whole), a cap covering the whole window reaches head
    val bytesOfV2 = {
      val s = ManifestLake.snapshot(spark, src)
      s.fileBytes.filter(_._1.contains("pday=2024-02-0")).values.sum
    }
    assert(bytesOfV2 > 0L)
    assert(ManifestLake.cappedStreamTarget(spark, src, 1L, head, None,
      maxBytes = Some(1L)) == 2L)
    assert(ManifestLake.cappedStreamTarget(spark, src, 1L, head, None,
      maxBytes = Some(Long.MaxValue)) == head)
  }
}
