package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Column mapping (VERDICT r11 #6): ALTER TABLE RENAME/DROP COLUMN as
  * metadata-only commits over stable physical names — the Delta
  * column-mapping design on public primitives. Pins the full
  * contract: rename round-trips through every read AND write path
  * under the same stored bytes, time travel answers each version
  * under ITS names, stats/bloom skipping survives the rename (the
  * footer keys are physical), drop hides without deleting, and a
  * re-added name cannot resurrect dropped data. */
class ManifestLakeMappingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkBase() = (0 until 400).map { i =>
    val d = i / 100
    (i.toLong, ts(f"2024-01-${d + 1}%02d 12:00:00"), s"cat-${i % 3}",
      (i % 50) / 10.0)
  }.toDF("uid", "ts", "cat", "amount")

  test("rename: metadata-only commit; reads, writes, and time travel agree") {
    val dir = Files.createTempDirectory("graft_map_rename").toString
    ManifestLake.create(spark, dir, mkBase(), "ts",
      statsCols = Seq("uid", "amount"))
    val v1Files = ManifestLake.snapshot(spark, dir).days.values.flatten.toSet
    val beforeSum = ManifestLake.read(spark, dir)
      .agg(sum("amount")).head().getDouble(0)

    val v2 = ManifestLake.renameColumn(spark, dir, "amount", "price")
    // metadata-only: the data directories are IDENTICAL
    assert(ManifestLake.snapshot(spark, dir).days.values.flatten.toSet
      == v1Files, "rename rewrote data")
    val head = ManifestLake.read(spark, dir)
    assert(head.columns.contains("price") && !head.columns.contains("amount"))
    assert(head.agg(sum("price")).head().getDouble(0) == beforeSum)
    // time travel: version 1 still answers under the OLD name
    val old = ManifestLake.readVersion(spark, dir, 1L)
    assert(old.columns.contains("amount") && !old.columns.contains("price"))
    assert(old.agg(sum("amount")).head().getDouble(0) == beforeSum)

    // a write AFTER the rename lands under the SAME physical name as
    // every old file: upsert through the new name, read both ways
    val upd = Seq((0L, ts("2024-01-01 13:00:00"), "cat-9", 99.9))
      .toDF("uid", "ts", "cat", "price")
    ManifestLake.upsert(spark, dir, upd, Seq("uid"), "ts")
    val after = ManifestLake.read(spark, dir)
    assert(after.filter(col("uid") === 0L).head().getAs[Double]("price")
      == 99.9)
    assert(after.agg(count(when(col("price").isNull, 1))).head().getLong(0)
      == 0L, "a post-rename write split the column across physical names")
    // ...and the stored files really carry the ORIGINAL physical name
    val gens = ManifestLake.snapshot(spark, dir).days.values.flatten.toSeq
    val rawCols = spark.read.parquet(gens.map(p => s"$dir/$p"): _*).columns
    assert(rawCols.contains("amount") && !rawCols.contains("price"),
      s"stored columns: ${rawCols.mkString(",")}")

    // stats skipping keyed by the physical name still fires through a
    // predicate on the LOGICAL name
    val rep = ManifestLake.candidateFiles(spark, dir, "price >= 99.0")
    assert(rep.keptFiles.size < rep.totalFiles,
      s"no pruning on renamed column (kept ${rep.keptFiles.size}/${rep.totalFiles})")
    val viaStats = ManifestLake.readWhere(spark, dir, "price >= 99.0")
      .collect().map(_.toString).sorted.toSeq
    val full = ManifestLake.read(spark, dir).filter("price >= 99.0")
      .collect().map(_.toString).sorted.toSeq
    assert(viaStats == full)

    // compaction preserves the mapping (physical rewrite, logical read)
    val day = ManifestLake.snapshot(spark, dir).days.keys.min
    ManifestLake.compactDay(spark, dir, day, clusterBy = Seq("price"))
    val afterSum = ManifestLake.read(spark, dir)
      .agg(sum("price")).head().getDouble(0)
    // uid 0's amount was 0.0 before the upsert set price = 99.9
    assert(math.abs(afterSum - (beforeSum + 99.9)) < 1e-9,
      s"$afterSum vs ${beforeSum + 99.9}")
    assert(v2 == 2L)
  }

  test("drop hides without deleting; re-add cannot resurrect (fresh physical)") {
    val dir = Files.createTempDirectory("graft_map_drop").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.dropColumn(spark, dir, "cat")
    val head = ManifestLake.read(spark, dir)
    assert(!head.columns.contains("cat"))
    assert(head.count() == 400)
    // time travel still sees the dropped column's data
    assert(ManifestLake.readVersion(spark, dir, 1L)
      .filter(col("cat").isNotNull).count() == 400)
    // re-add the SAME logical name via evolution: every OLD row must
    // read NULL (fresh physical name), only the new rows carry values
    val extra = Seq((9999L, ts("2024-01-05 08:00:00"), "fresh", 1.0))
      .toDF("uid", "ts", "cat", "amount")
    ManifestLake.appendBatch(spark, dir, extra, "ts", batchId = 0L)
    val re = ManifestLake.read(spark, dir)
    assert(re.filter(col("cat").isNotNull).count() == 1,
      "dropped column data resurrected through the re-added name")
    assert(re.filter(col("cat") === "fresh").count() == 1)
  }

  test("a producer still writing the pre-rename name is refused, not forked (review r12)") {
    val dir = Files.createTempDirectory("graft_map_stale").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.renameColumn(spark, dir, "amount", "price")
    // a lagging producer re-sends 'amount' — under evolution this
    // would become a SECOND logical column whose translation collides
    // with the stored bytes of 'price' (physical name 'amount'), and
    // the first DML after it would corrupt the frame (duplicate
    // columns). The evolution guard refuses it up front instead.
    val stale = Seq((9999L, ts("2024-01-05 08:00:00"), "c", 1.0))
      .toDF("uid", "ts", "cat", "amount")
    val e = intercept[IllegalArgumentException] {
      ManifestLake.appendBatch(spark, dir, stale, "ts", batchId = 0L)
    }
    assert(e.getMessage.contains("physical storage name"), e.getMessage)
    // the aligned producer flows, and DML through the new name works
    val fresh = stale.withColumnRenamed("amount", "price")
    ManifestLake.appendBatch(spark, dir, fresh, "ts", batchId = 0L)
    val upd = Seq((9999L, ts("2024-01-05 09:00:00"), "c2", 2.0))
      .toDF("uid", "ts", "cat", "price")
    ManifestLake.upsert(spark, dir, upd, Seq("uid"), "ts")
    val got = ManifestLake.read(spark, dir).filter(col("uid") === 9999L)
    assert(got.count() == 1 && got.head().getAs[Double]("price") == 2.0)
  }

  test("mirror: a source rename mid-window is refused until the mirror applies it too (review r12)") {
    val src = Files.createTempDirectory("graft_map_mir_src").toString
    val dst = Files.createTempDirectory("graft_map_mir_dst").toString + "/m"
    ManifestLake.create(spark, src, mkBase(), "ts")
    ManifestLake.replicateOnce(spark, src, dst, "ts") // seed: dst has 'amount'
    ManifestLake.renameColumn(spark, src, "amount", "price")
    val extra = Seq((9999L, ts("2024-01-05 08:00:00"), "c", 1.0))
      .toDF("uid", "ts", "cat", "price")
    ManifestLake.appendBatch(spark, src, extra, "ts", batchId = 0L)
    // without alignment: refuse loudly (silently proceeding would fork
    // the mirrored column into amount-NULLs + price rows)
    val e = intercept[IllegalStateException] {
      ManifestLake.replicateOnce(spark, src, dst, "ts")
    }
    assert(e.getMessage.contains("renameColumn"), e.getMessage)
    // apply the SAME metadata-only rename on the mirror → the round flows
    ManifestLake.renameColumn(spark, dst, "amount", "price")
    ManifestLake.replicateOnce(spark, src, dst, "ts")
    val d = ManifestLake.read(spark, dst)
    assert(d.columns.contains("price") && !d.columns.contains("amount"))
    assert(d.count() == ManifestLake.read(spark, src).count())
    assert(d.filter(col("price").isNull).count() == 0, "forked column")
  }

  test("mirror seeded after mapping activation: an unapplied source rename is still refused (ADVICE r12)") {
    val src = Files.createTempDirectory("graft_map_mir2_src").toString
    val dst = Files.createTempDirectory("graft_map_mir2_dst").toString + "/m"
    ManifestLake.create(spark, src, mkBase(), "ts")
    // the source activates mapping BEFORE the mirror exists: 'amount'
    // becomes 'price' but stays stored as 'amount'
    ManifestLake.renameColumn(spark, src, "amount", "price")
    ManifestLake.replicateOnce(spark, src, dst, "ts") // seed AFTER mapping
    // dst's physical names now share NOTHING with the source's (the
    // column is stored as 'amount' at the source, as 'price' at the
    // dst) — the pre-fix physical-keyed alignment check looked every
    // source physical name up in the dst, found none, and passed
    // vacuously, letting the next rename flow through as evolution
    // and silently forking the mirror
    ManifestLake.renameColumn(spark, src, "price", "cost")
    val extra = Seq((9999L, ts("2024-01-05 08:00:00"), "c", 1.0))
      .toDF("uid", "ts", "cat", "cost")
    ManifestLake.appendBatch(spark, src, extra, "ts", batchId = 0L)
    val e = intercept[IllegalStateException] {
      ManifestLake.replicateOnce(spark, src, dst, "ts")
    }
    assert(e.getMessage.contains("renameColumn"), e.getMessage)
    // the documented remedy still works, and the mirror does not fork
    ManifestLake.renameColumn(spark, dst, "price", "cost")
    ManifestLake.replicateOnce(spark, src, dst, "ts")
    val d = ManifestLake.read(spark, dst)
    assert(d.columns.contains("cost") && !d.columns.contains("price"))
    assert(d.count() == ManifestLake.read(spark, src).count())
    assert(d.filter(col("cost").isNull).count() == 0, "forked column")
  }

  test("mapping survives CDC, restore, and the refusal surface holds") {
    val dir = Files.createTempDirectory("graft_map_misc").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.renameColumn(spark, dir, "amount", "price") // v2
    val vRenamed = ManifestLake.snapshot(spark, dir).version
    // CDC window crossing the rename: both sides read under toV's
    // schema — one consistent frame, new names
    val upd = Seq((1L, ts("2024-01-01 14:00:00"), "c", 5.5))
      .toDF("uid", "ts", "cat", "price")
    ManifestLake.upsert(spark, dir, upd, Seq("uid"), "ts") // v3
    val feed = ManifestLake.readChanges(spark, dir, fromV = 1L,
      toV = ManifestLake.snapshot(spark, dir).version)
    assert(feed.columns.contains("price") && !feed.columns.contains("amount"))
    assert(feed.filter(col("uid") === 1L && col("_change_type") === "insert")
      .head().getAs[Double]("price") == 5.5)
    // RESTORE to the pre-rename version reinstates the old logical name
    ManifestLake.restore(spark, dir, 1L)
    assert(ManifestLake.read(spark, dir).columns.contains("amount"))
    ManifestLake.restore(spark, dir, vRenamed)
    assert(ManifestLake.read(spark, dir).columns.contains("price"))

    // refusals: day, duplicate, physical shadow, CHECK reference
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "day", "d2")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "cat", "price")
    }
    // 'amount' is now the PHYSICAL storage name behind 'price' — a new
    // logical column may not shadow it
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "cat", "amount")
    }
    ManifestLake.addCheck(spark, dir, "c_pos", "price >= 0")
    intercept[IllegalArgumentException] {
      ManifestLake.renameColumn(spark, dir, "price", "cost")
    }
    intercept[IllegalArgumentException] {
      ManifestLake.dropColumn(spark, dir, "price")
    }
    ManifestLake.dropCheck(spark, dir, "c_pos")
    ManifestLake.renameColumn(spark, dir, "price", "cost") // now fine
    assert(ManifestLake.read(spark, dir).columns.contains("cost"))
  }
}
