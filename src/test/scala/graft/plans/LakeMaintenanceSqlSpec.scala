package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ManifestLake

/** Maintenance SQL (round 14, the Delta parser-extension surface):
  * DESCRIBE HISTORY / OPTIMIZE [ZORDER BY] / VACUUM [RETAIN n HOURS]
  * [FORCE] [DRY RUN] / RESTORE … TO VERSION|TIMESTAMP AS OF — each
  * statement must be a thin syntax layer over the corresponding lake
  * API (twinned results), and everything that is NOT a graft-lake
  * maintenance statement must reach Spark's own parser untouched. */
class LakeMaintenanceSqlSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mk(ids: Range, day: Int): DataFrame =
    ids.map(i => (i.toLong, ts(f"2024-03-$day%02d 10:00:00"), s"v$i"))
      .toDF("id", "ts", "v")

  /** Fragmented fixture: v1 create + 3 appends into the same days →
    * plenty of small files for OPTIMIZE, history depth for RESTORE. */
  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_maint").toString
    ManifestLake.create(spark, dir, mk(0 until 8, 1), "ts")
    ManifestLake.append(spark, dir, mk(100 until 108, 1), "ts")
    ManifestLake.append(spark, dir, mk(200 until 208, 2), "ts")
    ManifestLake.append(spark, dir, mk(300 until 308, 2), "ts")
    dir
  }

  private def ids(path: String): Set[Long] =
    ManifestLake.read(spark, path).select("id").collect()
      .map(_.getLong(0)).toSet

  test("DESCRIBE HISTORY ≡ the history() API, row for row") {
    val lake = freshLake()
    val viaSql = spark.sql(s"DESCRIBE HISTORY `graft-lake`.`$lake`")
    val viaApi = ManifestLake.history(spark, lake)
    assert(viaSql.columns.toSeq == viaApi.columns.toSeq)
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
    assert(viaSql.count() == 4L)
    assert(viaSql.select("operation").collect().map(_.getString(0)).toSeq ==
      Seq("create", "append", "append", "append"))
  }

  test("OPTIMIZE compacts the fragmented days; content is unchanged") {
    val lake = freshLake()
    val before = ids(lake)
    val snap0 = ManifestLake.snapshot(spark, lake)
    assert(snap0.days.values.exists(_.size > 1)) // genuinely fragmented
    val compacted = spark.sql(s"OPTIMIZE `graft-lake`.`$lake`")
      .collect().map(_.getString(0)).toSet
    assert(compacted == Set("2024-03-01", "2024-03-02"))
    val snap1 = ManifestLake.snapshot(spark, lake)
    assert(snap1.days.values.forall(_.size == 1)) // one dir per day
    assert(ids(lake) == before)
  }

  test("OPTIMIZE ZORDER BY clusters without changing content") {
    val lake = freshLake()
    val before = ids(lake)
    val compacted = spark.sql(
      s"OPTIMIZE `graft-lake`.`$lake` ZORDER BY (id, v)")
      .collect().map(_.getString(0)).toSet
    assert(compacted.nonEmpty)
    assert(ids(lake) == before)
  }

  test("VACUUM DRY RUN lists but keeps; VACUUM RETAIN 0 HOURS FORCE " +
      "deletes the retired generations") {
    val lake = freshLake()
    spark.sql(s"OPTIMIZE `graft-lake`.`$lake`") // retire the small files
    val dry = spark.sql(
      s"VACUUM `graft-lake`.`$lake` RETAIN 0 HOURS FORCE DRY RUN")
      .collect().map(_.getString(0))
    assert(dry.nonEmpty)
    assert(ids(lake).size == 32) // nothing actually deleted
    val real = spark.sql(
      s"VACUUM `graft-lake`.`$lake` RETAIN 0 HOURS FORCE")
      .collect().map(_.getString(0))
    assert(real.toSet == dry.toSet) // the dry run told the truth
    assert(ids(lake).size == 32)    // head still fully readable
  }

  test("VACUUM below the retention floor refuses without FORCE") {
    val lake = freshLake()
    val e = intercept[Exception] {
      spark.sql(s"VACUUM `graft-lake`.`$lake` RETAIN 0 HOURS")
    }
    assert(e.getMessage.contains("floor"))
  }

  test("RESTORE TO VERSION AS OF rewinds as a NEW commit") {
    val lake = freshLake()
    val out = spark.sql(
      s"RESTORE TABLE `graft-lake`.`$lake` TO VERSION AS OF 1").collect()
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 5L)
    assert(ids(lake) == (0L until 8L).toSet)
    // append-only history: v4 (pre-restore head) is still addressable
    assert(ManifestLake.readVersion(spark, lake, 4L).count() == 32L)
  }

  test("RESTORE TO TIMESTAMP AS OF routes through versionAt") {
    val lake = freshLake()
    val t2 = ManifestLake.history(spark, lake)
      .filter(col("version") === 2L).head().getTimestamp(2)
    spark.sql(s"RESTORE `graft-lake`.`$lake` TO TIMESTAMP AS OF '$t2'")
    assert(ids(lake) == ((0L until 8L) ++ (100L until 108L)).toSet)
  }

  test("DESCRIBE DETAIL: one summary row from the head manifest") {
    val lake = freshLake()
    val r = spark.sql(s"DESCRIBE DETAIL `graft-lake`.`$lake`")
      .collect().head
    assert(r.getString(0) == "graft-lake")
    assert(r.getString(1) == lake)
    assert(r.getLong(2) == 4L)               // head version
    assert(r.getString(3) == "append")       // last operation
    assert(r.getInt(4) == 2)                 // days
    assert(r.getInt(5) == 4)                 // dirs (create + 3 appends)
    assert(r.getLong(6) == 4L)               // files (filesPerDay = 1)
    assert(r.getLong(7) > 0L)                // manifest-carried bytes
    assert(r.getString(8) == "ts")           // ord col
  }

  test("table_changes TVF: the CDF from SQL, joinable and filterable") {
    val lake = freshLake()
    // v1 create(0..8)d1 → v2 append(100..108)d1 → v3,v4 appends d2
    val changes = spark.sql(
      s"SELECT id, _change_type FROM table_changes('$lake', 1, 2) " +
        "ORDER BY id")
    assert(changes.collect().map(r =>
      (r.getLong(0), r.getString(1))).toSeq ==
      (100L until 108L).map(i => (i, "insert")))
    // 2-arg form reads to head; the feed joins a view in one statement
    spark.range(300, 304).createOrReplaceTempView("watch_ids")
    val joined = spark.sql(
      s"""SELECT c.id FROM table_changes('$lake', 1) c
         |JOIN watch_ids w ON c.id = w.id ORDER BY c.id""".stripMargin)
    assert(joined.collect().map(_.getLong(0)).toSeq ==
      (300L until 304L).toSeq)
    // a non-lake path is NOT claimed — Spark's own resolver answers
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM table_changes('/no/such/lake', 1, 2)")
        .collect()
    }
    assert(!e.getMessage.contains("graft"))
    // r15: rows carry commit attribution — each append window's rows
    // name the version that landed them, SQL-filterable
    val meta = spark.sql("SELECT DISTINCT _commit_version " +
      s"FROM table_changes('$lake', 1, 3) ORDER BY _commit_version")
    assert(meta.collect().map(_.getLong(0)).toSeq == Seq(2L, 3L))
    val v3only = spark.sql(s"SELECT min(id), max(id) FROM " +
      s"table_changes('$lake', 1, 4) WHERE _commit_version = 4")
      .collect().head
    assert(v3only.getLong(0) == 300L && v3only.getLong(1) == 307L)
  }

  test("table_changes optional key-list argument (r16): update rows " +
      "surface as update_pre/postimage from SQL") {
    val dir = Files.createTempDirectory("graft_maint_upd").toString
    ManifestLake.create(spark, dir, mk(0 until 6, 1), "ts")
    // one upsert: id 2 updated (pair) + id 500 brand-new (insert)
    ManifestLake.upsert(spark, dir,
      Seq((2L, ts("2024-03-01 11:00:00"), "changed"),
        (500L, ts("2024-03-02 09:00:00"), "fresh")).toDF("id", "ts", "v"),
      Seq("id"), "ts")
    val got = spark.sql("SELECT id, v, _change_type FROM " +
      s"table_changes('$dir', 1, 2, 'id') ORDER BY id, _change_type")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSet
    assert(got == Set(
      (2L, "v2", "update_preimage"),
      (2L, "changed", "update_postimage"),
      (500L, "fresh", "insert")), got)
    // 3-arg key form reads to head; keyless form keeps delete+insert
    assert(spark.sql("SELECT DISTINCT _change_type FROM " +
      s"table_changes('$dir', 1, 'id')").collect()
      .map(_.getString(0)).toSet ==
      Set("update_preimage", "update_postimage", "insert"))
    assert(spark.sql("SELECT DISTINCT _change_type FROM " +
      s"table_changes('$dir', 1, 2)").collect()
      .map(_.getString(0)).toSet == Set("delete", "insert"))
  }

  test("ZORDER BY with three columns interleaves all three " +
      "(zValueN) without changing content") {
    val lake = freshLake()
    val before = ids(lake)
    val compacted = spark.sql(
      s"OPTIMIZE `graft-lake`.`$lake` ZORDER BY (id, v, ts)")
      .collect().map(_.getString(0)).toSet
    assert(compacted.nonEmpty)
    assert(ids(lake) == before)
  }

  test("ZORDER BY on an already-compacted table still re-clusters " +
      "every day (an explicit layout request never no-ops)") {
    val lake = freshLake()
    spark.sql(s"OPTIMIZE `graft-lake`.`$lake`") // fold to 1 dir/day
    val snap1 = ManifestLake.snapshot(spark, lake)
    assert(snap1.days.values.forall(_.size == 1))
    // plain OPTIMIZE is now a no-op (idempotent, nothing to pick) ...
    assert(spark.sql(s"OPTIMIZE `graft-lake`.`$lake`").collect().isEmpty)
    // ... but an explicit ZORDER request rewrites ALL days anyway
    val before = ids(lake)
    val zordered = spark.sql(
      s"OPTIMIZE `graft-lake`.`$lake` ZORDER BY (id, v)")
      .collect().map(_.getString(0)).toSet
    assert(zordered == Set("2024-03-01", "2024-03-02"))
    assert(ids(lake) == before)
    val snap2 = ManifestLake.snapshot(spark, lake)
    assert(snap2.version == snap1.version + 2) // one commit per day
  }

  test("a malformed maintenance statement fails with the grammar, " +
      "not a Spark fallback error") {
    val lake = freshLake()
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE `graft-lake`.`$lake` ZORDER id")
    }
    assert(e.getMessage.contains("DESCRIBE HISTORY"))
  }

  test("non-maintenance SQL still parses through the session parser") {
    assert(spark.sql("SELECT 1 + 1 AS x").collect().head.getInt(0) == 2)
    // OPTIMIZE aimed at something that is not a graft-lake identifier
    // falls through to Spark (which rejects it as unknown syntax)
    val e = intercept[Exception] { spark.sql("OPTIMIZE some_table") }
    assert(!e.getMessage.contains("graft"))
  }
}
