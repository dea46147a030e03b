package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Predicate overwrite (r17, VERDICT r16 #3 — Delta's replaceWhere):
  * ONE atomic commit composing deleteWhere(pred) + append. Contracts
  * pinned here (values are pinned independently by the l_replace_where
  * DuckDB oracle):
  *   - semantics: matching rows are replaced by the batch, survivors
  *     of a partially-matched day are rewritten not dropped, a fully
  *     drained day disappears, an empty batch is a pure delete, a
  *     no-match predicate is a pure append;
  *   - the Delta data constraint: every batch row must satisfy the
  *     predicate, refused loudly otherwise;
  *   - OCC: a concurrent writer touching a REPLACED day refuses (the
  *     VERDICT r16 #3 arm); a disjoint concurrent writer rebases and
  *     both commits land;
  *   - doors: writeTo(...).overwrite(cond) (incl. the lit(true)
  *     truncate idiom → replaceAll), the format-door writer option's
  *     mode guard, and the catalog WriteBuilder's strict
  *     total-or-refuse filter translation. */
class ManifestLakeReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def base(): DataFrame = Seq(
    (1L, 10L, ts("2024-03-01 10:00:00"), "a", 1.0),
    (2L, 11L, ts("2024-03-01 11:00:00"), "a", 2.0),
    (3L, 12L, ts("2024-03-02 10:00:00"), "a", 3.0),
    (4L, 13L, ts("2024-03-02 11:00:00"), "a", 4.0),
    (5L, 14L, ts("2024-03-03 10:00:00"), "a", 5.0))
    .toDF("user_id", "event_id", "ts", "event_type", "value")

  private def row(uid: Long, eid: Long, at: String,
      typ: String = "r", v: Double = 9.0): DataFrame =
    Seq((uid, eid, ts(at), typ, v))
      .toDF("user_id", "event_id", "ts", "event_type", "value")

  private def tmp(tag: String) =
    Files.createTempDirectory(s"graft_rw_$tag").toString

  private def ids(dir: String): Set[Long] =
    ManifestLake.read(spark, dir).select("event_id").as[Long]
      .collect().toSet

  test("replace a whole day atomically; the day maps to ONE new dir") {
    val dir = tmp("day")
    ManifestLake.create(spark, dir, base(), "ts")
    val v = ManifestLake.replaceWhere(spark, dir,
      row(30L, 31L, "2024-03-02 12:00:00"),
      col("day") === "2024-03-02", "ts")
    assert(v == 2L)
    assert(ids(dir) == Set(10L, 11L, 31L, 14L))
    val snap = ManifestLake.snapshot(spark, dir)
    assert(snap.days("2024-03-02").size == 1,
      "a replaced day must remap wholesale to its rewritten dir")
    assert(snap.op == "replaceWhere")
  }

  test("partial-day predicate: survivors are rewritten, not dropped; empty batch = pure delete") {
    val dir = tmp("partial")
    ManifestLake.create(spark, dir, base(), "ts")
    val v = ManifestLake.replaceWhere(spark, dir, base().limit(0),
      col("event_id") === 13L, "ts")
    assert(v == 2L)
    assert(ids(dir) == Set(10L, 11L, 12L, 14L),
      "only the matched row may disappear; its day-mates survive")
    // and a predicate draining a day entirely drops the day
    val v2 = ManifestLake.replaceWhere(spark, dir, base().limit(0),
      col("day") === "2024-03-03", "ts")
    assert(v2 == 3L)
    assert(!ManifestLake.snapshot(spark, dir).days.contains("2024-03-03"))
  }

  test("no-match predicate with a batch is a pure append into the predicate's region") {
    val dir = tmp("append")
    ManifestLake.create(spark, dir, base(), "ts")
    val v = ManifestLake.replaceWhere(spark, dir,
      row(40L, 41L, "2024-03-09 10:00:00"),
      col("day") === "2024-03-09", "ts")
    assert(v == 2L)
    assert(ids(dir) == Set(10L, 11L, 12L, 13L, 14L, 41L))
  }

  test("the Delta data constraint: batch rows outside the predicate refuse loudly") {
    val dir = tmp("constraint")
    ManifestLake.create(spark, dir, base(), "ts")
    val e = intercept[IllegalArgumentException] {
      ManifestLake.replaceWhere(spark, dir,
        row(50L, 51L, "2024-03-05 10:00:00"), // lands outside the day
        col("day") === "2024-03-02", "ts")
    }
    assert(e.getMessage.contains("do not satisfy"), e.getMessage)
    assert(ids(dir) == Set(10L, 11L, 12L, 13L, 14L), "nothing committed")
  }

  test("NULL-ord batch rows: day-range predicates refuse them; `day IS NULL` addresses the null partition") {
    val dir = tmp("nullday")
    def nullRow(uid: Long, eid: Long, typ: String): DataFrame =
      Seq((uid, eid, Option.empty[java.sql.Timestamp], typ, 0.0))
        .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.create(spark, dir,
      base().unionByName(nullRow(9L, 19L, "n")), "ts")
    // a NULL-ord batch row's day is NULL on every read, so a
    // day-range region can never contain it — the constraint must
    // see the PRE-coalesce day (the NullPart sentinel sorts AFTER
    // date strings, so a post-coalesce check would wave it through)
    val e = intercept[IllegalArgumentException] {
      ManifestLake.replaceWhere(spark, dir, nullRow(10L, 20L, "bad"),
        col("day") >= "2024-03-01", "ts")
    }
    assert(e.getMessage.contains("do not satisfy"), e.getMessage)
    assert(ids(dir) == Set(10L, 11L, 12L, 13L, 14L, 19L))
    // and the null partition is an addressable region of its own
    val v = ManifestLake.replaceWhere(spark, dir, nullRow(11L, 21L, "ok"),
      col("day").isNull, "ts")
    assert(v == 2L)
    assert(ids(dir) == Set(10L, 11L, 12L, 13L, 14L, 21L),
      "the null-partition row 19 must be replaced by 21")
  }

  test("OCC: a concurrent append into a REPLACED day refuses; a disjoint one rebases") {
    val dir = tmp("occ")
    ManifestLake.create(spark, dir, base(), "ts")
    val e = intercept[java.util.ConcurrentModificationException] {
      ManifestLake.replaceWhere(spark, dir,
        row(60L, 61L, "2024-03-02 12:00:00"),
        col("day") === "2024-03-02", "ts",
        beforeCommit = () => {
          ManifestLake.append(spark, dir,
            row(70L, 71L, "2024-03-02 13:00:00"), "ts"); ()
        })
    }
    assert(e.getMessage.contains("concurrently modified"), e.getMessage)
    // the winner's row is live; the refused replace changed nothing
    assert(ids(dir) == Set(10L, 11L, 12L, 13L, 14L, 71L))

    // disjoint winner (a different day): the replace rebases and lands
    val v = ManifestLake.replaceWhere(spark, dir,
      row(62L, 63L, "2024-03-02 14:00:00"),
      col("day") === "2024-03-02", "ts",
      beforeCommit = () => {
        ManifestLake.append(spark, dir,
          row(72L, 73L, "2024-03-07 10:00:00"), "ts"); ()
      })
    assert(v == ManifestLake.snapshot(spark, dir).version)
    assert(ids(dir) == Set(10L, 11L, 14L, 63L, 73L),
      "rebase must keep the disjoint winner AND apply the replace " +
        "(row 71 sat in the replaced day, so the replace removes it; " +
        "12/13 likewise)")
  }

  test("writeTo(...).overwrite(cond) routes to replaceWhere; lit(true) takes the replaceAll path") {
    val wh = tmp("wh")
    val dir = s"$wh/ns/t"
    ManifestLake.create(spark, dir, base(), "ts")
    val prev = spark.conf.getOption("spark.graft.warehouse")
    spark.conf.set("spark.graft.warehouse", wh)
    try {
      row(80L, 81L, "2024-03-02 15:00:00")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .writeTo("graft.ns.t").overwrite(col("day") === "2024-03-02")
      assert(ids(dir) == Set(10L, 11L, 81L, 14L))
      // the truncate idiom: overwrite(lit(true)) replaces the table
      // through replaceAll's cheaper whole-table path (op label pins
      // the route)
      row(90L, 91L, "2024-03-04 10:00:00")
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
        .writeTo("graft.ns.t").overwrite(lit(true))
      assert(ids(dir) == Set(91L))
      val ops = ManifestLake.history(spark, dir)
        .select("operation").as[String].collect().toSeq
      assert(ops.contains("replaceWhere") && ops.contains("overwrite"),
        s"expected both routes in history, got $ops")
    } finally prev.fold(spark.conf.unset("spark.graft.warehouse"))(
      spark.conf.set("spark.graft.warehouse", _))
  }

  test("format-door option: replaceWhere demands mode overwrite and an existing lake") {
    val dir = tmp("fmt")
    ManifestLake.create(spark, dir, base(), "ts")
    val e = intercept[IllegalArgumentException] {
      row(95L, 96L, "2024-03-02 16:00:00")
        .write.format("graft-lake").mode("append")
        .option("ordCol", "ts")
        .option("replaceWhere", "day = '2024-03-02'").save(dir)
    }
    assert(e.getMessage.contains("requires mode overwrite"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      row(95L, 96L, "2024-03-02 16:00:00")
        .write.format("graft-lake").mode("overwrite")
        .option("ordCol", "ts")
        .option("replaceWhere", "day = '2024-03-02'")
        .save(tmp("fmt_absent"))
    }
    assert(e2.getMessage.contains("no committed lake"), e2.getMessage)
  }

  test("catalog WriteBuilder: translated filters replace; untranslatable ones refuse with the remedy") {
    val dir = tmp("cat")
    ManifestLake.create(spark, dir, base(), "ts")
    val tbl = GraftCatalogTable(spark, "graft.ns.cat", dir)
    def builder() = tbl.newWriteBuilder(null)
      .asInstanceOf[org.apache.spark.sql.connector.write.SupportsOverwrite]
    val e = intercept[UnsupportedOperationException] {
      builder().overwrite(Array[org.apache.spark.sql.sources.Filter](
        org.apache.spark.sql.sources.AlwaysFalse()))
    }
    assert(e.getMessage.contains("not translatable") &&
      e.getMessage.contains("REPLACE WHERE"), e.getMessage)
    // a translatable predicate lands on replaceWhere end-to-end
    val w = builder().overwrite(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("day", "2024-03-02")))
      .asInstanceOf[org.apache.spark.sql.connector.write.WriteBuilder]
      .build().asInstanceOf[org.apache.spark.sql.connector.write.V1Write]
    w.toInsertableRelation.insert(
      row(85L, 86L, "2024-03-02 17:00:00"), overwrite = true)
    assert(ids(dir) == Set(10L, 11L, 86L, 14L))
  }
}
