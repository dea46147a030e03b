package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.sources.ManifestLake

/** Named tables (r14): ``graft`.`db`.`t`` resolves to
  * `<spark.graft.warehouse>/db/t` — the catalog UX on the path-table
  * machinery (the warehouse DIRECTORY is the catalog, one convention
  * instead of a second metastore). Every front door must accept the
  * named form identically: CREATE / INSERT / UPDATE / MERGE-free
  * reads / time travel / maintenance SQL. Without the conf the
  * identifier is NOT claimed (a real catalog named `graft` keeps
  * resolving). */
class NamedTableSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private lazy val warehouse =
    Files.createTempDirectory("graft_wh").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.graft.warehouse", warehouse)
  }
  override def afterAll(): Unit = {
    spark.conf.unset("spark.graft.warehouse")
    super.afterAll()
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("the full lifecycle through the named form: CREATE AS SELECT, " +
      "INSERT, UPDATE, SELECT, VERSION AS OF, DESCRIBE HISTORY") {
    (0 until 6).map(i =>
      (i.toLong, ts(f"2024-03-${i % 2 + 1}%02d 10:00:00"), i * 1.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("named_src")
    spark.sql("CREATE TABLE graft.analytics.events " +
      "OPTIONS ('ordCol' 'ts') AS SELECT * FROM named_src")
    // the table landed at the warehouse convention path
    assert(ManifestLake.tableExists(spark,
      s"$warehouse/analytics/events"))
    spark.sql("INSERT INTO graft.analytics.events VALUES " +
      "(100, TIMESTAMP '2024-03-09 10:00:00', 9.0)")
    assert(spark.sql("UPDATE graft.analytics.events SET v = v + 1 " +
      "WHERE id = 100").collect().head.getLong(0) == 1L)
    val head = spark.sql(
      "SELECT id, v FROM graft.analytics.events ORDER BY id")
    assert(head.count() == 7L)
    assert(head.collect().last.getDouble(1) == 10.0)
    val v1 = spark.sql(
      "SELECT id FROM graft.analytics.events VERSION AS OF 1")
    assert(v1.count() == 6L)
    assert(spark.sql("DESCRIBE HISTORY graft.analytics.events")
      .count() == 3L)
    val detail = spark.sql("DESCRIBE DETAIL graft.analytics.events")
      .collect().head
    assert(detail.getString(8) == "ts")
  }

  test("MERGE INTO and ALTER TABLE work on the named form") {
    (0 until 4).map(i =>
      (i.toLong, ts("2024-03-01 10:00:00"), i * 1.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("named_src2")
    spark.sql("CREATE TABLE graft.analytics.merge_t " +
      "OPTIONS ('ordCol' 'ts') AS SELECT * FROM named_src2")
    spark.sql(
      """MERGE INTO graft.analytics.merge_t t USING named_src2 s
        |ON t.id = s.id
        |WHEN MATCHED AND t.id = 0 THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.v + 100
        |""".stripMargin)
    val got = spark.sql("SELECT id, v FROM graft.analytics.merge_t " +
      "ORDER BY id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(got.forall(_.getDouble(1) >= 100.0))
    spark.sql("ALTER TABLE graft.analytics.merge_t " +
      "ADD COLUMNS (note STRING)")
    assert(spark.sql("SELECT * FROM graft.analytics.merge_t")
      .columns.contains("note"))
  }

  test("qualified references resolve by TABLE NAME, not the resolved " +
      "warehouse path (r14 ADVICE: alias the relation by the last " +
      "identifier part)") {
    (0 until 3).map(i => (i.toLong, ts("2024-03-01 10:00:00"), i * 1.0))
      .toDF("id", "ts", "v").createOrReplaceTempView("named_src3")
    spark.sql("CREATE TABLE graft.analytics.qual_t " +
      "OPTIONS ('ordCol' 'ts') AS SELECT * FROM named_src3")
    // table-name-qualified column reference
    assert(spark.sql(
      "SELECT qual_t.id FROM graft.analytics.qual_t ORDER BY qual_t.id")
      .collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // self-join with explicit aliases disambiguates both sides
    val joined = spark.sql(
      """SELECT a.id, b.id FROM graft.analytics.qual_t a
        |JOIN graft.analytics.qual_t b ON a.id = b.id - 1
        |ORDER BY a.id""".stripMargin).collect()
    assert(joined.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 1L), (1L, 2L)))
  }

  test("without the warehouse conf the graft catalog name is NOT " +
      "claimed") {
    spark.conf.unset("spark.graft.warehouse")
    try {
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM graft.analytics.events").collect()
      }
      // Spark's own resolution error, not a graft one
      assert(!e.getMessage.contains("graft-lake"))
    } finally spark.conf.set("spark.graft.warehouse", warehouse)
  }

  test("a maintenance statement on the named form without the conf " +
      "errors loudly with the remedy") {
    spark.conf.unset("spark.graft.warehouse")
    try {
      val e = intercept[Exception] {
        spark.sql("DESCRIBE HISTORY graft.analytics.events")
      }
      assert(e.getMessage.contains("spark.graft.warehouse"))
    } finally spark.conf.set("spark.graft.warehouse", warehouse)
  }
}
