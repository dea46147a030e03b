package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ManifestLake

/** `ALTER TABLE` SQL over graft-lake identifiers (round 14): each verb
  * is one metadata-only manifest commit through the corresponding lake
  * API — RENAME/DROP COLUMN on the column-mapping tier, ADD COLUMNS as
  * the explicit checkpoint widening, ADD/DROP CONSTRAINT on the CHECK
  * set. The ord column's metadata must follow a rename and block a
  * drop (day partitioning derives from it). */
class SqlAlterSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_alter").toString
    val df = (0 until 6).map(i =>
      (i.toLong, ts(f"2024-03-${i % 2 + 1}%02d 10:00:00"), i * 1.0))
      .toDF("id", "ts", "v")
    ManifestLake.create(spark, dir, df, "ts")
    dir
  }

  test("RENAME COLUMN is metadata-only and reads back under the new " +
      "name; DROP COLUMN hides bytes that time travel still sees") {
    val lake = freshLake()
    spark.sql(s"ALTER TABLE `graft-lake`.`$lake` RENAME COLUMN v TO score")
    assert(ManifestLake.read(spark, lake).columns.contains("score"))
    val r = spark.sql(
      s"SELECT sum(score) AS s FROM `graft-lake`.`$lake`").collect().head
    assert(r.getDouble(0) == 15.0)
    spark.sql(s"ALTER TABLE `graft-lake`.`$lake` DROP COLUMN score")
    assert(!ManifestLake.read(spark, lake).columns.contains("score"))
    // pre-drop version still answers under its own names
    assert(ManifestLake.readVersion(spark, lake, 2L)
      .columns.contains("score"))
    // IF EXISTS tolerates the now-missing column; bare drop refuses
    spark.sql(
      s"ALTER TABLE `graft-lake`.`$lake` DROP COLUMN IF EXISTS score")
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE `graft-lake`.`$lake` DROP COLUMN score")
    }
    assert(e.getMessage.contains("no such column"))
  }

  test("renaming the ord column carries the table metadata; dropping " +
      "it refuses") {
    val lake = freshLake()
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE `graft-lake`.`$lake` DROP COLUMN ts")
    }
    assert(e.getMessage.contains("ord column"))
    spark.sql(
      s"ALTER TABLE `graft-lake`.`$lake` RENAME COLUMN ts TO event_ts")
    assert(ManifestLake.ordColOf(spark, lake).contains("event_ts"))
    // SQL writes keep working against the renamed ord column
    spark.sql(s"INSERT INTO `graft-lake`.`$lake` VALUES " +
      "(100, TIMESTAMP '2024-03-09 10:00:00', 9.0)")
    assert(ManifestLake.readDays(spark, lake, _ == "2024-03-09")
      .count() == 1L)
  }

  test("ADD COLUMNS widens the checkpoint before any row carries the " +
      "column; existing rows read NULL") {
    val lake = freshLake()
    spark.sql(s"ALTER TABLE `graft-lake`.`$lake` " +
      "ADD COLUMNS (note STRING, rank BIGINT)")
    val head = ManifestLake.read(spark, lake)
    assert(head.columns.toSeq == Seq("id", "ts", "v", "day", "note", "rank"))
    assert(head.filter(col("note").isNotNull).count() == 0L)
    spark.sql(s"INSERT INTO `graft-lake`.`$lake` VALUES " +
      "(200, TIMESTAMP '2024-03-05 10:00:00', 1.0, 'hi', 7)")
    assert(ManifestLake.read(spark, lake)
      .filter(col("note") === "hi" && col("rank") === 7L).count() == 1L)
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE `graft-lake`.`$lake` ADD COLUMNS (v DOUBLE)")
    }
    assert(e.getMessage.contains("already exists"))
  }

  test("ADD CONSTRAINT CHECK enforces on every later write; DROP " +
      "CONSTRAINT lifts it") {
    val lake = freshLake()
    spark.sql(s"ALTER TABLE `graft-lake`.`$lake` " +
      "ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO `graft-lake`.`$lake` VALUES " +
        "(300, TIMESTAMP '2024-03-05 10:00:00', -1.0)")
    }
    assert(e.getMessage.contains("v_nonneg"))
    spark.sql(s"ALTER TABLE `graft-lake`.`$lake` DROP CONSTRAINT v_nonneg")
    spark.sql(s"INSERT INTO `graft-lake`.`$lake` VALUES " +
      "(300, TIMESTAMP '2024-03-05 10:00:00', -1.0)")
    assert(ManifestLake.read(spark, lake).filter(col("v") < 0).count() == 1L)
    // re-adding now refuses: the EXISTING rows are validated too
    // (Delta's add-constraint scan), and the -1 row violates
    val e2 = intercept[Exception] {
      spark.sql(s"ALTER TABLE `graft-lake`.`$lake` " +
        "ADD CONSTRAINT v_nonneg CHECK (v >= 0)")
    }
    assert(e2.getMessage.contains("v_nonneg"))
    assert(ManifestLake.checksOf(spark, lake).isEmpty) // nothing committed
  }

  test("DROP COLUMNS with several columns is ONE atomic commit " +
      "(review r14 #7)") {
    val lake = freshLake()
    spark.sql(s"ALTER TABLE `graft-lake`.`$lake` " +
      "ADD COLUMNS (n1 STRING, n2 STRING)")
    val before = ManifestLake.snapshot(spark, lake).version
    spark.sql(s"ALTER TABLE `graft-lake`.`$lake` DROP COLUMNS (n1, n2)")
    assert(ManifestLake.snapshot(spark, lake).version == before + 1)
    val cols = ManifestLake.read(spark, lake).columns.toSet
    assert(!cols.contains("n1") && !cols.contains("n2"))
  }

  test("non-CHECK constraints refuse with the modeling-hint message") {
    val lake = freshLake()
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE `graft-lake`.`$lake` " +
        "ADD CONSTRAINT pk PRIMARY KEY (id)")
    }
    assert(e.getMessage.contains("CHECK"))
  }

  test("ALTER on non-lake tables is untouched by the rule") {
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE no_such_table RENAME COLUMN a TO b")
    }
    assert(!e.getMessage.contains("graft"))
  }
}
