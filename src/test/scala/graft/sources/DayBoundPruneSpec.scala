package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Derived day-bound pruning for the DML discovery scan (r14): a
  * predicate carrying its own `day` conjuncts must open ONLY the
  * bounded days' directories — the partition pruning a SQL
  * DELETE/UPDATE gets for free. The proof is behavioral, not
  * rhetorical: one day's parquet bytes are overwritten with garbage;
  * a day-bounded statement succeeds (it never opened the file), the
  * unbounded control crashes on the same lake state. */
class DayBoundPruneSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def mk(ids: Range, day: Int) =
    ids.map(i => (i.toLong, ts(f"2024-03-$day%02d 10:00:00"), s"v$i"))
      .toDF("id", "ts", "v")

  /** Three days, then day 3's data file is garbage on disk. */
  private def poisonedLake(): String = {
    val dir = Files.createTempDirectory("graft_prune").toString
    ManifestLake.create(spark, dir,
      mk(0 until 10, 1).union(mk(100 until 110, 2))
        .union(mk(200 until 210, 3)), "ts")
    val rels = ManifestLake.snapshot(spark, dir).days("2024-03-03")
    rels.foreach { rel =>
      val d = new java.io.File(s"$dir/$rel")
      d.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
        java.nio.file.Files.write(f.toPath, Array.fill[Byte](64)(0x7f))
      }
    }
    dir
  }

  test("a day-bounded SQL DELETE never opens the other days' files") {
    val lake = poisonedLake()
    val got = spark.sql(s"DELETE FROM `graft-lake`.`$lake` " +
      "WHERE day = '2024-03-01' AND id < 5").collect().head.getLong(0)
    assert(got == 5L)
    assert(ManifestLake.readDays(spark, lake, _ == "2024-03-01")
      .count() == 5L)
  }

  test("a day-ranged SQL UPDATE prunes its discovery the same way") {
    val lake = poisonedLake()
    val got = spark.sql(s"UPDATE `graft-lake`.`$lake` SET v = 'patched' " +
      "WHERE day >= '2024-03-02' AND day <= '2024-03-02'")
      .collect().head.getLong(0)
    assert(got == 10L)
    assert(ManifestLake.readDays(spark, lake, _ == "2024-03-02")
      .filter(col("v") === "patched").count() == 10L)
  }

  test("a day-bounded REPLACE WHERE never opens the other days' files (r17)") {
    val lake = poisonedLake()
    mk(300 until 305, 1).createOrReplaceTempView("graft_prune_rw_src")
    spark.sql(s"INSERT INTO `graft-lake`.`$lake` REPLACE WHERE " +
      "day = '2024-03-01' SELECT * FROM graft_prune_rw_src")
    assert(ManifestLake.readDays(spark, lake, _ == "2024-03-01")
      .select("id").as[Long].collect().toSet ==
      (300L until 305L).toSet,
      "the replaced day must hold exactly the batch")
    // the poisoned day is untouched in the manifest — still 1 dir
    assert(ManifestLake.snapshot(spark, lake).days.contains("2024-03-03"))
  }

  test("a day-bounded DV delete prunes its position scan") {
    val lake = poisonedLake()
    val n = ManifestLake.deleteWhereDV(spark, lake,
      col("day") === "2024-03-01" && col("id") === 1L)
    assert(n == 1L)
    assert(ManifestLake.readDays(spark, lake, _ == "2024-03-01")
      .count() == 9L)
  }

  test("control: the unbounded statement actually reads the poisoned " +
      "day and fails — the successes above were pruning, not luck") {
    val lake = poisonedLake()
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM `graft-lake`.`$lake` WHERE id < 5")
    }
    assert(e != null)
  }
}
