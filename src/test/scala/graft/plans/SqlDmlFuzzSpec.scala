package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ManifestLake

/** Property fuzz for the SQL DML translation layer (r14): for a
  * grammar of generated predicates and assignment sets, the SQL
  * statement and its API twin run against IDENTICAL lakes and the
  * full table states must match — the statement-twinning SqlDmlSpec
  * does by hand, swept across operator/null/alias combinations a
  * hand-picked set misses. Seeded, so a failure replays. */
class SqlDmlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** ids 0..19 over 3 days, with NULLs sprinkled into cat and a. */
  private def seed: DataFrame =
    (0 until 20).map { i =>
      (i.toLong, ts(f"2024-03-${i % 3 + 1}%02d 10:00:00"),
        if (i % 5 == 0) null else s"c${i % 4}",
        if (i % 7 == 0) None else Some(i * 1.5))
    }.toDF("id", "ts", "cat", "a")

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_dmlfuzz").toString
    ManifestLake.create(spark, dir, seed, "ts")
    dir
  }

  private def state(p: String): Set[(Long, String, String, String, String)] =
    ManifestLake.read(spark, p)
      .select(col("id"), col("ts").cast("string"), col("cat"),
        col("a").cast("string"), col("day"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet

  /** The predicate grammar: (sql text, equivalent Column). */
  private val preds: Seq[(String, Column)] = Seq(
    ("id % 3 = 1", col("id") % 3 === 1),
    ("a > 10", col("a") > 10),
    ("a IS NULL", col("a").isNull),
    ("cat = 'c1'", col("cat") === "c1"),
    ("cat IS NOT NULL AND id < 15", col("cat").isNotNull && col("id") < 15),
    ("day = '2024-03-02'", col("day") === "2024-03-02"),
    ("id BETWEEN 4 AND 12", col("id").between(4, 12)),
    ("a > 5 OR cat = 'c0'", col("a") > 5 || col("cat") === "c0"),
    ("NOT (id % 2 = 0)", !(col("id") % 2 === 0)),
    ("day >= '2024-03-02' AND a < 20",
      col("day") >= "2024-03-02" && col("a") < 20))

  /** The assignment grammar: (sql SET text, API set map). */
  private val sets: Seq[(String, Map[String, Column])] = Seq(
    ("a = a + 1", Map("a" -> (col("a") + 1))),
    ("cat = upper(cat)", Map("cat" -> upper(col("cat")))),
    ("a = id * 2, cat = 'x'",
      Map("a" -> (col("id") * 2), "cat" -> lit("x"))),
    ("ts = ts + INTERVAL 2 DAYS",
      Map("ts" -> (col("ts") + expr("INTERVAL 2 DAYS")))),
    ("a = coalesce(a, 0) + id",
      Map("a" -> (coalesce(col("a"), lit(0)) + col("id")))))

  test("fuzz: SQL DELETE ≡ deleteWhere for every grammar predicate") {
    preds.foreach { case (sqlPred, apiPred) =>
      val sqlLake = freshLake(); val apiLake = freshLake()
      val got = spark.sql(
        s"DELETE FROM `graft-lake`.`$sqlLake` WHERE $sqlPred")
        .collect().head.getLong(0)
      val want = ManifestLake.deleteWhere(spark, apiLake, apiPred)
      assert(got == want, s"count diverged for DELETE WHERE $sqlPred")
      assert(state(sqlLake) == state(apiLake),
        s"state diverged for DELETE WHERE $sqlPred")
    }
  }

  test("fuzz: SQL UPDATE ≡ updateWhere across the " +
      "assignment × predicate grammar") {
    for ((sqlSet, apiSet) <- sets; (sqlPred, apiPred) <- preds.take(6)) {
      val sqlLake = freshLake(); val apiLake = freshLake()
      val got = spark.sql(s"UPDATE `graft-lake`.`$sqlLake` " +
        s"SET $sqlSet WHERE $sqlPred").collect().head.getLong(0)
      val want = ManifestLake.updateWhere(spark, apiLake, apiSet, apiPred)
      assert(got == want,
        s"count diverged for UPDATE SET $sqlSet WHERE $sqlPred")
      assert(state(sqlLake) == state(apiLake),
        s"state diverged for UPDATE SET $sqlSet WHERE $sqlPred")
    }
  }
}
