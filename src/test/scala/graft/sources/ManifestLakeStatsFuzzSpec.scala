package graft.sources

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized soundness fuzz for the data-skipping layer (the
  * ManifestLakeModelSpec discipline applied to readWhere): seeded
  * random predicates — mixed ops, literals in and out of range, day
  * conjuncts, nested OR residue — over a lake whose days were
  * clustered on different keys, each checked two ways:
  *
  *   1. readWhere(pred) ≡ read().filter(pred)  (pruning never changes
  *      the answer);
  *   2. every file the report DROPS truly holds no matching row
  *      (pruning is not just compensated-for by the residual filter —
  *      re-reading each dropped file under the predicate must yield 0).
  *
  * Check 2 is the one a correctness-only compare can miss: a pruner
  * that wrongly drops a file AND a filter bug that wrongly keeps rows
  * could in principle cancel; asserting emptiness of the dropped set
  * pins the envelope arithmetic itself.
  */
class ManifestLakeStatsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def buildLake(): String = {
    val dir = Files.createTempDirectory("graft_mls_fuzz").toString
    val rows = (0 until 3000).map { i =>
      val d = i % 5
      (i.toLong, ts(f"2024-04-${d + 1}%02d ${i % 24}%02d:00:00"),
        if (i % 11 == 0) null else s"s${i % 7}-${i % 97}",
        (i % 200) / 8.0)
    }.toDF("uid", "ts", "cat", "amount")
    ManifestLake.create(spark, dir, rows, "ts", filesPerDay = 3,
      statsCols = Seq("uid", "cat", "amount", "ts"),
      bloomCols = Seq("uid", "cat"))
    // cluster alternating keys so different predicates exercise
    // different layouts (and one day stays hash-spread)
    ManifestLake.compactDay(spark, dir, "2024-04-01",
      targetFileBytes = 8 * 1024, clusterBy = Seq("uid"))
    ManifestLake.compactDay(spark, dir, "2024-04-02",
      targetFileBytes = 8 * 1024, clusterBy = Seq("cat"))
    ManifestLake.compactDay(spark, dir, "2024-04-03",
      targetFileBytes = 8 * 1024, clusterBy = Seq("amount"))
    dir
  }

  private def randomPred(rnd: Random): String = {
    def leaf(): String = rnd.nextInt(15) match {
      case 0 => s"uid = ${rnd.nextInt(3500) - 200}"
      case 1 => s"uid >= ${rnd.nextInt(3000)} AND uid < ${rnd.nextInt(3000) + 500}"
      case 2 => s"cat = 's${rnd.nextInt(9)}-${rnd.nextInt(110)}'"
      case 3 => s"cat LIKE 's${rnd.nextInt(8)}-%'"
      case 4 => "cat IS NULL"
      case 5 => "cat IS NOT NULL"
      case 6 => s"amount <= ${rnd.nextInt(30)}.${rnd.nextInt(10)}"
      case 7 => s"amount > ${rnd.nextInt(30)}"
      case 8 => s"day = '2024-04-0${rnd.nextInt(6) + 1}'"
      case 9 => s"day >= '2024-04-0${rnd.nextInt(6) + 1}'"
      case 10 => s"ts < TIMESTAMP '2024-04-0${rnd.nextInt(5) + 1} 12:00:00'"
      case 11 => s"uid IN (${Seq.fill(3)(rnd.nextInt(3500)).mkString(", ")})"
      // the review-fix paths: double-space boundary literals against
      // the float column, and cross-typed literals that must SKIP
      // pruning (string vs integral stats/bloom) yet stay correct
      case 12 => f"amount = ${rnd.nextInt(25)}%d.${rnd.nextInt(100)}%02d"
      case 13 => s"uid = '${rnd.nextInt(3500)}'"
      case 14 => s"ts >= '2024-04-0${rnd.nextInt(5) + 1} 06:00:00'"
    }
    val n = rnd.nextInt(3) + 1
    val parts = Seq.fill(n)(leaf())
    val conj = parts.mkString(" AND ")
    // sprinkle OR residue a third of the time — must degrade safely
    if (rnd.nextInt(3) == 0) s"($conj) OR uid = ${rnd.nextInt(3000)}"
    else conj
  }

  private def fuzz(dir: String, phase: String): Unit = {
    val snapFiles = ManifestLake.snapshot(spark, dir).files.keys.toSet
    Seq(7L, 20260814L).foreach { seed =>
      val rnd = new Random(seed)
      (1 to 20).foreach { i =>
        val pred = randomPred(rnd)
        withClue(s"$phase seed=$seed #$i pred=[$pred]: ") {
          val got = ManifestLake.readWhere(spark, dir, pred)
            .collect().map(_.toString).sorted.toSeq
          val want = ManifestLake.read(spark, dir).filter(pred)
            .collect().map(_.toString).sorted.toSeq
          assert(got == want, "pruned read diverged from full scan")
          val rep = ManifestLake.candidateFiles(spark, dir, pred)
          val dropped = snapFiles -- rep.keptFiles.toSet
          if (dropped.nonEmpty) {
            // a dropped file re-read under the predicate must be empty
            // (day restored from the path segment, as readPaths does).
            // The check is against RAW rows deliberately: pruning must
            // be sound on the file's contents, DVs only subtract more.
            val reread = spark.read
              .schema(ManifestLake.read(spark, dir).schema)
              .parquet(dropped.map(f => s"$dir/$f").toSeq: _*)
              .withColumn("day", when(col("day") ===
                "__HIVE_DEFAULT_PARTITION__", lit(null: String))
                .otherwise(col("day")))
              .filter(pred).count()
            assert(reread == 0L, s"dropped files held $reread matching rows")
          }
        }
      }
    }
  }

  test("40 seeded random predicates: pruned ≡ full, and every dropped file is truly empty under the predicate") {
    val dir = buildLake()
    fuzz(dir, "plain")
    // the same battery with a deletion vector active: stats pruning,
    // bloom probes, and the position anti-join must compose for every
    // predicate shape — the file SET is untouched by the DV (no
    // rewrite), so the dropped-file arithmetic is identical and only
    // the surviving-row sets shrink on both sides equally
    val nDv = ManifestLake.deleteWhereDV(spark, dir,
      expr("uid % 13 = 4 OR cat LIKE 's3-%'"))
    assert(nDv > 0L, "DV phase deleted nothing — predicate went stale")
    fuzz(dir, "dv-active")
  }
}
