package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.ManifestLake

/** The SQL DML front door (round 14): INSERT INTO / INSERT OVERWRITE /
  * DELETE FROM / UPDATE / MERGE INTO over ``graft-lake`.`path``
  * identifiers must land through the SAME transactional APIs the
  * programmatic route uses — each statement is twinned against its
  * API call on an identical lake and the full table states must
  * match. Refusals (shape restrictions the lake cannot express) must
  * be loud and actionable. */
class SqlDmlSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** (id, ts, cat, a, b) over three days; ids 0..11. */
  private def seed: DataFrame =
    (0 until 12).map { i =>
      (i.toLong, ts(f"2024-03-${i % 3 + 1}%02d 10:00:00"),
        if (i % 2 == 0) "even" else "odd", i.toDouble, i * 10.0)
    }.toDF("id", "ts", "cat", "a", "b")

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_sqldml").toString
    ManifestLake.create(spark, dir, seed, "ts")
    dir
  }

  private def state(path: String): Set[(Long, String, String, Double,
      Double, String)] =
    ManifestLake.read(spark, path)
      .select(col("id"), col("ts").cast("string"), col("cat"), col("a"),
        col("b"), col("day"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4), r.getString(5))).toSet

  test("ordCol persists as table metadata at create") {
    val lake = freshLake()
    assert(ManifestLake.ordColOf(spark, lake).contains("ts"))
  }

  test("INSERT INTO (positional) appends through appendless SQL") {
    val lake = freshLake()
    Seq((100L, "2024-03-09 09:00:00", "new", 1.5, 2.5))
      .toDF("id", "tss", "cat", "a", "b").createOrReplaceTempView("ins_src")
    val out = spark.sql(
      s"INSERT INTO `graft-lake`.`$lake` " +
        "SELECT id, CAST(tss AS TIMESTAMP), cat, a, b FROM ins_src")
    assert(out.columns.toSeq == Seq("version"))
    val st = state(lake)
    assert(st.size == 13)
    assert(st.exists(r => r._1 == 100L && r._6 == "2024-03-09"))
    // the insert is a real lake commit, visible to time travel
    assert(ManifestLake.readVersion(spark, lake, 1L).count() == 12L)
  }

  test("INSERT INTO arity mismatch and PARTITION clause refuse loudly") {
    val lake = freshLake()
    spark.range(3).createOrReplaceTempView("short_src")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO `graft-lake`.`$lake` SELECT id FROM short_src")
    }
    assert(e.getMessage.contains("insertable"))
  }

  test("INSERT INTO (column list): unlisted columns land NULL") {
    val lake = freshLake()
    Seq((200L, "2024-03-09 09:00:00")).toDF("id", "tss")
      .createOrReplaceTempView("partial_src")
    spark.sql(s"INSERT INTO `graft-lake`.`$lake` (id, ts) " +
      "SELECT id, CAST(tss AS TIMESTAMP) FROM partial_src")
    val row = ManifestLake.read(spark, lake).filter(col("id") === 200L)
      .select("cat", "a", "b").collect().head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }

  test("INSERT OVERWRITE replaces the whole table in one commit") {
    val lake = freshLake()
    seed.limit(2).createOrReplaceTempView("ovw_src")
    spark.sql(s"INSERT OVERWRITE `graft-lake`.`$lake` " +
      "SELECT id, ts, cat, a, b FROM ovw_src")
    assert(ManifestLake.read(spark, lake).count() == 2L)
    // previous state still addressable by version
    assert(ManifestLake.readVersion(spark, lake, 1L).count() == 12L)
  }

  test("DELETE FROM ≡ deleteWhere twin, returns the deleted count") {
    val sqlLake = freshLake(); val apiLake = freshLake()
    val got = spark.sql(
      s"DELETE FROM `graft-lake`.`$sqlLake` WHERE id % 3 = 0 AND a < 7")
      .collect().head.getLong(0)
    val want = ManifestLake.deleteWhere(spark, apiLake,
      col("id") % 3 === 0 && col("a") < 7)
    assert(got == want && got == 3L) // ids 0, 3, 6
    assert(state(sqlLake) == state(apiLake))
  }

  test("DELETE FROM with a target alias strips the qualifier") {
    val lake = freshLake()
    val got = spark.sql(
      s"DELETE FROM `graft-lake`.`$lake` AS t WHERE t.id = 5")
      .collect().head.getLong(0)
    assert(got == 1L)
    assert(!state(lake).exists(_._1 == 5L))
  }

  test("UPDATE ≡ updateWhere twin; every RHS sees the PRE-update row") {
    val sqlLake = freshLake(); val apiLake = freshLake()
    // the classic swap: correct only if both RHS evaluate on the old row
    val got = spark.sql(s"UPDATE `graft-lake`.`$sqlLake` " +
      "SET a = b, b = a, cat = concat(cat, '!') WHERE id >= 6")
      .collect().head.getLong(0)
    val want = ManifestLake.updateWhere(spark, apiLake,
      Map("a" -> col("b"), "b" -> col("a"),
        "cat" -> concat(col("cat"), lit("!"))),
      col("id") >= 6)
    assert(got == want && got == 6L)
    assert(state(sqlLake) == state(apiLake))
    // the swap actually happened
    assert(state(sqlLake).exists(r => r._1 == 7L && r._4 == 70.0 &&
      r._5 == 7.0 && r._3 == "odd!"))
    // untouched rows untouched
    assert(state(sqlLake).exists(r => r._1 == 2L && r._4 == 2.0 &&
      r._5 == 20.0 && r._3 == "even"))
  }

  test("UPDATE of the ord column moves rows across day partitions") {
    val lake = freshLake()
    spark.sql(s"UPDATE `graft-lake`.`$lake` " +
      "SET ts = ts + INTERVAL 10 DAYS WHERE id = 4")
    val moved = state(lake).find(_._1 == 4L).get
    assert(moved._6 == "2024-03-12") // 03-02 + 10 days
    assert(moved._2.startsWith("2024-03-12"))
    assert(state(lake).size == 12)
    // manifest day pruning still finds it (day key is consistent)
    assert(ManifestLake.readDays(spark, lake, _ == "2024-03-12")
      .count() == 1L)
  }

  test("UPDATE refuses assigning the derived day column") {
    val lake = freshLake()
    val e = intercept[Exception] {
      spark.sql(s"UPDATE `graft-lake`.`$lake` SET day = 'x' WHERE id = 1")
    }
    assert(e.getMessage.contains("derived"))
  }

  test("UPDATE refuses duplicate assignment targets instead of " +
      "silently keeping the last") {
    val lake = freshLake()
    val e = intercept[Exception] {
      spark.sql(s"UPDATE `graft-lake`.`$lake` SET a = 1, A = 2 WHERE id = 1")
    }
    assert(e.getMessage.contains("duplicate"))
    // nothing committed
    assert(state(lake).exists(r => r._1 == 1L && r._4 == 1.0))
  }

  test("MERGE refuses SET day (derived) and duplicate UPDATE targets, " +
      "matching the UPDATE statement route") {
    val lake = freshLake()
    seed.limit(2).createOrReplaceTempView("merge_day_src")
    val e1 = intercept[Exception] {
      spark.sql(s"""MERGE INTO `graft-lake`.`$lake` t
        |USING merge_day_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET day = '2024-01-01'""".stripMargin)
    }
    assert(e1.getMessage.contains("derived") ||
      e1.getMessage.contains("ord column"))
    val e2 = intercept[Exception] {
      spark.sql(s"""MERGE INTO `graft-lake`.`$lake` t
        |USING merge_day_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET a = 1, a = 2""".stripMargin)
    }
    assert(e2.getMessage.contains("duplicate"))
  }

  test("MERGE INTO ≡ mergeInto twin across all three clause families") {
    val sqlLake = freshLake(); val apiLake = freshLake()
    val src = Seq(
      (1L, "2024-03-05 10:00:00", "src", 100.0, 1.0),  // matched, a<where
      (2L, "2024-03-05 10:00:00", "src", 200.0, 2.0),  // matched
      (50L, "2024-03-06 10:00:00", "src", 500.0, 5.0)) // not matched
      .toDF("id", "tss", "cat", "a", "b")
      .select(col("id"), col("tss").cast("timestamp").as("ts"), col("cat"),
        col("a"), col("b"))
    src.createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO `graft-lake`.`$sqlLake` t
         |USING merge_src s
         |ON t.id = s.id
         |WHEN MATCHED AND t.a < 2 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET a = s.a, cat = s.cat
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE AND t.id >= 10
         |  THEN UPDATE SET cat = 'stale'
         |""".stripMargin)
    ManifestLake.mergeInto(spark, apiLake, src, Seq("id"), "ts", Seq(
      ManifestLake.MatchedDelete(Some(col("t.a") < 2)),
      ManifestLake.MatchedUpdate(Map("a" -> col("s.a"),
        "cat" -> col("s.cat"))),
      ManifestLake.NotMatchedInsert(),
      ManifestLake.NotMatchedBySourceUpdate(Map("cat" -> lit("stale")),
        Some(col("t.id") >= 10))))
    assert(state(sqlLake) == state(apiLake))
    val st = state(sqlLake)
    assert(!st.exists(_._1 == 1L))                        // deleted
    assert(st.exists(r => r._1 == 2L && r._4 == 200.0 &&
      r._3 == "src"))                                     // updated
    assert(st.exists(r => r._1 == 50L && r._6 == "2024-03-06")) // inserted
    assert(st.exists(r => r._1 == 11L && r._3 == "stale"))      // by-source
    assert(st.exists(r => r._1 == 9L && r._3 == "odd"))   // guard held
  }

  test("MERGE explicit INSERT column list: identity accepted, " +
      "reshape refused") {
    val lake = freshLake()
    Seq((60L, "2024-03-06 10:00:00", "x", 6.0, 6.0))
      .toDF("id", "tss", "cat", "a", "b")
      .selectExpr("id", "CAST(tss AS TIMESTAMP) AS ts", "cat", "a", "b")
      .createOrReplaceTempView("ins_merge_src")
    spark.sql(
      s"""MERGE INTO `graft-lake`.`$lake` t USING ins_merge_src s
         |ON t.id = s.id
         |WHEN NOT MATCHED THEN INSERT (id, ts, cat, a, b)
         |  VALUES (s.id, s.ts, s.cat, s.a, s.b)""".stripMargin)
    assert(state(lake).exists(_._1 == 60L))
    val e = intercept[Exception] {
      spark.sql(
        s"""MERGE INTO `graft-lake`.`$lake` t USING ins_merge_src s
           |ON t.id = s.id
           |WHEN NOT MATCHED THEN INSERT (id, ts, cat, a, b)
           |  VALUES (s.id, s.ts, s.cat, s.b, s.a)""".stripMargin)
    }
    assert(e.getMessage.contains("identity"))
  }

  test("MERGE refuses a non-equi / cross-name ON condition") {
    val lake = freshLake()
    spark.range(1).selectExpr("id AS key").createOrReplaceTempView("bad_src")
    val e1 = intercept[Exception] {
      spark.sql(s"MERGE INTO `graft-lake`.`$lake` t USING bad_src s " +
        "ON t.id = s.key WHEN MATCHED THEN DELETE")
    }
    assert(e1.getMessage.contains("same-name"))
    val e2 = intercept[Exception] {
      spark.sql(s"MERGE INTO `graft-lake`.`$lake` t USING bad_src s " +
        "ON t.id > s.key WHEN MATCHED THEN DELETE")
    }
    assert(e2.getMessage.contains("non-equality"))
  }

  test("SQL DML refuses a lake without ord-column metadata, " +
      "pointing at the API") {
    val lake = freshLake()
    val p = new org.apache.hadoop.fs.Path(s"$lake/_graft_log/ord_col")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, false)
    spark.range(1).selectExpr("id", "CAST(NULL AS TIMESTAMP) AS ts",
      "'x' AS cat", "1.0 AS a", "2.0 AS b")
      .createOrReplaceTempView("noord_src")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO `graft-lake`.`$lake` SELECT * FROM noord_src")
    }
    assert(e.getMessage.contains("ord-column metadata"))
    // DELETE and UPDATE don't need the ord column unless it's assigned
    assert(spark.sql(s"DELETE FROM `graft-lake`.`$lake` WHERE id = 0")
      .collect().head.getLong(0) == 1L)
  }

  test("CREATE TABLE AS SELECT creates a queryable lake with ord-col " +
      "metadata; IF NOT EXISTS no-ops; bare re-CREATE refuses") {
    val dir = Files.createTempDirectory("graft_ctas").toString + "/t"
    seed.createOrReplaceTempView("ctas_src")
    val v = spark.sql(s"CREATE TABLE `graft-lake`.`$dir` " +
      "OPTIONS ('ordCol' 'ts', 'filesPerDay' '2') " +
      "AS SELECT * FROM ctas_src").collect().head.getLong(0)
    assert(v == 1L)
    assert(ManifestLake.ordColOf(spark, dir).contains("ts"))
    assert(state(dir).size == 12)
    // the full lifecycle from SQL: create → insert → update → read
    spark.sql(s"INSERT INTO `graft-lake`.`$dir` SELECT id + 500, ts, " +
      "cat, a, b FROM ctas_src WHERE id < 2")
    assert(spark.sql(s"SELECT count(*) AS c FROM `graft-lake`.`$dir`")
      .collect().head.getLong(0) == 14L)
    val again = spark.sql(s"CREATE TABLE IF NOT EXISTS " +
      s"`graft-lake`.`$dir` OPTIONS ('ordCol' 'ts') " +
      "AS SELECT * FROM ctas_src").collect().head.getLong(0)
    assert(again == 2L)                       // head version, no new commit
    assert(state(dir).size == 14)             // untouched
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE `graft-lake`.`$dir` " +
        "OPTIONS ('ordCol' 'ts') AS SELECT * FROM ctas_src")
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("CREATE TABLE with a column list commits an empty v1 whose " +
      "schema anchors later inserts") {
    val dir = Files.createTempDirectory("graft_ct").toString + "/t"
    spark.sql(s"CREATE TABLE `graft-lake`.`$dir` " +
      "(id BIGINT, ts TIMESTAMP, note STRING) OPTIONS ('ordCol' 'ts')")
    assert(ManifestLake.read(spark, dir).count() == 0L)
    assert(ManifestLake.read(spark, dir).columns.toSeq ==
      Seq("id", "ts", "note", "day"))
    spark.sql(s"INSERT INTO `graft-lake`.`$dir` VALUES " +
      "(1, TIMESTAMP '2024-03-01 10:00:00', 'hello')")
    val r = ManifestLake.read(spark, dir).collect().head
    assert(r.getLong(0) == 1L && r.getString(2) == "hello")
  }

  test("CREATE TABLE refuses a missing ordCol option and PARTITIONED BY") {
    val dir = Files.createTempDirectory("graft_ctbad").toString + "/t"
    seed.createOrReplaceTempView("ctas_src2")
    val e1 = intercept[Exception] {
      spark.sql(s"CREATE TABLE `graft-lake`.`$dir` " +
        "AS SELECT * FROM ctas_src2")
    }
    assert(e1.getMessage.contains("ordCol"))
    val e2 = intercept[Exception] {
      spark.sql(s"CREATE TABLE `graft-lake`.`$dir` " +
        "OPTIONS ('ordCol' 'ts') PARTITIONED BY (cat) " +
        "AS SELECT * FROM ctas_src2")
    }
    assert(e2.getMessage.contains("PARTITIONED BY"))
  }

  test("INSERT BY NAME refuses extra source columns instead of " +
      "silently dropping them (review r14 #5)") {
    val lake = freshLake()
    seed.withColumn("extra_col", lit(1))
      .createOrReplaceTempView("byname_src")
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO `graft-lake`.`$lake` BY NAME " +
        "SELECT * FROM byname_src")
    }
    assert(e.getMessage.contains("extra_col"))
    // the aligned form works (shuffled column order, matched by name)
    spark.sql(s"INSERT INTO `graft-lake`.`$lake` BY NAME " +
      "SELECT cat, b, a, ts, id + 900 AS id FROM byname_src WHERE id = 0")
    assert(state(lake).exists(_._1 == 900L))
    assert(state(lake).size == 13)
    // lake-to-lake BY NAME SELECT * keeps working: the derived `day`
    // column every lake read carries is re-derived by the write path,
    // not treated as an extra (pass-2 #2)
    val src = freshLake()
    spark.sql(s"DELETE FROM `graft-lake`.`$src` WHERE id >= 1")
    spark.sql(s"UPDATE `graft-lake`.`$src` SET id = id + 800 WHERE id = 0")
    spark.sql(s"INSERT INTO `graft-lake`.`$lake` BY NAME " +
      s"SELECT * FROM `graft-lake`.`$src`")
    assert(state(lake).exists(_._1 == 800L))
    assert(state(lake).size == 14)
  }

  test("a write whose ordCol disagrees with the table metadata " +
      "refuses (review r14 #4)") {
    val lake = freshLake()
    val e = intercept[Exception] {
      ManifestLake.append(spark, lake, seed.limit(1), "id")
    }
    assert(e.getMessage.contains("persisted ord column"))
    val e2 = intercept[Exception] {
      ManifestLake.upsert(spark, lake, seed.limit(1), Seq("id"), "id")
    }
    assert(e2.getMessage.contains("persisted ord column"))
  }

  test("DML on non-lake tables is untouched by the rule") {
    seed.createOrReplaceTempView("plain_view")
    // a plain view has no DML support — Spark's own error, not graft's
    val e = intercept[Exception] {
      spark.sql("DELETE FROM plain_view WHERE id = 1")
    }
    assert(!e.getMessage.contains("graft"))
  }
}
