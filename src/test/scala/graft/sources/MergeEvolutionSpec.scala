package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** MERGE schema evolution (VERDICT r14 #4 — Delta's
  * schema.autoMerge.enabled): a merge whose source carries a NEW
  * column refuses by default with the remedy; with the conf on, the
  * column widens the checkpoint IN THE SAME COMMIT as the merge —
  * old files read it as NULL, updates may SET it, inserts carry it,
  * and a concurrent widening still refuses through the OCC metadata
  * guard. Also pins the silent-drop fix: a SET target naming no
  * output column is an error, never ignored. */
class MergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def freshLake(): String = {
    val dir = Files.createTempDirectory("graft_mevo").toString
    ManifestLake.create(spark,
      dir,
      (0 until 6).map(i => (i.toLong, ts(f"2024-05-0${i % 2 + 1} 10:00:00"),
        i * 1.0)).toDF("id", "ts", "v"),
      "ts")
    dir
  }

  private def withAutoMerge[A](on: Boolean)(body: => A): A = {
    if (on) spark.conf.set(ManifestLake.AutoMergeConf, "true")
    try body
    finally spark.conf.unset(ManifestLake.AutoMergeConf)
  }

  private val wideSrc = Seq(
    (1L, ts("2024-05-01 11:00:00"), 100.0, "alpha"),   // matched: update
    (50L, ts("2024-05-03 09:00:00"), 50.0, "beta"))    // unmatched: insert
    .toDF("id", "ts", "v", "tag")

  test("default OFF: a wider source refuses loudly with the remedy, " +
      "and nothing commits") {
    val lake = freshLake()
    val v0 = ManifestLake.snapshot(spark, lake).version
    val e = intercept[IllegalArgumentException] {
      ManifestLake.mergeInto(spark, lake, wideSrc, Seq("id"), "ts",
        Seq(ManifestLake.MatchedUpdate(Map("v" -> col("s.v"))),
          ManifestLake.NotMatchedInsert()))
    }
    assert(e.getMessage.contains("tag") &&
      e.getMessage.contains(ManifestLake.AutoMergeConf))
    assert(ManifestLake.snapshot(spark, lake).version == v0)
  }

  test("conf ON: the new column lands atomically with the merge — " +
      "old rows read NULL, SET writes it, the insert carries it") {
    val lake = freshLake()
    withAutoMerge(on = true) {
      ManifestLake.mergeInto(spark, lake, wideSrc, Seq("id"), "ts",
        Seq(ManifestLake.MatchedUpdate(
            Map("v" -> col("s.v"), "tag" -> col("s.tag"))),
          ManifestLake.NotMatchedInsert()))
    }
    val head = ManifestLake.read(spark, lake)
    assert(head.columns.contains("tag"))
    val byId = head.select("id", "v", "tag").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1),
        Option(r.getString(2)))).toMap
    assert(byId(1L) == ((100.0, Some("alpha")))) // updated + SET new col
    assert(byId(50L) == ((50.0, Some("beta")))) // inserted with new col
    // untouched rows (old files, never rewritten) read the column NULL
    assert(byId(4L) == ((4.0, None)) && byId(5L) == ((5.0, None)))
    // ONE commit: merge + widening are the same version
    val hist = ManifestLake.history(spark, lake).collect()
    assert(hist.length == 2 && hist.last.getString(1) == "merge")
    // and the checkpointed schema drives later reads (time travel to
    // v1 still shows the narrow schema)
    assert(!ManifestLake.readVersion(spark, lake, 1L).columns
      .contains("tag"))
  }

  test("SQL MERGE evolves through the same conf (the statement is a " +
      "thin layer over mergeInto)") {
    val lake = freshLake()
    wideSrc.createOrReplaceTempView("mevo_src")
    val boom = intercept[Exception] {
      spark.sql(s"""MERGE INTO `graft-lake`.`$lake` t USING mevo_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    assert(boom.getMessage.contains(ManifestLake.AutoMergeConf))
    withAutoMerge(on = true) {
      spark.sql(s"""MERGE INTO `graft-lake`.`$lake` t USING mevo_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v, tag = s.tag
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
    val got = spark.sql(
      s"SELECT id, tag FROM `graft-lake`.`$lake` ORDER BY id").collect()
    assert(got.find(_.getLong(0) == 1L).get.getString(1) == "alpha")
    assert(got.find(_.getLong(0) == 50L).get.getString(1) == "beta")
    assert(got.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("OCC: a CONCURRENT widening between snapshot and commit " +
      "refuses cleanly (the merge validated against the old schema)") {
    val lake = freshLake()
    val e = intercept[java.util.ConcurrentModificationException] {
      ManifestLake.mergeInto(spark, lake,
        Seq((1L, ts("2024-05-01 11:00:00"), 100.0)).toDF("id", "ts", "v"),
        Seq("id"), "ts",
        Seq(ManifestLake.MatchedUpdate(Map("v" -> col("s.v")))),
        beforeCommit = () => {
          // another writer widens the schema mid-merge
          ManifestLake.addColumns(spark, lake,
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("late",
                org.apache.spark.sql.types.StringType))))
          ()
        })
    }
    assert(e.getMessage.contains("metadata"), e.getMessage)
    // the widening won; the merge never half-landed
    val head = ManifestLake.read(spark, lake)
    assert(head.columns.contains("late"))
    assert(head.filter(col("id") === 1L).head().getDouble(2) == 1.0)
  }

  test("autoMerge composes with COLUMN MAPPING: a renamed table " +
      "widens through a merge, old names stay historical") {
    val lake = freshLake()
    ManifestLake.renameColumn(spark, lake, "v", "score") // v2, metadata-only
    val src = Seq(
      (1L, ts("2024-05-01 11:00:00"), 100.0, "alpha"),
      (60L, ts("2024-05-03 09:00:00"), 60.0, "beta"))
      .toDF("id", "ts", "score", "tag")
    withAutoMerge(on = true) {
      ManifestLake.mergeInto(spark, lake, src, Seq("id"), "ts",
        Seq(ManifestLake.MatchedUpdate(
            Map("score" -> col("s.score"), "tag" -> col("s.tag"))),
          ManifestLake.NotMatchedInsert()))
    }
    val head = ManifestLake.read(spark, lake)
    assert(head.columns.contains("score") && head.columns.contains("tag")
      && !head.columns.contains("v"))
    val byId = head.select("id", "score", "tag").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1),
        Option(r.getString(2)))).toMap
    assert(byId(1L) == ((100.0, Some("alpha"))))
    assert(byId(60L) == ((60.0, Some("beta"))))
    assert(byId(2L) == ((2.0, None))) // untouched, NULL new col
    // history answers each version under ITS names: v1 has v, no tag
    val v1 = ManifestLake.readVersion(spark, lake, 1L)
    assert(v1.columns.contains("v") && !v1.columns.contains("score") &&
      !v1.columns.contains("tag"))
  }

  test("a SET target naming no output column is an ERROR, not a " +
      "silent drop (pre-r15 it was ignored by the rewrite fold)") {
    val lake = freshLake()
    val e = intercept[IllegalArgumentException] {
      ManifestLake.mergeInto(spark, lake,
        Seq((1L, ts("2024-05-01 11:00:00"), 2.0)).toDF("id", "ts", "v"),
        Seq("id"), "ts",
        Seq(ManifestLake.MatchedUpdate(Map("typo_col" -> lit(9)))))
    }
    assert(e.getMessage.contains("typo_col"))
  }
}
