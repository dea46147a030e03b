package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CHECK-constraint contract (the Delta invariant design): constraints
  * version with the data in the manifest; ADD validates the existing
  * table first; every row-adding commit validates what it is about to
  * publish and fails BEFORE its manifest rename — a committed snapshot
  * can never hold a violating row. SQL CHECK semantics: NULL passes. */
class ManifestLakeCheckSpec extends SparkSpec {
  import spark.implicits._
  import ManifestLake._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkBase() = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), "click", 1.0),
    (2L, 20L, ts("2024-01-02 11:00:00"), "click", 2.0))
    .toDF("user_id", "event_id", "ts", "event_type", "value")

  test("violating append rejected before commit; conforming append lands; drop lifts it") {
    val dir = Files.createTempDirectory("graft_ml_chk").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    assert(ManifestLake.addCheck(spark, dir, "c_pos", "value > 0") == 2L)
    assert(ManifestLake.checksOf(spark, dir) == Seq("c_pos" -> "value > 0"))
    val bad = Seq((3L, 30L, ts("2024-01-03 10:00:00"), "x", -1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val boom = intercept[IllegalStateException] {
      ManifestLake.appendBatch(spark, dir, bad, "ts", batchId = 0L)
    }
    assert(boom.getMessage.contains("c_pos") &&
      boom.getMessage.contains("1 violating rows"))
    assert(ManifestLake.snapshot(spark, dir).version == 2L)
    assert(ManifestLake.read(spark, dir).count() == 2)
    val good = bad.withColumn("value", lit(5.0))
    assert(ManifestLake.appendBatch(spark, dir, good, "ts", batchId = 0L) == 3L)
    // dropCheck: the constraint lifts and the bad batch now lands
    ManifestLake.dropCheck(spark, dir, "c_pos")
    assert(ManifestLake.checksOf(spark, dir).isEmpty)
    assert(ManifestLake.appendBatch(spark, dir, bad, "ts", batchId = 1L) == 5L)
  }

  test("addCheck on an already-violating table is refused with no commit") {
    val dir = Files.createTempDirectory("graft_ml_chk2").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    intercept[IllegalStateException] {
      ManifestLake.addCheck(spark, dir, "c_big", "value > 100")
    }
    assert(ManifestLake.snapshot(spark, dir).version == 1L)
    assert(ManifestLake.checksOf(spark, dir).isEmpty)
  }

  test("upsert and mergeInto validate the rows they publish (computed values too)") {
    val dir = Files.createTempDirectory("graft_ml_chk3").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.addCheck(spark, dir, "c_pos", "value > 0")
    val upd = Seq((1L, 10L, ts("2024-01-01 12:00:00"), "upd", -3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    intercept[IllegalStateException] {
      ManifestLake.upsert(spark, dir, upd, Seq("event_id"), "ts")
    }
    assert(ManifestLake.snapshot(spark, dir).version == 2L)
    // mergeInto: the UPDATE EXPRESSION manufactures the violation from
    // conforming inputs — validation must run on the written rows, not
    // the source
    val src = Seq((1L, 10L, ts("2024-01-01 12:00:00"), "m", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    intercept[IllegalStateException] {
      ManifestLake.mergeInto(spark, dir, src, Seq("event_id"), "ts", Seq(
        MatchedUpdate(Map("value" -> (col("s.value") - lit(100.0))))))
    }
    assert(ManifestLake.snapshot(spark, dir).version == 2L)
    assert(ManifestLake.read(spark, dir)
      .filter(col("value") < 0).count() == 0)
  }

  test("NULL predicate passes (SQL CHECK semantics); multiple violations all named") {
    val dir = Files.createTempDirectory("graft_ml_chk4").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.addCheck(spark, dir, "c_pos", "value > 0")
    ManifestLake.addCheck(spark, dir, "c_type", "event_type IN ('click','buy')")
    val nullRow = Seq((3L, 30L, ts("2024-01-03 10:00:00"), "click",
      null.asInstanceOf[java.lang.Double]))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    assert(ManifestLake.appendBatch(spark, dir, nullRow, "ts", 0L) == 4L)
    val doubleBad = Seq((4L, 40L, ts("2024-01-03 11:00:00"), "zap", -1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val boom = intercept[IllegalStateException] {
      ManifestLake.appendBatch(spark, dir, doubleBad, "ts", 1L)
    }
    assert(boom.getMessage.contains("c_pos") &&
      boom.getMessage.contains("c_type"))
  }

  test("constraints restore with their version (metadata is state)") {
    val dir = Files.createTempDirectory("graft_ml_chk5").toString
    ManifestLake.create(spark, dir, mkBase(), "ts") // v1: no checks
    ManifestLake.addCheck(spark, dir, "c_pos", "value > 0") // v2
    ManifestLake.restore(spark, dir, 1L) // v3: v1's (empty) constraint set
    assert(ManifestLake.checksOf(spark, dir).isEmpty)
    val bad = Seq((3L, 30L, ts("2024-01-03 10:00:00"), "x", -1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    assert(ManifestLake.appendBatch(spark, dir, bad, "ts", 0L) == 4L)
    // and restoring to v2 reinstates it
    ManifestLake.restore(spark, dir, 2L)
    assert(ManifestLake.checksOf(spark, dir) == Seq("c_pos" -> "value > 0"))
  }

  test("streaming sink on a constrained table: a violating micro-batch fails the query, the table stays consistent, a fixed batch lands") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ml_chk_sink").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.addCheck(spark, dir, "c_pos", "value > 0")
    def startQuery(mem: MemoryStream[graft.streaming.TaskEvent]) =
      mem.toDS().toDF()
        .writeStream.foreachBatch(ManifestLake.sink(dir, "ts"))
        .option("checkpointLocation",
          Files.createTempDirectory("graft_ml_chk_sink_cp").toString)
        .start()
    val mem = MemoryStream[graft.streaming.TaskEvent]
    val q = startQuery(mem)
    val boom = intercept[Exception] {
      mem.addData(graft.streaming.TaskEvent(9L,
        ts("2024-01-15 00:01:00"), 9L, "x", -1.0))
      q.processAllAvailable()
    }
    // the violation surfaces as the query's failure, not a silent drop
    assert(boom.getMessage.contains("c_pos") ||
      Option(boom.getCause).exists(_.getMessage.contains("c_pos")),
      s"constraint violation did not surface: ${boom.getMessage}")
    q.stop()
    assert(ManifestLake.read(spark, dir).filter(col("value") <= 0).count() == 0)
    // a fresh query with conforming data lands normally
    val mem2 = MemoryStream[graft.streaming.TaskEvent]
    val q2 = startQuery(mem2)
    try {
      mem2.addData(graft.streaming.TaskEvent(9L,
        ts("2024-01-15 00:01:00"), 9L, "x", 5.0))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(ManifestLake.read(spark, dir)
      .filter(col("event_id") === 9L).count() == 1)
  }

  test("history: every commit records its operation; restore names its target version") {
    val dir = Files.createTempDirectory("graft_ml_hist").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val b = Seq((3L, 30L, ts("2024-01-03 10:00:00"), "s", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L)
    ManifestLake.upsert(spark, dir, b, Seq("event_id"), "ts")
    ManifestLake.deleteWhereDV(spark, dir, col("event_id") === 20L)
    ManifestLake.restore(spark, dir, 1L)
    val h = ManifestLake.history(spark, dir)
      .select("version", "operation", "n_dvs").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(h.map(_._2).toSeq ==
      Seq("create", "append(0)", "upsert", "deleteDV", "restore(1)"), h.toSeq)
    assert(h.find(_._2 == "deleteDV").exists(_._3 == 1))
    assert(h.last._3 == 0, "restore(1) should carry v1's empty DV set")
    // committed_at is the rename instant: non-decreasing
    val times = ManifestLake.history(spark, dir)
      .select("committed_at").collect().map(_.getTimestamp(0).getTime)
    assert(times.sameElements(times.sorted))
  }

  test("constraints survive EVERY commit kind (append, upsert, merge, CoW/DV delete, compaction)") {
    // regression pin: the upsert commit initially failed to carry the
    // constraint set forward — a successful upsert silently DROPPED
    // every constraint from the next manifest, so all later writes
    // went unvalidated; this walks each commit kind and asserts the
    // constraint is still in force afterwards
    val dir = Files.createTempDirectory("graft_ml_chk6").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.addCheck(spark, dir, "c_pos", "value > 0")
    val want = Seq("c_pos" -> "value > 0")
    val b = Seq((3L, 30L, ts("2024-01-03 10:00:00"), "s", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, dir, b, "ts", batchId = 0L)
    assert(ManifestLake.checksOf(spark, dir) == want, "lost at append")
    ManifestLake.upsert(spark, dir, b.withColumn("value", lit(2.0)),
      Seq("event_id"), "ts")
    assert(ManifestLake.checksOf(spark, dir) == want, "lost at upsert")
    ManifestLake.mergeInto(spark, dir, b.withColumn("value", lit(3.0)),
      Seq("event_id"), "ts",
      Seq(MatchedUpdate(Map("value" -> col("s.value")))))
    assert(ManifestLake.checksOf(spark, dir) == want, "lost at merge")
    ManifestLake.deleteWhereDV(spark, dir, col("event_id") === 30L)
    assert(ManifestLake.checksOf(spark, dir) == want, "lost at DV delete")
    ManifestLake.deleteWhere(spark, dir, col("event_id") === 20L)
    assert(ManifestLake.checksOf(spark, dir) == want, "lost at delete")
    ManifestLake.compactDay(spark, dir, "2024-01-01")
    assert(ManifestLake.checksOf(spark, dir) == want, "lost at compaction")
    // and it still ENFORCES after the whole chain
    intercept[IllegalStateException] {
      ManifestLake.appendBatch(spark, dir,
        b.withColumn("value", lit(-1.0)).withColumn("event_id", lit(99L)),
        "ts", batchId = 1L)
    }
  }
}
