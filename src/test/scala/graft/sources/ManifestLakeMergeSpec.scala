package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The generic MERGE INTO contract (clause-based DML over the
  * manifest lake): first-applicable clause precedence, condition-aware
  * day discovery (a day no clause touches is never rewritten; inserts
  * APPEND to untouched days), the ambiguity error, cross-day update
  * moves, crash atomicity — plus RESTORE's rollback contract (history
  * preserved, batch cursor not rewound, vacuumed targets refused). */
class ManifestLakeMergeSpec extends SparkSpec {
  import spark.implicits._
  import ManifestLake._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def mkBase() = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00"), "click", 1.0),
    (2L, 20L, ts("2024-01-01 11:00:00"), "click", -1.0),
    (3L, 30L, ts("2024-01-02 10:00:00"), "click", 5.0),
    (4L, 40L, ts("2024-01-02 11:00:00"), "click", 2.0),
    (5L, 50L, ts("2024-01-03 10:00:00"), "click", 3.0),
    (6L, 60L, ts("2024-01-03 11:00:00"), "purge_me", 4.0))
    .toDF("user_id", "event_id", "ts", "event_type", "value")

  private def state(dir: String): Map[Long, (String, Double, String)] =
    ManifestLake.read(spark, dir)
      .select("event_id", "event_type", "value", "day")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getString(3)))).toMap

  test("full clause mix: conditional update/delete, insert appends to untouched days, by-source delete") {
    val dir = Files.createTempDirectory("graft_ml_merge").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val v1Days = ManifestLake.snapshot(spark, dir).days
    val source = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "merged", 7.0),  // update fires
      (2L, 20L, ts("2024-01-01 11:00:00"), "merged", -5.0), // delete fires
      (3L, 30L, ts("2024-01-02 10:00:00"), "merged", 1.0),  // no clause → untouched
      (9L, 99L, ts("2024-01-01 09:00:00"), "ins", 1.0),     // insert → rewritten day
      (8L, 88L, ts("2024-01-04 09:00:00"), "ins", 1.0),     // insert → brand-new day
      (7L, 77L, ts("2024-01-02 09:00:00"), "ins", 1.0))     // insert → APPENDS to day2
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val v = ManifestLake.mergeInto(spark, dir, source,
      keyCols = Seq("event_id"), ordCol = "ts", clauses = Seq(
        MatchedUpdate(Map("value" -> col("s.value"),
          "event_type" -> col("s.event_type")),
          cond = Some(expr("s.value > t.value"))),
        MatchedDelete(cond = Some(expr("t.value < 0"))),
        NotMatchedInsert(),
        NotMatchedBySourceDelete(cond = Some(expr("t.event_type = 'purge_me'")))))
    assert(v == 2L)
    val got = state(dir)
    assert(got(10L) == (("merged", 7.0, "2024-01-01")))
    assert(!got.contains(20L), "matched delete failed")
    assert(got(30L) == (("click", 5.0, "2024-01-02")), "no-clause row changed")
    assert(got(40L) == (("click", 2.0, "2024-01-02")))
    assert(got(50L) == (("click", 3.0, "2024-01-03")))
    assert(!got.contains(60L), "by-source delete failed")
    assert(got(99L) == (("ins", 1.0, "2024-01-01")))
    assert(got(88L) == (("ins", 1.0, "2024-01-04")))
    assert(got(77L) == (("ins", 1.0, "2024-01-02")))
    // day-level IO contract: day2 took no clause, so its original dir
    // SURVIVES and the insert landed as an appended dir next to it;
    // day1 (update+delete) and day3 (by-source) were rewritten
    val v2Days = ManifestLake.snapshot(spark, dir).days
    assert(v2Days("2024-01-02").contains(v1Days("2024-01-02").head),
      "untouched day was rewritten")
    assert(v2Days("2024-01-02").size == 2, "insert did not append")
    assert(!v2Days("2024-01-01").contains(v1Days("2024-01-01").head))
    assert(!v2Days("2024-01-03").contains(v1Days("2024-01-03").head))
    assert(v2Days.contains("2024-01-04"))
  }

  test("clause precedence: first applicable wins in caller order") {
    val dir = Files.createTempDirectory("graft_ml_prec").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val source = Seq((3L, 30L, ts("2024-01-02 10:00:00"), "x", 100.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    // delete listed FIRST and its condition passes → update never runs
    ManifestLake.mergeInto(spark, dir, source,
      Seq("event_id"), "ts", Seq(
        MatchedDelete(cond = Some(expr("t.value < 10"))),
        MatchedUpdate(Map("value" -> col("s.value")))))
    assert(!state(dir).contains(30L), "first-applicable delete lost to update")
  }

  test("conditional insert: only source rows passing the s-referencing condition land") {
    val dir = Files.createTempDirectory("graft_ml_condins").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val source = Seq(
      (9L, 99L, ts("2024-01-05 10:00:00"), "keep", 5.0),
      (9L, 98L, ts("2024-01-05 11:00:00"), "drop", 0.5))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.mergeInto(spark, dir, source, Seq("event_id"), "ts", Seq(
      NotMatchedInsert(cond = Some(expr("s.value > 1.0")))))
    val got = state(dir)
    assert(got.contains(99L) && !got.contains(98L),
      s"conditional insert wrong: ${got.keySet}")
  }

  test("NULL clause condition does not apply (SQL filter semantics)") {
    val dir = Files.createTempDirectory("graft_ml_null").toString
    ManifestLake.create(spark, dir,
      Seq((1L, 10L, ts("2024-01-01 10:00:00"), "click",
        null.asInstanceOf[java.lang.Double]))
        .toDF("user_id", "event_id", "ts", "event_type", "value"), "ts")
    val source = Seq((1L, 10L, ts("2024-01-01 10:00:00"), "x", 5.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val v = ManifestLake.mergeInto(spark, dir, source,
      Seq("event_id"), "ts", Seq(
        MatchedDelete(cond = Some(expr("s.value > t.value"))))) // NULL
    // no clause applied anywhere → no day rewritten → no-op commit
    assert(ManifestLake.read(spark, dir).count() == 1)
    assert(ManifestLake.read(spark, dir).select("event_type")
      .head().getString(0) == "click")
    assert(v == 1L, "a merge that changed nothing still committed")
  }

  test("ambiguity: duplicate source keys touching a target row throw; insert-only dups are legal") {
    val dir = Files.createTempDirectory("graft_ml_dup").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val dupMatched = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "a", 1.0),
      (1L, 10L, ts("2024-01-01 10:00:00"), "b", 2.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    val boom = intercept[IllegalStateException] {
      ManifestLake.mergeInto(spark, dir, dupMatched, Seq("event_id"), "ts",
        Seq(MatchedUpdate(Map("value" -> col("s.value")))))
    }
    assert(boom.getMessage.contains("ambiguous"))
    assert(ManifestLake.snapshot(spark, dir).version == 1L)
    // duplicate keys matching NOTHING insert both rows (MERGE semantics)
    val dupNew = Seq(
      (9L, 99L, ts("2024-01-05 10:00:00"), "a", 1.0),
      (9L, 99L, ts("2024-01-05 11:00:00"), "b", 2.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.mergeInto(spark, dir, dupNew, Seq("event_id"), "ts",
      Seq(MatchedUpdate(Map("value" -> col("s.value"))), NotMatchedInsert()))
    assert(ManifestLake.read(spark, dir)
      .filter(col("event_id") === 99L).count() == 2)
  }

  test("cross-day update move: origin day drains, destination day appends") {
    val dir = Files.createTempDirectory("graft_ml_move").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val daysBefore = ManifestLake.snapshot(spark, dir).days
    val source = Seq((1L, 10L, ts("2024-01-02 10:00:00"), "moved", 1.0),
      (2L, 20L, ts("2024-01-02 10:00:00"), "moved", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.mergeInto(spark, dir, source, Seq("event_id"), "ts", Seq(
      MatchedUpdate(Map("ts" -> col("s.ts"), "event_type" -> lit("moved")))))
    val got = state(dir)
    assert(got(10L) == (("moved", 1.0, "2024-01-02")))
    assert(got(20L) == (("moved", -1.0, "2024-01-02")))
    val days = ManifestLake.snapshot(spark, dir).days
    assert(!days.contains("2024-01-01"), "drained origin day still listed")
    // day2 was not itself rewritten: originals survive, movers appended
    assert(days("2024-01-02").contains(daysBefore("2024-01-02").head))
    assert(days("2024-01-02").size == 2)
  }

  test("by-source update against an empty source touches every passing row") {
    val dir = Files.createTempDirectory("graft_ml_bysrc").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val empty = mkBase().limit(0)
    ManifestLake.mergeInto(spark, dir, empty, Seq("event_id"), "ts", Seq(
      NotMatchedBySourceUpdate(Map("event_type" -> lit("stale")),
        cond = Some(expr("t.value > 2")))))
    val got = state(dir)
    assert(got(30L)._1 == "stale" && got(50L)._1 == "stale" &&
      got(60L)._1 == "stale")
    assert(got(10L)._1 == "click" && got(20L)._1 == "click" &&
      got(40L)._1 == "click")
  }

  test("merge crash between data write and commit: wholly-old snapshot; re-run converges") {
    val dir = Files.createTempDirectory("graft_ml_mcrash").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val before = state(dir)
    val source = Seq((1L, 10L, ts("2024-01-01 10:00:00"), "m", 9.0),
      (9L, 99L, ts("2024-01-04 09:00:00"), "ins", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    def run(hook: () => Unit) = ManifestLake.mergeInto(spark, dir, source,
      Seq("event_id"), "ts", Seq(
        MatchedUpdate(Map("value" -> col("s.value"),
          "event_type" -> col("s.event_type"))),
        NotMatchedInsert()), beforeCommit = hook)
    intercept[RuntimeException] { run(() => throw new RuntimeException("kill")) }
    assert(state(dir) == before, "crashed merge leaked")
    assert(ManifestLake.snapshot(spark, dir).version == 1L)
    assert(run(() => ()) == 2L)
    val got = state(dir)
    assert(got(10L) == (("m", 9.0, "2024-01-01")) &&
      got(99L) == (("ins", 1.0, "2024-01-04")))
  }

  test("mergeSink: a real streaming query merges micro-batches; updates and inserts land per trigger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_ml_msink").toString
    val mem = MemoryStream[graft.streaming.TaskEvent]
    val q = mem.toDS().toDF()
      .writeStream.foreachBatch(ManifestLake.mergeSink(dir,
        keyCols = Seq("event_id"), ordCol = "ts", clauses = Seq(
          MatchedUpdate(Map("value" -> col("s.value"),
            "event_type" -> col("s.event_type"))),
          NotMatchedInsert())))
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ml_msink_cp").toString)
      .start()
    try {
      mem.addData(
        graft.streaming.TaskEvent(10L, ts("2024-01-15 00:01:00"), 1L, "new", 1.0),
        graft.streaming.TaskEvent(20L, ts("2024-01-16 00:02:00"), 2L, "new", 2.0))
      q.processAllAvailable()
      mem.addData(
        graft.streaming.TaskEvent(10L, ts("2024-01-15 00:05:00"), 1L, "done", 9.0),
        graft.streaming.TaskEvent(30L, ts("2024-01-15 00:06:00"), 3L, "new", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = ManifestLake.read(spark, dir)
      .select("event_id", "event_type", "value").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    assert(got == Map(10L -> (("done", 9.0)), 20L -> (("new", 2.0)),
      30L -> (("new", 3.0))), s"got $got")
    val ops = ManifestLake.history(spark, dir)
      .select("operation").collect().map(_.getString(0)).toSeq
    assert(ops == Seq("merge(0)", "merge(1)"), ops)
  }

  test("merge batch cursor: a replayed batch is skipped even under NON-idempotent clauses") {
    val dir = Files.createTempDirectory("graft_ml_mcursor").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    // the clause Delta's foreachBatch-MERGE pattern gets WRONG under
    // replay: an increment — idempotence is not assumed here, the
    // cursor makes the batch exactly-once regardless
    val src = Seq((1L, 10L, ts("2024-01-01 10:00:00"), "inc", 0.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    def applyOnce() = ManifestLake.mergeInto(spark, dir, src,
      Seq("event_id"), "ts",
      Seq(MatchedUpdate(Map("value" -> (col("t.value") + lit(1.0))))),
      batchId = Some(7L))
    assert(applyOnce() == 2L)
    assert(applyOnce() == 2L, "replayed batch re-committed")
    val v = ManifestLake.read(spark, dir)
      .filter(col("event_id") === 10L).select("value").head().getDouble(0)
    assert(v == 2.0, s"replay double-applied the increment: $v")
    // a LATER batch still lands
    assert(ManifestLake.mergeInto(spark, dir, src, Seq("event_id"), "ts",
      Seq(MatchedUpdate(Map("value" -> (col("t.value") + lit(1.0))))),
      batchId = Some(8L)) == 3L)
  }

  test("restore: rollback is one commit, history preserved, composes with later writes") {
    val dir = Files.createTempDirectory("graft_ml_restore").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    val v1 = state(dir)
    ManifestLake.deleteWhere(spark, dir, col("value") > 2) // v2
    assert(state(dir).size < v1.size)
    val v = ManifestLake.restore(spark, dir, 1L)
    assert(v == 3L)
    assert(state(dir) == v1, "restore did not reproduce v1")
    // the bad version stays readable — the incident is auditable
    assert(ManifestLake.readVersion(spark, dir, 2L).count() == v1.size - 3)
    // later writes build on the RESTORED state
    ManifestLake.deleteWhere(spark, dir, col("event_id") === 10L)
    assert(state(dir).size == v1.size - 1)
    // restore to head is a no-op; out-of-range refused
    val head = ManifestLake.snapshot(spark, dir).version
    assert(ManifestLake.restore(spark, dir, head) == head)
    intercept[IllegalArgumentException] {
      ManifestLake.restore(spark, dir, head + 5)
    }
  }

  test("restore does not rewind the exactly-once batch cursor") {
    val dir = Files.createTempDirectory("graft_ml_rcursor").toString
    ManifestLake.create(spark, dir, mkBase(), "ts") // v1, cursor -1
    val b0 = Seq((9L, 99L, ts("2024-01-05 10:00:00"), "s", 1.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
    ManifestLake.appendBatch(spark, dir, b0, "ts", batchId = 0L) // v2, cursor 0
    ManifestLake.restore(spark, dir, 1L) // v3: v1 data, cursor STAYS 0
    assert(ManifestLake.snapshot(spark, dir).lastBatch == 0L)
    // the replayed batch id is still recognized as committed → skipped
    val v = ManifestLake.appendBatch(spark, dir, b0, "ts", batchId = 0L)
    assert(v == 3L, "restore rewound the cursor — batch 0 re-applied")
    assert(ManifestLake.read(spark, dir)
      .filter(col("event_id") === 99L).count() == 0)
  }

  test("restore refuses a version whose data was vacuumed away, before committing") {
    val dir = Files.createTempDirectory("graft_ml_rvac").toString
    ManifestLake.create(spark, dir, mkBase(), "ts")
    ManifestLake.deleteWhere(spark, dir, lit(true)) // v2 drains everything
    // simulate vacuum having reaped v1's generation
    val gens = new java.io.File(s"$dir/data").listFiles().filter(_.isDirectory)
    gens.foreach(g => org.apache.commons.io.FileUtils.deleteDirectory(g))
    val head = ManifestLake.snapshot(spark, dir).version
    val boom = intercept[IllegalArgumentException] {
      ManifestLake.restore(spark, dir, 1L)
    }
    assert(boom.getMessage.contains("vacuumed"))
    assert(ManifestLake.snapshot(spark, dir).version == head,
      "failed restore mutated the table")
  }
}
