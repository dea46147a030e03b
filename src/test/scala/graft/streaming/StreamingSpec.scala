package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** §2g streaming jobs driven through MemoryStream — the unbounded
  * path is exercised for real (triggers, state, watermarks), and
  * WindowedCounts is cross-checked against its batch twin. */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, uid: Long, typ: String = "click",
      v: Double = 1.0): TaskEvent = TaskEvent(id, ts(t), uid, typ, v)

  test("windowedCounts matches its batch twin on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev(1, "2024-01-15 00:01:00", 1), ev(2, "2024-01-15 00:02:00", 1),
      ev(3, "2024-01-15 00:06:00", 2, "view"), ev(4, "2024-01-15 00:13:00", 1),
      ev(5, "2024-01-15 00:14:30", 2, "view"))

    val mem = MemoryStream[TaskEvent]
    val q = Streams.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("wc")
      .select("window_start", "event_type", "n_events", "total_value")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = events.toDF()
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("window.start"), col("event_type"), col("n"), col("v"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch, s"stream $streamed vs batch $batch")
  }

  test("timerFiring: first event per (timer, minute) fires, repeats suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.timerFiring(mem.toDS())
      .writeStream.format("memory").queryName("tf").outputMode("append").start()
    // same minute twice for timer 1, one for timer 2
    mem.addData(ev(1, "2024-01-15 00:01:10", 1), ev(2, "2024-01-15 00:01:40", 1),
      ev(3, "2024-01-15 00:02:00", 2))
    q.processAllAvailable()
    // replay of the same minute for timer 1 in a later batch → suppressed
    mem.addData(ev(4, "2024-01-15 00:01:55", 1))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("tf")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getBoolean(2), r.getInt(3)))
    val t1 = rows.filter(_._1 == 1L).sortBy(t => (t._2, !t._3))
    assert(t1.length == 2, s"$t1")
    assert(t1(0) == ((1L, "2024-01-15 00:01:00.0", true, 1)), s"first firing: ${t1(0)}")
    assert(t1(1) == ((1L, "2024-01-15 00:01:00.0", false, 1)), s"replay suppressed: ${t1(1)}")
    assert(rows.count(_._1 == 2L) == 1)
  }

  test("timerFiring: dedup state is evicted below the watermark (bounded state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.timerFiring(mem.toDS())
      .writeStream.format("memory").queryName("tf_evict").outputMode("append").start()
    mem.addData(ev(1, "2024-01-15 00:01:10", 1)) // fires minute 00:01
    q.processAllAvailable()
    mem.addData(ev(2, "2024-01-15 02:00:00", 1)) // advances watermark past 00:01
    q.processAllAvailable()
    mem.addData(ev(3, "2024-01-15 03:00:00", 1)) // prune runs with wm ≈ 01:50
    q.processAllAvailable()
    val before = spark.table("tf_evict").count()
    mem.addData(ev(4, "2024-01-15 00:01:30", 1)) // replay of evicted minute
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tf_evict").collect()
      .map(r => (r.getTimestamp(1).toString, r.getBoolean(2), r.getInt(3)))
    val replays = spark.table("tf_evict").count() - before
    // the dedup entry for 00:01 is gone; the watermarked stream either
    // drops the late replay outright or re-fires it (at-least-once) —
    // never a "suppressed duplicate" against evicted state
    assert(replays <= 1, rows.mkString(","))
    if (replays == 1) {
      val last = rows.last
      assert(last == (("2024-01-15 00:01:00.0", true, 0)), s"re-fire expected, got $last")
    }
  }

  test("sessionizer: 30-min gap closes a session; next event opens a new one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.sessionizer(mem.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    mem.addData(ev(1, "2024-01-15 00:00:00", 7, v = 2.0),
      ev(2, "2024-01-15 00:05:00", 7, v = 3.0))
    q.processAllAvailable()
    // 40 minutes later → closes the first session
    mem.addData(ev(3, "2024-01-15 00:45:00", 7, v = 1.0))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3), r.getDouble(4)))
    assert(sessions.contains(
      (7L, "2024-01-15 00:00:00.0", "2024-01-15 00:05:00.0", 2L, 5.0)),
      s"closed session missing from ${sessions.toSeq}")
  }

  test("enrichedFiring: disabled timers are dropped, defs columns attached") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val defs = Seq(
      TimerDef(1, enabled = true, "http://cb/1"),
      TimerDef(2, enabled = false, "http://cb/2")).toDS()
    val q = Streams.enrichedFiring(Streams.timerFiring(mem.toDS()), defs)
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    mem.addData(
      ev(1, "2024-01-15 00:01:10", 1),
      ev(2, "2024-01-15 00:01:20", 2), // disabled timer: must not fire
      ev(3, "2024-01-15 00:02:30", 1))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("enriched")
      .select("timer_id", "notify_url").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "http://cb/1")),
      s"expected only enabled timer 1 firings, got ${out.mkString(",")}")
    // both minutes of timer 1 fired (enrichment preserves multiplicity)
    assert(spark.table("enriched").count() == 2)
  }

  test("sessionizer: late in-gap event lowers session_start (out-of-order merge)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.sessionizer(mem.toDS())
      .writeStream.format("memory").queryName("sess_ooo").outputMode("append").start()
    // batch 1: session opens at 00:10
    mem.addData(ev(1, "2024-01-15 00:10:00", 9, v = 1.0))
    q.processAllAvailable()
    // batch 2: LATE event at 00:05 — within the 10-min watermark and
    // within the gap of the open session → must merge and LOWER start
    // (ADVICE r2 #2: previously start stayed 00:10 and diverged from
    // the batch twin)
    mem.addData(ev(2, "2024-01-15 00:05:00", 9, v = 2.0))
    q.processAllAvailable()
    // 40 min past the merged end → closes the session
    mem.addData(ev(3, "2024-01-15 00:50:00", 9, v = 1.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_ooo").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3), r.getDouble(4)))
    assert(sessions.contains(
      (9L, "2024-01-15 00:05:00.0", "2024-01-15 00:10:00.0", 2L, 3.0)),
      s"merged session with lowered start missing from ${sessions.toSeq}")
  }

  test("sessionizer: late event a full gap BEFORE the open session closes alone") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    // gap (5 min) < watermark delay (10 min): the only regime where a
    // late event can be admitted by the watermark yet sit a full gap
    // before the open session — with the default 30-min gap such an
    // event is always watermark-dropped first
    val q = Streams.sessionizer(mem.toDS(), gapMs = 5L * 60 * 1000)
      .writeStream.format("memory").queryName("sess_orphan").outputMode("append").start()
    // open a session at 01:40 (watermark advances to 01:30)
    mem.addData(ev(1, "2024-01-15 01:40:00", 4, v = 1.0))
    q.processAllAvailable()
    // late event at 01:32 — inside the watermark, but 8 min (> gap)
    // BEFORE the open session's start: it can never join it, so it's
    // emitted closed immediately as its own single-event session
    mem.addData(ev(2, "2024-01-15 01:32:00", 4, v = 2.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_orphan").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3), r.getDouble(4)))
    assert(sessions.contains(
      (4L, "2024-01-15 01:32:00.0", "2024-01-15 01:32:00.0", 1L, 2.0)),
      s"orphan session missing from ${sessions.toSeq}")
  }

  test("sessionizer: same-batch late events merge with each other, not fragment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.sessionizer(mem.toDS(), gapMs = 5L * 60 * 1000)
      .writeStream.format("memory").queryName("sess_latepair").outputMode("append").start()
    mem.addData(ev(1, "2024-01-15 01:40:00", 6, v = 1.0))
    q.processAllAvailable()
    // two late events, both a full gap before the open session but
    // in-gap of EACH OTHER: the batch twin makes ONE session [01:31,
    // 01:32] n=2 — fragmentation into singletons would diverge
    mem.addData(ev(2, "2024-01-15 01:31:00", 6, v = 2.0),
      ev(3, "2024-01-15 01:32:00", 6, v = 3.0))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_latepair").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
        r.getLong(3), r.getDouble(4)))
    assert(sessions.contains(
      (6L, "2024-01-15 01:31:00.0", "2024-01-15 01:32:00.0", 2L, 5.0)),
      s"merged late pair missing from ${sessions.toSeq}")
    assert(!sessions.exists(s => s._4 == 1L && s._2.startsWith("2024-01-15 01:3")),
      s"late events fragmented: ${sessions.toSeq}")
  }

  test("canonicalKey is the exact JVM mirror of the batch fingerprint expression") {
    import spark.implicits._
    val tricky = Seq("\tHello  World ", "  MiXeD   Case", "tab\tinside text",
      "unicode \u00c4\u00d6\u00dc stra\u00dfe", "plain text", " lead and trail ")
    val df = tricky.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val exprFp = df.select(col("doc_id"), graft.operators.TextOps.canonicalFpExpr.as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    tricky.zipWithIndex.foreach { case (t, i) =>
      val jvm = Streams.canonicalKey(DocEvent(i.toLong, t))
      assert(jvm == exprFp(i.toLong), s"drift on ${t.map(_.toInt)}: $jvm vs ${exprFp(i.toLong)}")
    }
  }

  test("streamingDedup: duplicate content suppressed across batches, min id kept") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = Streams.streamingDedup(mem.toDS())
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    // batch 1: doc 5 and 3 share content — canonical (min id 3) survives
    mem.addData(DocEvent(5, "the same text"), DocEvent(3, "the same text"),
      DocEvent(7, "unique text"))
    q.processAllAvailable()
    // batch 2: replay of batch-1 content must be suppressed by state;
    // new content passes
    mem.addData(DocEvent(9, "the same text"), DocEvent(11, "fresh text"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("sdedup").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 7L, 11L), s"kept $kept")
  }

  test("streamingFunnel: dedups, features, and filters like the batch tail") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    val q = Streams.streamingFunnel(mem.toDS(), minQuality = 0.0)
      .writeStream.format("memory").queryName("sfunnel").outputMode("append").start()
    mem.addData(
      DocEvent(1, "the fast scan the a merge"),
      DocEvent(2, "the fast scan the a merge"), // exact dup: dropped
      DocEvent(5, "  the fast  scan the a merge "), // whitespace variant:
      // the funnel keys on the NORMALIZED fingerprint like the batch
      // tier, so this is a duplicate too
      DocEvent(3, "stream window query query"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sfunnel").collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out.keySet == Set(1L, 3L), s"kept ${out.keySet}")
    // features must agree with the batch formulation on the same text
    val batch = graft.operators.TrainingPipeline.featureAndFilter(
      Seq((1L, "the fast scan the a merge"), (3L, "stream window query query"))
        .toDF("doc_id", "text"), 0.0, Seq("de", "en", "es", "fr", "zh"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out == batch, s"stream $out != batch $batch")
  }

  test("firingCompletionJoin: in-interval completion matches; latency computed; misses emit NULL") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def fire(id: Long, t: String) = TaskFiring(id, ts(t), fired = true, 0)
    def done(id: Long, t: String, st: String = "success") = TaskCompletion(id, ts(t), st)

    val fmem = MemoryStream[TaskFiring]
    val cmem = MemoryStream[TaskCompletion]
    val q = Streams.firingCompletionJoin(fmem.toDS(), cmem.toDS())
      .writeStream.format("memory").queryName("fcj").outputMode("append").start()

    // timer 1 fires and completes 4 min later; timer 2 fires and never
    // completes; timer 3's completion is OUTSIDE the 15-min interval
    fmem.addData(fire(1, "2024-01-15 00:01:00"), fire(2, "2024-01-15 00:01:00"),
      fire(3, "2024-01-15 00:01:00"))
    cmem.addData(done(1, "2024-01-15 00:05:00"), done(3, "2024-01-15 00:30:00"))
    q.processAllAvailable()
    // advance BOTH watermarks far past every interval so the outer
    // side emits its NULL rows (global watermark = min across inputs);
    // two advances — outer results land a batch after the watermark move
    fmem.addData(fire(99, "2024-01-15 06:00:00"))
    cmem.addData(done(99, "2024-01-15 06:00:30"))
    q.processAllAvailable()
    fmem.addData(fire(98, "2024-01-15 07:00:00"))
    cmem.addData(done(98, "2024-01-15 07:00:30"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("fcj").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        Option(r.getTimestamp(2)).map(_.toString), Option(r.getString(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .filter(_._1 <= 3).toSet
    val expected = Set(
      (1L, "2024-01-15 00:01:00.0", Some("2024-01-15 00:05:00.0"),
        Some("success"), Some(240000L)),
      (2L, "2024-01-15 00:01:00.0", None, None, None),
      (3L, "2024-01-15 00:01:00.0", None, None, None))
    assert(rows == expected, s"got $rows")
  }

  test("eventStream reads a parquet drop directory with the pinned schema") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_ck").toString
    Seq(ev(1, "2024-01-15 00:01:00", 1), ev(2, "2024-01-15 00:02:00", 2))
      .toDS().write.mode("overwrite").parquet(dir)
    val q = Streams.eventStream(spark, dir)
      .writeStream.format("memory").queryName("es")
      .option("checkpointLocation", ck).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("es").count() == 2)
    assert(spark.table("es").schema == Streams.eventSchema)
  }

  test("streamingDedupWithin: duplicate suppressed inside retention, passes after eviction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DocEvent]
    // NOTE: processing-time timeouts force the engine to run batches
    // continuously (FlatMapGroupsWithStateExec.shouldRunAnotherBatch
    // is always true), so processAllAvailable never observes a
    // no-new-data quiesce and would hang — poll the sink instead.
    val q = Streams.streamingDedupWithin(mem.toDS(), retention = "3 seconds")
      .writeStream.format("memory").queryName("dedup_ttl").outputMode("append").start()
    def waitCount(n: Long): Unit = {
      val end = System.currentTimeMillis + 60000
      while (spark.table("dedup_ttl").count() < n && System.currentTimeMillis < end)
        Thread.sleep(100)
      assert(spark.table("dedup_ttl").count() >= n, s"sink never reached $n rows")
    }
    mem.addData(DocEvent(1, "same text"))
    waitCount(1)
    mem.addData(DocEvent(2, "same text")) // well inside retention → suppressed
    mem.addData(DocEvent(3, "other"))
    waitCount(2)
    Thread.sleep(7000) // let the sliding TTL lapse (batches keep running)
    mem.addData(DocEvent(4, "same text")) // key evicted → passes again
    waitCount(3)
    q.stop()
    val ids = spark.table("dedup_ttl").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L, 4L), s"got $ids")
  }

  test("gapMonitor: uncovered minutes emit once finalized; quiet app alerts on others' progress") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.gapMonitor(mem.toDS())
      .writeStream.format("memory").queryName("gaps").outputMode("append").start()
    // app 1 heartbeats at :00, :01, :04 then goes SILENT; app 2 keeps
    // running and its events march the shared watermark forward
    mem.addData(
      ev(1, "2024-01-15 00:00:10", 1), ev(2, "2024-01-15 00:01:20", 1),
      ev(3, "2024-01-15 00:04:30", 1), ev(4, "2024-01-15 00:00:05", 2))
    q.processAllAvailable()
    mem.addData(ev(5, "2024-01-15 00:20:00", 2)) // wm → 00:10
    q.processAllAvailable()
    mem.addData(ev(6, "2024-01-15 00:40:00", 2)) // wm → 00:30
    q.processAllAvailable()
    q.stop()

    val gaps = spark.table("gaps").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString)).toSet
    def g(app: Long, mm: String) = (app, s"2024-01-15 00:$mm:00.0")
    // app 1: armed at :00; :02, :03 were inside its active span; from
    // :05 on it is silent — app 2's watermark progress (through 00:30)
    // keeps PROVING app 1's minutes quiet: the deadman alert
    val app1Expected = Set("02", "03") ++ (5 to 29).map(m => f"$m%02d")
    assert(gaps.filter(_._1 == 1L) == app1Expected.map(g(1L, _)),
      s"app1 gaps: ${gaps.filter(_._1 == 1L).toSeq.sortBy(_._2).mkString(",")}")
    // app 2 ran at :00, :20, :40 — everything between, below wm, is a gap
    val app2Expected = ((1 to 19) ++ (21 to 29)).map(m => f"$m%02d").toSet
    assert(gaps.filter(_._1 == 2L) == app2Expected.map(g(2L, _)))
    // exactly-once: no duplicate (app, minute) rows
    assert(spark.table("gaps").count() == gaps.size)
  }
}
