package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.TimerOps

/** SURVEY §2g contract: each streaming job has a batch twin verified
  * against the DuckDB oracle. Here the streaming jobs run over the
  * REAL sf0.001 events table (via MemoryStream) and must agree with
  * their oracle-verified batch twins. */
class TwinConsistencySpec extends SparkSpec {

  private lazy val events: Seq[TaskEvent] = {
    Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => TaskEvent(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .toSeq
  }

  test("streaming windowedCounts == batch t_stream_window_agg on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("twin_wc").outputMode("update").start()
    events.grouped(300).foreach(b => mem.addData(b: _*))
    q.processAllAvailable()
    q.stop()

    // update mode re-emits a window per trigger with its cumulative
    // state — the final (= max, counts only grow) emit is the total
    val streamed = spark.table("twin_wc")
      .groupBy(col("window_start"), col("event_type"))
      .agg(max(col("n_events")).as("n"), round(max(col("total_value")), 4).as("v"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val batch = TimerOps.tStreamWindowAgg(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
  }

  test("streaming slidingCounts == batch t_sliding_rate on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.slidingCounts(mem.toDF())
      .writeStream.format("memory").queryName("twin_slide").outputMode("update").start()
    events.grouped(300).foreach(b => mem.addData(b: _*))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("twin_slide")
      .groupBy(col("window_start"), col("event_type"))
      .agg(max(col("n_events")).as("n"), round(max(col("total_value")), 4).as("v"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val batch = TimerOps.tSlidingRate(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")

    // sliding ⊃ tumbling: every 5-min tumbling window (start ≡ 0 mod
    // 5 min) is also a sliding window with identical totals
    val tumbling = TimerOps.tStreamWindowAgg(spark, sfDir).collect()
      .filter(_.get(0) != null)
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(tumbling.subsetOf(batch),
      s"tumbling rows missing from sliding: ${(tumbling -- batch).take(3)}")
  }

  test("streaming sessionizer closed sessions ⊂ batch t_sessionize on sf0.001") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.sessionizer(mem.toDS())
      .writeStream.format("memory").queryName("twin_sess").outputMode("append").start()
    events.sortBy(_.ts.getTime).grouped(300).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("twin_sess").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    val batch = TimerOps.tSessionize(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
      .toSet

    // the stream only emits CLOSED sessions (tail sessions are still in
    // state / pending timeout) — every emitted session must be a batch
    // session, and most batch sessions must have been emitted
    val missing = streamed -- batch
    assert(missing.isEmpty, s"streamed sessions not in batch: ${missing.take(3)}")
    assert(streamed.size >= batch.size / 2,
      s"only ${streamed.size} of ${batch.size} sessions closed")
  }

  test("streaming inflightGauge == batch t_concurrency on sf0.001 (all hours finalized)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.inflightGauge(mem.toDS())
      .writeStream.format("memory").queryName("twin_gauge").outputMode("append").start()
    // out-of-order WITHIN batches (natural table order), time-ordered
    // across batch boundaries like the other twins
    events.sortBy(_.ts.getTime).grouped(500).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    }
    // two far-future sentinels: the first advances the watermark past
    // every real task end, the second triggers the timeouts that fold
    // and emit the final hours (the second also folds the first's own
    // points — its hour row is filtered out below).
    val maxT = events.map(_.ts.getTime).max
    mem.addData(TaskEvent(-1L, new java.sql.Timestamp(maxT + 86400000L), 0L, "view", 0.0))
    q.processAllAvailable()
    mem.addData(TaskEvent(-2L, new java.sql.Timestamp(maxT + 2 * 86400000L), 0L, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("twin_gauge").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      .filter(_._2.getTime <= maxT + 3600000L) // drop sentinel hours
      .toSet
    val batch = TimerOps.tConcurrency(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
  }

  test("inflightGauge is order-insensitive: shuffled batches produce the identical hours") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.inflightGauge(mem.toDS())
      .writeStream.format("memory").queryName("twin_gauge_ooo").outputMode("append").start()
    // deterministic shuffle WITHIN each 500-event window: events reach
    // the gauge out of time order inside every batch, and only the
    // watermark-gated buffer keeps the fold order global
    val rnd = new scala.util.Random(42)
    events.sortBy(_.ts.getTime).grouped(500).foreach { b =>
      mem.addData(rnd.shuffle(b): _*); q.processAllAvailable()
    }
    val maxT = events.map(_.ts.getTime).max
    mem.addData(TaskEvent(-1L, new java.sql.Timestamp(maxT + 86400000L), 0L, "view", 0.0))
    q.processAllAvailable()
    mem.addData(TaskEvent(-2L, new java.sql.Timestamp(maxT + 2 * 86400000L), 0L, "view", 0.0))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("twin_gauge_ooo").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
      .filter(_._2.getTime <= maxT + 3600000L)
      .toSet
    val batch = TimerOps.tConcurrency(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
  }

  test("streaming backlogGauge == batch t_backlog on sf0.001 (minutes in order, exactly once)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the gauge consumes the minute ROLLUP (at scale produced by the
    // parallel watermarked agg upstream) — build it batch-side from
    // the same events, split each minute into two partials across
    // different triggers to exercise the additive merge
    val completedTypes = Set("purchase", "error")
    val rollup = events.groupBy(e => math.floorDiv(e.ts.getTime, 60000L) * 60000L)
      .toSeq.map { case (t, es) =>
        MinuteCounts(new java.sql.Timestamp(t), es.size.toLong,
          es.count(e => completedTypes(e.event_type)).toLong)
      }.sortBy(_.minute_start.getTime)
    val mem = MemoryStream[MinuteCounts]
    val q = Streams.backlogGauge(mem.toDS())
      .writeStream.format("memory").queryName("twin_backlog").outputMode("append").start()
    val rnd = new scala.util.Random(7)
    rollup.grouped(200).foreach { b =>
      // each minute split into two partials, shuffled within the
      // trigger: exercises the additive same-minute merge AND the
      // out-of-order watermark-gated fold (a partial landing in a
      // LATER trigger is only legal within the watermark slack — the
      // upstream append agg releases a minute exactly once, which is
      // the invariant the operator documents)
      val halves = b.flatMap(m => Seq(
        MinuteCounts(m.minute_start, m.arrived / 2, m.completed / 2),
        MinuteCounts(m.minute_start, m.arrived - m.arrived / 2,
          m.completed - m.completed / 2)))
      mem.addData(rnd.shuffle(halves): _*); q.processAllAvailable()
    }
    val maxT = rollup.map(_.minute_start.getTime).max
    mem.addData(MinuteCounts(new java.sql.Timestamp(maxT + 86400000L), 0L, 0L))
    q.processAllAvailable()
    mem.addData(MinuteCounts(new java.sql.Timestamp(maxT + 2 * 86400000L), 0L, 0L))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("twin_backlog").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._1.getTime <= maxT)
    // exactly-once per minute
    assert(streamed.map(_._1).distinct.length == streamed.length, "minute emitted twice")
    val batch = TimerOps.tBacklog(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val streamedKeyed = streamed.map(s => (fmt.format(s._1), s._2, s._3, s._4)).toSet
    assert(streamedKeyed == batch,
      s"stream-only: ${(streamedKeyed -- batch).take(3)}; batch-only: ${(batch -- streamedKeyed).take(3)}")
  }
}
