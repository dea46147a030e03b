package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** Streaming state-size MEASUREMENT (VERDICT r10 #8): the
  * InflightGauge/GapMonitor state bounds were argued in doc comments
  * ("state = |apps| keys × watermark-window tail"); this suite
  * measures them off the state-store metrics the engine itself
  * reports (StateOperatorProgress.numRowsTotal / memoryUsedBytes) and
  * pins the two claims that matter at 100 TB:
  *
  *   1. state KEYS = |apps| (the shard fan-out), not |events| — a
  *      10× event volume leaves the key count identical;
  *   2. once the watermark passes the data, state DRAINS — folded
  *      points and finalized hours leave the store, so a day of
  *      throughput does not accumulate a day of state.
  *
  * Numbers land in SCALING.md §2g. */
class StateSizeSpec extends SparkSpec {

  private val base = Timestamp.valueOf("2024-01-15 00:00:00").getTime

  /** (rows, bytes) of the query's only stateful operator, from the
    * most recent progress that actually reported state. */
  private def stateOf(q: StreamingQuery): (Long, Long) = {
    val ops = q.recentProgress.reverse.flatMap(_.stateOperators.headOption)
    val p = ops.headOption.getOrElse(fail("no state operator progress"))
    (p.numRowsTotal, p.memoryUsedBytes)
  }

  /** Run inflightGauge over n events across nApps shards spread over
    * 30 minutes; returns state size (rows, bytes) mid-stream (all
    * events in, watermark still inside the span) and after the
    * watermark clears the span. */
  private def runGauge(name: String, n: Int, nApps: Int): ((Long, Long), (Long, Long)) = {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    val mem = MemoryStream[TaskEvent]
    val q = Streams.inflightGauge(mem.toDS())
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      val evs = (0 until n).map(i => TaskEvent(i.toLong,
        new Timestamp(base + (i.toLong * 1800000L / n)), (i % nApps).toLong,
        "click", 1.0))
      mem.addData(evs: _*)
      q.processAllAvailable()
      val mid = stateOf(q)
      // two far-future ticks: the first sets the new watermark, the
      // second runs a batch UNDER it so every pending point folds,
      // every hour finalizes, and drained app states self-remove
      mem.addData(TaskEvent(n + 1L, new Timestamp(base + 86400000L), 0L, "click", 1.0))
      q.processAllAvailable()
      mem.addData(TaskEvent(n + 2L, new Timestamp(base + 86400000L + 1000L), 0L, "click", 1.0))
      q.processAllAvailable()
      (mid, stateOf(q))
    } finally q.stop()
  }

  test("inflightGauge state: keys = |apps| not |events|; drains once the watermark passes") {
    val ((rowsSmallMid, bytesSmallMid), (rowsSmallEnd, bytesSmallEnd)) =
      runGauge("ssz_small", 2000, 8)
    val ((rowsBigMid, bytesBigMid), (rowsBigEnd, bytesBigEnd)) =
      runGauge("ssz_big", 20000, 8)
    val ((rowsWideMid, _), _) = runGauge("ssz_wide", 2000, 16)

    // claim 1: key count tracks the SHARD fan-out (appShardOf pins it
    // at AppCount = 8) — 10× the events, same 8 keys; and even 2× the
    // distinct timer ids still collapse onto the same 8 shard keys
    // (state scales with the sharding constant, not uid cardinality)
    assert(rowsSmallMid == 8L, s"small mid rows $rowsSmallMid")
    assert(rowsBigMid == 8L, s"10x events moved the key count: $rowsBigMid")
    assert(rowsWideMid == 8L, s"16 uids must still shard to 8 keys, got $rowsWideMid")

    // claim 2: after the watermark clears the span, everything folds
    // and finalizes — only the far-future tick's app key remains
    assert(rowsSmallEnd <= 1L, s"state did not drain: $rowsSmallEnd rows")
    assert(rowsBigEnd <= 1L, s"state did not drain: $rowsBigEnd rows")
    // drained stores are equal-sized regardless of the 10× volume
    assert(bytesBigEnd <= bytesSmallEnd * 2 + 4096,
      s"drained state grew with volume: $bytesSmallEnd -> $bytesBigEnd")

    // the SCALING.md §2g row (bytes are informational — JVM estimate):
    info(s"inflightGauge mid-stream: 8 apps × 2k events = $bytesSmallMid B, " +
      s"8 × 20k = $bytesBigMid B; drained: $bytesSmallEnd / $bytesBigEnd B")
  }

  test("gapMonitor state: per-app seen-minutes window, drains below the frontier") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext
    def run(name: String, n: Int): ((Long, Long), (Long, Long)) = {
      val mem = MemoryStream[TaskEvent]
      val q = Streams.gapMonitor(mem.toDS())
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        // n events across 8 apps inside the same 30 minutes — minute
        // coverage (the state) is IDENTICAL across densities
        val evs = (0 until n).map(i => TaskEvent(i.toLong,
          new Timestamp(base + (i.toLong * 1800000L / n)), (i % 8).toLong,
          "click", 1.0))
        mem.addData(evs: _*)
        q.processAllAvailable()
        val mid = stateOf(q)
        mem.addData(TaskEvent(n + 1L, new Timestamp(base + 86400000L), 0L, "click", 1.0))
        q.processAllAvailable()
        mem.addData(TaskEvent(n + 2L, new Timestamp(base + 86400000L + 1000L), 0L, "click", 1.0))
        q.processAllAvailable()
        (mid, stateOf(q))
      } finally q.stop()
    }
    val ((rowsSmall, bytesSmall), (_, bytesSmallEnd)) = run("gap_small", 2000)
    val ((rowsBig, bytesBig), (_, bytesBigEnd)) = run("gap_big", 20000)
    assert(rowsSmall == 8L && rowsBig == 8L,
      s"gap state keys moved with volume: $rowsSmall/$rowsBig")
    // the seen-minute sets cover the same 30 minutes in both runs, so
    // even MID-stream the state bytes are volume-invariant (generous
    // 2× for store bookkeeping noise)
    assert(bytesBig <= bytesSmall * 2,
      s"seen-minute state grew with event volume: $bytesSmall -> $bytesBig")
    info(s"gapMonitor mid-stream: $bytesSmall B vs 10x volume $bytesBig B; " +
      s"drained: $bytesSmallEnd / $bytesBigEnd B")
  }

  // ---- RocksDB state-store arm (r17, VERDICT r16 #5): the provider a
  // 100 TB deployment turns on first when keyed state outgrows
  // executor heaps (state spills to native+disk; memoryUsedBytes
  // reports the store's own estimate, checkpoints ship RocksDB
  // snapshots/changelogs instead of HDFSBackedStateStore deltas —
  // same API contract, different durability plumbing) ----

  /** Run `body` under RocksDBStateStoreProvider, restoring the session
    * default (HDFSBackedStateStoreProvider) after. The conf is read at
    * query START, so per-query scoping like this is exact. */
  private def withRocksDB[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try body
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("RocksDB provider: gauge key-count and drain contracts hold unchanged") {
    val ((rowsMid, bytesMid), (rowsEnd, bytesEnd)) =
      withRocksDB(runGauge("ssz_rocks", 2000, 8))
    // the two 100 TB claims are PROVIDER-INDEPENDENT: keys = shard
    // fan-out, and state drains once the watermark passes
    assert(rowsMid == 8L, s"RocksDB mid rows $rowsMid")
    assert(rowsEnd <= 1L, s"RocksDB state did not drain: $rowsEnd rows")
    info(s"RocksDB inflightGauge: mid $bytesMid B, drained $bytesEnd B " +
      "(native-store estimate — not comparable 1:1 with the JVM " +
      "HDFSBacked numbers above)")
  }

  test("RocksDB provider: dedup / sessionizer / backlog outputs are provider-invariant") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    def outputs(name: String): (Set[String], Set[String], Set[String]) = {
      // streamingDedup: unbounded fingerprint suppression
      val dmem = MemoryStream[DocEvent]
      val dq = Streams.streamingDedup(dmem.toDS())
        .writeStream.format("memory").queryName(s"${name}_d")
        .outputMode("append").start()
      try {
        dmem.addData(DocEvent(1L, "a"), DocEvent(2L, "a"), DocEvent(3L, "b"))
        dq.processAllAvailable()
        dmem.addData(DocEvent(4L, "a"), DocEvent(5L, "c"))
        dq.processAllAvailable()
      } finally dq.stop()
      // sessionizer: two users, a gap split, then a watermark push
      val smem = MemoryStream[TaskEvent]
      val sq = Streams.sessionizer(smem.toDS())
        .writeStream.format("memory").queryName(s"${name}_s")
        .outputMode("append").start()
      try {
        smem.addData(
          TaskEvent(1L, new Timestamp(base), 1L, "click", 1.0),
          TaskEvent(2L, new Timestamp(base + 60000L), 1L, "click", 1.0),
          TaskEvent(3L, new Timestamp(base + 3L * 3600000L), 1L, "click", 1.0),
          TaskEvent(4L, new Timestamp(base + 10000L), 2L, "click", 1.0))
        sq.processAllAvailable()
        smem.addData(TaskEvent(9L,
          new Timestamp(base + 86400000L), 1L, "click", 1.0))
        sq.processAllAvailable()
      } finally sq.stop()
      // backlogGauge: five minutes of counts, then the frontier push
      val bmem = MemoryStream[MinuteCounts]
      val bq = Streams.backlogGauge(bmem.toDS())
        .writeStream.format("memory").queryName(s"${name}_b")
        .outputMode("append").start()
      try {
        bmem.addData((0 until 5).map(i => MinuteCounts(
          new Timestamp(base + i * 60000L), 10L + i, 8L)): _*)
        bq.processAllAvailable()
        bmem.addData(MinuteCounts(new Timestamp(base + 86400000L), 0L, 0L))
        bq.processAllAvailable()
      } finally bq.stop()
      def grab(t: String): Set[String] =
        spark.table(t).collect().map(_.toString).toSet
      (grab(s"${name}_d"), grab(s"${name}_s"), grab(s"${name}_b"))
    }

    val (dRocks, sRocks, bRocks) = withRocksDB(outputs("rx"))
    val (dHdfs, sHdfs, bHdfs) = outputs("hx")
    assert(dRocks == dHdfs, s"dedup diverged:\n$dRocks\n$dHdfs")
    assert(sRocks == sHdfs, s"sessionizer diverged:\n$sRocks\n$sHdfs")
    assert(bRocks == bHdfs, s"backlog diverged:\n$bRocks\n$bHdfs")
    assert(dRocks.nonEmpty && sRocks.nonEmpty && bRocks.nonEmpty,
      "equivalence is vacuous — no output rows")
  }
}
