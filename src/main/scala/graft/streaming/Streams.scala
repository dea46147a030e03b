package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** §2g Structured Streaming: the continuous half of the reference —
  * Pulsar topics (gotimer_scheduler/mq/client.go producer/consumer)
  * re-expressed as unbounded Datasets. A file/memory source stands in
  * for the broker: same at-least-once, resume-from-offset semantics
  * via checkpointing, no broker internals.
  *
  * Each job here has a batch twin verified against the DuckDB oracle
  * (t_stream_window_agg, t_sessionize), and the streaming versions
  * are spec-tested with MemoryStream (StreamingSpec).
  */

/** One event off the stream — the task message on the trigger topic. */
case class TaskEvent(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** A firing decision emitted by TimerFiring. `fired` separates a real
  * (first) firing from a suppressed-duplicate report — without it a
  * fully-suppressed replayed minute is indistinguishable from a real
  * firing and downstream callbacks would double-fire. */
case class TaskFiring(timer_id: Long, minute_start: Timestamp, fired: Boolean,
    n_suppressed: Int)

/** A closed session emitted by Sessionizer. */
case class Session(timer_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long, total_value: Double)

/** A timer definition row — the web `timer` table analog
  * (gotimer_web/dao/timer): id, enabled flag, callback target. */
case class TimerDef(timer_id: Long, enabled: Boolean, notify_url: String)

/** An executor completion report — the task-status write the executor
  * makes after running the callback (gotimer_executor posts the HTTP
  * callback then updates the task row to success/failed). */
case class TaskCompletion(timer_id: Long, done_ts: Timestamp, status: String)

/** A document on the ingest stream (streaming twin of the documents
  * table feeding §2c). */
case class DocEvent(doc_id: Long, text: String)

private case class FiringState(firedMinutes: Set[Long])
private case class SessionState(start: Long, end: Long, n: Long, sum: Double)

/** A finalized per-(app, hour) in-flight row from InflightGauge —
  * the streaming twin of t_concurrency's sweep output. */
case class InflightUpdate(app: Long, hour_start: Timestamp,
    peak_inflight: Long, n_starts: Long)

private case class GaugePoint(t: Long, delta: Long, eventId: Long)

/** A proven-quiet minute emitted by GapMonitor: no task of this app
  * ran in [minute_start, minute_start + 1 min), and the watermark has
  * passed the minute's end so none can arrive anymore. */
case class MinuteGap(app: Long, minute_start: Timestamp)

/** GapMonitor state: minutes (ms epoch, minute-aligned) seen with ≥1
  * event at or above the emission frontier, and the frontier itself
  * (everything below is already classified). Bounded by the watermark
  * delay: seen entries below the frontier are evicted each trigger. */
private case class GapState(seen: Set[Long], emittedThrough: Long)

/** InflightGauge state: the running count after every folded point
  * (`carry`), the out-of-order buffer of points still above the
  * watermark (`pending` — bounded by the watermark delay × event
  * rate plus open task durations, the same bound a stream-stream
  * interval join's buffer has), and per-hour partial aggregates not
  * yet finalized (`partials`: hour → (peak, n_starts)). */
private case class GaugeState(carry: Long, pending: List[GaugePoint],
    partials: Map[Long, (Long, Long)])

/** One finalized minute of the outstanding-backlog series from
  * BacklogGauge — the streaming twin of a t_backlog row. */
case class MinuteCounts(minute_start: Timestamp, arrived: Long, completed: Long)
case class BacklogPoint(minute_start: Timestamp, arrived: Long,
    completed: Long, backlog: Long)

/** BacklogGauge state: the running Σ(arrived − completed) over every
  * folded minute (`carry` — the series is cumulative, so this lives
  * for the query's lifetime: ONE long), and the minute rows still
  * above the watermark (`pending` — bounded by watermark delay ×
  * 1 row/min, since the input is the minute ROLLUP, not events). */
private case class BacklogState(carry: Long,
    pending: List[(Long, Long, Long)])

object Streams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** MQ-consumer analog: an unbounded stream of task events from a
    * directory of parquet/json drops (the scheduler-topic). Schema is
    * pinned — streaming sources never infer. */
  def eventStream(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.readStream.schema(eventSchema).format(format).load(dir)

  /** One epoch of an exactly-once file sink. Structured Streaming
    * guarantees foreachBatch runs AT LEAST once per epoch: a crash
    * between the sink write and the checkpoint commit replays the
    * same (batch, batchId) after restart. Writing each epoch into its
    * own batch_id= partition with DYNAMIC partition overwrite turns
    * that replay into a byte-identical overwrite of exactly its own
    * partition — never a duplicate append, never touching other
    * epochs' partitions — which lifts at-least-once delivery to
    * exactly-once observed state. The reference gets the same
    * property from the MySQL unique index absorbing duplicate task
    * inserts (timer_xxx_tasks' unique key); here the partition IS the
    * unique key. At 100 TB this is also the natural compaction unit
    * (LakeLayout.compact per closed batch_id partition). */
  def applyBatchIdempotent(batch: DataFrame, batchId: Long,
      targetDir: String): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(targetDir)

  /** The wired sink: any append-mode stream → exactly-once parquet
    * delivery under crash-replay (StreamingSinkSpec simulates the
    * replay by re-invoking the batch function with a committed id). */
  def idempotentSink(out: DataFrame, targetDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    out.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyBatchIdempotent(b.toDF(), id, targetDir))
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** One epoch of the CONTINUOUS MERGE sink: apply a micro-batch of
    * task updates to the day-partitioned snapshot with latest-wins
    * upsert semantics (LakeLayout.upsert — the executor's
    * Updates-by-unique-key write path applied per trigger, so the
    * lake IS the task store's current state, continuously). First
    * batch bootstraps the partitioned layout.
    *
    * Exactly-once here comes from a DIFFERENT mechanism than
    * applyBatchIdempotent's epoch partitions: the latest-wins merge
    * is a natural idempotent — replaying a committed batch re-applies
    * the same versions, the window picks the same winners, and the
    * snapshot content is unchanged (UpsertSinkSpec pins the replay).
    * Epoch partitioning preserves the LOG exactly-once; this
    * preserves derived STATE exactly-once — the two compose: log sink
    * for audit/replay, merge sink for the serving snapshot. */
  def applyBatchUpsert(batch: DataFrame, targetDir: String,
      keyCols: Seq[String], ordCol: String): Unit = {
    val spark = batch.sparkSession
    val bootstrapped =
      try { spark.read.parquet(targetDir); true }
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Unable to infer schema") ||
               e.getMessage.contains("PATH_NOT_FOUND") => false
      }
    if (bootstrapped)
      graft.sources.LakeLayout.upsert(spark, targetDir, batch, keyCols, ordCol)
    else if (!batch.isEmpty) {
      // bootstrap must uphold the same one-row-per-key invariant the
      // merge maintains: collapse in-batch versions latest-wins first
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*).orderBy(col(ordCol).desc)
      graft.sources.LakeLayout.writePartitioned(
        batch.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).drop("rn"),
        targetDir)
    }
  }

  /** The wired merge sink: any append-mode stream of task events →
    * a continuously-current latest-wins snapshot keyed on keyCols. */
  def upsertSnapshotSink(out: DataFrame, targetDir: String,
      checkpointDir: String, keyCols: Seq[String], ordCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    out.writeStream
      .foreachBatch((b: Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyBatchUpsert(b.toDF(), targetDir, keyCols, ordCol))
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()

  /** MQ-consumer analog over a REAL broker transport — the direct
    * counterpart of the reference's Pulsar consumer subscription
    * (gotimer_trigger/mq/consumer.go: subscribe topic, Unmarshal each
    * payload): subscribe to `topic`, deserialize each JSON value into
    * the pinned event schema. Requires the kafka DataSource
    * (spark-sql-kafka-0-10, shipped separately from core Spark) on
    * the classpath at load() time; the deserialization half is
    * parseEventValues, unit-specced against the kafka wire schema
    * without a broker (KafkaSourceSpec). Downstream jobs compose
    * unchanged — the output columns ARE eventSchema's. */
  def kafkaEventStream(spark: SparkSession, bootstrapServers: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    parseEventValues(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .load())

  /** The value-deserialization select: kafka wire rows (key/value
    * binary + topic/partition/offset/timestamp) → event rows — the
    * reference consumer's Unmarshal step. PERMISSIVE from_json: a
    * malformed payload yields a row of NULL fields (flagged by a null
    * event_id) instead of killing the stream, so dead-letter routing
    * composes downstream as a filter. */
  def parseEventValues(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), eventSchema).as("e"))
      .select(col("e.event_id"), col("e.ts"), col("e.user_id"),
        col("e.event_type"), col("e.value"))

  /** Producer-side serialization — the symmetric half of
    * parseEventValues (the reference's scheduler/trigger PRODUCE to
    * topics: gotimer_scheduler/mq/client.go SendMessage): event rows →
    * kafka wire columns. key = the timer id, so a timer's events land
    * in one partition and per-timer ORDER survives the broker — the
    * property timerFiring/sessionizer state transitions rely on, and
    * the reason the reference keys its messages the same way. Attach
    * with writeStream.format("kafka"); spec-pinned to roundtrip
    * losslessly through parseEventValues (KafkaSourceSpec). */
  def serializeEventValues(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      to_json(struct(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))).cast("binary").as("value"))

  /** The reference's OTHER transport, Pulsar — the scheduler→trigger
    * token channel (gotimer_scheduler/service/scheduler/worker.go:140
    * produces `pulsar.ProducerMessage{Payload: GetSliceMsgKey(t,
    * bucket)}`; gotimer_trigger/mq/consumer/main.go subscribes and
    * the trigger splits the key back into its (minute, bucket)
    * slice). Structured Streaming consumes Pulsar through the public
    * StreamNative pulsar-spark connector, whose wire columns this
    * function is shaped against (`value` binary payload +
    * `__key`/`__topic`/`__messageId`/`__publishTime`/`__eventTime`
    * metadata — PulsarSourceSpec pins the shape broker-free, the
    * KafkaSourceSpec discipline). Requires that connector on the
    * classpath at load() time. */
  def pulsarSliceStream(spark: SparkSession, serviceUrl: String, topic: String): DataFrame =
    parseSliceKeys(
      spark.readStream.format("pulsar")
        .option("service.url", serviceUrl)
        .option("topics", topic)
        .load())

  /** Payload-deserialization half of the Pulsar slice channel: wire
    * rows → (minute_start, bucket) slices per the reference's
    * GetSliceMsgKey format `"yyyy-MM-dd HH:mm_<bucket>"`
    * (common/utils/timer.go:47, MinuteFormat consts/timer.go:4).
    * Null-tolerant like parseEventValues: a malformed payload yields
    * null minute_start/bucket (dead-letter filter composes
    * downstream), never a killed stream — try_to_timestamp because
    * the session runs ANSI. */
  def parseSliceKeys(raw: DataFrame): DataFrame =
    raw.select(col("value").cast("string").as("slice"),
        col("__publishTime").as("publish_time"))
      .select(
        expr("try_to_timestamp(element_at(split(slice, '_'), 1), 'yyyy-MM-dd HH:mm')")
          .as("minute_start"),
        expr("try_cast(try_element_at(split(slice, '_'), 2) AS INT)").as("bucket"),
        col("slice"), col("publish_time"))

  /** Producer half, symmetric with parseSliceKeys — the scheduler's
    * GetSliceMsgKey serialization; spec-pinned to roundtrip. */
  def serializeSliceKeys(slices: DataFrame): DataFrame =
    slices.select(
      concat(date_format(col("minute_start"), "yyyy-MM-dd HH:mm"),
        lit("_"), col("bucket").cast("string")).cast("binary").as("value"))

  /** Watermarked tumbling-window counts — the trigger's per-minute
    * shard aggregation, continuously. 10-min watermark bounds state;
    * partial aggregation applies exactly as in batch. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** SLIDING-window rates, continuously — the trailing-5-minute rate
    * panel advanced every minute (streaming twin of t_sliding_rate;
    * TwinConsistencySpec pins agreement on the same data). Identical
    * plan shape to windowedCounts: the slide only multiplies the
    * per-event window expansion (5 rows into the same partial agg),
    * and the watermark bounds state to the open windows of the last
    * (delay + 5 min) — each event-time minute keeps ≤ 5 live window
    * groups per status, evicted as the watermark passes window end.
    * NULL-ts rows (PERMISSIVE parse leftovers) are dropped before the
    * window generator, matching the batch twin's explicit filter. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .filter(col("ts").isNotNull)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes", "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Per-timer idempotent firing — the executor's dedup-then-fire
    * (bloom + unique index) as keyed state: first event of a
    * (timer, minute) fires, repeats are counted as suppressed.
    *
    * State is the set of fired minute-stamps per timer, EVICTED below
    * the event-time watermark: a replay older than the watermark can
    * no longer arrive through the watermarked stream, so its dedup
    * entry is dead weight. This bounds state to
    * (watermark delay / 1 min) entries per timer — the streaming
    * analog of the reference's per-day bloom expiry
    * (dao/task/cache.go bloom key per day + Expire). */
  def timerFiring(events: Dataset[TaskEvent],
      watermarkDelay: String = "10 minutes"): Dataset[TaskFiring] = {
    import events.sparkSession.implicits._
    events
      // malformed records (PERMISSIVE parse → NULL ts) are skipped,
      // not allowed to NPE the state function (same guard as the
      // gauge/monitor jobs)
      .filter(_.ts != null)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (timerId: Long, it: Iterator[TaskEvent], state: GroupState[FiringState]) => {
          val prev = state.getOption.getOrElse(FiringState(Set.empty))
          var firedMinutes = prev.firedMinutes
          val out = scala.collection.mutable.ArrayBuffer.empty[TaskFiring]
          val byMinute = it.toSeq.groupBy(e => e.ts.getTime / 60000L)
          byMinute.toSeq.sortBy(_._1).foreach { case (minute, evs) =>
            if (!firedMinutes.contains(minute)) {
              firedMinutes += minute
              out += TaskFiring(timerId, new Timestamp(minute * 60000L),
                fired = true, evs.size - 1)
            } else {
              out += TaskFiring(timerId, new Timestamp(minute * 60000L),
                fired = false, evs.size)
            }
          }
          val watermarkMinute = state.getCurrentWatermarkMs() / 60000L
          state.update(FiringState(firedMinutes.filter(_ >= watermarkMinute)))
          out.iterator
        })
  }

  /** Executor-side enrichment: before acting on a firing, re-read the
    * FULL timer definition and drop firings whose timer has been
    * disabled — gotimer_executor/service/executor/worker.go:85-95
    * (executeAndPostProcess: timerService.GetTimer, then skip when
    * Status != Enabled). Expressed as a stream-static join: the static
    * side is re-planned every micro-batch, so a definition change
    * lands on the next batch — the same freshness the reference gets
    * by re-querying MySQL per task, without a per-task point lookup.
    * Timer defs are dimension-sized (10⁶–10⁸ rows ≪ the event
    * stream), hence the explicit broadcast. */
  def enrichedFiring(firings: Dataset[TaskFiring], defs: Dataset[TimerDef]): DataFrame =
    firings.filter(_.fired)
      .join(broadcast(defs.filter(col("enabled"))), Seq("timer_id"), "inner")

  /** Cross-batch exact dedup of an unbounded document stream — the
    * streaming twin of d_exact_dedup, and the executor's
    * bloom-then-db idempotency check (worker.go:69-78) generalized to
    * content identity. Keyed by md5(text); the first doc of a
    * fingerprint (min doc_id within its arrival batch) passes, every
    * later duplicate is suppressed by keyed state. State is one
    * boolean per DISTINCT document ever seen — inherent to exact
    * dedup (there is no watermark after which a duplicate becomes
    * acceptable); at 100 TB that lives in the RocksDB state store,
    * optionally fronted by a bloom filter exactly like the
    * reference's redis bloom + unique-index fallback. */
  private def md5Hex(text: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Raw content identity — the streaming twin of d_exact_dedup. */
  def rawKey(d: DocEvent): String = md5Hex(d.text)

  /** Canonical content identity — the JVM mirror of
    * TextOps.canonicalFpExpr (equality pinned in StreamingSpec), so
    * the streaming and batch tiers agree on what counts as a
    * duplicate. Mirrors Spark semantics exactly: trim() strips only
    * SPACES (Java's String.trim would also strip tabs/controls and
    * diverge on "\tdoc"), and lower() is locale-independent (default
    * toLowerCase would vary under e.g. tr_TR). */
  def canonicalKey(d: DocEvent): String = {
    val spaceTrimmed = d.text.replaceAll("^ +| +$", "")
    md5Hex(spaceTrimmed.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " "))
  }

  /** Keep-rule caveat (ADVICE r3): the kept representative is
    * FIRST-ARRIVAL — min doc_id within the key's first micro-batch.
    * The batch twin (d_exact_dedup / x_fingerprint) keeps the GLOBAL
    * min doc_id, so if a smaller id for the same content arrives in a
    * later batch, periodic batch compaction swaps the survivor id.
    * Content-level dedup agrees across tiers; the representative id
    * is only batch-stable. */
  def streamingDedup(docs: Dataset[DocEvent],
      keyFn: DocEvent => String = rawKey): Dataset[DocEvent] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, it: Iterator[DocEvent], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(it.minBy(_.doc_id))
          }
        })
  }

  /** Retention-bounded dedup — the deployment knob the unbounded form
    * above trades away: suppress duplicates only within `retention`
    * of the fingerprint's last sighting (sliding TTL), after which
    * the key is EVICTED and the content may pass again. This caps
    * state at (arrival rate × retention) distinct keys instead of
    * "every document ever", which is how a production ingest dedups
    * on the stream while periodic batch compaction (d_exact_dedup)
    * catches cross-window repeats — the same stream-fast/batch-exact
    * split StreamingFunnel documents for near-dups. Processing-time
    * timeout because content identity has no event time. */
  def streamingDedupWithin(docs: Dataset[DocEvent],
      retention: String = "30 minutes",
      keyFn: DocEvent => String = rawKey): Dataset[DocEvent] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout)(
        (_: String, it: Iterator[DocEvent], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            state.setTimeoutDuration(retention) // sliding: sighting refreshes
            Iterator.empty
          } else {
            state.update(true)
            state.setTimeoutDuration(retention)
            Iterator.single(it.minBy(_.doc_id))
          }
        })
  }

  /** The TrainingPipeline funnel on an unbounded ingest stream:
    * cross-batch exact dedup (keyed state), then the SAME per-doc
    * feature/filter expressions the batch pipeline uses (language ID,
    * token count, quality — all stateless, so they compose onto a
    * stream unchanged). Near-dup suppression is deliberately absent
    * here: LSH pair-joins need the corpus, so the streaming tier
    * dedups exactly and near-dup clustering runs as the periodic
    * batch compaction (TrainingPipeline) — the classic lambda split.
    * Columns: doc_id, text, pred_lang, n_tokens, quality. */
  def streamingFunnel(docs: Dataset[DocEvent],
      minQuality: Double = 0.05,
      langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")): DataFrame =
    // canonicalKey, not rawKey: the batch funnel dedups on the
    // NORMALIZED fingerprint, and the two tiers must agree on what a
    // duplicate is (a whitespace-variant doc kept here would be
    // retro-dropped by batch compaction)
    graft.operators.TrainingPipeline.featureAndFilter(
      streamingDedup(docs, canonicalKey).toDF(), minQuality, langs)

  /** Firing↔completion correlation — joins the trigger's firing
    * stream to the executor's completion stream, the continuous form
    * of "which fired tasks completed, and how late?" (the reference
    * answers it by joining the task table's trigger and done
    * timestamps after the fact; t_exec_delay is the batch analog).
    * A stream-STREAM interval join: both sides watermarked, a
    * completion matches a firing of the same timer with done_ts ∈
    * [fire_ts, fire_ts + maxDelay]. LEFT OUTER: a firing with no
    * completion in its interval emits once with NULL completion
    * columns as soon as the watermark clears the interval — exactly
    * the timed-out task the reference's monitor marks failed, for
    * free from join semantics instead of a side sweep. State stays
    * bounded because the time-range predicate lets Spark evict each
    * side's buffered rows once the (global min) watermark passes
    * their join range — unbounded-state stream joins without a range
    * condition are rejected by the planner by design. */
  def firingCompletionJoin(firings: Dataset[TaskFiring],
      completions: Dataset[TaskCompletion],
      maxDelay: String = "15 minutes",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val f = firings.toDF().filter(col("fired"))
      .select(col("timer_id"), col("minute_start").as("fire_ts"))
      .withWatermark("fire_ts", watermarkDelay)
    val c = completions.toDF()
      .select(col("timer_id").as("done_timer_id"), col("done_ts"), col("status"))
      .withWatermark("done_ts", watermarkDelay)
    f.join(c,
      col("timer_id") === col("done_timer_id") &&
        col("done_ts") >= col("fire_ts") &&
        col("done_ts") <= col("fire_ts") + expr(s"INTERVAL $maxDelay"),
      "leftOuter")
      .select(col("timer_id"), col("fire_ts"), col("done_ts"), col("status"),
        ((unix_micros(col("done_ts")) - unix_micros(col("fire_ts"))) / 1000L)
          .cast("long").as("latency_ms"))
  }

  /** Continuous heartbeat-gap detection — the deadman-switch question
    * a TIMER platform actually monitors (the reference's unexeced
    * gauge alerts on minutes where scheduled work did NOT run;
    * t_coverage is the batch rollup of the same absence): per app,
    * emit every minute that provably saw no task. Absence cannot be
    * observed from arriving rows — it needs TIME to pass — so this is
    * keyed state + event-time timeouts: each watermark advance
    * re-invokes every app's group, the frontier moves to the minute
    * the watermark has fully cleared, and every uncovered minute
    * between the old and new frontier is emitted exactly once. An app
    * that stops sending entirely keeps emitting gaps on other apps'
    * watermark progress — exactly the alert a silent producer should
    * trigger. Gaps start at the app's first observed minute (the
    * monitor arms on first heartbeat).
    *
    * Honest limit: if EVERY producer goes silent (total broker
    * outage), the event-time watermark freezes and no further gap is
    * emitted — event-time alone cannot prove wall-clock absence. A
    * deployment closes that last gap outside this operator: a
    * synthetic heartbeat topic (the reference's scheduler produces
    * one per minute by construction) or a wall-clock alert on
    * watermark staleness, both standard practice. */
  def gapMonitor(events: Dataset[TaskEvent]): Dataset[MinuteGap] = {
    import events.sparkSession.implicits._
    events
      .filter(_.ts != null)
      .withWatermark("ts", "10 minutes")
      .groupByKey(e => graft.operators.TimerOps.appShardOf(e.user_id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (app: Long, it: Iterator[TaskEvent], state: GroupState[GapState]) => {
          val wm = state.getCurrentWatermarkMs()
          val newMinutes = it
            .map(e => math.floorDiv(e.ts.getTime, 60000L) * 60000L).toSet
          val st = state.getOption.getOrElse(GapState(Set.empty, newMinutes.min))
          // a minute is classifiable once the watermark clears its end:
          // every minute strictly below the watermark's own minute
          val frontier = math.floorDiv(wm, 60000L) * 60000L
          val seen = st.seen ++ newMinutes
          val out = scala.collection.mutable.ArrayBuffer.empty[MinuteGap]
          var m = st.emittedThrough
          while (m < frontier) {
            if (!seen.contains(m)) out += MinuteGap(app, new Timestamp(m))
            m += 60000L
          }
          val through = math.max(st.emittedThrough, frontier)
          state.update(GapState(seen.filter(_ >= through), through))
          state.setTimeoutTimestamp(wm + 1L) // re-arm on next advance
          out.iterator
        })
  }

  /** Finalized per-(app, hour) in-flight stats — the streaming twin
    * of TimerOps.tConcurrency's output rows. */
  def inflightGauge(events: Dataset[TaskEvent]): Dataset[InflightUpdate] = {
    import events.sparkSession.implicits._
    events
      // the batch twin's NULL guard: a malformed record must be
      // skipped, not NPE inside the state function and kill the query
      // (value is a primitive — a NULL there is rejected upstream at
      // the Dataset decode, same as every job in this package)
      .filter(_.ts != null)
      .withWatermark("ts", "10 minutes")
      .groupByKey(e => graft.operators.TimerOps.appShardOf(e.user_id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (app: Long, it: Iterator[TaskEvent], state: GroupState[GaugeState]) => {
          val st = state.getOption.getOrElse(GaugeState(0L, Nil, Map.empty))
          val wm = state.getCurrentWatermarkMs()
          // +1 at start, −1 at end (end-exclusive: −1 sorts first on
          // ties) — the same two points per task as the batch sweep;
          // duration via the exact cents integer (Catalyst Round ≡
          // BigDecimal HALF_UP)
          val newPts = it.flatMap { e =>
            val t0 = e.ts.getTime
            val dur = java.math.BigDecimal.valueOf(e.value * 100)
              .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
            Seq(GaugePoint(t0, 1L, e.event_id), GaugePoint(t0 + dur, -1L, e.event_id))
          }.toList
          // a point is foldable once the watermark passes it: no new
          // event (ts ≥ wm) can produce an earlier point, so the
          // global time order of everything ≤ wm is complete
          val (ready, still) = (st.pending ++ newPts).partition(_.t <= wm)
          var carry = st.carry
          var partials = st.partials
          ready.sortBy(p => (p.t, p.delta, p.eventId)).foreach { p =>
            carry += p.delta
            val hour = math.floorDiv(p.t, 3600000L) * 3600000L
            val (pk, ns) = partials.getOrElse(hour, (Long.MinValue, 0L))
            partials = partials.updated(hour,
              (math.max(pk, carry), ns + (if (p.delta == 1L) 1L else 0L)))
          }
          // an hour is final once the watermark clears its end — any
          // unfolded point sits at t > wm ≥ hour end
          val (done, open) = partials.partition { case (h, _) => h + 3600000L <= wm }
          if (still.isEmpty && open.isEmpty) state.remove()
          else {
            state.update(GaugeState(carry, still, open))
            state.setTimeoutTimestamp(wm + 1L) // re-check on next advance
          }
          done.toSeq.sortBy(_._1).iterator.map { case (h, (pk, ns)) =>
            InflightUpdate(app, new Timestamp(h), pk, ns)
          }
        })
  }

  /** Continuous outstanding-backlog series — the streaming twin of
    * t_backlog (the reference's unexeced gauge IS continuous: the
    * monitor repolls `SELECT count(*) WHERE status = 0` every minute;
    * this emits the same cumulative arrivals−completions series as
    * each minute finalizes). Input is the per-minute ROLLUP stream
    * (windowedCounts' shape reduced to (minute, arrived, completed) —
    * at scale the parallel watermarked agg runs upstream and THIS
    * stage consumes one row per minute), so the inherently sequential
    * running sum folds a calendar-sized stream, never events — the
    * same two-level decomposition t_backlog/t_concurrency use in
    * batch. The series is global, so the fold is a single keyed group
    * whose state is ONE long plus the ≤ watermark-delay pending
    * minutes; each minute is emitted exactly once, in order, when the
    * watermark clears its end (same-minute partials arriving across
    * triggers merge additively before folding — histogram-style
    * mergeability, so an upstream re-emit cannot double-count).
    * Late rows BELOW an already-folded frontier cannot occur by
    * construction: the upstream append-mode agg only releases a
    * minute after ITS watermark passes, and this stage's watermark
    * trails the same event-time column. */
  def backlogGauge(perMinute: Dataset[MinuteCounts]): Dataset[BacklogPoint] = {
    import perMinute.sparkSession.implicits._
    perMinute
      .filter(_.minute_start != null)
      .withWatermark("minute_start", "10 minutes")
      .groupByKey(_ => 0L) // one global series — input is 1 row/min
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, it: Iterator[MinuteCounts], state: GroupState[BacklogState]) => {
          val st = state.getOption.getOrElse(BacklogState(0L, Nil))
          val wm = state.getCurrentWatermarkMs()
          val pts = st.pending ++ it.map(m =>
            (m.minute_start.getTime, m.arrived, m.completed))
          // a minute folds once the watermark clears its end — no
          // earlier minute can still arrive (upstream releases rows
          // in watermark order)
          val (ready, still) = pts.partition(_._1 + 60000L <= wm)
          var carry = st.carry
          val out = ready.groupBy(_._1).toSeq.sortBy(_._1).map {
            case (t, vs) =>
              val a = vs.map(_._2).sum
              val c = vs.map(_._3).sum
              carry += a - c
              BacklogPoint(new Timestamp(t), a, c, carry)
          }
          // carry persists for the query lifetime (the series is
          // cumulative); pending drains as the watermark advances
          state.update(BacklogState(carry, still))
          state.setTimeoutTimestamp(wm + 1L)
          out.iterator
        })
  }

  // Session state tracks MICROSECONDS — Timestamp.getTime is
  // millis-only and would silently truncate the event table's µs
  // precision, diverging from the batch twin (caught by
  // TwinConsistencySpec).
  private def toMicros(t: Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
  private def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization (30-min) with per-timer state — the
    * stateful twin of TimerOps.tSessionize. A session closes when a
    * later event arrives past the gap (or on event-time timeout).
    *
    * Out-of-order events admitted within the watermark (ADVICE r2 #2):
    * each micro-batch gap-splits the open session PLUS the batch's
    * events over their combined time-sorted sequence — the batch
    * twin's exact rule applied to everything available. An event
    * landing in-gap of the open session merges it (start lowers, end
    * raises); events a full gap earlier form their own sessions,
    * merging with each other when in-gap (reachable only when the gap
    * is shorter than the watermark delay — otherwise such events are
    * watermark-dropped before reaching state). All sessions but the
    * latest are emitted closed. The one remaining (documented)
    * divergence from the batch twin: a session closed in an earlier
    * batch cannot absorb a still-older event arriving in a later
    * batch — exact replay requires buffering the full event set,
    * which is what the batch twin is for. */
  def sessionizer(events: Dataset[TaskEvent],
      gapMs: Long = 30L * 60 * 1000): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMs * 1000L
    events
      .filter(_.ts != null) // NULL-ts guard, as in the other stateful jobs
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (timerId: Long, it: Iterator[TaskEvent], state: GroupState[SessionState]) => {
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          if (state.hasTimedOut) {
            state.getOption.foreach { s =>
              out += Session(timerId, fromMicros(s.start), fromMicros(s.end), s.n, s.sum)
            }
            state.remove()
          } else {
            // Gap-split the open session (as one interval) plus this
            // batch's events over the combined time-sorted sequence —
            // the batch twin's exact split rule applied to everything
            // available. In particular, several late events in the
            // SAME batch that sit before the open session merge with
            // each other instead of fragmenting into singletons.
            val intervals = (state.getOption.toSeq ++
              it.map(e => SessionState(toMicros(e.ts), toMicros(e.ts), 1, e.value)))
              .sortBy(s => (s.start, s.end))
            val merged = intervals.foldLeft(List.empty[SessionState]) { (acc, iv) =>
              acc match {
                case head :: tail if iv.start - head.end <= gapUs =>
                  SessionState(math.min(head.start, iv.start), math.max(head.end, iv.end),
                    head.n + iv.n, head.sum + iv.sum) :: tail
                case _ => iv :: acc
              }
            }.reverse
            if (merged.nonEmpty) {
              // every session but the latest can no longer grow from
              // in-order data — emit closed; the latest stays open
              merged.init.foreach { s =>
                out += Session(timerId, fromMicros(s.start), fromMicros(s.end), s.n, s.sum)
              }
              val last = merged.last
              state.update(last)
              state.setTimeoutTimestamp((last.end + gapUs) / 1000L)
            }
          }
          out.iterator
        })
  }
}
