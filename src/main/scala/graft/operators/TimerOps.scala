package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.ExactNum.{avg4, sum4}

/** §2a timer-domain operators: the reference's scheduler / trigger /
  * executor / monitoring query surface re-expressed over the events
  * table (mapping per SURVEY §3: ts→run_timer, user_id→timer_id,
  * event_type→status analog, value→cost_time).
  *
  * Scale notes: every operator here groups or windows on
  * (minute[, bucket]) or timer_id — exactly the reference's
  * minute×bucket parallelism model (gotimer_scheduler
  * service/scheduler/worker.go handleSlices), which in Spark is plain
  * hash partitioning: no Redis, no locks, same fan-out. Time-range
  * predicates push down to the parquet scan (and to partition pruning
  * on a date-partitioned lake at 100 TB).
  */
object TimerOps {

  type Q = (SparkSession, String) => DataFrame

  private val NumBuckets = 8

  private def minuteCol(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm")

  /** Reference status enum (gotimer_executor/common/consts/timer.go:25-28:
    * NotRunned 0 → Running 1 → Successed 2 / Failed 3) mapped onto the
    * 5 event types. */
  private[operators] def statusCode: Column =
    when(col("event_type") === "click", 0)
      .when(col("event_type") === "signup", 0)
      .when(col("event_type") === "view", 1)
      .when(col("event_type") === "purchase", 2)
      .otherwise(3)

  /** Per-minute task counts — the always-on monitoring query
    * (gotimer_web/dao/task/sql.go:3 SQLGetMinuteTaskCnt:
    * SELECT LEFT(run_timer,16), count(*) ... GROUP BY). */
  def tMinuteTaskCnt(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(minuteCol(col("ts")).as("minute"))
      .agg(count(lit(1)).as("task_cnt"))
      .orderBy(col("minute"))

  /** Minute × bucket shard counts — the scheduler's shard key
    * (gotimer_executor/common/utils/timer.go:29 GetSliceMsgKey:
    * "time_bucketID"; bucket = id % maxBucket). */
  def tTimeBucketShard(s: SparkSession, dir: String): DataFrame =
    // Exact distinct via two-level aggregation instead of
    // countDistinct: the expand-based distinct plan shuffles every
    // row TWICE (one copy per aggregate); pre-aggregating on
    // (minute, bucket, timer) shuffles each distinct triple once and
    // the second agg is tiny. Same exact result, half the shuffle —
    // the 100 TB approximation (approx_count_distinct) is proven in
    // ApproxSwapSpec.
    Tables.events(s, dir)
      .groupBy(minuteCol(col("ts")).as("minute"),
        pmod(col("user_id"), lit(NumBuckets)).as("bucket"),
        col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("minute"), col("bucket"))
      // count(user_id), not count(*): a NULL timer id would form its
      // own group here, and countDistinct/the oracle's
      // count(DISTINCT user_id) both skip NULLs — count(user_id)
      // preserves that exact semantics
      .agg(sum(col("cnt")).as("task_cnt"), count(col("user_id")).as("n_timers"))
      .orderBy(col("minute"), col("bucket"))

  /** [start,end) epoch-ms range scan emitting "{timer_id}_{unix_ms}"
    * union keys — the trigger's ZRANGEBYSCORE sub-minute window
    * (gotimer_executor/dao/task/cache.go:84-102 GetTasksByTime) with
    * member format utils.UnionTimerIDUnix (utils/timer.go:12). */
  def tTimeWindowSlice(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-16 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("user_id").as("timer_id"),
        unix_millis(col("ts")).as("unix_ms"),
        concat_ws("_", col("user_id"), unix_millis(col("ts"))).as("union_key"))
      .orderBy(col("event_id"))

  /** Split union keys back to (timer_id, unix_ms) and verify the
    * roundtrip — utils.SplitTimerIDUnix (utils/timer.go:21). */
  def tUnionKeyRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.events(s, dir)
      .withColumn("union_key", concat_ws("_", col("user_id"), unix_millis(col("ts"))))
    keyed
      .withColumn("timer_id", element_at(split(col("union_key"), "_"), 1).cast("long"))
      .withColumn("unix_ms", element_at(split(col("union_key"), "_"), 2).cast("long"))
      .select(col("event_id"), col("union_key"), col("timer_id"), col("unix_ms"),
        (col("timer_id") === col("user_id") &&
          col("unix_ms") === unix_millis(col("ts"))).as("roundtrip_ok"))
      .orderBy(col("event_id"))
  }

  /** Counts + cost stats per lifecycle status — the executor's
    * 0→1→2/3 state machine (consts/timer.go:25-28, status written by
    * service/executor/worker.go). */
  def tStatusLifecycle(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(statusCode.as("status"), col("event_type"))
      .agg(count(lit(1)).as("n_tasks"),
        sum4(col("value")).as("total_cost"),
        avg4(col("value")).as("avg_cost"),
        round(min(col("value")), 4).as("min_cost"),
        round(max(col("value")), 4).as("max_cost"))
      .orderBy(col("status"), col("event_type"))

  /** Overdue/pending scan, newest-first, paginated — the admin list
    * query (dao/task/option.go WithStatus + WithRunTimer +
    * dao/timer/option.go:50 WithPageLimit, WithDesc). */
  def tPendingOverdue(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(statusCode === 0 &&
        col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("user_id").as("timer_id"), col("ts"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(50)

  /** cost_time min/avg/max/p50/p95 per status — executor CostTime
    * recording (service/executor/worker.go) + Prometheus histogram
    * quantiles. Exact percentile (linear interpolation) to match
    * DuckDB quantile_cont; at 100 TB swap in approx_percentile. */
  def tSlaPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(statusCode.as("status"))
      .agg(count(lit(1)).as("n_tasks"),
        round(min(col("value")), 4).as("min_cost"),
        avg4(col("value")).as("avg_cost"),
        round(max(col("value")), 4).as("max_cost"),
        round(expr("percentile(value, 0.5)"), 4).as("p50_cost"),
        round(expr("percentile(value, 0.95)"), 4).as("p95_cost"))
      .orderBy(col("status"))

  /** Firing-delay distribution — the executor's timer_delay Summary
    * (pkg/promethus/reporter.go:74-83, quantile objectives
    * 0.5/0.9/0.99; observed at service/executor/worker.go:148-151 as
    * actualExecTime.UnixMilli − expectExecTimeUnix). Tasks are due on
    * minute marks (run_timer is minute-aligned by the migrator), so
    * the scheduled time of an event is its minute floor and delay =
    * ts − floor_minute(ts) in ms. The companion unexeced gauge
    * (ReportTimerUnexecedRecord) is the unlimited COUNT form of
    * tPendingOverdue. */
  def tExecDelay(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("delay_ms",
        unix_millis(col("ts")) - unix_millis(date_trunc("minute", col("ts"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_execs"),
        round(sum(col("delay_ms")) / (lit(1.0) * count(lit(1))), 4).as("avg_delay_ms"),
        round(expr("percentile(delay_ms, 0.5)"), 4).as("p50_delay_ms"),
        round(expr("percentile(delay_ms, 0.9)"), 4).as("p90_delay_ms"),
        round(expr("percentile(delay_ms, 0.99)"), 4).as("p99_delay_ms"),
        max(col("delay_ms")).as("max_delay_ms"))
      .orderBy(col("event_type"))

  /** Idempotent dedup on (timer_id, minute), keep earliest — the
    * task table's unique index idx_def_timer on (timer_id, run_timer)
    * (gotimer_web/dao/task/po.go). */
  def tTaskDedup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("timer_id"), col("minute"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id").as("timer_id"),
        minuteCol(col("ts")).as("minute"), col("ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("timer_id"), col("minute"))
  }

  /** Tumbling 5-minute window counts/sums per status — batch twin of
    * streaming.WindowedCounts (trigger minute windows,
    * service/trigger/worker.go). Uses Spark's window() — epoch-aligned
    * in UTC, matching the oracle's integer epoch-ms bucketing. */
  def tStreamWindowAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "5 minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum4(col("value")).as("total_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Gap-based sessionization (30-min) per timer — batch twin of
    * streaming.Sessionizer (flatMapGroupsWithState). Two windows, one
    * shuffle on timer_id. */
  def tSessionize(s: SparkSession, dir: String): DataFrame = {
    val byTs = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    Tables.events(s, dir)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byTs))
      .withColumn("new_session",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_session")).over(byTs))
      .groupBy(col("user_id").as("timer_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum4(col("value")).as("total_value"))
      .orderBy(col("timer_id"), col("session_idx"))
  }

  val queries: ListMap[String, Q] = ListMap(
    "t_minute_task_cnt" -> (tMinuteTaskCnt _),
    "t_time_bucket_shard" -> (tTimeBucketShard _),
    "t_time_window_slice" -> (tTimeWindowSlice _),
    "t_union_key_roundtrip" -> (tUnionKeyRoundtrip _),
    "t_status_lifecycle" -> (tStatusLifecycle _),
    "t_pending_overdue" -> (tPendingOverdue _),
    "t_sla_percentile" -> (tSlaPercentile _),
    "t_exec_delay" -> (tExecDelay _),
    "t_task_dedup" -> (tTaskDedup _),
    "t_stream_window_agg" -> (tStreamWindowAgg _),
    "t_sessionize" -> (tSessionize _),
  )

  private val statusSql =
    """CASE event_type WHEN 'click' THEN 0 WHEN 'signup' THEN 0
      | WHEN 'view' THEN 1 WHEN 'purchase' THEN 2 ELSE 3 END""".stripMargin

  val oracles: ListMap[String, String] = ListMap(
    "t_minute_task_cnt" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:%M') AS minute, count(*) AS task_cnt
        |FROM events GROUP BY 1 ORDER BY minute""".stripMargin,
    "t_time_bucket_shard" ->
      """SELECT strftime(ts, '%Y-%m-%d %H:%M') AS minute, ((user_id % 8) + 8) % 8 AS bucket,
        |  count(*) AS task_cnt, count(DISTINCT user_id) AS n_timers
        |FROM events GROUP BY 1, 2 ORDER BY minute, bucket""".stripMargin,
    "t_time_window_slice" ->
      """SELECT event_id, user_id AS timer_id, epoch_ms(ts) AS unix_ms,
        |  CAST(user_id AS VARCHAR) || '_' || CAST(epoch_ms(ts) AS VARCHAR) AS union_key
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' AND ts < TIMESTAMP '2024-01-16 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "t_union_key_roundtrip" ->
      """SELECT event_id, union_key,
        |  CAST(split_part(union_key, '_', 1) AS BIGINT) AS timer_id,
        |  CAST(split_part(union_key, '_', 2) AS BIGINT) AS unix_ms,
        |  (CAST(split_part(union_key, '_', 1) AS BIGINT) = user_id AND
        |   CAST(split_part(union_key, '_', 2) AS BIGINT) = epoch_ms(ts)) AS roundtrip_ok
        |FROM (SELECT event_id, user_id, ts,
        |        CAST(user_id AS VARCHAR) || '_' || CAST(epoch_ms(ts) AS VARCHAR) AS union_key
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "t_status_lifecycle" ->
      s"""SELECT $statusSql AS status, event_type, count(*) AS n_tasks,
         |  round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 4) AS total_cost,
         |  round(sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value)), 4) AS avg_cost,
         |  round(min(value), 4) AS min_cost, round(max(value), 4) AS max_cost
         |FROM events GROUP BY 1, 2 ORDER BY status, event_type""".stripMargin,
    "t_pending_overdue" ->
      s"""SELECT event_id, user_id AS timer_id, ts, event_type
         |FROM events
         |WHERE ($statusSql) = 0 AND ts < TIMESTAMP '2024-01-20 00:00:00'
         |ORDER BY ts DESC, event_id DESC
         |LIMIT 50""".stripMargin,
    "t_exec_delay" ->
      """SELECT event_type, count(*) AS n_execs,
        |  round(sum(delay_ms) / (1.0 * count(*)), 4) AS avg_delay_ms,
        |  round(quantile_cont(delay_ms, 0.5), 4) AS p50_delay_ms,
        |  round(quantile_cont(delay_ms, 0.9), 4) AS p90_delay_ms,
        |  round(quantile_cont(delay_ms, 0.99), 4) AS p99_delay_ms,
        |  max(delay_ms) AS max_delay_ms
        |FROM (SELECT event_type,
        |        epoch_ms(ts) - epoch_ms(date_trunc('minute', ts)) AS delay_ms
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "t_sla_percentile" ->
      s"""SELECT $statusSql AS status, count(*) AS n_tasks,
         |  round(min(value), 4) AS min_cost,
         |  round(sum(CAST(round(value * 100, 0) AS BIGINT)) / (100.0 * count(value)), 4) AS avg_cost,
         |  round(max(value), 4) AS max_cost,
         |  round(quantile_cont(value, 0.5), 4) AS p50_cost,
         |  round(quantile_cont(value, 0.95), 4) AS p95_cost
         |FROM events GROUP BY 1 ORDER BY status""".stripMargin,
    "t_task_dedup" ->
      """SELECT event_id, timer_id, minute, ts
        |FROM (SELECT event_id, user_id AS timer_id,
        |        strftime(ts, '%Y-%m-%d %H:%M') AS minute, ts,
        |        row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d %H:%M')
        |          ORDER BY ts, event_id) AS rn
        |      FROM events)
        |WHERE rn = 1
        |ORDER BY timer_id, minute""".stripMargin,
    "t_stream_window_agg" ->
      """SELECT make_timestamp((epoch_ms(ts) // 300000) * 300000000) AS window_start,
        |  event_type, count(*) AS n_events,
        |  round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "t_sessionize" ->
      """SELECT user_id AS timer_id, session_idx,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events,
        |  round(sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0, 4) AS total_value
        |FROM (SELECT user_id, ts, value,
        |        -- CAST: duck sum() over INTEGER widens to HUGEINT; the
        |        -- driver's hash distinguishes HUGEINT from the Spark
        |        -- dump's BIGINT even when values are equal (r03's one
        |        -- hash_match=false) — pin the type
        |        CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_idx
        |      FROM (SELECT event_id, user_id, ts, value,
        |              CASE WHEN prev_ms IS NULL OR epoch_ms(ts) - prev_ms > 1800000
        |                THEN 1 ELSE 0 END AS new_session
        |            FROM (SELECT event_id, user_id, ts, value,
        |                    lag(epoch_ms(ts)) OVER (PARTITION BY user_id
        |                      ORDER BY ts, event_id) AS prev_ms
        |                  FROM events)))
        |GROUP BY 1, 2
        |ORDER BY timer_id, session_idx""".stripMargin,
  )
}
