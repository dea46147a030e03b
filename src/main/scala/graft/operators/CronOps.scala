package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2a cron expansion + migrator: the reference's core data
  * generator. A timer table is derived deterministically from the
  * events stream (SURVEY §3: distinct timer ids + a per-id cron from
  * a restricted, oracle-expressible set), then expanded through the
  * real cron engine (graft.functions.CronSchedule / cron_times —
  * full cronexpr grammar: 5/6/7-field, @macros, L/W/# — spec-tested
  * in CronScheduleSpec/CronPropertySpec; the oracle covers the
  * macro + 6-field + "*\/K" spellings, which all normalize to
  * minute-divisibility).
  *
  * Scale: expansion is embarrassingly parallel — each timer row
  * expands independently (explode), no shuffle until the downstream
  * dedup/groupBy; exactly the migrator's per-timer loop
  * (service/migrator/worker.go:73-98 Migrate) flattened onto
  * executors.
  */
object CronOps {

  type Q = (SparkSession, String) => DataFrame

  private val WinStart = "2024-01-15 00:00:00"
  private val WinEnd = "2024-01-15 02:00:00"

  /** Shared step rule: id mod 7 = 0 → 60 (the @hourly macro slice),
    * else 5·(1 + id mod 4). NextFireSpec pins previews inside the
    * horizon this implies. */
  private[operators] def stepMin(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(pmod(id, lit(7)) === 0, 60).otherwise((pmod(id, lit(4)) + 1) * 5)

  /** Derived timer table: one row per distinct timer id with a
    * deterministic cron and the reference's app_status analog
    * (Enabled=1 ⇔ id mod 3 ≠ 0 — consts Enabled/Unabled,
    * gotimer_web/dao/timer/po.go). Three cron spellings exercise the
    * full reference grammar (cronexpr via parser.go:18) in the
    * ORACLED path, not just specs: id mod 7 = 0 → the `@hourly`
    * macro; id mod 7 = 1 → the 6-field seconds form
    * "0 *\/K * * * *"; else the plain 5-field "*\/K * * * *"
    * (K = 5·(1 + id mod 4); @hourly ≡ step 60). */
  private def timers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id").as("timer_id")).distinct()
      .withColumn("step_min", stepMin(col("timer_id")))
      .withColumn("cron",
        when(pmod(col("timer_id"), lit(7)) === 0, lit("@hourly"))
          .when(pmod(col("timer_id"), lit(7)) === 1,
            concat(lit("0 */"), col("step_min"), lit(" * * * *")))
          .otherwise(concat(lit("*/"), col("step_min"), lit(" * * * *"))))
      .withColumn("status", when(pmod(col("timer_id"), lit(3)) =!= 0, 1).otherwise(0))

  /** Cron → activation times in [start,end) (+ the reference's
    * trailing-boundary activation — parser.go:40 NextsBetween, see
    * CronSchedule doc) for every timer. */
  def tCronExpand(s: SparkSession, dir: String): DataFrame =
    timers(s, dir)
      .withColumn("run_timer", explode(expr(
        s"cron_times(cron, TIMESTAMP '$WinStart', TIMESTAMP '$WinEnd')")))
      .select(col("timer_id"), col("cron"), col("run_timer"))

  /** Migrate: enabled timers × cron expansion → deduped task rows
    * with status NotRunned(0) — service/migrator/worker.go:73
    * (WithStatus(Enabled) → NextsBetween → BatchCreateRecords, unique
    * on (timer_id, run_timer) per idx_def_timer). The expansion is
    * already unique per timer; dropDuplicates mirrors the unique
    * index as an explicit operator. */
  def tMigratorBatch(s: SparkSession, dir: String): DataFrame =
    timers(s, dir)
      .filter(col("status") === 1)
      .withColumn("run_timer", explode(expr(
        s"cron_times(cron, TIMESTAMP '$WinStart', TIMESTAMP '$WinEnd')")))
      .dropDuplicates("timer_id", "run_timer")
      .select(col("timer_id"), col("run_timer"), lit(0).as("task_status"))

  /** Fire-rate audit — THE health metric of a timer platform: did
    * every scheduled activation actually run? Expected activations =
    * the migrator expansion (enabled timers × cron over the window);
    * observed firings = distinct (timer, minute) events. Per timer:
    * expected / fired / missed counts and the exact miss rate — the
    * reference answers this by diffing the task table's NotRunned
    * rows against run_timer (the unexeced gauge's numerator); here
    * it is one left join on (timer_id, minute). Scale: the expansion
    * is explode-parallel, the observed side is a distinct over the
    * (pruned) window scan, and the join + rollup shuffle on
    * timer_id — activations ≪ raw events. */
  def tMissRate(s: SparkSession, dir: String): DataFrame = {
    val expected = timers(s, dir)
      .filter(col("status") === 1)
      .withColumn("run_timer", explode(expr(
        s"cron_times(cron, TIMESTAMP '$WinStart', TIMESTAMP '$WinEnd')")))
      .select(col("timer_id"), col("run_timer"))
    val observed = Tables.events(s, dir)
      .filter(col("ts") >= lit(WinStart).cast("timestamp") &&
        col("ts") < lit(ObsEnd).cast("timestamp"))
      .select(col("user_id").as("timer_id"),
        date_trunc("minute", col("ts")).as("run_timer"))
      .distinct()
      .withColumn("fired", lit(1L))
    expected.join(observed, Seq("timer_id", "run_timer"), "left")
      .groupBy(col("timer_id"))
      .agg(count(lit(1)).as("n_expected"),
        sum(coalesce(col("fired"), lit(0L))).as("n_fired"))
      .withColumn("n_missed", col("n_expected") - col("n_fired"))
      .withColumn("miss_rate", ExactNum.ratio4(col("n_missed"), col("n_expected")))
  }

  /** Observed-side scan bound: one minute past WinEnd so the trailing
    * WinEnd activation's minute is fully covered — DERIVED from
    * WinEnd (a second literal would silently desynchronize if the
    * window ever widens, review r8). */
  private val ObsEnd: String =
    java.sql.Timestamp.valueOf(WinEnd).toLocalDateTime.plusMinutes(1)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** The "now" of the next-fire preview — mid-window, off-minute
    * (second 22), so waits are non-trivial and the strictly-after rule
    * is exercised against a partial minute. */
  private[operators] val Now = "2024-01-15 00:37:22"
  /** Next-fire search horizon: the largest derived step is 60 min
    * (the @hourly slice), so a 61-min horizon contains the next
    * activation from ANY anchor minute — decoupled from Now's
    * position in the hour. Widening never changes the result (the
    * preview takes the min activation); NextFireSpec pins every
    * preview row inside its own step bound, so a widened step set
    * would fail loudly. */
  private val NextHorizonMin = 61L
  private val NextEnd: String =
    java.sql.Timestamp.valueOf(Now).toLocalDateTime.plusMinutes(NextHorizonMin)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Next activation from a fixed "now", per timer — the web enable
    * flow's preview (`gotimer_web/pkg/cron/parser.go:20 NextFromNow`,
    * called before a timer is switched on): first cron activation
    * STRICTLY after now, plus the wait in whole seconds. Runs over
    * ALL timers (the preview happens while the timer is still
    * disabled), with the status column carried. Scale: one explode-
    * free per-row expression — cron_times over the constant
    * NextHorizonMin-minute horizon returns a bounded handful of
    * activations (≤ horizon/step + 1), array_min picks the first; no
    * shuffle anywhere but the presentational sort. */
  def tNextFire(s: SparkSession, dir: String): DataFrame =
    timers(s, dir)
      .withColumn("next_fire", array_min(expr(
        s"cron_times(cron, TIMESTAMP '$Now', TIMESTAMP '$NextEnd')")))
      .withColumn("wait_sec",
        unix_timestamp(col("next_fire")) - unix_timestamp(lit(Now).cast("timestamp")))
      .select(col("timer_id"), col("cron"), col("status"),
        col("next_fire"), col("wait_sec"))

  val queries: ListMap[String, Q] = ListMap(
    "t_cron_expand" -> (tCronExpand _),
    "t_migrator_batch" -> (tMigratorBatch _),
    "t_miss_rate" -> (tMissRate _),
    "t_next_fire" -> (tNextFire _),
  )

  /** Oracle mirror of `stepMin` / the cron spelling rule. user_id is
    * non-negative, so `%` ≡ pmod here. The three spellings all
    * normalize to "fire when minute % step_min = 0", so the oracle's
    * divisibility join is spelling-independent. */
  private val stepSql =
    "CASE WHEN user_id % 7 = 0 THEN 60 ELSE (user_id % 4 + 1) * 5 END"
  private val cronSql =
    """CASE WHEN user_id % 7 = 0 THEN '@hourly'
      |         WHEN user_id % 7 = 1 THEN '0 */' || CAST((user_id % 4 + 1) * 5 AS VARCHAR) || ' * * * *'
      |         ELSE '*/' || CAST((user_id % 4 + 1) * 5 AS VARCHAR) || ' * * * *' END""".stripMargin

  /** Shared oracle prefix: derived timers + the static minute series
    * over the window (inclusive end — mirroring the NextsBetween
    * trailing activation). */
  private val timersSeriesCtes: String =
    s"""timers AS (
       |  SELECT DISTINCT user_id AS timer_id,
       |    $stepSql AS step_min,
       |    $cronSql AS cron,
       |    CASE WHEN user_id % 3 <> 0 THEN 1 ELSE 0 END AS status
       |  FROM events),
       |series AS (
       |  SELECT ts FROM generate_series(TIMESTAMP '$WinStart',
       |    TIMESTAMP '$WinEnd', INTERVAL 1 MINUTE) g(ts))""".stripMargin

  /** Expansion join on the "*\/K" minute-of-hour divisibility rule,
    * strictly after start. */
  private def expandSql(statusFilter: String, select: String): String =
    s"""WITH $timersSeriesCtes
       |SELECT $select
       |FROM timers t JOIN series g
       |  ON minute(g.ts) % t.step_min = 0 AND g.ts > TIMESTAMP '$WinStart'
       |$statusFilter
       |ORDER BY t.timer_id, g.ts""".stripMargin

  val oracles: ListMap[String, String] = ListMap(
    "t_cron_expand" ->
      expandSql("", "t.timer_id, t.cron, g.ts AS run_timer"),
    "t_migrator_batch" ->
      expandSql("WHERE t.status = 1",
        "t.timer_id, g.ts AS run_timer, 0 AS task_status"),
    "t_miss_rate" ->
      s"""WITH $timersSeriesCtes,
         |exp AS (SELECT t.timer_id, g.ts AS run_timer
         |        FROM timers t JOIN series g
         |          ON minute(g.ts) % t.step_min = 0 AND g.ts > TIMESTAMP '$WinStart'
         |        WHERE t.status = 1),
         |obs AS (SELECT DISTINCT user_id AS timer_id,
         |          date_trunc('minute', ts) AS run_timer
         |        FROM events
         |        WHERE ts >= TIMESTAMP '$WinStart' AND ts < TIMESTAMP '$ObsEnd')
         |SELECT e.timer_id, count(*) AS n_expected,
         |  CAST(sum(CASE WHEN o.timer_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_fired,
         |  CAST(sum(CASE WHEN o.timer_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missed,
         |  ${ExactNum.ratioSql(
             "sum(CASE WHEN o.timer_id IS NULL THEN 1 ELSE 0 END)", "count(*)")} AS miss_rate
         |FROM exp e LEFT JOIN obs o
         |  ON e.timer_id = o.timer_id AND e.run_timer = o.run_timer
         |GROUP BY e.timer_id ORDER BY e.timer_id""".stripMargin,
    // minute series over the horizon, first minute with
    // minute % step = 0 strictly after Now; the wait is an integer
    // date_diff — both engines count whole seconds
    "t_next_fire" ->
      s"""WITH timers AS (
         |  SELECT DISTINCT user_id AS timer_id,
         |    $stepSql AS step_min,
         |    $cronSql AS cron,
         |    CASE WHEN user_id % 3 <> 0 THEN 1 ELSE 0 END AS status
         |  FROM events),
         |mins AS (
         |  SELECT ts FROM generate_series(TIMESTAMP '2024-01-15 00:37:00',
         |    TIMESTAMP '$NextEnd', INTERVAL 1 MINUTE) g(ts)),
         |nf AS (
         |  SELECT t.timer_id, min(g.ts) AS next_fire
         |  FROM timers t JOIN mins g
         |    ON minute(g.ts) % t.step_min = 0 AND g.ts > TIMESTAMP '$Now'
         |  GROUP BY t.timer_id)
         |SELECT t.timer_id, t.cron, t.status, n.next_fire,
         |  date_diff('second', TIMESTAMP '$Now', n.next_fire) AS wait_sec
         |FROM timers t JOIN nf n ON t.timer_id = n.timer_id
         |ORDER BY t.timer_id""".stripMargin,
  )
}
