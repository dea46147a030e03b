package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2a cron expansion + migrator: the reference's core data
  * generator. A timer table is derived deterministically from the
  * events stream (SURVEY §3: distinct timer ids + a per-id cron from
  * a restricted, oracle-expressible set), then expanded through the
  * real 5-field cron engine (graft.functions.CronSchedule /
  * cron_times — the full grammar is spec-tested in CronScheduleSpec;
  * the oracle covers the restricted "*\/K * * * *" subset).
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

  /** Derived timer table: one row per distinct timer id with a
    * deterministic cron ("*\/K * * * *", K = 5·(1 + id mod 4)) and the
    * reference's app_status analog (Enabled=1 ⇔ id mod 3 ≠ 0 —
    * consts Enabled/Unabled, gotimer_web/dao/timer/po.go). */
  private def timers(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id").as("timer_id")).distinct()
      .withColumn("step_min", (pmod(col("timer_id"), lit(4)) + 1) * 5)
      .withColumn("cron", concat(lit("*/"), col("step_min"), lit(" * * * *")))
      .withColumn("status", when(pmod(col("timer_id"), lit(3)) =!= 0, 1).otherwise(0))

  /** Cron → activation times in [start,end) (+ the reference's
    * trailing-boundary activation — parser.go:40 NextsBetween, see
    * CronSchedule doc) for every timer. */
  def tCronExpand(s: SparkSession, dir: String): DataFrame =
    timers(s, dir)
      .withColumn("run_timer", explode(expr(
        s"cron_times(cron, TIMESTAMP '$WinStart', TIMESTAMP '$WinEnd')")))
      .select(col("timer_id"), col("cron"), col("run_timer"))
      .orderBy(col("timer_id"), col("run_timer"))

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
      .orderBy(col("timer_id"), col("run_timer"))

  val queries: ListMap[String, Q] = ListMap(
    "t_cron_expand" -> (tCronExpand _),
    "t_migrator_batch" -> (tMigratorBatch _),
  )

  /** Oracle: static minute series over the window (inclusive end —
    * mirroring the NextsBetween trailing activation), joined on the
    * "*\/K" minute-of-hour divisibility rule, strictly after start. */
  private def expandSql(statusFilter: String, select: String): String =
    s"""WITH timers AS (
       |  SELECT DISTINCT user_id AS timer_id,
       |    (user_id % 4 + 1) * 5 AS step_min,
       |    '*/' || CAST((user_id % 4 + 1) * 5 AS VARCHAR) || ' * * * *' AS cron,
       |    CASE WHEN user_id % 3 <> 0 THEN 1 ELSE 0 END AS status
       |  FROM events),
       |series AS (
       |  SELECT ts FROM generate_series(TIMESTAMP '$WinStart',
       |    TIMESTAMP '$WinEnd', INTERVAL 1 MINUTE) g(ts))
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
  )
}
