package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** §2b relational core: the "batch admin" query surface of the
  * reference (web/dao query options: filter, order, paginate, count,
  * fuzzy search — gotimer_web/dao/timer/option.go,
  * gotimer_web/dao/task/option.go) generalized to a full analytic
  * operator set over the TPC-H-ish tables.
  *
  * Every query ends in an explicit orderBy on a unique key set so the
  * output is deterministic under any parallelism; every double output
  * is rounded to 4dp so the DuckDB oracle hash-matches bit-for-bit.
  */
object RelationalOps {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 flavor: multi-measure scan-heavy aggregation.
    * Scale: partial aggregation map-side; only 2 grouping keys → tiny
    * shuffle regardless of input size. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Global top-k: ORDER BY + LIMIT with a unique tie-break key.
    * Scale: Spark plans TakeOrderedAndProject — per-partition top-k
    * then a single-reduce merge; no full sort of 100 TB. */
  def q2Topk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 4).as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  val queries: ListMap[String, Q] = ListMap(
    "q1_agg"  -> (q1Agg _),
    "q2_topk" -> (q2Topk _),
  )

  val oracles: ListMap[String, String] = ListMap(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
        |FROM orders
        |ORDER BY round(o_totalprice, 4) DESC, o_orderkey
        |LIMIT 100""".stripMargin,
  )
}
