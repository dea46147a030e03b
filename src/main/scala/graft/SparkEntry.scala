package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each operator family contributes an ordered (name → query) map and
  * a parallel (name → DuckDB oracle SQL) map; names line up with the
  * SURVEY §2 tables.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalOps.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ListMap.empty[String, (SparkSession, String) => DataFrame] ++
      RelationalOps.queries ++ TimerOps.queries ++ CronOps.queries ++
      BloomOps.queries ++ TextOps.queries ++ MultimodalOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++
      TrainingPipeline.queries ++ LakeOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    ListMap.empty[String, String] ++
      RelationalOps.oracles ++ TimerOps.oracles ++ CronOps.oracles ++
      BloomOps.oracles ++ TextOps.oracles ++ MultimodalOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++
      TrainingPipeline.oracles ++ LakeOps.oracles
}
