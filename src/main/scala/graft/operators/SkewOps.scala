package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling (SURVEY §5): at 100 TB a handful of hot keys (the
  * reference's "wide minutes" — a minute×bucket shard with millions
  * of tasks) can pin a whole stage on one executor. AQE's skew-join
  * splitting covers sort-merge joins; these helpers cover the rest:
  * broadcast-incompatible replicated joins and single-stage
  * aggregations.
  *
  * Both are exact: salting only changes the partitioning, never the
  * result (spec: SkewOpsSpec proves result equality against the
  * unsalted plan).
  */
object SkewOps {

  /** Join a skewed fact to a (non-broadcastable) dimension by
    * replicating the dimension across `salts` sub-keys: the fact side
    * gets a deterministic per-row salt, the dimension is exploded
    * `salts`× so every (key, salt) pair finds its match. Hot keys
    * spread over `salts` partitions. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    // salt derived from the whole fact row hash — deterministic, no
    // state, uniform
    val saltedFact = skewed.withColumn("_salt",
      pmod(hash(skewed.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for skewed grouping keys: partial
    * aggregate on (key, salt), then final aggregate on key. Exact for
    * decomposable aggregates (sum/count/min/max). Spark's own partial
    * aggregation usually covers this — the explicit form is for
    * high-cardinality maps where map-side partials stop helping
    * (e.g. after an explode). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n_rows"))
  }
}
