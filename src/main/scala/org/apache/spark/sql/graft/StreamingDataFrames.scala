package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The ONE internal hop a V1 streaming `Source` needs: the frame
  * `getBatch` returns must carry `isStreaming = true` on every leaf
  * (MicroBatchExecution asserts it before splicing the batch plan into
  * the streaming query), and the flag is only settable through the
  * relation constructors, which sit behind `private[sql]`. This is
  * exactly the hop Delta's streaming source takes — `DeltaSource`'s
  * per-batch `createDataFrame` builds `LogicalRelation(...,
  * isStreaming = true)` from inside Spark's sql package — so the
  * pattern is the published one for file-backed streaming sources.
  * Kept to this single function so the package-escalation surface is
  * one auditable file; the rest of the engine stays on the public API.
  *
  * The marked plan keeps its relation leaves intact (no RDD
  * materialization boundary), so column pruning and filter pushdown
  * from the downstream streaming query still reach the parquet scan —
  * the property that makes a 100-TB lake tail read only the columns
  * and row groups the query needs.
  */
object StreamingDataFrames {
  def markStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val plan = ds.queryExecution.analyzed
    // Mark ONLY the leftmost leaf — the main table scan. isStreaming
    // propagates up through any ancestor (`exists` over children), so
    // one marked leaf satisfies the engine's assert; marking EVERY
    // leaf would be wrong, not just redundant: a batch plan that
    // anti-joins the deletion-vector side would then read as a
    // stream-stream join and the per-batch planner would reach for
    // streaming-join operators. With one streaming leaf the DV side
    // stays static and the join plans as the ordinary broadcast
    // anti-join it is.
    val target = plan.collectLeaves().head
    val marked = plan.transform {
      case lr: LogicalRelation if (lr eq target) && !lr.isStreaming =>
        lr.copy(isStreaming = true)
      case lr: LocalRelation if (lr eq target) && !lr.isStreaming =>
        lr.copy(isStreaming = true)
    }
    Dataset.ofRows(ds.sparkSession, marked)
  }

  /** Build a DataFrame over a LOGICAL plan (analysis runs lazily when
    * the frame is first used) — the hop the SQL DML front door needs:
    * a parsed INSERT source query / MERGE source subtree arrives as a
    * raw LogicalPlan inside the statement, and the executing command
    * must hand it to the lake's write APIs as a DataFrame. This is
    * `Dataset.ofRows`, the constructor every Spark command uses for
    * exactly this, kept here so the package-escalation surface stays
    * one auditable file. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The inverse hop, for a V1 streaming SINK: `Sink.addBatch` hands
    * over a frame whose plan still carries streaming leaves, so any
    * re-planning action on it (`df.write`, a fresh aggregation)
    * throws "streaming sources must be executed with
    * writeStream.start()". Re-wrap the batch's physical rows as a
    * plain batch frame — `LogicalRDD.fromDataset(…, isStreaming =
    * false)`, the exact move Spark's own ForeachBatchSink makes to
    * hand user code a writable DataFrame. The plan is executed ONCE
    * (the RDD is the incremental execution's output); downstream
    * writes see an ordinary scan of it. */
  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    Dataset.ofRows(ds.sparkSession,
      org.apache.spark.sql.execution.LogicalRDD.fromDataset(
        ds.queryExecution.toRdd, ds, isStreaming = false))
  }
}
