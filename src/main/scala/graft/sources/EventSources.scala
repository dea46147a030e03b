package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Streams

/** Source helpers (SURVEY §4 sources/): the reference's transports
  * mapped to Spark sources.
  *
  *  - MySQL `timer`/`task` tables → the parquet tables (graft.Tables)
  *  - Pulsar topics carrying JSON messages
  *    (gotimer_scheduler/mq/client.go produces; trigger/executor
  *    consume) → newline-JSON drop directories, batch or streaming,
  *    with the schema PINNED (streaming sources must never infer) and
  *    corrupt records quarantined instead of killing the job.
  */
object EventSources {

  /** The MQ message envelope: the event payload plus transport
    * metadata (the reference wraps msgKey + timestamps). */
  val messageSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("_corrupt", StringType)))

  /** Batch read of a JSON message drop. Malformed lines land in
    * `_corrupt` (PERMISSIVE) so a poison message never fails the
    * consumer — the reference logs-and-continues the same way
    * (service/trigger/worker.go error branches). */
  def eventsFromJson(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(messageSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .json(dir)

  /** Streaming read of the same drop directory — the continuous
    * consumer analog. */
  def eventStreamFromJson(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(messageSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .json(dir)

  /** Valid / quarantined split of a message batch. The cache() is
    * required: Spark disallows queries that reference ONLY the
    * corrupt-record column of a raw JSON source
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the
    * documented pattern is to materialize first. */
  def splitCorrupt(messages: DataFrame): (DataFrame, DataFrame) = {
    val m = messages.cache()
    val good = m.filter(col("_corrupt").isNull).drop("_corrupt")
    val bad = m.filter(col("_corrupt").isNotNull).select(col("_corrupt"))
    (good, bad)
  }

  /** Parquet stream source with the canonical event schema —
    * re-exported from Streams for a single sources entry point. */
  def eventStreamFromParquet(spark: SparkSession, dir: String): DataFrame =
    Streams.eventStream(spark, dir)
}
