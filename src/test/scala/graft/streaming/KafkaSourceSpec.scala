package graft.streaming

import java.sql.Timestamp
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** A kafka wire row exactly as format("kafka") emits it (key/value
  * binary + topic/partition/offset/timestamp/timestampType) — pinned
  * here so parseEventValues is specced against the real source shape
  * without a broker (the kafka DataSource ships outside core Spark). */
case class KafkaWire(key: Array[Byte], value: Array[Byte], topic: String,
    partition: Int, offset: Long, timestamp: Timestamp, timestampType: Int)

/** The broker-transport consumer analog (Streams.kafkaEventStream):
  * the value-deserialization half is driven here over the kafka wire
  * schema, batch AND streaming, including the poison-message rule. */
class KafkaSourceSpec extends SparkSpec {

  private def wire(off: Long, payload: String): KafkaWire =
    KafkaWire(null, payload.getBytes(UTF_8), "events", 0, off,
      Timestamp.valueOf("2024-01-15 00:00:00"), 0)

  private val good1 =
    """{"event_id": 1, "ts": "2024-01-15 00:01:10", "user_id": 7,
      | "event_type": "click", "value": 2.5}""".stripMargin.replace("\n", "")
  private val good2 =
    """{"event_id": 2, "ts": "2024-01-15 00:02:40", "user_id": 7,
      | "event_type": "view", "value": 1.25}""".stripMargin.replace("\n", "")
  private val poison = """{"event_id": "not-a-number", nope"""

  test("parseEventValues: wire rows → typed events; poison payload survives as a null-flagged row") {
    val session = spark
    import session.implicits._
    val parsed = Streams.parseEventValues(
      Seq(wire(0, good1), wire(1, good2), wire(2, poison)).toDF())
    // the output schema IS the pinned event schema — downstream jobs
    // (windowedCounts, timerFiring, sessionizer) compose unchanged
    assert(parsed.schema == Streams.eventSchema)
    val rows = parsed.collect()
    assert(rows.length == 3, "poison message must not drop the row")
    val ok = rows.filter(r => !r.isNullAt(0))
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(ok.toSeq == Seq(
      (1L, Timestamp.valueOf("2024-01-15 00:01:10"), 7L, "click", 2.5),
      (2L, Timestamp.valueOf("2024-01-15 00:02:40"), 7L, "view", 1.25)))
    // dead-letter filter: exactly the poison row is null-flagged
    assert(rows.count(_.isNullAt(0)) == 1)
  }

  test("producer serialization roundtrips losslessly through the consumer parse") {
    val session = spark
    import session.implicits._
    val events = Seq(
      TaskEvent(1, Timestamp.valueOf("2024-01-15 00:01:10"), 7, "click", 2.5),
      TaskEvent(2, Timestamp.valueOf("2024-01-15 00:02:40"), 9, "view", 1.25),
      TaskEvent(3, Timestamp.valueOf("2024-01-15 23:59:59"), 7, "purchase", 0.0))
    val wire = Streams.serializeEventValues(events.toDF())
    // wire shape: key = timer id bytes (per-timer broker ordering), value = JSON
    assert(wire.schema.fieldNames.toSeq == Seq("key", "value"))
    val keys = wire.select("key").collect().map(r => new String(r.getAs[Array[Byte]](0), UTF_8))
    assert(keys.sorted.toSeq == Seq("7", "7", "9"))
    val back = Streams.parseEventValues(wire).as[TaskEvent].collect().sortBy(_.event_id)
    assert(back.toSeq == events, s"roundtrip mismatch: ${back.toSeq}")
  }

  test("parsed kafka stream composes with the windowed aggregation unchanged") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KafkaWire]
    val q = Streams.windowedCounts(Streams.parseEventValues(mem.toDF())
        .filter(col("event_id").isNotNull)) // dead-letter drop
      .writeStream.format("memory").queryName("kwc").outputMode("update").start()
    mem.addData(wire(0, good1), wire(1, good2), wire(2, poison))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("kwc")
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set(
      (Timestamp.valueOf("2024-01-15 00:00:00"), "click", 1L),
      (Timestamp.valueOf("2024-01-15 00:00:00"), "view", 1L)))
  }
}
