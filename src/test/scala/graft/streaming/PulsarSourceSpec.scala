package graft.streaming

import java.sql.Timestamp
import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkSpec

/** A Pulsar wire row exactly as the public StreamNative
  * pulsar-spark connector emits it for a bytes-schema topic (binary
  * `value` payload + the `__`-prefixed broker metadata columns) —
  * pinned here so parseSliceKeys is specced against the real source
  * shape without a broker, the KafkaSourceSpec discipline (the
  * pulsar DataSource ships outside core Spark). */
case class PulsarWire(value: Array[Byte], __key: Array[Byte], __topic: String,
    __messageId: Array[Byte], __publishTime: Timestamp, __eventTime: Timestamp)

/** The scheduler→trigger token channel (Streams.pulsarSliceStream):
  * payload deserialization of the reference's GetSliceMsgKey format
  * "yyyy-MM-dd HH:mm_<bucket>", incl. the poison-message rule and
  * the producer roundtrip. */
class PulsarSourceSpec extends SparkSpec {

  private def wire(payload: String): PulsarWire =
    PulsarWire(payload.getBytes(UTF_8), null, "scheduler-topic",
      Array[Byte](0, 1, 2), Timestamp.valueOf("2024-01-15 00:37:02"),
      Timestamp.valueOf("2024-01-15 00:37:01"))

  test("parseSliceKeys: slice payloads → (minute, bucket); poison survives null-flagged") {
    val session = spark
    import session.implicits._
    val parsed = Streams.parseSliceKeys(Seq(
      wire("2024-01-15 00:37_3"),
      wire("2024-01-15 00:38_11"),
      wire("not a slice key"),          // no separator, unparseable minute
      wire("2024-99-99 99:99_x")        // separator present, both halves bad
    ).toDF())
    val rows = parsed.collect()
    assert(rows.length == 4, "poison messages must not drop rows")
    val ok = rows.filter(r => !r.isNullAt(0))
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getString(2)))
      .sortBy(_._1.getTime)
    assert(ok.toSeq == Seq(
      (Timestamp.valueOf("2024-01-15 00:37:00"), 3, "2024-01-15 00:37_3"),
      (Timestamp.valueOf("2024-01-15 00:38:00"), 11, "2024-01-15 00:38_11")))
    // dead-letter filter: exactly the two poison rows are null-flagged
    assert(rows.count(r => r.isNullAt(0) || r.isNullAt(1)) == 2)
    // broker publish time rides along for lag monitoring
    assert(rows.forall(!_.isNullAt(3)))
  }

  test("conformance: the parse binds against the connector's FULL published source schema") {
    // The StreamNative pulsar-spark connector's documented source
    // schema for a bytes-schema topic, field for field (value payload
    // + __-prefixed broker metadata incl. the properties map). The
    // connector itself cannot be on this classpath (offline build —
    // SURVEY §8f), so this constant IS the contract: pulsarSliceStream
    // binds by name/type against exactly these columns, and a
    // connector upgrade that changes them must break THIS spec first.
    import org.apache.spark.sql.types._
    val published = StructType(Seq(
      StructField("value", BinaryType),
      StructField("__key", BinaryType),
      StructField("__topic", StringType),
      StructField("__messageId", BinaryType),
      StructField("__publishTime", TimestampType),
      StructField("__eventTime", TimestampType),
      StructField("__messageProperties", MapType(StringType, StringType))))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row("2024-01-15 00:37_3".getBytes(UTF_8),
        null, "persistent://public/default/scheduler-topic",
        Array[Byte](0, 1, 2), Timestamp.valueOf("2024-01-15 00:37:02"),
        Timestamp.valueOf("2024-01-15 00:37:01"),
        scala.collection.immutable.Map.empty[String, String]))
    val parsed = Streams.parseSliceKeys(spark.createDataFrame(rows, published))
    val r = parsed.collect().head
    assert(r.getTimestamp(0) == Timestamp.valueOf("2024-01-15 00:37:00"))
    assert(r.getInt(1) == 3)
    // the local PulsarWire fixture used by the other tests is a strict
    // projection of the published schema — no invented columns/types
    val session = spark
    import session.implicits._
    val fixture = Seq.empty[PulsarWire].toDF().schema
    fixture.fields.foreach { f =>
      val pub = published.fields.find(_.name == f.name)
      assert(pub.exists(_.dataType == f.dataType),
        s"fixture column ${f.name}:${f.dataType} not in the published schema")
    }
  }

  test("producer serialization roundtrips losslessly through the consumer parse") {
    val session = spark
    import session.implicits._
    val slices = Seq(
      (Timestamp.valueOf("2024-01-15 00:37:00"), 3),
      (Timestamp.valueOf("2024-01-15 23:59:00"), 0))
      .toDF("minute_start", "bucket")
    val wireDf = Streams.serializeSliceKeys(slices)
    // GetSliceMsgKey byte-parity: "yyyy-MM-dd HH:mm_<bucket>"
    val payloads = wireDf.collect().map(r => new String(r.getAs[Array[Byte]](0), UTF_8))
    assert(payloads.sorted.toSeq == Seq("2024-01-15 00:37_3", "2024-01-15 23:59_0"))
    val back = Streams.parseSliceKeys(
      wireDf.withColumn("__publishTime",
        org.apache.spark.sql.functions.lit(Timestamp.valueOf("2024-01-15 00:37:02"))))
      .collect().map(r => (r.getTimestamp(0), r.getInt(1))).sortBy(_._1.getTime)
    assert(back.toSeq == Seq(
      (Timestamp.valueOf("2024-01-15 00:37:00"), 3),
      (Timestamp.valueOf("2024-01-15 23:59:00"), 0)))
  }
}
