package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** JSON message-drop source: schema pinned, corrupt messages
  * quarantined, batch and stream reads agree. */
class EventSourcesSpec extends SparkSpec {

  private lazy val dir = {
    val d = Files.createTempDirectory("graft_mq").toString
    val lines = Seq(
      """{"event_id": 1, "ts": "2024-01-15 00:01:00", "user_id": 7, "event_type": "click", "value": 1.5}""",
      """{"event_id": 2, "ts": "2024-01-15 00:02:00.123456", "user_id": 8, "event_type": "view", "value": 2.0}""",
      """this is not json at all""",
      """{"event_id": "also-not-a-long", "ts": "2024-01-15 00:03:00", "user_id": 9, "event_type": "error", "value": 3.0}""")
    Files.write(java.nio.file.Paths.get(d, "drop1.json"),
      lines.mkString("\n").getBytes)
    d
  }

  test("batch read: good rows parsed with pinned schema, bad rows quarantined") {
    val (good, bad) = EventSources.splitCorrupt(EventSources.eventsFromJson(spark, dir))
    val g = good.collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(g.toSet == Set((1L, 7L, "click"), (2L, 8L, "view")), g.mkString(","))
    // µs precision survives
    val ts2 = good.filter("event_id = 2").collect()(0).getTimestamp(1)
    assert(ts2.getNanos == 123456000, ts2.toString)
    assert(bad.count() == 2)
  }

  test("streaming read of the same drop matches the batch read") {
    val ck = Files.createTempDirectory("graft_mq_ck").toString
    val q = EventSources.eventStreamFromJson(spark, dir)
      .writeStream.format("memory").queryName("mq")
      .option("checkpointLocation", ck).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("mq").filter("_corrupt IS NULL")
      .collect().map(_.getLong(0)).toSet
    assert(streamed == Set(1L, 2L))
  }
}
