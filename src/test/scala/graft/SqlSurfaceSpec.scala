package graft

/** The library's SQL front door: after Tables.registerViews every
  * table is a temp view and every graft Catalyst function is callable
  * from plain `spark.sql` — the surface a reference user migrating
  * their ad-hoc admin SQL would actually touch. */
class SqlSurfaceSpec extends SparkSpec {

  test("all tables queryable as views; graft functions callable from SQL") {
    Tables.registerViews(spark, sfDir)
    // every view resolves and has rows
    Tables.names.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1L, s"view $t empty")
    }
    // events.ts arrives as a real timestamp (nanos reconstruction applied)
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    // a timer-domain admin query in plain SQL
    val perMinute = spark.sql(
      """SELECT date_format(ts, 'yyyy-MM-dd HH:mm') AS minute, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY minute LIMIT 5""".stripMargin)
    assert(perMinute.count() == 5)
    // graft expressions resolve inside spark.sql
    val cos = spark.sql(
      """SELECT a.vec_id, cosine_similarity(a.embedding, a.embedding) AS self_cos
        |FROM embeddings a ORDER BY a.vec_id LIMIT 3""".stripMargin)
      .collect().map(_.getDouble(1))
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-12), cos.mkString(","))
    val sig = spark.sql(
      "SELECT size(minhash_signature(transform(split(text, ' '), w -> poly_hash31(w)), 64, 42)) " +
        "FROM documents LIMIT 1").head().getInt(0)
    assert(sig == 64)
    val cron = spark.sql(
      "SELECT size(cron_times('*/15 * * * *', timestamp'2024-01-15 00:00:00', " +
        "timestamp'2024-01-15 01:00:00')) AS n").head().getInt(0)
    assert(cron == 4, s"cron_times returned $cron activations")
  }

  test("the transactional tier is reachable from SQL: graft-lake identifier joins a view, VERSION AS OF addresses history (r14)") {
    import org.apache.spark.sql.functions.col
    Tables.registerViews(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_sqlsurf").toString
    val ev = Tables.events(spark, sfDir)
    graft.sources.ManifestLake.create(spark, dir, ev, "ts") // v1
    graft.sources.ManifestLake.deleteWhere(spark, dir,
      col("user_id") % 2 === 0) // v2
    // head read via SQL identifier, composed with a regular view in
    // one statement — the lake is a first-class SQL relation
    val joined = spark.sql(
      s"""SELECT count(*) AS n
         |FROM `graft-lake`.`$dir` l JOIN events e USING (event_id)""".stripMargin)
      .head().getLong(0)
    val headCnt = graft.sources.ManifestLake.read(spark, dir).count()
    assert(joined == headCnt && headCnt > 0)
    // VERSION AS OF 1 from SQL sees the pre-delete table
    val v1 = spark.sql(
      s"SELECT count(*) AS n FROM `graft-lake`.`$dir` VERSION AS OF 1")
      .head().getLong(0)
    assert(v1 == ev.count() && v1 > headCnt)
  }
}
