package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Batch `format("graft-lake")` + the SQL front door (VERDICT r13 #1):
  * the reader options route, the SQL-on-file route, TIMESTAMP/VERSION
  * AS OF from SQL, plan fidelity vs the API route, and the
  * no-extensions fallback scan. */
class LakeFormatSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def mk(ids: Range, day: Int) =
    ids.map(i => (i.toLong, ts(f"2024-03-$day%02d 10:00:00"), s"v$i"))
      .toDF("id", "ts", "v")

  /** One three-version lake per suite run: v1 create (10 rows),
    * v2 append (5 rows), v3 append (5 rows). */
  private lazy val lake: String = {
    val dir = Files.createTempDirectory("graft_fmt").toString
    ManifestLake.create(spark, dir, mk(0 until 10, 1), "ts")
    ManifestLake.appendBatch(spark, dir, mk(100 until 105, 2), "ts", 0L)
    ManifestLake.appendBatch(spark, dir, mk(200 until 205, 3), "ts", 1L)
    dir
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("id").collect().map(_.getLong(0)).toSet

  test("spark.read.format(graft-lake).load reads the head snapshot ≡ API read") {
    val fmt = spark.read.format("graft-lake").load(lake)
    assert(fmt.schema == ManifestLake.read(spark, lake).schema)
    assert(ids(fmt) == ids(ManifestLake.read(spark, lake)))
    assert(fmt.count() == 20L)
  }

  test("versionAsOf / timestampAsOf options pin the snapshot") {
    val v1 = spark.read.format("graft-lake")
      .option("versionAsOf", "1").load(lake)
    assert(ids(v1) == (0L until 10L).toSet)
    val t2 = ManifestLake.history(spark, lake)
      .filter(col("version") === 2L).head().getTimestamp(2)
    val asof = spark.read.format("graft-lake")
      .option("timestampAsOf", t2.toString).load(lake)
    assert(asof.count() == 15L)
    val boom = intercept[Exception] {
      spark.read.format("graft-lake")
        .option("versionAsOf", "1").option("timestampAsOf", t2.toString)
        .load(lake).collect()
    }
    assert(boom.getMessage.contains("mutually exclusive"))
  }

  test("date-only timestamp strings pin the SAME version through the " +
      "option route and the SQL TIMESTAMP AS OF route (ADVICE r14 #5)") {
    // the lake's commits are all 'today'; a far-future date-only
    // string resolves to the head through BOTH doors instead of the
    // option route throwing on the missing time component
    val d = "2030-01-01"
    val viaOpt = spark.read.format("graft-lake")
      .option("timestampAsOf", d).load(lake)
    val viaSql = spark.sql(
      s"SELECT * FROM `graft-lake`.`$lake` TIMESTAMP AS OF '$d'")
    assert(ids(viaOpt) == ids(viaSql) && viaOpt.count() == 20L)
    // midnight session-zone semantics: parse lands at 00:00:00
    val parsed = ManifestLake.parseSessionTimestamp(spark, d)
    assert(parsed == java.sql.Timestamp.valueOf("2030-01-01 00:00:00"))
    // garbage still refuses loudly
    val e = intercept[IllegalArgumentException] {
      ManifestLake.parseSessionTimestamp(spark, "not-a-date")
    }
    assert(e.getMessage.contains("timestamp must be"))
  }

  test("SQL-on-file: SELECT FROM `graft-lake`.`path`") {
    val df = spark.sql(s"SELECT id, v FROM `graft-lake`.`$lake` WHERE id >= 100")
    assert(ids(df.select(col("id"), col("v"))
      .withColumnRenamed("v", "vv").select("id")) == // touch plan
      ((100L until 105L) ++ (200L until 205L)).toSet)
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val v1 = spark.sql(s"SELECT id FROM `graft-lake`.`$lake` VERSION AS OF 1")
    assert(ids(v1) == (0L until 10L).toSet)
    val t2 = ManifestLake.history(spark, lake)
      .filter(col("version") === 2L).head().getTimestamp(2)
    val asof = spark.sql(
      s"SELECT id FROM `graft-lake`.`$lake` TIMESTAMP AS OF '$t2'")
    assert(asof.count() == 15L)
  }

  test("plan fidelity: the format route plans the SAME pruned scan as the API route (no V1 scan wall)") {
    val fmt = spark.read.format("graft-lake").load(lake)
      .filter(col("id") >= 200L).select("id", "v")
    val api = ManifestLake.read(spark, lake)
      .filter(col("id") >= 200L).select("id", "v")
    val pf = fmt.queryExecution.executedPlan.toString
    val pa = api.queryExecution.executedPlan.toString
    // no RowDataSourceScanExec / buildScan boundary in the format plan
    assert(!pf.contains("RowDataSourceScan"), pf)
    // both bottom out in the same vectorized parquet scan with the
    // filter pushed
    assert(pf.contains("FileScan parquet") || pf.contains("BatchScan"), pf)
    assert(pf.contains("PushedFilters") &&
      pf.contains("GreaterThanOrEqual(id,200)"), pf)
    def shape(s: String) = s.replaceAll("#\\d+L?", "#x")
      .replaceAll("plan_id=\\d+", "plan_id=x")
    assert(shape(pf) == shape(pa), s"format:\n$pf\napi:\n$pa")
  }

  test("df.write.format(graft-lake): create / append / batchId idempotence / atomic overwrite / mode guards (r14)") {
    val dst = Files.createTempDirectory("graft_fmt_w").toString + "/lake"
    def write(df: org.apache.spark.sql.DataFrame, mode: String,
        extra: (String, String)*): Unit = {
      val w = df.write.format("graft-lake").mode(mode).option("ordCol", "ts")
      extra.foldLeft(w) { case (x, (k, v)) => x.option(k, v) }.save(dst)
    }
    // default ErrorIfExists: first write creates, second refuses
    write(mk(0 until 10, 1), "error")
    assert(ids(spark.read.format("graft-lake").load(dst)) ==
      (0L until 10L).toSet)
    val boom = intercept[IllegalStateException] {
      write(mk(50 until 55, 2), "error")
    }
    assert(boom.getMessage.contains("already exists"), boom.getMessage)
    // Ignore: no-op on an existing lake
    write(mk(50 until 55, 2), "ignore")
    assert(ManifestLake.read(spark, dst).count() == 10L)
    // plain append: one commit, batch cursor untouched
    val cur0 = ManifestLake.snapshot(spark, dst).lastBatch
    write(mk(100 until 110, 2), "append")
    assert(ManifestLake.read(spark, dst).count() == 20L)
    assert(ManifestLake.snapshot(spark, dst).lastBatch == cur0,
      "a plain batch append must not consume the streaming id space")
    // batchId opt-in: the cursor'd exactly-once append — a replay of
    // the same id is a no-op
    write(mk(200 until 205, 3), "append", "batchId" -> "7")
    write(mk(200 until 205, 3), "append", "batchId" -> "7")
    assert(ManifestLake.read(spark, dst).count() == 25L)
    assert(ManifestLake.snapshot(spark, dst).lastBatch == 7L)
    // atomic overwrite: ONE commit replaces all content; history and
    // time travel keep the pre-overwrite state; cursor preserved
    val preV = ManifestLake.snapshot(spark, dst).version
    write(mk(1000 until 1004, 5), "overwrite")
    val snap = ManifestLake.snapshot(spark, dst)
    assert(snap.version == preV + 1, "overwrite must be ONE commit")
    assert(snap.lastBatch == 7L, "overwrite regressed the batch cursor")
    assert(ids(ManifestLake.read(spark, dst)) == (1000L until 1004L).toSet)
    assert(ManifestLake.readVersion(spark, dst, preV).count() == 25L,
      "time travel below the overwrite lost the old state")
    // and the format-read route sees the replaced head
    assert(ids(spark.read.format("graft-lake").load(dst)) ==
      (1000L until 1004L).toSet)
  }

  test("batchId exactly-once holds on a FRESH table: the bootstrap " +
      "commit carries no data, so a replay cannot double it (review r14 #2)") {
    val dst = Files.createTempDirectory("graft_fmt_boot").toString + "/t"
    def write(): Unit = mk(0 until 8, 1).write.format("graft-lake")
      .mode("append").option("ordCol", "ts").option("batchId", "0")
      .save(dst)
    write()          // bootstrap: empty v1 anchor + cursor'd v2
    write()          // the crash-replay of the SAME batch id
    assert(ManifestLake.read(spark, dst).count() == 8L,
      "a replayed bootstrap batch landed twice")
    assert(ManifestLake.snapshot(spark, dst).lastBatch == 0L)
  }

  test("translate soundness: partial-And conjuncts only at top level " +
      "— NOT(a AND untranslatable) must NOT become NOT(a) (review r14 #8)") {
    import org.apache.spark.sql.sources._
    val eq = EqualTo("id", 1L)
    val opaque = AlwaysTrue // no translate case — stands in for any
                            // filter the translator cannot express
    assert(GraftLakeRelation.translate(Not(And(eq, opaque))).isEmpty)
    assert(GraftLakeRelation.translate(Or(eq, And(eq, opaque))).isEmpty)
    // the top-level split still prunes with the translatable conjunct
    assert(GraftLakeRelation.translateTop(And(eq, opaque)).size == 1)
  }

  test("fallback buildScan (no-extensions session): same rows, columns pruned, filters honored") {
    val rel = GraftLakeRelation(spark,
      Map("path" -> lake, "versionAsOf" -> "2"))
    assert(rel.version == 2L)
    val rdd = rel.buildScan(Array("id"),
      Array(org.apache.spark.sql.sources.GreaterThanOrEqual("id", 100L)))
    // needConversion=false: rows come back as InternalRow
    val got = rdd.asInstanceOf[org.apache.spark.rdd.RDD[
      org.apache.spark.sql.catalyst.InternalRow]]
      .map(_.getLong(0)).collect().toSet
    assert(got == (100L until 105L).toSet)
  }
}
