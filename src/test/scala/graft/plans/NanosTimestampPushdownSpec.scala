package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The pushdown rule must be semantics-preserving at every floor
  * boundary of the nanos→micros truncation, and must never derive
  * from inside a disjunction. Checked by comparing rule-on results
  * against brute-force evaluation on a crafted nanos table. */
class NanosTimestampPushdownSpec extends SparkSpec {
  import spark.implicits._

  // nanos values straddling the 1 µs and 1 ms boundaries around
  // 2024-01-15 00:00:00 UTC (epoch µs 1705276800000000)
  private val baseUs = 1705276800000000L
  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("nanos_pd").toString
    val ns = Seq(-1000001L, -1000000L, -999999L, -1L, 0L, 1L, 999L, 1000L,
      999999L, 1000000L, 1000001L).map(baseUs * 1000L + _)
    ns.toDF("ts").write.mode("overwrite").parquet(d)
    d
  }

  private def table = spark.read.parquet(dir)
    .withColumn("ts_conv", timestamp_micros(expr("ts DIV 1000")))

  private def pushedFilters(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f.metadata.getOrElse("PushedFilters", "")
    }.mkString(";")

  private val lit0 = java.time.Instant.ofEpochSecond(baseUs / 1000000L)

  test("every comparison op agrees with brute-force at the truncation boundaries") {
    val t = Timestamp.from(lit0)
    val all = table.select(col("ts"), col("ts_conv")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    def check(name: String, df: org.apache.spark.sql.DataFrame,
        expect: Timestamp => Boolean): Unit = {
      val got = df.select("ts").collect().map(_.getLong(0)).toSet
      val want = all.filter { case (_, conv) => expect(conv) }.map(_._1).toSet
      assert(got == want, s"$name: got ${got.size}, want ${want.size}")
      // and the raw bound actually reached the scan
      assert(pushedFilters(df).contains("(ts,"), s"$name not pushed: ${pushedFilters(df)}")
    }
    check("lt", table.filter(col("ts_conv") < t), _.before(t))
    check("leq", table.filter(col("ts_conv") <= t), c => !c.after(t))
    check("gt", table.filter(col("ts_conv") > t), _.after(t))
    check("geq", table.filter(col("ts_conv") >= t), c => !c.before(t))
    check("eq", table.filter(col("ts_conv") === t), _.equals(t))
  }

  test("negative nanos (pre-1970): trunc-toward-zero bounds drop no rows") {
    // ts DIV 1000 truncates toward zero, so e.g. ns=−500 converts to
    // epoch exactly; a floor-style derived bound ns >= 0 for
    // ts_conv >= epoch would wrongly drop it (ADVICE r2 #1).
    val d = java.nio.file.Files.createTempDirectory("nanos_neg").toString
    val ns = Seq(-2000001L, -2000000L, -1999999L, -1000001L, -1000000L,
      -999999L, -500L, -1L, 0L, 1L, 500L, 999L, 1000L, 1999L, 2000L, 2001L)
    ns.toDF("ts").write.mode("overwrite").parquet(d)
    val tbl = spark.read.parquet(d)
      .withColumn("ts_conv", timestamp_micros(expr("ts DIV 1000")))
    val all = tbl.select(col("ts"), col("ts_conv")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    // literals at epoch, epoch−1µs, epoch−1ms, epoch+1µs
    val lits = Seq(0L, -1L, -1000L, 1L)
      .map(us => Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000L)))
    for (t <- lits) {
      def check(name: String, df: org.apache.spark.sql.DataFrame,
          expect: Timestamp => Boolean): Unit = {
        val got = df.select("ts").collect().map(_.getLong(0)).toSet
        val want = all.filter { case (_, conv) => expect(conv) }.map(_._1).toSet
        assert(got == want, s"$name @$t: got ${got.toSeq.sorted}, want ${want.toSeq.sorted}")
      }
      check("lt", tbl.filter(col("ts_conv") < t), _.before(t))
      check("leq", tbl.filter(col("ts_conv") <= t), c => !c.after(t))
      check("gt", tbl.filter(col("ts_conv") > t), _.after(t))
      check("geq", tbl.filter(col("ts_conv") >= t), c => !c.before(t))
      check("eq", tbl.filter(col("ts_conv") === t), _.equals(t))
    }
  }

  test("no derivation from inside OR — disjunctive filters stay correct") {
    val t = Timestamp.from(lit0)
    val t2 = Timestamp.from(lit0.plusSeconds(1))
    val df = table.filter(col("ts_conv") < t || col("ts_conv") > t2)
    val got = df.select("ts").collect().map(_.getLong(0)).toSet
    val want = table.select(col("ts"), col("ts_conv")).collect()
      .filter(r => r.getTimestamp(1).before(t) || r.getTimestamp(1).after(t2))
      .map(_.getLong(0)).toSet
    assert(got == want)
    // nothing beyond IsNotNull may be pushed for the OR-only filter
    assert(!pushedFilters(df).contains("LessThan(ts"), pushedFilters(df))
  }
}
