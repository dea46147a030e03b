package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-backed skew stress (VERDICT r14 #6): inject ONE hot key
  * carrying SPARK_GRAFT_HOT_PCT% of rows into the 100×-replicated
  * fact tables and prove the production plans degrade the way the
  * design claims:
  *
  *   - q4_shuffle_join (orders⋈lineitem): a hot l_orderkey makes one
  *     shuffle partition ~hotPct% of the table — AQE's skew-join
  *     split must FIRE at the production defaults (the executed plan
  *     is audited for the skew marker, not assumed) and the wall
  *     time is compared against skewJoin.enabled=false (what the
  *     stall looks like).
  *   - t_upsert_merge (window over (timer_id, minute)): the SAME hot
  *     uid share does NOT create a hot partition, because the window
  *     key is COMPOSITE — a hot timer's rows spread across its
  *     minutes, which is the reference's own bucket-sharding insight
  *     (a minute×bucket shard splits a wide minute for exactly this
  *     reason). AQE cannot split a window partition (correctness:
  *     every row of a group must meet its peers), so composite keys
  *     are the load-bearing defense — measured here skewed vs
  *     uniform at the same scale, expected ≈flat.
  *
  * Prints ONE JSON line (the SCALING.md §r15 row):
  *   {"metric":"skew","blowup":N,"hot_pct":P,"calibration_sec":C,
  *    "q4_aqe_on":…,"q4_aqe_off":…,"q4_skew_split_fired":true,
  *    "upsert_skewed":…,"upsert_uniform":…}
  *
  *   SPARK_GRAFT_BLOWUP=100 SPARK_GRAFT_HOT_PCT=10 \
  *     sbt "runMain graft.SkewLadder"
  */
object SkewLadder {
  private val Offset = 1000000000L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_BLOWUP", "100").toInt
    val hotPct = sys.env.getOrElse("SPARK_GRAFT_HOT_PCT", "10").toInt
    require(hotPct >= 1 && hotPct <= 100, s"hot pct $hotPct not in [1,100]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build("graft-skewladder", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- build the skewed 100× facts (in-memory lineage over the
    // base parquet — the probe times the JOIN/WINDOW stages, and a
    // parquet round-trip of 60M rows would only add scan noise that
    // the shuffle dominates anyway) ----
    val rep = spark.range(factor).toDF("rep")
    def blow(df: DataFrame, keys: Seq[String]): DataFrame =
      df.crossJoin(rep).select(df.columns.map { c =>
        if (keys.contains(c))
          (col(c) + col("rep") * Offset).as(c)
        else col(c)
      }.toIndexedSeq: _*)

    val ordersBig = blow(Tables.orders(spark, sfDir),
      Seq("o_orderkey", "o_custkey"))
    val liBase = blow(Tables.lineitem(spark, sfDir),
      Seq("l_orderkey", "l_partkey", "l_suppkey"))
    // the hot key must be a REAL order (join-consistent): hotPct% of
    // lineitem rows remap onto replica 0's minimum orderkey
    val hotKey = Tables.lineitem(spark, sfDir)
      .agg(min(col("l_orderkey"))).head().getLong(0)
    val liSkew = liBase.withColumn("l_orderkey",
      when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
        lit(100)) < hotPct, lit(hotKey)).otherwise(col("l_orderkey")))

    val evBase = blow(
      Tables.events(spark, sfDir).filter(col("ts").isNotNull),
      Seq("event_id"))
    val evSkew = evBase.withColumn("user_id",
      when(pmod(xxhash64(col("event_id")), lit(100)) < hotPct, lit(7L))
        .otherwise(col("user_id")))

    def timeOnce(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def steady(df: => DataFrame): Double = {
      timeOnce(df); math.min(timeOnce(df), timeOnce(df))
    }

    // same fixed calibration spin as Bench — the cross-round anchor
    def calib(): Double = timeOnce(
      spark.range(1L << 26).selectExpr("id % 1024 AS k", "id AS v")
        .groupBy("k").agg(sum(col("v"))))
    calib()
    val calibration = (1 to 3).map(_ => calib()).min

    // ---- q4 shape on the skewed facts ----
    def q4(): DataFrame = ordersBig
      .join(liSkew, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"), col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), sum(col("l_extendedprice")))

    // Scale the skew detector to the corpus, the AqeSkewJoinSpec
    // discipline: at 100× the hot partition is ~10% of the fact —
    // ~3.5× the 32-partition median — which the 100 TB DEFAULTS
    // (256 MB, 5× median) deliberately ignore as not-yet-pathological;
    // the probe's question is "does the split FIRE and what does it
    // buy", so the detector is set to 64 MB / 2× with 64 MB advisory
    // splits (documented here, printed in the row).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      (64L * 1024 * 1024).toString)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "2.0")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      (64L * 1024 * 1024).toString)

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val q4On = steady(q4())
    // audit the EXECUTED plan INSTANCE: df.write clones the plan into
    // a fresh QueryExecution, which would leave this one's
    // AdaptiveSparkPlan unfinalized (isFinalPlan=false, no skew
    // markers) — execute() the same instance instead, the
    // AqeSkewJoinSpec move
    val audited = q4()
    audited.queryExecution.executedPlan.execute().count()
    val planStr = audited.queryExecution.executedPlan.toString
    val fired = planStr.contains("isFinalPlan=true") &&
      (planStr.contains("skew=true") ||
        planStr.toLowerCase.contains("skewed"))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val q4Off = steady(q4())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    // ---- t_upsert_merge shape: skewed vs uniform uid ----
    def upsert(src: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("timer_id"), col("minute"))
      val latest = w.orderBy(col("ts").desc, col("event_id").desc)
      src.select(col("event_id"), col("user_id").as("timer_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm").as("minute"),
        col("ts"), col("event_type"), col("value"))
        .withColumn("rn", row_number().over(latest))
        .withColumn("created_ts", min(col("ts")).over(w))
        .withColumn("n_versions", count(lit(1)).over(w))
        .filter(col("rn") === 1)
    }
    val upSkew = steady(upsert(evSkew))
    val upUniform = steady(upsert(evBase))

    val line =
      f"""{"metric":"skew","blowup":$factor,"hot_pct":$hotPct,""" +
        f""""calibration_sec":$calibration%.3f,"q4_aqe_on":$q4On%.3f,""" +
        f""""q4_aqe_off":$q4Off%.3f,"q4_skew_split_fired":$fired,""" +
        f""""upsert_skewed":$upSkew%.3f,"upsert_uniform":$upUniform%.3f}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("skew_ladder.json"), line + "\n")
    spark.stop()
  }
}
