package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide-minute skew measurement (SCALING.md row; AqeSkewJoinSpec pins
  * the plan): times the hot-key shuffle join in three configurations —
  * AQE skew-split ON (the default defense), OFF (what the stall looks
  * like), and SkewOps.saltedJoin (the manual fallback) — on a
  * synthetic fact with `SPARK_GRAFT_HOT_PCT`% of rows on one key.
  *
  *   SPARK_GRAFT_SKEW_ROWS=20000000 sbt "runMain graft.SkewProbe"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "20000000").toLong
    val hotPct = sys.env.getOrElse("SPARK_GRAFT_HOT_PCT", "20").toInt
    // ADVICE r11 #4: id % (100/hotPct) divides by zero for hotPct >
    // 100 and silently lands on a different hot fraction for
    // non-divisors of 100 (integer division: 33 → every 3rd row);
    // pmod(id, 100) < hotPct below is exact for any 1..100.
    require(hotPct >= 1 && hotPct <= 100,
      s"SPARK_GRAFT_HOT_PCT must be in [1, 100], got $hotPct")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build("graft-skewprobe", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def fact(): DataFrame = spark.range(n).select(
      when(pmod(col("id"), lit(100L)) < hotPct, 0L)
        .otherwise(pmod(col("id"), lit(997L))).as("k"),
      concat(lit("payload-"), col("id")).as("pay"))
    def dim(): DataFrame = spark.range(997).select(col("id").as("k"),
      concat(lit("dim-"), col("id")).as("dval"))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // scale the detector to the probe corpus, as in AqeSkewJoinSpec
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4194304")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4194304")

    // min of 2 with a discarded cold run per config: the first
    // execution of each join shape pays ~2 s of codegen, which is
    // JVM cost, not plan cost (the Bench discipline)
    def time(label: String)(df: => DataFrame): (String, Double) = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      label -> math.min(once(), once())
    }
    val results = Seq(
      {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        time("aqe_skew_on")(fact().join(dim(), "k"))
      },
      {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        time("aqe_skew_off")(fact().join(dim(), "k"))
      },
      {
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        time("salted_8")(operators.SkewOps.saltedJoin(fact(), dim(), "k", 8))
      })
    println(s"""{"metric":"skewprobe","rows":$n,"hot_pct":$hotPct,${
      results.map { case (l, t) => s""""$l":${f"$t%.3f"}""" }.mkString(",")}}""")
    spark.stop()
  }
}
