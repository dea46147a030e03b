package graft

import org.apache.spark.sql.functions._

/** Dev-loop boilerplate-hazard probe for the ngram similarity join:
  * copies a documents table with a corpus-common header prepended to
  * EVERY doc (the hot-shingle adversary — a shared header trigram has
  * df = corpus size, so the fused kernel's self-join pays df² rows on
  * it), then times the kernel vs the prefix tier at τ = 4/5 on the
  * injected corpus. The numbers land in SCALING.md's crossover table.
  *
  *   sbt "runMain graft.NgramProbe /root/testdata/sf0.1 3"
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val dir = "/tmp/graft_ngram_boiler"
    val spark = Sessions.build("graft-ngramprobe", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    Tables.documents(spark, src)
      .withColumn("text", concat(lit("graft shared boilerplate header every page "), col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def time(label: String, f: () => org.apache.spark.sql.DataFrame): String = {
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      s""""$label":[${ts.map(t => f"$t%.3f").mkString(",")}]"""
    }
    val a = time("prefix_hi", () => operators.DedupOps.ngramVerify(spark, dir, 4, 5,
      operators.DedupOps.ngramPrefixCandidates(spark, dir, 4, 5)))
    val b = time("kernel_hi", () => operators.DedupOps.ngramKernelPairs(spark, dir, 4, 5))
    println(s"""{"metric":"ngram_boiler_probe","src":"$src",$a,$b}""")
    spark.stop()
  }
}
