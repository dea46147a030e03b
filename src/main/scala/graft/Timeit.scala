package graft

/** Time ONE named plan end-to-end at an arbitrary data dir — the
  * dev-loop microbench (Bench runs the fixed headline set; this runs
  * a single query, plus named baselines deliberately NOT in the
  * inventory, e.g. the exact all-pairs embed-cosine that SCALING.md
  * compares the LSH-bucketed operator against).
  *
  *   sbt "runMain graft.Timeit d_embed_cosine /tmp/graft_sf1 3"
  */
object Timeit {
  private val baselines: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] = Map(
    "d_embed_cosine_exact" -> ((s, d) => operators.DedupOps.dEmbedCosineExact(s, d)),
    "d_embed_cosine_hi_exact" -> ((s, d) => operators.DedupOps.dEmbedCosineHiExact(s, d)),
    "d_ngram_kernel_hi" -> ((s, d) => operators.DedupOps.ngramKernelPairs(s, d, 4, 5)),
    "d_ngram_prefix_lo" -> ((s, d) =>
      operators.DedupOps.ngramVerify(s, d, 1, 2, operators.DedupOps.ngramPrefixCandidates(s, d, 1, 2))),
    "d_ngram_cands_hi" -> ((s, d) => operators.DedupOps.ngramPrefixCandidates(s, d, 4, 5)),
    "t_backlog_global" -> ((s, d) => operators.TimerOps.tBacklogGlobal(s, d)),
    "t_concurrency_global" -> ((s, d) => operators.TimerOps.tConcurrencyGlobal(s, d)))

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.build("graft-timeit", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name, baselines(name))
    val times = (1 to reps).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"""{"metric":"timeit","query":"$name","dir":"$dir","times":[${
      times.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
