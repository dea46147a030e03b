package graft

/** Dev-loop cardinality probe for the ngram similarity join —
  * prefix-candidate counts vs final output at an arbitrary data dir
  * and τ = p/q (the numbers behind SCALING.md's crossover table). */
object CandCount {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("graft-cand", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val p = if (args.length > 1) args(1).toInt else 1
    val q = if (args.length > 2) args(2).toInt else 2
    val cands = operators.DedupOps.ngramPrefixCandidates(spark, dir, p, q).count()
    val out = operators.DedupOps.ngramJaccardPairs(spark, dir, p, q).count()
    val docs = Tables.documents(spark, dir).count()
    println(s"""{"tau":"$p/$q","cands":$cands,"output":$out,"docs":$docs}""")
    spark.stop()
  }
}
