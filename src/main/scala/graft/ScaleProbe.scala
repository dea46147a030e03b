package graft

import org.apache.spark.sql.functions._

/** Empirical scale probe for the dedup family (the README's scaling
  * claim, reproducible): blow the documents table up N× by appending
  * a replica marker word to each copy — every original gains N−1
  * dense near-duplicates (one shingle of ~85 changes, J ≈ 0.97), the
  * adversarial shape for LSH (every band bucket collides inside each
  * clique). Times each dedup operator end-to-end on the blown corpus
  * and prints one JSON line.
  *
  * The probe validates SHAPE, not absolute speed: candidates grow
  * linearly with clique count (band-bucket joins, never all-pairs),
  * so runtime should scale ~linearly in N² only within cliques
  * (pairs per clique) and ~linearly in corpus size otherwise.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BLOWUP=10 \
  *     sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_BLOWUP", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val out = sys.env.getOrElse("SPARK_GRAFT_BLOWUP_DIR", "/tmp/graft_blowup")
    val spark = Sessions.build("graft-scaleprobe", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    // materialize the blown corpus as a real parquet dir so every
    // operator runs its normal scan path (pushdown, parallel input)
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(factor).toDF("rep"))
      .select((col("doc_id") * factor + col("rep")).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(concat_ws(" ", col("text"),
            concat(lit("rep"), col("rep")))).as("text"),
        col("lang"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val nDocs = spark.read.parquet(s"$out/documents.parquet").count()

    def time(name: String)(body: => Unit): (String, Double) = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      body
      (name, (System.nanoTime() - t0) / 1e9)
    }
    def run(name: String): (String, Double) = time(name) {
      SparkEntry.queries(name)(spark, out)
        .write.format("noop").mode("overwrite").save()
    }

    val results = Seq(
      run("d_exact_dedup"), run("x_fingerprint"),
      run("d_minhash_lsh"), run("d_simhash"),
      run("x_winnow_fingerprint"), run("x_dup_spans"))
    val qs = results.map { case (k, v) => f""""$k":$v%.1f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scaleprobe","n_docs":$nDocs,"factor":$factor,"queries":$qs}""")
    spark.stop()
  }
}
