package graft

/** Dev-loop probe (r17): cost of a bare spark.read.parquet — file
  * listing + footer schema inference — per invocation, vs reusing the
  * resolved DataFrame. Informs whether Tables.load should memoize the
  * resolved plan per (session, dir). Not part of the inventory.
  */
object FooterProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-footer-probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    // warmup
    spark.read.parquet(s"$dir/lineitem.parquet").schema
    def timed(n: Int)(f: => Unit): Double = {
      val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e6 / n
    }
    val readMs = timed(30) {
      spark.read.parquet(s"$dir/lineitem.parquet").schema
    }
    val small = timed(30) {
      spark.read.parquet(s"$dir/nation.parquet").schema
    }
    val cached = Tables.lineitem(spark, dir)
    val reuseMs = timed(30) { cached.schema }
    println(f"{'read_parquet_ms': $readMs%.2f, 'small_table_ms': $small%.2f, 'reuse_ms': $reuseMs%.3f}")
    spark.stop()
  }
}
