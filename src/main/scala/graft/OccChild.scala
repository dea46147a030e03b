package graft

import org.apache.spark.sql.functions._

import graft.sources.ManifestLake

/** One writer PROCESS for the cross-process OCC stress (VERDICT r15
  * #4): the in-JVM stresses race threads through one FileSystem
  * object, but the manifest publish claims atomicity across
  * PROCESSES — link(2)'s EEXIST on the local store, fail-if-exists
  * rename elsewhere. This main is the other process: a fresh JVM, a
  * fresh SparkSession, a fresh Hadoop FileSystem, appending `n`
  * one-row batches to a shared lake while sibling JVMs do the same.
  *
  * args: lakePath writerId nAppends barrierFile
  * A writer that exhausts its bounded OCC rebases re-runs from a
  * fresh snapshot (the documented remedy); rows are unique per
  * (writerId, i), so the parent asserts system-level exactly-once.
  * Prints `occ-child <id> committed <versions>` for the artifact. */
object OccChild {
  def main(args: Array[String]): Unit = {
    val Array(lakePath, idS, nS, barrier) = args.take(4)
    val (id, n) = (idS.toInt, nS.toInt)
    val spark = Sessions.build(s"graft-occ-child-$id", "2")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // barrier: all children sessions are UP before anyone writes, so
    // the commits genuinely interleave instead of serializing behind
    // JVM startup skew
    val deadline = System.currentTimeMillis() + 120000
    while (!new java.io.File(barrier).exists()) {
      require(System.currentTimeMillis() < deadline, "barrier never rose")
      Thread.sleep(50)
    }
    val committed = (0 until n).map { i =>
      val row = Seq((id.toLong, id.toLong * 1000 + i,
        java.sql.Timestamp.valueOf("2024-05-01 10:00:00"), 1.0))
        .toDF("writer", "event_id", "ts", "v")
        .withColumn("v", col("v") * lit(1.0))
      var v = -1L
      while (v < 0) {
        try v = ManifestLake.append(spark, lakePath, row, "ts")
        catch { case _: java.util.ConcurrentModificationException => () }
      }
      v
    }
    println(s"occ-child $id committed ${committed.mkString(",")}")
    spark.stop()
  }
}
