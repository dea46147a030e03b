package graft

import org.apache.hadoop.fs.Path

import graft.sources.ManifestLake

/** The ≥20k-commit log-resolution soak (VERDICT r15 #1's measured
  * arm): synthesizes a deep retained log — every manifest here is a
  * byte-copy of a real commit's, which is sound because each manifest
  * IS a full snapshot; only the log's LENGTH is under test — then
  * measures per-poll head resolution with the `_head_hint` floor
  * against the pre-r16 full-listing fallback, on the same directory.
  *
  * Run: sbt "runMain graft.LogSoak [nCommits] [polls]"
  * Prints one JSON line; the numbers land in SCALING.md §r16.
  *
  * What flat-vs-linear means at 100 TB: a streaming lake committing
  * one manifest per minute retains ~43k manifests at 30-day
  * retention, and the source polls headVersion EVERY trigger — the
  * fallback pays an O(retained) directory listing per poll (and so
  * does every snapshot(), i.e. every batch read's planning), while
  * the hint floor pays ≤2 existence probes regardless of log length. */
object LogSoak {
  def main(args: Array[String]): Unit = {
    val nCommits = if (args.length > 0) args(0).toInt else 20000
    val polls = if (args.length > 1) args(1).toInt else 1000
    val spark = Sessions.build("graft-log-soak",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_log_soak")
      .toString
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      1.0)).toDF("id", "ts", "v")
    ManifestLake.create(spark, dir, df, "ts")

    // replicate commit 1's manifest out to nCommits (metadata only —
    // the data generation is shared, exactly like an idle day under a
    // per-minute heartbeat sink)
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m1 = new Path(dir, "_graft_log/00000001.manifest")
    val bytes = {
      val in = fs.open(m1)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](8192)
        var n = in.read(tmp)
        while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
        buf.toByteArray
      } finally in.close()
    }
    (2 to nCommits).foreach { v =>
      val out = fs.create(new Path(dir, f"_graft_log/$v%08d.manifest"), true)
      try out.write(bytes) finally out.close()
    }
    val hintPath = new Path(dir, "_graft_log/_head_hint")
    def writeHint(): Unit = {
      val out = fs.create(hintPath, true)
      try out.write(nCommits.toString.getBytes("UTF-8")) finally out.close()
    }
    writeHint()

    def timePolls(label: String)(poll: () => Long): Double = {
      require(poll() == nCommits.toLong, s"$label resolved the wrong head")
      val t0 = System.nanoTime()
      var i = 0
      while (i < polls) { require(poll() == nCommits.toLong); i += 1 }
      (System.nanoTime() - t0) / 1e3 / polls // µs per poll
    }

    // hint floor in place: the steady streaming-poll path
    ManifestLake.LogMetrics.reset()
    val hintHeadUs = timePolls("hint head")(() =>
      ManifestLake.headVersion(spark, dir))
    val hintListings = ManifestLake.LogMetrics.listings.get()
    val hintProbes = ManifestLake.LogMetrics.probes.get()
    val hintSnapUs = timePolls("hint snapshot")(() =>
      ManifestLake.snapshot(spark, dir).version)

    // hint removed: the pre-r16 full-listing fallback on the SAME log
    fs.delete(hintPath, false)
    ManifestLake.LogMetrics.reset()
    val listHeadUs = timePolls("listing head")(() =>
      ManifestLake.headVersion(spark, dir))
    val listListings = ManifestLake.LogMetrics.listings.get()
    val listSnapUs = timePolls("listing snapshot")(() =>
      ManifestLake.snapshot(spark, dir).version)
    writeHint() // leave the dir consistent

    println(f"""{"metric":"log_soak","commits":$nCommits,"polls":$polls,""" +
      f""""hint_head_us":$hintHeadUs%.1f,"hint_snapshot_us":$hintSnapUs%.1f,""" +
      f""""listing_head_us":$listHeadUs%.1f,"listing_snapshot_us":$listSnapUs%.1f,""" +
      f""""hint_listings":$hintListings,"hint_probes":$hintProbes,""" +
      f""""fallback_listings":$listListings,""" +
      f""""speedup_head":${listHeadUs / hintHeadUs}%.1f}""")
    spark.stop()
  }
}
