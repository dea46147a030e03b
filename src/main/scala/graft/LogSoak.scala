package graft

import org.apache.hadoop.fs.Path

import graft.sources.ManifestLake

/** The ≥20k-commit log-resolution soak (VERDICT r15 #1's measured
  * arm): synthesizes a deep retained log — every manifest here is a
  * byte-copy of a real commit's (with its `#ts` stamp and mtime
  * patched to keep the r17 strictly-increasing stamp invariant),
  * which is sound because each manifest IS a full snapshot; only the
  * log's LENGTH is under test — then measures per-poll head
  * resolution with the `_head_hint` floor against the pre-r16
  * full-listing fallback, on the same directory.
  *
  * r17 (VERDICT r16 #4) adds the FULL trigger-loop soak: a LIVE
  * changeStream — append mode AND CDF mode — driven one commit per
  * trigger over the shallow log and again over the ≥20k-commit log,
  * measuring per-trigger wall clock + LogMetrics listings/probes.
  * This is the end-to-end composition check that the head-hint floor
  * (r16) and the in-commit stamp floor (r17) hold under the engine's
  * own trigger machinery, not just under direct calls: per-trigger
  * cost must be FLAT in log length and the listing count ZERO.
  *
  * Run: sbt "runMain graft.LogSoak [nCommits] [polls] [triggers]"
  * Prints one JSON line; the numbers land in SCALING.md §r17.
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
    val triggers = if (args.length > 2) args(2).toInt else 25
    val spark = Sessions.build("graft-log-soak",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_log_soak")
      .toString
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      1.0)).toDF("id", "ts", "v")
    ManifestLake.create(spark, dir, df, "ts")

    /** One live changeStream loop: start at the CURRENT head, drive
      * `triggers` micro-batches by committing one real append before
      * each processAllAvailable, return (ms/trigger, listings,
      * probes/trigger) — measured around the WHOLE loop, i.e. the
      * engine's trigger machinery + the source's polls + the commit
      * itself, exactly the steady production composition. */
    def soakStream(cdf: Boolean, tag: String): (Double, Long, Double) = {
      val cp = java.nio.file.Files
        .createTempDirectory(s"graft_log_soak_cp_$tag").toString
      var rows = 0L
      val q = ManifestLake.changeStream(spark, dir,
          startingVersion = "latest", readChangeFeed = cdf)
        .writeStream.option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          rows += b.count(); ()
        }.start()
      try {
        q.processAllAvailable() // absorb the empty bootstrap trigger
        ManifestLake.LogMetrics.reset()
        val t0 = System.nanoTime()
        var i = 0
        while (i < triggers) {
          ManifestLake.append(spark, dir,
            Seq((100L + i, java.sql.Timestamp
              .valueOf("2024-01-01 12:00:00"), 2.0))
              .toDF("id", "ts", "v"), "ts")
          q.processAllAvailable()
          i += 1
        }
        val ms = (System.nanoTime() - t0) / 1e6 / triggers
        require(rows >= triggers.toLong,
          s"$tag soak lost rows: $rows < $triggers")
        (ms, ManifestLake.LogMetrics.listings.get(),
          ManifestLake.LogMetrics.probes.get().toDouble / triggers)
      } finally q.stop()
    }

    // shallow-log trigger soak first: the flat-in-log-length baseline
    val (shAppendMs, shAppendList, shAppendProbes) =
      soakStream(cdf = false, "shallow_append")
    val (shCdfMs, shCdfList, shCdfProbes) =
      soakStream(cdf = true, "shallow_cdf")

    // replicate the head commit's manifest out to nCommits (metadata
    // only — the data generations are shared, exactly like an idle
    // day under a per-minute heartbeat sink). Each copy gets its own
    // strictly-increasing `#ts` stamp + mtime mirror, preserving the
    // r17 commit invariant the real write path enforces.
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val headSnap = ManifestLake.snapshot(spark, dir)
    val fromV = headSnap.version
    // the shallow soaks already committed 2×triggers versions — a
    // nCommits at or below that would silently skip replication and
    // measure "deep" numbers on the shallow log while the JSON still
    // claims nCommits (review r17); refuse a non-deep ask instead
    require(nCommits > fromV + 1000,
      s"LogSoak: nCommits $nCommits must exceed the shallow-phase " +
        s"head ($fromV) by ≥1000 for the deep comparison to measure " +
        "anything — pass a larger nCommits")
    val baseTs = headSnap.ts.getOrElse(System.currentTimeMillis())
    val m1 = new Path(dir, f"_graft_log/$fromV%08d.manifest")
    val lines = {
      val in = fs.open(m1)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      txt.split('\n')
    }
    ((fromV + 1) to nCommits.toLong).foreach { v =>
      val stamp = baseTs + (v - fromV)
      val body = lines.map {
        case l if l.startsWith("#ts\t") => s"#ts\t$stamp"
        case l => l
      }.mkString("\n").getBytes("UTF-8")
      val p = new Path(dir, f"_graft_log/$v%08d.manifest")
      val out = fs.create(p, true)
      try out.write(body) finally out.close()
      new java.io.File(p.toUri.getPath).setLastModified(stamp)
      ()
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

    // deep-log trigger soak: the SAME live loops over the ≥20k-commit
    // retained log — per-trigger cost must read flat vs the shallow
    // baseline, with ZERO listings (head hint + in-commit stamps)
    val (dpAppendMs, dpAppendList, dpAppendProbes) =
      soakStream(cdf = false, "deep_append")
    val (dpCdfMs, dpCdfList, dpCdfProbes) =
      soakStream(cdf = true, "deep_cdf")

    println(f"""{"metric":"log_soak","commits":$nCommits,"polls":$polls,""" +
      f""""hint_head_us":$hintHeadUs%.1f,"hint_snapshot_us":$hintSnapUs%.1f,""" +
      f""""listing_head_us":$listHeadUs%.1f,"listing_snapshot_us":$listSnapUs%.1f,""" +
      f""""hint_listings":$hintListings,"hint_probes":$hintProbes,""" +
      f""""fallback_listings":$listListings,""" +
      f""""speedup_head":${listHeadUs / hintHeadUs}%.1f,""" +
      f""""triggers":$triggers,""" +
      f""""append_trigger_ms":{"shallow":$shAppendMs%.1f,"deep":$dpAppendMs%.1f},""" +
      f""""cdf_trigger_ms":{"shallow":$shCdfMs%.1f,"deep":$dpCdfMs%.1f},""" +
      f""""trigger_listings":{"shallow_append":$shAppendList,"shallow_cdf":$shCdfList,"deep_append":$dpAppendList,"deep_cdf":$dpCdfList},""" +
      f""""trigger_probes":{"shallow_append":$shAppendProbes%.1f,"shallow_cdf":$shCdfProbes%.1f,"deep_append":$dpAppendProbes%.1f,"deep_cdf":$dpCdfProbes%.1f}}""")
    spark.stop()
  }
}
