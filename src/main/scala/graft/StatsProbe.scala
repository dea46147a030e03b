package graft

import org.apache.spark.sql.functions._

import graft.sources.ManifestLake

/** Data-skipping measurement (SCALING.md §r11): builds a stats-indexed
  * ManifestLake from the events table (filesPerDay files per day,
  * hash-spread — the honest ingest layout), then times a selective
  * point + range query three ways:
  *
  *   1. full read().filter  — what a reader without stats pays;
  *   2. readWhere pre-compaction — day conjuncts prune dirs, but the
  *      hash-spread files all cover the full key range, so a non-day
  *      predicate keeps everything (the report proves it);
  *   3. readWhere after compactDay(clusterBy = user_id) across every
  *      day — the OPTIMIZE pass that earns per-file pruning.
  *
  * Files kept / total ride along so "opens ~1 file per day instead of
  * all of them" is a measured claim, not an asserted one.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.StatsProbe"
  */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_LAKE_DIR", "/tmp/graft_stats_probe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val filesPerDay = sys.env.getOrElse("SPARK_GRAFT_FILES_PER_DAY", "8").toInt
    // sized so a day compacts into SEVERAL clustered files (intra-day
    // skipping needs >1 file per day to have anything to skip; a
    // production 128 MB target plays the same role against 100 TB days)
    val targetBytes = sys.env.getOrElse("SPARK_GRAFT_TARGET_KB", "24").toInt * 1024L
    val spark = Sessions.build("graft-statsprobe", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(out), true)

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val events = Tables.events(spark, sfDir).filter(col("ts").isNotNull)
    val (_, tCreate) = time(ManifestLake.create(spark, out, events, "ts",
      filesPerDay = filesPerDay, statsCols = Seq("user_id", "value"),
      bloomCols = Seq("user_id")))
    val days = ManifestLake.snapshot(spark, out).days.keys.toSeq.sorted
    // an OBSERVED median uid (percentile_approx returns an element of
    // the data, so the point probe always hits rows — a computed
    // midpoint can fall into an id gap on stretched corpora)
    val probeUid = events.agg(
      expr("percentile_approx(user_id, 0.5)")).head().getLong(0)
    val pred = s"user_id = $probeUid"
    val rangePred = s"user_id >= $probeUid AND user_id < ${probeUid + 50}"

    def run(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(count(lit(1))).head().getLong(0)

    // 1. full scan + filter (no stats consulted)
    val (nFull, tFull) = time(run(ManifestLake.read(spark, out).filter(pred)))
    // 2. stats-pruned, hash-spread layout
    val repBefore = ManifestLake.candidateFiles(spark, out, pred)
    val (nPre, tPre) = time(run(ManifestLake.readWhere(spark, out, pred)))
    // 3. cluster every day on the probe key, then re-probe
    val (_, tCompact) = time(days.foreach(d =>
      ManifestLake.compactDay(spark, out, d,
        targetFileBytes = targetBytes, clusterBy = Seq("user_id"))))
    val repAfter = ManifestLake.candidateFiles(spark, out, pred)
    val (nPost, tPost) = time(run(ManifestLake.readWhere(spark, out, pred)))
    val repRange = ManifestLake.candidateFiles(spark, out, rangePred)
    val (nRange, tRange) = time(run(ManifestLake.readWhere(spark, out, rangePred)))
    val (nRangeFull, tRangeFull) =
      time(run(ManifestLake.read(spark, out).filter(rangePred)))
    require(nFull == nPre && nPre == nPost,
      s"pruned reads diverged: $nFull/$nPre/$nPost")
    require(nRange == nRangeFull, s"range diverged: $nRange/$nRangeFull")

    // planning-cost pair: the r11 schema checkpoint (one log line) vs
    // the legacy mergeSchema footer union over every live file —
    // .schema forces ONLY planning, no data task runs
    val liveDirs = ManifestLake.snapshot(spark, out).days.values
      .flatten.toSeq.sorted.map(p => s"$out/$p")
    val (_, tPlanCkpt) = time(ManifestLake.read(spark, out).schema)
    val (_, tPlanMerge) = time(
      spark.read.option("mergeSchema", "true").parquet(liveDirs: _*).schema)

    println(s"""{"metric":"statsprobe","dir":"$sfDir","days":${days.size},""" +
      f""""create_sec":$tCreate%.3f,"compact_all_days_sec":$tCompact%.3f,""" +
      s""""point_rows":$nFull,""" +
      f""""full_scan_sec":$tFull%.3f,"pre_compact_sec":$tPre%.3f,""" +
      s""""pre_kept_files":${repBefore.keptFiles.size},""" +
      s""""pre_total_files":${repBefore.totalFiles},""" +
      f""""post_compact_sec":$tPost%.3f,""" +
      s""""post_kept_files":${repAfter.keptFiles.size},""" +
      s""""post_total_files":${repAfter.totalFiles},""" +
      f""""range_sec":$tRange%.3f,"range_full_sec":$tRangeFull%.3f,""" +
      s""""range_kept_files":${repRange.keptFiles.size},""" +
      s""""range_rows":$nRange,""" +
      f""""plan_ckpt_sec":$tPlanCkpt%.3f,"plan_merge_sec":$tPlanMerge%.3f}""")
    spark.stop()
  }
}
