package graft

import org.apache.spark.sql.functions._

import graft.sources.ManifestLake

/** ManifestLake cost measurement (SCALING.md §r11): builds the
  * transactional lake from a (stretched) events table and times the
  * write-path operations a compliance owner actually runs — create,
  * a one-day-targeted takedown, a scattered (all-days) takedown, an
  * upsert touching one day, vacuum. Affected-day counts ride along so
  * the "cost ∝ affected days, commit O(1)" claim is checkable.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_soak10 sbt "runMain graft.LakeProbe"
  */
object LakeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_soak10")
    val out = sys.env.getOrElse("SPARK_GRAFT_LAKE_DIR", "/tmp/graft_lake_probe")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.build("graft-lakeprobe", cpus)
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
    val (_, tCreate) = time(ManifestLake.create(spark, out, events, "ts"))
    val nDays = ManifestLake.snapshot(spark, out).days.size

    // one-day takedown: predicate bounded to a single day's keys,
    // with the manifest-level day bound pruning the discovery scan
    val day = ManifestLake.snapshot(spark, out).days.keys.toSeq.sorted.apply(nDays / 2)
    val (_, tDelDay) = time(ManifestLake.deleteWhere(spark, out,
      col("day") === day && col("user_id") % 7 === 3,
      dayBound = Some(_ == day)))

    // the DV counterpart FIRST, on its own key set: ~1% of keys
    // across every day through a deletion vector — the position
    // write replaces the full-lake rewrite, so this is the number
    // that should stay flat as the lake grows
    val (nRead0, tRead0) = time(ManifestLake.read(spark, out).count())
    val (nDvDel, tDvDel) = time(ManifestLake.deleteWhereDV(spark, out,
      col("user_id") % 103 === 11))
    // read-side price of the active DV (anti-join vs the plain scan)
    val (_, tReadDv) = time(ManifestLake.read(spark, out).count())

    // scattered takedown: ~1% of keys across EVERY day (worst case —
    // the whole lake rewrites, but still in ONE atomic commit; its
    // DV-aware rewrite also retires the vector above)
    val (nDel, tDelAll) = time(ManifestLake.deleteWhere(spark, out,
      col("user_id") % 101 === 7))

    // the MV maintenance base: everything AFTER this version is
    // day-local (upsert rewrites one day; merge + restore cancel),
    // i.e. the production incremental-ETL window
    val vBase = ManifestLake.snapshot(spark, out).version

    // upsert: re-fire one day's surviving rows an hour later (same day)
    val upd = ManifestLake.readDays(spark, out, _ == day)
      .withColumn("ts", col("ts") + expr("INTERVAL 1 HOUR"))
      .drop("day")
    val (_, tUpsert) = time(ManifestLake.upsert(spark, out, upd,
      Seq("user_id", "event_id"), "ts"))

    // generic MERGE arm: conditional update touching ONE day plus
    // inserts landing on a DIFFERENT existing day — the rewrite must
    // cost the updated day only, with the insert day APPENDED (its
    // existing dirs untouched); contrast with upsert_one_day above
    val preMerge = ManifestLake.snapshot(spark, out)
    val otherDay = preMerge.days.keys.toSeq.sorted.head
    val updSrc = ManifestLake.readDays(spark, out, _ == day)
      .filter(col("user_id") % 11 === 5)
      .withColumn("value", col("value") + 1).drop("day")
    val insSrc = ManifestLake.readDays(spark, out, _ == otherDay)
      .filter(col("user_id") % 13 === 4)
      .withColumn("event_id", col("event_id") + 900000000L).drop("day")
    val (_, tMerge) = time(ManifestLake.mergeInto(spark, out,
      updSrc.unionByName(insSrc), Seq("user_id", "event_id"), "ts", Seq(
        ManifestLake.MatchedUpdate(Map("value" -> col("s.value"))),
        ManifestLake.NotMatchedInsert())))
    val postMerge = ManifestLake.snapshot(spark, out)
    val mergeRewritten = postMerge.days.count { case (d, dirs) =>
      preMerge.days.get(d).exists(old => old.toSet.intersect(dirs.toSet).isEmpty)
    }
    val mergeAppended = postMerge.days.count { case (d, dirs) =>
      preMerge.days.get(d).exists(old =>
        old.toSet.subsetOf(dirs.toSet) && dirs.size > old.size)
    }

    // restore: undo the merge — pure manifest arithmetic, no data IO;
    // this is the rollback cost a bad takedown/merge actually pays
    val (_, tRestore) = time(
      ManifestLake.restore(spark, out, postMerge.version - 1))

    // incremental-MV arm (the l_incr_mv cost claim, measured): a
    // per-user MV materialized at v1 is brought to head two ways —
    // folding the change feed (cost ∝ |changes|: the deltas of the
    // takedowns/upsert/merge above) vs recomputing from the head
    // snapshot (cost ∝ |table|). The base-MV write is NOT timed
    // (production has it materialized already).
    val head = ManifestLake.snapshot(spark, out).version
    def mvOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id").agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"))
    val mvPath = s"$out/../graft_probe_mv"
    def maintainFrom(fromV: Long): Long = {
      val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
      val delta = ManifestLake.readChanges(spark, out, fromV, head)
        .groupBy("user_id")
        .agg(sum(sign).as("dc"), sum(sign * col("value")).as("dv"))
      // null-safe key equality, same as lIncrMv: a NULL group must
      // MERGE with its delta, not split into two rows
      spark.read.parquet(mvPath).as("m")
        .join(delta.as("d"), col("m.user_id") <=> col("d.user_id"), "full_outer")
        .select(coalesce(col("m.user_id"), col("d.user_id")).as("user_id"),
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("cnt"),
          (coalesce(col("sv"), lit(0.0)) + coalesce(col("dv"), lit(0.0))).as("sv"))
        .filter(col("cnt") > 0).count()
    }
    // production window: the deltas since vBase are day-local (one
    // upsert-rewritten day; merge↔restore net to identical manifests
    // so readChanges skips them with zero IO) — this is the shape
    // the l_incr_mv O(|changes|) claim is about
    mvOf(ManifestLake.readVersion(spark, out, vBase))
      .write.mode("overwrite").parquet(mvPath)
    val (nIncMv, tIncMv) = time(maintainFrom(vBase))
    // adversarial window: v1→head spans the SCATTERED delete — a
    // full-lake rewrite, where the feed's exceptAll pays ~two table
    // scans; measured to document when NOT to use the feed (recompute
    // from the snapshot instead — the skipChangeCommits boundary)
    mvOf(ManifestLake.readVersion(spark, out, 1L))
      .write.mode("overwrite").parquet(mvPath)
    val (_, tIncMvRw) = time(maintainFrom(1L))
    val (nFullMv, tFullMv) = time(mvOf(ManifestLake.read(spark, out)).count())

    val (nVac, tVac) = time(ManifestLake.vacuum(spark, out, retentionMs = 0L, force = true).size)

    println(s"""{"metric":"lakeprobe","dir":"$sfDir","days":$nDays,""" +
      f""""create_sec":$tCreate%.3f,"delete_one_day_sec":$tDelDay%.3f,""" +
      f""""dv_delete_scattered_sec":$tDvDel%.3f,"dv_deleted_rows":$nDvDel,""" +
      f""""read_sec":$tRead0%.3f,"read_with_dv_sec":$tReadDv%.3f,""" +
      s""""read_rows":$nRead0,""" +
      f""""delete_scattered_sec":$tDelAll%.3f,"deleted_rows":$nDel,""" +
      f""""upsert_one_day_sec":$tUpsert%.3f,""" +
      f""""merge_one_day_sec":$tMerge%.3f,""" +
      s""""merge_rewritten_days":$mergeRewritten,""" +
      s""""merge_appended_days":$mergeAppended,""" +
      f""""restore_sec":$tRestore%.3f,""" +
      f""""inc_mv_sec":$tIncMv%.3f,"inc_mv_across_rewrite_sec":$tIncMvRw%.3f,""" +
      f""""full_mv_sec":$tFullMv%.3f,""" +
      s""""inc_mv_keys":$nIncMv,"full_mv_keys":$nFullMv,""" +
      f""""vacuum_sec":$tVac%.3f,""" +
      s""""vacuumed_paths":$nVac}""")
    spark.stop()
  }
}
