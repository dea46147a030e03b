package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The 100 TB lake layout (SURVEY §5): the events fact table written
  * hive-partitioned by event date, so every time-range operator
  * prunes whole partitions BEFORE any file is opened — the lake
  * analog of the reference's per-day Redis key space
  * (dao/task/cache.go keys per minute-bucket, blooms per day).
  *
  * At 100 TB this layout is the difference between a scan of ~1/30th
  * of the table for a one-day query and a scan of everything;
  * LakeLayoutSpec asserts the pruning on the physical plan
  * (PartitionFilters, not just PushedFilters).
  */
object LakeLayout {

  /** Write events partitioned by event date (day=YYYY-MM-DD/...).
    * Sort within partitions by ts so parquet row-group min/max stats
    * make sub-day ranges cheap too. */
  def writePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .repartition(col("day"))
      .sortWithinPartitions(col("day"), col("ts"))
      .write
      .partitionBy("day")
      .mode("overwrite")
      .parquet(path)

  /** Read the partitioned lake back; `day` is a partition column —
    * filters on it become PartitionFilters (directory pruning). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** One day of events — the shape every per-day operator (bloom
    * build, minute monitoring) takes against the lake. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    read(spark, path).filter(col("day") === day)

  /** Schema-evolved read — the read path a LONG-LIVED lake needs: a
    * table written over months accumulates schema changes (a new
    * metadata column starts appearing in day=N), and the default
    * parquet read takes ONE footer's schema for the whole table — a
    * column present only in newer days silently vanishes or the scan
    * fails, depending on which file is sampled first. mergeSchema
    * unions every footer's schema instead: old partitions surface the
    * new columns as NULL (additive evolution — the only kind a
    * parquet lake supports without a rewrite; renames/retypes need a
    * migration pass, which is what compact()/upsert() are for).
    * Cost: one footer read per file at planning — at 100 TB bounded
    * by compaction keeping file counts sane, and paid only by readers
    * that opt in (the schema-stable operators keep the cheap read()).
    * LakeLayoutSpec pins: union schema, NULL back-fill, partition
    * pruning and predicate pushdown intact through the merged scan. */
  def readEvolved(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Write a fact table BUCKETED on its join key (hash-bucketed files
    * + catalog bucket spec). Two tables bucketed the same way on the
    * same key join WITHOUT any Exchange — the co-located fact-fact
    * join SCALING.md §2b promises for 100 TB (shuffle cost paid once
    * at write time, amortized over every subsequent join/groupBy on
    * that key). BucketedJoinSpec asserts the Exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Z-ORDER (Morton-curve) clustering — the multi-dimensional
    * complement of writePartitioned's one-dimensional time sort (the
    * Delta/Iceberg OPTIMIZE ZORDER analog, from public Morton-order
    * literature). A single-column sort makes parquet min/max stats
    * narrow on THAT column only: a filter on any other column still
    * opens every file. Interleaving the bits of two columns' scaled
    * ranks into one z-value and range-partitioning + sorting by it
    * keeps each file's (min, max) envelope narrow on BOTH columns,
    * so selective filters on EITHER skip most files.
    *
    * Columns are scaled to [0, 2¹⁶) by min/max (one 1-row aggregate —
    * a constant-size driver collect, the BloomOps pattern), then the
    * 32-bit z-value is a single builtins fold (one pass; the
    * expression is referenced once, so no projection-collapse
    * blowup). At 100 TB this is a per-partition maintenance rewrite
    * (z-order day=D after it closes), exactly like compact().
    * ZOrderSpec measures the skipping: both probe columns prune files
    * under the z-layout; the linear layout prunes only its sort key. */
  /** The Morton z-value of (colA, colB) — the 2-column fast path
    * every existing call site uses; see zValueN. */
  private[sources] def zValue(df: DataFrame, colA: String,
      colB: String): Option[org.apache.spark.sql.Column] =
    zValueN(df, Seq(colA, colB))

  /** The N-column Morton z-value, each column scaled to its own
    * [0, 2^bits) rank by the frame's min/max (ONE 1-row aggregate —
    * a constant-size driver collect, the BloomOps pattern), bits =
    * min(16, 63/n) so the interleave always fits a signed long. The
    * z-value itself is a single builtins fold — one pass, referenced
    * once, no projection-collapse blowup. None when the frame is
    * empty, any cluster column is all-null, or a column's type has no
    * numeric rank (string keys under SQL OPTIMIZE ZORDER BY fall back
    * to the caller's linear layout instead of dying in an ANSI cast).
    * Fidelity note for wide lists: each added column costs every
    * column resolution bits (n=4 → 15 bits/dim, n=8 → 7) — the
    * standard Z-order tradeoff, the reason ZORDER BY guidance
    * everywhere says "few, selective columns". */
  private[sources] def zValueN(df: DataFrame, zCols: Seq[String])
      : Option[org.apache.spark.sql.Column] = {
    require(zCols.size >= 2, s"zValueN: need 2+ columns, got $zCols")
    // a column's integer-rank rendering, or None when its type has no
    // numeric rank. DATE needs unix_date — CAST(date AS BIGINT) has
    // been disallowed since Spark 3.0 (pass-2 #3: dying at analysis
    // would break the promised linear fallback).
    def rankSql(c: String): Option[String] =
      df.schema.find(_.name.equalsIgnoreCase(c)).map(_.dataType).flatMap {
        case _: org.apache.spark.sql.types.NumericType =>
          Some(s"CAST(`$c` AS BIGINT)")
        case org.apache.spark.sql.types.TimestampType =>
          Some(s"CAST(`$c` AS BIGINT)")
        case org.apache.spark.sql.types.DateType =>
          Some(s"CAST(unix_date(`$c`) AS BIGINT)")
        case org.apache.spark.sql.types.BooleanType =>
          Some(s"CAST(CAST(`$c` AS INT) AS BIGINT)")
        case _ => None
      }
    val ranks = zCols.map(rankSql)
    if (ranks.exists(_.isEmpty)) return None
    val aggs = ranks.flatten.flatMap(rk =>
      Seq(min(expr(rk)), max(expr(rk))))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    if (zCols.indices.exists(i => r.isNullAt(2 * i))) return None
    val n = zCols.size
    val bits = math.min(16, 63 / n)
    val top = (1L << bits) - 1
    val scaled = zCols.indices.map { i =>
      val (lo, hi) = (r.getLong(2 * i), r.getLong(2 * i + 1))
      // BigInt guards: hi - lo itself can overflow a signed long for
      // near-full-range keys (fall back to linear — no exact rank
      // exists), and the old ((c - lo) * top) div range form overflowed
      // under ANSI for any range past ~1.4e14 (pass-2 #4). Dividing by
      // a precomputed step keeps every intermediate in range; the ≤1
      // bucket of rounding slack is layout slack, not correctness.
      val range = BigInt(hi) - BigInt(lo)
      if (range > Long.MaxValue) return None
      if (hi == lo) "0L"
      else {
        val step = (range / top).max(1).toLong
        s"least(${top}L, ((${ranks(i).get}) - (${lo}L)) div ${step}L)"
      }
    }
    // collision-proof lambda variables: a data column named `i` or
    // `acc` would be captured by the fold's own parameters (lambda
    // binding wins over backticked attributes — pass-2 #5)
    val (accV, idxV) = ("__graft_z_acc", "__graft_z_i")
    val lanes = zCols.indices.map(i =>
      s"shiftleft(shiftright(${scaled(i)}, $idxV) & 1L, $n * $idxV + $i)")
    Some(expr(s"aggregate(sequence(0, ${bits - 1}), 0L, " +
      s"($accV, $idxV) -> $accV | ${lanes.mkString(" | ")})"))
  }

  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, numFiles: Int = 8): Unit = zValue(df, colA, colB) match {
    case None =>
      // empty input (or all-null cluster columns): no range to
      // interleave — a maintenance rewrite of a quiet partition writes
      // it through unchanged instead of dying on a null aggregate
      df.write.mode("overwrite").parquet(path)
    case Some(z) =>
      df.withColumn("z", z)
        .repartitionByRange(numFiles, col("z"))
        .sortWithinPartitions(col("z"))
        .drop("z")
        .write.mode("overwrite").parquet(path)
  }

  /** Copy-on-write UPSERT into the day-partitioned lake — the lake
    * form of t_upsert_merge's latest-wins semantics (the executor's
    * Updates-by-unique-key write path,
    * gotimer_executor/dao/task/task.go:42) and the MERGE INTO of the
    * Delta/Iceberg world, built from primitives:
    *
    *   1. the affected days are discovered from BOTH directions: the
    *      updates batch's own days (one distinct on the derived
    *      partition column — calendar-bounded collect, the BloomOps
    *      pattern) PLUS every day whose standing rows hold an updated
    *      key — a key created at 23:59 and updated at 00:10 spans two
    *      partitions, and missing the old one would leave a stale
    *      duplicate. The key→day lookup is a column-pruned (key, day)
    *      scan semi-joined against the batch's broadcast key set —
    *      the honest price of MERGE without a key index (Delta/Hudi
    *      pay it as file-level key stats / record-level indexes);
    *   2. ONLY those partitions of the base are read back in full (an
    *      isin filter on the partition column → directory pruning —
    *      the 99%+ of a 100 TB lake in untouched days is never fully
    *      opened);
    *   3. latest-wins per key across base ∪ updates: one window over
    *      (keyCols) ordered by (ordCol, src) with updates outranking
    *      base on ties — a single hash shuffle of the affected days
    *      only. The winner's day is recomputed from ITS ordCol, so a
    *      key moves with its latest version (writePartitioned's
    *      day = date(event time) invariant holds after every merge);
    *   4. the merged rows overwrite exactly the affected day
    *      directories via DYNAMIC partition overwrite (the same
    *      mechanism that makes the streaming sink exactly-once) —
    *      untouched partitions keep their files byte-for-byte. A day
    *      fully drained by keys migrating to newer days produces no
    *      output rows, which dynamic overwrite cannot express as a
    *      deletion — those directories are removed explicitly.
    *
    * `ordCol` is the event-time column that both orders a key's
    * versions and derives the day partition (the task store's ts
    * does both). Across equal ords the updates side wins, matching
    * Updates-after-insert replay.
    *
    * Returns the number of affected partitions (rewritten + drained).
    * UpsertSpec pins: result ≡ a full-lake recompute — including
    * cross-day version chains — and untouched day directories are
    * physically unmodified. */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], ordCol: String): Long = {
    import org.apache.spark.sql.expressions.Window
    val dayOf = date_format(col(ordCol), "yyyy-MM-dd")
    val upd = updates.withColumn("day", dayOf)
    val updDays = upd.select("day").distinct().collect().map(_.getString(0)).toSet
    if (updDays.isEmpty) return 0L
    val updKeys = upd.select(keyCols.map(col): _*).distinct()
    // partition-type inference reads `day` back as DATE — normalize
    // to the string form the rest of the merge uses
    val keyDays = read(spark, path)
      .select((keyCols :+ "day").map(col): _*)
      .join(broadcast(updKeys), keyCols, "left_semi")
      .select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val days = (updDays ++ keyDays).toSeq
    val base = read(spark, path).filter(col("day").isin(days: _*))
    val cols = base.columns.toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ordCol).desc, col("src").desc)
    val merged = base.withColumn("src", lit(0))
      .unionByName(upd.select(cols.map(col): _*).withColumn("src", lit(1)))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn", "src")
      .withColumn("day", dayOf)
    overwriteAffected(spark, path, merged, days.toSet)
    days.size.toLong
  }

  /** The hive name Spark gives the null-valued partition directory. */
  private val NullPart = "__HIVE_DEFAULT_PARTITION__"

  /** The shared copy-on-write tail of the MERGE family (upsert +
    * deleteWhere): materialize the rewritten rows BEFORE the write —
    * the plan reads the same path it overwrites, which Spark
    * (correctly) refuses lazily; copy-on-write means paying exactly
    * this one materialization of the affected partitions
    * (Delta/Iceberg pay it as new files + a metadata swap) — then
    * dynamically overwrite the day directories the rows land in, and
    * physically remove every affected day that produced NO rows
    * (dynamic overwrite cannot express an emptied partition). `days`
    * uses NullPart for the null partition, matching the directory
    * name Spark writes for a null day.
    *
    * CRASH-SAFETY CONTRACT (LakeLayoutSpec pins each clause): the
    * write itself rides Spark's staged commit protocol — tasks write
    * under `.spark-staging-<jobId>`/`_temporary` and job commit swaps
    * each matched day directory in via delete+rename — so a crash at
    * ANY point leaves every affected day either wholly old or wholly
    * new, never a mix of rows, and untouched days are never at risk.
    * What is NOT atomic, stated honestly (true multi-partition
    * atomicity needs a metadata layer — it is exactly the commit-log
    * swap Delta/Iceberg sell, and graft now ships it: ManifestLake
    * wraps the same merge semantics in a versioned manifest whose
    * single rename IS the commit, closing every window below —
    * ManifestLakeSpec crash-sims each one; use ManifestLake when a
    * takedown must be all-or-nothing across days):
    *   1. ACROSS days the commit is sequential: a mid-commit crash
    *      can leave some affected days new and others old;
    *   2. the drained-day removal runs AFTER the commit: a crash in
    *      between leaves a stale (pre-merge) day visible. Deleting
    *      before the write would flip the failure mode to data
    *      MISSING, which is strictly worse — stale-and-recoverable
    *      is the right side of that trade;
    *   3. a pre-commit crash leaves staging litter (invisible to
    *      readers; `vacuum` reclaims it past retention).
    * RECOVERY is re-running the same merge: upsert's latest-wins and
    * deleteWhere's predicate are idempotent, so a re-run from any
    * intermediate state converges to the full-merge result —
    * LakeLayoutSpec replays the worst intermediate states and checks
    * convergence. */
  private def overwriteAffected(spark: SparkSession, path: String,
      merged: DataFrame, days: Set[String]): Unit = {
    val out = merged.localCheckpoint(true)
    val outDays = out
      .select(coalesce(col("day").cast("string"), lit(NullPart)).as("d"))
      .distinct().collect().map(_.getString(0)).toSet
    out.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(path)
    val conf = spark.sparkContext.hadoopConfiguration
    (days -- outDays).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(path, s"day=$d")
      p.getFileSystem(conf).delete(p, true)
    }
  }

  /** Copy-on-write DELETE — the takedown / right-to-be-forgotten
    * pass every training-data lake must be able to run (a DMCA or
    * GDPR request names documents; the pipeline must physically
    * remove them, not just filter at read time), and the DELETE FROM
    * of the Delta/Iceberg world built from the same primitives as
    * upsert:
    *
    *   1. the affected days are discovered from the matching rows
    *      (one distinct on the partition column — calendar-bounded
    *      collect, the BloomOps pattern); a predicate matching
    *      nothing is a no-op that touches zero files;
    *   2. ONLY those partitions are read back and rewritten without
    *      the matching rows — the 99%+ of a 100 TB lake in untouched
    *      days is never opened, and untouched partitions keep their
    *      files byte-for-byte (spec-pinned on mtimes);
    *   3. NULL-evaluating predicates KEEP the row (SQL DELETE
    *      semantics: only rows where the predicate is TRUE go);
    *   4. a day whose every row matches is drained: dynamic overwrite
    *      cannot express an empty partition, so the directory is
    *      removed explicitly (same as upsert's migrated-away days).
    *
    * Returns the number of rows deleted. At 100 TB the matching-row
    * day discovery is the only full-table read, and it is a
    * column-pruned scan of (predicate columns + day) — with a
    * key-list takedown (the common case) the predicate is an isin/
    * semi-join against a broadcast id set, so the scan never
    * shuffles. The discovery pass also carries the per-day match
    * counts, so the deleted-row total costs no extra scan (review
    * r9). Reads go through the MERGED schema (readEvolved): a
    * single-footer read of a schema-evolved lake would silently drop
    * late-added columns from the rewritten partitions (review r9);
    * and rows in the NULL partition (day=__HIVE_DEFAULT_PARTITION__,
    * e.g. null event time) are deleted like any others — a GDPR pass
    * that silently skipped them would be wrong in the worst way
    * (review r9). */
  def deleteWhere(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): Long = {
    val hit = coalesce(predicate, lit(false))
    val matched = readEvolved(spark, path).filter(hit)
      .groupBy(coalesce(col("day").cast("string"), lit(NullPart)).as("d"))
      .count().collect()
    if (matched.isEmpty) return 0L
    val days = matched.map(_.getString(0)).toSet
    val deleted = matched.map(_.getLong(1)).sum
    val realDays = (days - NullPart).toSeq
    val dayMatch =
      if (days(NullPart)) col("day").isin(realDays: _*) || col("day").isNull
      else col("day").isin(realDays: _*)
    val kept = readEvolved(spark, path).filter(dayMatch).filter(!hit)
    overwriteAffected(spark, path, kept, days)
    deleted
  }

  /** Small-file compaction — the lake-maintenance job every
    * streaming ingest needs: each micro-batch of the file-sink
    * (eventStream's drop directory, the lake's per-day partitions)
    * leaves one-file-per-trigger litter, and a 100 TB table read
    * through millions of kilobyte files is throttled by open()/footer
    * costs, not bandwidth. Rewrite a directory into
    * ⌈bytes / targetFileBytes⌉ similarly-sized files: size from the
    * FILESYSTEM (not row counts — row width varies), coalesce when
    * only merging (no shuffle), repartition when splitting. Content
    * equality and file-count bound are spec-pinned; at 100 TB this
    * runs per-partition (compact day=D after the day closes), never
    * against the whole table at once. Crash-safety: the input dir is
    * never written — a crashed compaction leaves only committer
    * litter in outDir (no `_SUCCESS`, so nothing reads it as
    * committed) and is simply re-run; the caller's swap of outDir
    * into place should be a rename, not a copy. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    // a quiet day / not-yet-committed drop dir is a NO-OP, not a
    // crashed maintenance job (review r8)
    val df =
      try spark.read.parquet(inDir)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Unable to infer schema") => return 0L
      }
    // size the COMMITTED data: inputFiles is what the read actually
    // honors (file-sink _spark_metadata, hidden files excluded) —
    // getContentSummary would count transaction logs and orphaned
    // parts into the target (review r8)
    val conf = spark.sparkContext.hadoopConfiguration
    val bytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(conf).getFileStatus(p).getLen
    }.sum
    if (bytes == 0L) return 0L
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    // repartition takes an Int: past 2³¹ files the silent toInt wrap
    // would mis-size (or crash) the rewrite — fail with the real
    // numbers instead (ADVICE r8; a >2³¹-file rewrite means the
    // target size is wrong or the job should run per-partition)
    require(nFiles <= Int.MaxValue,
      s"compaction of $inDir needs $nFiles files ($bytes bytes at " +
        s"$targetFileBytes B/file) — exceeds Int.MaxValue; raise " +
        "targetFileBytes or compact per-partition")
    // repartition, NOT coalesce: coalesce pushes the partition cut
    // into the SCAN, so a 10k-file day would be read by nFiles tasks
    // (one, in the worst case); the round-robin shuffle costs one
    // pass over data that is being rewritten anyway and keeps the
    // read at full width (review r8)
    df.repartition(nFiles.toInt).write.mode("overwrite").parquet(outDir)
    nFiles
  }

  /** VACUUM — the other half of lake maintenance (compact merges what
    * is committed; vacuum removes what is NOT): physically delete
    * files under the table directory that the committed read does not
    * reference and that are older than `retentionMs`. The Delta/
    * Iceberg VACUUM analog built on the same source of truth the
    * readers use — `df.inputFiles`, which honors a file-sink's
    * `_spark_metadata` commit log — so an exactly-once sink's
    * uncommitted leftovers (a crashed trigger's orphaned part files,
    * `_temporary` litter from a killed batch job) are reclaimable
    * without ever touching a file a reader could see.
    *
    * Safety rails, in order:
    *   - metadata is never a candidate: anything whose path BELOW THE
    *     TABLE ROOT contains a `_`/`.`-prefixed segment
    *     (`_spark_metadata`, `_SUCCESS`, `.crc`) is kept — only
    *     segments under the root are judged, so a lake that merely
    *     LIVES under a dot-dir ancestor (`/root/.cache/lake`) still
    *     vacuums instead of silently no-opping — vacuum reclaims data bytes, it does not
    *     garbage-collect the commit log that defines committedness.
    *     The exceptions are `_temporary` (the Hadoop committer's
    *     staging dir) and `.spark-staging-*` (the dynamic
    *     partition-overwrite staging dir — the canonical litter of a
    *     crashed upsert/deleteWhere commit): a crashed job's staging
    *     files are the canonical orphans, reclaimable once past
    *     retention. Other dot files stay conservatively kept even
    *     though some are in-progress writes — they are invisible to
    *     every reader, so keeping them costs bytes, never
    *     correctness;
    *   - referenced files are never candidates (set-membership against
    *     inputFiles URIs);
    *   - `retentionMs` guards in-flight writers: a file younger than
    *     the retention may belong to a trigger that has not committed
    *     YET — deleting it would corrupt that commit. The default
    *     mirrors the common 7-day VACUUM floor; tests pass 0
    *     deliberately.
    *
    * Driver-side file listing is correct here for the same reason it
    * is in compact: at 100 TB vacuum runs per-partition (day=D), and
    * a partition's file count is operationally bounded by compaction.
    * Returns the deleted paths (empty when the dir does not exist —
    * a never-written partition is a no-op, not an error). */
  def vacuum(spark: SparkSession, path: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000,
      force: Boolean = false): Seq[String] = {
    // same retention floor as ManifestLake.vacuum (VERDICT r11 #8):
    // sub-floor retention can reap files an in-flight reader resolved
    // moments ago; refuse unless the caller forces a teardown.
    require(force || retentionMs >= ManifestLake.MinRetentionMs,
      s"vacuum: retentionMs $retentionMs is below the " +
        s"${ManifestLake.MinRetentionMs}ms floor; pass force = true " +
        "only for tests or deliberate teardown.")
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Seq.empty
    val committed: Set[String] =
      try spark.read.parquet(path).inputFiles
        .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Unable to infer schema") => Set.empty
      }
    val cutoff = System.currentTimeMillis() - retentionMs
    val rootAbs = fs.makeQualified(root).toUri.getPath.stripSuffix("/")
    val it = fs.listFiles(root, /* recursive = */ true)
    val deleted = Seq.newBuilder[String]
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath
      val rel = p.toUri.getPath
      // judge only the segments BELOW the table root: an ancestor
      // dot-dir in the lake's own path must not mark every file as
      // metadata (which would make vacuum a silent no-op)
      val below = rel.stripPrefix(rootAbs).stripPrefix("/")
      val isMetadata = below.split('/').exists(seg =>
        (seg.startsWith(".") && !seg.startsWith(".spark-staging")) ||
          (seg.startsWith("_") && seg != "_temporary"))
      if (!isMetadata && !committed.contains(rel) &&
          st.getModificationTime < cutoff) {
        fs.delete(p, false)
        deleted += rel
      }
    }
    deleted.result()
  }
}
