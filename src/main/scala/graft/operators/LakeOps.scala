package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sources.ManifestLake

/** The transactional lake's READ path under the DuckDB oracle (§2h):
  * the oracled queries elsewhere prove the OPERATORS; this one proves
  * the STORAGE tier returns exactly the base table under a predicate
  * — build a stats-indexed ManifestLake from the events table, read
  * it back through readWhere (manifest day pruning + per-file stats
  * skipping + the full filter), and hash-compare against DuckDB
  * evaluating the same predicate over the raw parquet. Any pruning
  * bug that drops a matching file/row breaks the hash; any leak of
  * lake bookkeeping (pday, NullPart markers) breaks the schema.
  *
  * The lake is built once per (session, dir) via SessionMemo (the
  * bpeTrainedMerges precedent — the artifact is the deployment shape:
  * ingest once, query many) with the production layout: hash-spread
  * ingest, then compactDay(clusterBy = user_id) so the uid conjunct
  * actually skips files (ManifestLakeStatsSpec/StatsProbe measure the
  * skipping; this query pins its CORRECTNESS against an independent
  * engine).
  */
object LakeOps {
  type Q = (SparkSession, String) => DataFrame

  private val lakeMemo = new SessionMemo[String]

  /** A fresh tmp dir for one oracle lake, keyed by the FULL (dir,
    * applicationId) identity via SHA-256 (ADVICE r11 #5: the previous
    * 32-bit hashCode key risked two concurrent JVM sessions colliding
    * onto — and fs.delete-ing — each other's lake dir, and
    * abs(Int.MinValue) stays negative). Deletes any stale residue. */
  private def freshLakeDir(s: SparkSession, dir: String,
      family: String): String = {
    val keySrc = dir + "|" + s.sparkContext.applicationId
    val key = java.security.MessageDigest.getInstance("SHA-256")
      .digest(keySrc.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    val out = s"${System.getProperty("java.io.tmpdir")}/$family/$key"
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    out
  }

  /** Build (once per session+dir) the oracle lake: events keyed by
    * ts-day, uid+ts indexed, clustered on uid. Lives under the JVM
    * tmpdir (freshLakeDir), so a dead session's lake is plain tmp
    * garbage. */
  private def statsLake(s: SparkSession, dir: String): String =
    lakeMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_oracle")
      ManifestLake.create(s, out, Tables.events(s, dir), "ts",
        filesPerDay = 4, statsCols = Seq("user_id", "ts"),
        bloomCols = Seq("user_id"))
      ManifestLake.snapshot(s, out).days.keys.foreach { d =>
        ManifestLake.compactDay(s, out, d, targetFileBytes = 8L * 1024 * 1024,
          clusterBy = Seq("user_id"))
      }
      out
    }

  /** Fixed predicate, valid at every sf (low uid band + a mid-month
    * day bound): day conjuncts prune directories, uid conjuncts prune
    * clustered files, NULL-ts rows fall out on both engines (the day
    * key is NULL there, and NULL never satisfies a comparison). */
  private val PrunePredicate =
    "user_id < 500 AND day >= '2024-01-10'"

  def lScanPrune(s: SparkSession, dir: String): DataFrame =
    ManifestLake.readWhere(s, statsLake(s, dir), PrunePredicate)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"), col("day"))

  /** Point-lookup flavor: an IN-list of uids that exist at every sf.
    * This is the bloom index's oracle — the uid hash-spreads across
    * every ingest file, so min/max cannot prune and the per-file
    * blooms carry the skipping; a bloom false NEGATIVE (the only
    * unsound failure a bloom can have) would drop rows and break the
    * hash here. */
  def lPointLookup(s: SparkSession, dir: String): DataFrame =
    ManifestLake.readWhere(s, statsLake(s, dir), "user_id IN (7, 11, 13)")
      .select(col("user_id"), col("event_id"), col("ts"),
        col("event_type"), col("value"), col("day"))

  private val historyMemo = new SessionMemo[String]

  /** Deterministic three-commit mutation history (once per
    * session+dir): v1 CREATE from events → v2 latest-wins UPSERT
    * (every user_id≡3 (mod 7) key re-arrives one day later as an
    * 'updated' row with value+100 — strictly newer ord, so the update
    * wins everywhere, and the +1-day shift moves each key ACROSS its
    * day partition, the cross-day version-chain case) → v3
    * copy-on-write DELETE of user_id≡0 (mod 5). Every step is
    * SQL-expressible, so the committed SNAPSHOTS themselves go under
    * the DuckDB hash oracle: v1 via time travel, v3 via head read,
    * and the v1→v3 net change feed via readChanges. */
  private def historyLake(s: SparkSession, dir: String): String =
    historyMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_history")
      val ev = Tables.events(s, dir)
      ManifestLake.create(s, out, ev, "ts", filesPerDay = 2)
      val upd = ev
        .filter(col("user_id") % 7 === 3 && col("ts").isNotNull)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 DAY"))
        .withColumn("event_type", lit("updated"))
        .withColumn("value", col("value") + lit(100.0))
      ManifestLake.upsert(s, out, upd, Seq("event_id"), "ts")
      ManifestLake.deleteWhere(s, out, col("user_id") % 5 === 0)
      out
    }

  private val histCols = Seq("event_id", "ts", "user_id", "event_type",
    "value", "props", "day")

  /** Time travel under the oracle: after two further commits mutated
    * the table, version 1 must still read as EXACTLY the base events
    * table — a versioned read that leaks any later generation (or
    * loses a pre-mutation row) breaks the hash. */
  def lTimeTravel(s: SparkSession, dir: String): DataFrame =
    ManifestLake.readVersion(s, historyLake(s, dir), 1L)
      .select(histCols.map(col): _*)

  /** The MERGE+DELETE head state under the oracle: latest-wins
    * upsert semantics (ord-desc winner, cross-day key moves, drained
    * days) and TRUE-only deletion, replayed independently by DuckDB
    * as plain SQL over the raw parquet. */
  def lMergeHead(s: SparkSession, dir: String): DataFrame =
    ManifestLake.read(s, historyLake(s, dir))
      .select(histCols.map(col): _*)

  /** The net change feed v1→head under the oracle: updates must
    * surface as delete+insert pairs, deletes as deletes, and rows
    * untouched by either commit must NOT appear (the manifest-level
    * day skip and the exceptAll cancellation both land here — a
    * rewritten-but-identical row leaking into the feed breaks the
    * hash). DuckDB replays it as the EXCEPT ALL diff of the two
    * snapshot states. */
  def lCdf(s: SparkSession, dir: String): DataFrame = {
    val lake = historyLake(s, dir)
    val head = ManifestLake.snapshot(s, lake).version
    ManifestLake.readChanges(s, lake, 1L, head)
      .select((histCols :+ "_change_type").map(col): _*)
  }

  /** The PER-COMMIT change feed under the oracle (r15 — Delta
    * readChangeFeed parity): the same v1→head window as l_cdf, but
    * walked version by version, every row tagged with the
    * `_commit_version` that produced it — the upsert's delete+insert
    * pairs attribute to v2, the takedown's deletes to v3, and a v3
    * delete of a v2-updated row carries the UPDATED values (it left
    * the v2 state, not v1's). DuckDB replays each commit's diff
    * independently and stacks them. `_commit_timestamp` rides the
    * real feed but is wall-clock (nondeterministic under a hash
    * oracle) — its correctness is pinned by spec instead:
    * ManifestLakeCdcSpec asserts it equals history()'s committed_at
    * for the same version, which readAsOf round-trips. */
  def lCdfMeta(s: SparkSession, dir: String): DataFrame = {
    val lake = historyLake(s, dir)
    val head = ManifestLake.snapshot(s, lake).version
    ManifestLake.readChangesPerCommit(s, lake, 1L, head)
      .select((histCols :+ "_change_type" :+ "_commit_version")
        .map(col): _*)
  }

  private val cdfUpdateMemo = new SessionMemo[String]

  /** A three-commit history purpose-built for the update-image feed
    * (r16 — kept SEPARATE from historyLake, whose head state five
    * other oracles hash against): v1 CREATE from events → v2 one
    * upsert that BOTH updates existing keys (the uid≡3 (mod 7) slice,
    * +1-day/+100 like the shared history) AND inserts brand-new keys
    * (event_id+3·10⁸ for uid∈[20,30]) — so one commit's diff carries
    * paired delete+insert rows AND unpaired inserts → v3 deleteWhere
    * uid≡0 (mod 5), unpaired deletes. All four change types in one
    * oracled window. */
  private def cdfUpdateLake(s: SparkSession, dir: String): String =
    cdfUpdateMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_cdf_update")
      val ev = Tables.events(s, dir)
      ManifestLake.create(s, out, ev, "ts", filesPerDay = 2)
      val upd = ev
        .filter(col("user_id") % 7 === 3 && col("ts").isNotNull)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 DAY"))
        .withColumn("event_type", lit("updated"))
        .withColumn("value", col("value") + lit(100.0))
      val fresh = ev
        .filter(col("user_id").between(20, 30) && col("ts").isNotNull)
        .withColumn("event_id", col("event_id") + lit(300000000L))
        .withColumn("event_type", lit("arrived"))
      ManifestLake.upsert(s, out, upd.unionByName(fresh),
        Seq("event_id"), "ts")
      ManifestLake.deleteWhere(s, out, col("user_id") % 5 === 0)
      out
    }

  /** The update-image change feed under the oracle (VERDICT r15 #2 —
    * Delta readChangeFeed's update_preimage/update_postimage parity):
    * the v1→head window walked per commit with updateKeys=event_id,
    * so v2's paired delete+insert rows retag as
    * update_preimage/update_postimage while v2's brand-new keys stay
    * plain inserts and v3's takedown rows stay plain deletes — and a
    * v3 delete of a v2-updated row must carry the UPDATED values.
    * DuckDB derives the identical pairing from the per-commit EXCEPT
    * ALL diffs: a key in both diff directions of one commit is an
    * update. A spurious pair (two unrelated rows fused), a missed
    * pair, or an image row with the wrong side's values all break the
    * hash. */
  def lCdfUpdate(s: SparkSession, dir: String): DataFrame = {
    val lake = cdfUpdateLake(s, dir)
    val head = ManifestLake.snapshot(s, lake).version
    ManifestLake.readChangesPerCommit(s, lake, 1L, head,
        updateKeys = Seq("event_id"))
      .select((histCols :+ "_change_type" :+ "_commit_version")
        .map(col): _*)
  }

  /** Incremental materialized-view maintenance off the change feed —
    * the production use case CDF exists for (Delta's "incremental
    * ETL" pattern): a per-user aggregate MV is computed ONCE at v1,
    * then brought to head by folding in readChanges(1, head) deltas
    * (insert = +1/+cents, delete = −1/−cents) through a group-keyed
    * merge — the base table is never re-scanned. Correctness of the
    * whole loop is oracled: the incrementally-maintained MV must
    * hash-equal DuckDB aggregating the replayed head state from
    * scratch. A feed row with the wrong sign, a lost update pair, or
    * a group that should have drained to zero and didn't all break
    * the hash.
    *
    * Exactness: counts and cent-sums are LONGS (ExactNum's integer
    * space), so delta application is exact integer arithmetic —
    * incremental ≡ recompute bit-for-bit, no float drift however
    * many deltas fold in. All-NULL-value groups stay NULL through
    * maintenance via a separately-maintained non-null count (a sum
    * incrementally reaching 0 contributions is indistinguishable
    * from an all-NULL group otherwise).
    *
    * Scale shape (100 TB): maintenance cost is O(|changes|) feed read
    * (untouched days cost zero IO by the manifest diff) + one shuffle
    * of the DELTA on the group key + a key-equi merge into the MV —
    * never a base-table scan; the same delta would MERGE INTO an MV
    * lake via mergeSink for the continuous variant. Count/sum/avg
    * are self-maintainable aggregates; min/max are not (a delete at
    * the extremum needs a rescan of that group) — the standard MV
    * maintenance taxonomy, documented rather than hidden. */
  def lIncrMv(s: SparkSession, dir: String): DataFrame = {
    val lake = historyLake(s, dir)
    val head = ManifestLake.snapshot(s, lake).version
    val mv1 = ManifestLake.readVersion(s, lake, 1L)
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"), count(col("value")).as("nn"),
        coalesce(sum(ExactNum.cents(col("value"))), lit(0L)).as("units"))
    val sign = when(col("_change_type") === "insert", 1L).otherwise(-1L)
    val delta = ManifestLake.readChanges(s, lake, 1L, head)
      .groupBy("user_id")
      .agg(sum(sign).as("dcnt"),
        coalesce(sum(sign * when(col("value").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as("dnn"),
        coalesce(sum(sign * ExactNum.cents(col("value"))), lit(0L)).as("dunits"))
    // null-safe key equality: a NULL group (the SQL GROUP BY NULL
    // group both engines form) must MERGE, not split into two rows
    mv1.as("m").join(delta.as("d"),
        col("m.user_id") <=> col("d.user_id"), "full_outer")
      .select(coalesce(col("m.user_id"), col("d.user_id")).as("user_id"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dcnt"), lit(0L))).as("cnt"),
        (coalesce(col("nn"), lit(0L)) + coalesce(col("dnn"), lit(0L))).as("nn"),
        (coalesce(col("units"), lit(0L)) + coalesce(col("dunits"), lit(0L))).as("units"))
      .filter(col("cnt") > 0)
      .select(col("user_id"), col("cnt"),
        when(col("nn") > 0, round(col("units") / 100.0, 4)).as("total"))
  }

  private val dvMemo = new SessionMemo[String]

  /** Merge-on-read lake (once per session+dir): create from events,
    * then ONE deletion-vector takedown of user_id≡2 (mod 7) — no day
    * is rewritten, the deletes live purely in the position sidecar
    * the read path anti-joins out. */
  private def dvLake(s: SparkSession, dir: String): String =
    dvMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_dv")
      ManifestLake.create(s, out, Tables.events(s, dir), "ts", filesPerDay = 2)
      ManifestLake.deleteWhereDV(s, out, col("user_id") % 7 === 2)
      out
    }

  /** The deletion-vector read path under the oracle: every surviving
    * row of a merge-on-read takedown, hash-compared against DuckDB
    * filtering the raw parquet. A position off by one (row-index
    * drift), a dropped anti-join, or a DV row leaking into the
    * result all break the hash; that ZERO data files were rewritten
    * is pinned by ManifestLakeDvSpec. */
  def lDvTakedown(s: SparkSession, dir: String): DataFrame =
    ManifestLake.read(s, dvLake(s, dir))
      .select(histCols.map(col): _*)

  /** Stats-pruned TIME TRAVEL under the oracle: the takedown-audit
    * query — readWhereAt against the PRE-delete version of the DV
    * lake must return the predicate's rows INCLUDING the ones the
    * later deletion vector removed (the audit's whole point), and
    * hash-equal DuckDB filtering the raw parquet. A version mix-up
    * (head DV state leaking into the historical read) silently drops
    * the deleted rows and breaks the hash. */
  def lAuditTravel(s: SparkSession, dir: String): DataFrame =
    ManifestLake.readWhereAt(s, dvLake(s, dir), 1L, "user_id < 40")
      .select(histCols.map(col): _*)

  private val mergeMemo = new SessionMemo[String]

  /** Generic-MERGE lake (once per session+dir): create from events,
    * then ONE mergeInto exercising all four clause families at once —
    * conditional matched UPDATE (uid even: event_type/value overwritten
    * from the source), conditional matched DELETE (uid ≡ 1 mod 4),
    * matched-no-clause (uid ≡ 3 mod 4: row must survive unchanged),
    * NOT-MATCHED INSERT (a disjoint-key slice, ts shifted +3 days →
    * new day dirs appended), and NOT-MATCHED-BY-SOURCE DELETE
    * (uid ≡ 6 mod 31 among unmatched rows). Every clause path lands
    * rows in the head state, so DuckDB can replay the whole decision
    * table independently. */
  private def mergeLake(s: SparkSession, dir: String): String =
    mergeMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_merge")
      val ev = Tables.events(s, dir)
      ManifestLake.create(s, out, ev, "ts", filesPerDay = 2)
      val src1 = ev.filter(col("user_id") % 9 === 4 && col("ts").isNotNull)
        .withColumn("event_type", lit("merged"))
        .withColumn("value", col("value") * 2)
      val src2 = ev.filter(col("user_id") % 9 === 5 && col("ts").isNotNull)
        .withColumn("event_id", col("event_id") + lit(100000000L))
        .withColumn("ts", col("ts") + expr("INTERVAL 3 DAY"))
        .withColumn("event_type", lit("inserted"))
      ManifestLake.mergeInto(s, out, src1.unionByName(src2),
        keyCols = Seq("event_id"), ordCol = "ts", clauses = Seq(
          ManifestLake.MatchedUpdate(
            Map("event_type" -> col("s.event_type"), "value" -> col("s.value")),
            cond = Some(expr("t.user_id % 2 = 0"))),
          ManifestLake.MatchedDelete(cond = Some(expr("t.user_id % 4 = 1"))),
          ManifestLake.NotMatchedInsert(),
          ManifestLake.NotMatchedBySourceDelete(
            cond = Some(expr("t.user_id % 31 = 6")))))
      out
    }

  /** The full MERGE decision table under the oracle: first-applicable
    * clause per row (update beats delete in caller order), unmatched
    * rows pass the by-source filter, inserts land day-appended —
    * DuckDB replays every branch as plain SQL over the raw parquet.
    * A precedence slip (delete before update on even uids), a clause
    * leaking to the wrong match side, or an insert duplicated into a
    * rewritten day all break the hash. */
  def lMergeClauses(s: SparkSession, dir: String): DataFrame =
    ManifestLake.read(s, mergeLake(s, dir))
      .select(histCols.map(col): _*)

  private val restoreMemo = new SessionMemo[String]

  /** RESTORE lake (once per session+dir): create (v1) → copy-on-write
    * DELETE of uid ≡ 0 (mod 5) (v2, the "bad takedown") → restore(1)
    * (v3 — the rollback) → latest-wins upsert of the uid ≡ 3 (mod 7)
    * slice, ts+1 day (v4). Head must show the upsert applied to the
    * FULL pre-delete table: if restore leaked any of v2's deletions,
    * the mod-5 rows are missing and the hash breaks; if it replayed
    * data instead of re-pointing, the upsert's cross-day moves break
    * row counts. */
  private def restoreLake(s: SparkSession, dir: String): String =
    restoreMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_restore")
      val ev = Tables.events(s, dir)
      ManifestLake.create(s, out, ev, "ts", filesPerDay = 2)
      ManifestLake.deleteWhere(s, out, col("user_id") % 5 === 0)
      ManifestLake.restore(s, out, 1L)
      val upd = ev
        .filter(col("user_id") % 7 === 3 && col("ts").isNotNull)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 DAY"))
        .withColumn("event_type", lit("updated"))
        .withColumn("value", col("value") + lit(100.0))
      ManifestLake.upsert(s, out, upd, Seq("event_id"), "ts")
      out
    }

  /** Rollback-then-write-on-top under the oracle (see restoreLake). */
  def lRestore(s: SparkSession, dir: String): DataFrame =
    ManifestLake.read(s, restoreLake(s, dir))
      .select(histCols.map(col): _*)

  private val mappingMemo = new SessionMemo[String]

  /** Column-mapping ladder under the oracle (once per session+dir):
    * v1 CREATE from events → v2 RENAME value→score (metadata-only;
    * physical name stays "value" in every file) → v3 DROP props
    * (metadata-only; bytes stay for time travel) → v4 latest-wins
    * UPSERT through the NEW names (user_id≡3 (mod 7) re-arrives one
    * day later, score+100 — the write path must land "score" under
    * the stored physical "value" or old and new rows split into two
    * columns) → compactDay clustered on "score" (the logical→physical
    * translation inside compaction). The head read then crosses the
    * mapping in BOTH directions — old files and new files under one
    * logical schema — and DuckDB replays it as plain aliases over the
    * raw parquet: any physical/logical confusion (NULL column, split
    * column, resurrected props) breaks the hash. */
  private def mappingLake(s: SparkSession, dir: String): String =
    mappingMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_mapping")
      val ev = Tables.events(s, dir)
      ManifestLake.create(s, out, ev, "ts", filesPerDay = 2)
      ManifestLake.renameColumn(s, out, "value", "score")
      ManifestLake.dropColumn(s, out, "props")
      val upd = ev
        .filter(col("user_id") % 7 === 3 && col("ts").isNotNull)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 DAY"))
        .withColumn("event_type", lit("updated"))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), (col("value") + lit(100.0)).as("score"))
      ManifestLake.upsert(s, out, upd, Seq("event_id"), "ts")
      val days = ManifestLake.snapshot(s, out).days.keys.toSeq.sorted
      days.headOption.foreach { d =>
        ManifestLake.compactDay(s, out, d, clusterBy = Seq("score"))
      }
      out
    }

  /** ALTER TABLE RENAME/DROP COLUMN under the oracle (see
    * mappingLake). */
  def lRenameRead(s: SparkSession, dir: String): DataFrame =
    ManifestLake.read(s, mappingLake(s, dir))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("score"), col("day"))

  /** Time travel ACROSS the mapping edits: version 1 predates the
    * rename and the drop, so it must read under the ORIGINAL names —
    * value (not score) AND props (dropped at head, bytes still live) —
    * and hash-equal the raw base table. A mapping that leaked head
    * logical names into a historical read, or whose drop deleted
    * bytes, breaks schema or hash here. */
  def lMappingTravel(s: SparkSession, dir: String): DataFrame =
    ManifestLake.readVersion(s, mappingLake(s, dir), 1L)
      .select(histCols.map(col): _*)

  /** TIMESTAMP AS OF under the oracle (r13): resolve the instant of
    * v1's commit from the lake's own history() ledger — self-timing,
    * so the query is deterministic on any box — and the readAsOf
    * snapshot must hash-match exactly what the VERSIONED read answers
    * for v1 (the l_time_travel content, reached through the timestamp
    * resolver: monotone-adjusted commit mtimes, latest at-or-before). */
  def lAsofTravel(s: SparkSession, dir: String): DataFrame = {
    val lake = historyLake(s, dir)
    val t1 = ManifestLake.history(s, lake)
      .filter(col("version") === 1L).head()
      .getAs[java.sql.Timestamp]("committed_at")
    ManifestLake.readAsOf(s, lake, t1)
      .select(histCols.map(col): _*)
  }

  /** The FRONT-DOOR routes under the oracle (VERDICT r13 #1): the
    * identical v1 snapshot l_time_travel pins, reached through
    * `spark.read.format("graft-lake").option("versionAsOf", 1)` —
    * exercising the DataSourceRegister → RelationProvider →
    * ResolveLakeRelation inlining chain end-to-end. LakeFormatSpec
    * pins that this route plans the SAME pruned scan as the API
    * route (plan-shape equality), so the format path adds resolution
    * cost only: one manifest read at analysis, nothing per-file. */
  def lFormatRead(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft-lake").option("versionAsOf", "1")
      .load(historyLake(s, dir))
      .select(histCols.map(col): _*)

  /** SQL front door for time travel (VERDICT r13 #1): resolve v1's
    * commit instant from history(), then reach the snapshot through
    * real SQL — `FROM `graft-lake`.`path` TIMESTAMP AS OF t` — the
    * hints-batch ResolveLakeRelation rewrite (the built-in resolvers
    * only serve v2 catalog tables here). Same oracle as the API
    * route: hash-equality of the addressed snapshot. */
  def lSqlTravel(s: SparkSession, dir: String): DataFrame = {
    val lake = historyLake(s, dir)
    val t1 = ManifestLake.history(s, lake)
      .filter(col("version") === 1L).head()
      .getAs[java.sql.Timestamp]("committed_at")
    s.sql(
      s"""SELECT ${histCols.mkString(", ")}
         |FROM `graft-lake`.`$lake` TIMESTAMP AS OF '$t1'""".stripMargin)
  }

  private val sqlDmlMemo = new SessionMemo[String]

  /** A lake mutated ENTIRELY through the SQL DML front door (r14):
    * v1 CREATE from events → v2 `UPDATE … SET ts = ts + INTERVAL 1
    * DAY, event_type, value WHERE user_id≡3 (mod 7)` (the assignment
    * touches the ord column, so updated rows MOVE across day
    * partitions — the cross-day CoW path under SQL) → v3 `DELETE FROM
    * … WHERE user_id≡0 (mod 5)` → v4 `INSERT INTO … SELECT` of a
    * shifted-id slice (positional alignment + day derivation at the
    * write path). Every statement routes through ResolveLakeRelation's
    * DML pre-pass into the SAME transactional APIs the programmatic
    * route uses; DuckDB replays the statements as plain SQL over the
    * raw parquet, so a mistranslated predicate, a lost cross-day
    * move, or a misaligned insert breaks the hash. */
  private def sqlDmlLake(s: SparkSession, dir: String): String =
    sqlDmlMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_sqldml")
      ManifestLake.create(s, out, Tables.events(s, dir), "ts",
        filesPerDay = 2)
      s.sql(s"UPDATE `graft-lake`.`$out` SET ts = ts + INTERVAL 1 DAY, " +
        "event_type = 'updated', value = value + 100.0 " +
        "WHERE user_id % 7 = 3 AND ts IS NOT NULL")
      s.sql(s"DELETE FROM `graft-lake`.`$out` WHERE user_id % 5 = 0")
      Tables.events(s, dir).createOrReplaceTempView("graft_sqldml_base")
      s.sql(s"INSERT INTO `graft-lake`.`$out` " +
        "SELECT event_id + 100000000, ts, user_id, 'migrated', value, " +
        "props FROM graft_sqldml_base " +
        "WHERE user_id BETWEEN 100 AND 140 AND ts IS NOT NULL")
      out
    }

  /** The SQL-DML head state under the oracle (see sqlDmlLake); the
    * read itself also goes through the SQL identifier route. */
  def lSqlDml(s: SparkSession, dir: String): DataFrame = {
    val lake = sqlDmlLake(s, dir)
    s.sql(s"SELECT ${histCols.mkString(", ")} " +
      s"FROM `graft-lake`.`$lake`")
  }

  private val sqlMergeMemo = new SessionMemo[String]

  /** SQL `MERGE INTO` across all three clause families (r14): the
    * source is the historyLake update slice (user_id≡3 (mod 7), ts+1
    * day, value+100) plus a shifted-id insert slice; the statement
    * exercises guarded MATCHED DELETE (first-clause precedence),
    * MATCHED UPDATE through s.-qualified assignments, NOT MATCHED
    * INSERT *, and a guarded NOT MATCHED BY SOURCE UPDATE — the full
    * Delta MERGE grammar mapped onto mergeInto's clause algebra.
    * DuckDB replays it as one LEFT JOIN + CASE cascade + UNION ALL. */
  private def sqlMergeLake(s: SparkSession, dir: String): String =
    sqlMergeMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_sqlmerge")
      val ev = Tables.events(s, dir)
      ManifestLake.create(s, out, ev, "ts", filesPerDay = 2)
      val src = ev
        .filter(col("user_id") % 7 === 3 && col("ts").isNotNull)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 DAY"))
        .withColumn("event_type", lit("updated"))
        .withColumn("value", col("value") + lit(100.0))
        .unionByName(ev
          .filter(col("user_id").between(50, 60) && col("ts").isNotNull)
          .withColumn("event_id", col("event_id") + lit(200000000L))
          .withColumn("event_type", lit("new")))
      src.createOrReplaceTempView("graft_sqlmerge_src")
      s.sql(
        s"""MERGE INTO `graft-lake`.`$out` t
           |USING graft_sqlmerge_src s
           |ON t.event_id = s.event_id
           |WHEN MATCHED AND t.user_id % 2 = 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE
           |  SET ts = s.ts, event_type = s.event_type, value = s.value
           |WHEN NOT MATCHED THEN INSERT *
           |WHEN NOT MATCHED BY SOURCE AND t.user_id % 11 = 0
           |  THEN UPDATE SET event_type = 'stale'
           |""".stripMargin)
      out
    }

  private val catalogMemo = new SessionMemo[String]

  /** The CATALOG route under the oracle (r15, VERDICT r14 #3): a
    * warehouse registered as the real V2 `graft` catalog
    * (spark.sql.catalog.graft = GraftCatalog + its warehouse option —
    * the ONLY confs set), a named table created through catalog-form
    * SQL (`CREATE TABLE graft.oracle.events_t … AS SELECT`), verified
    * visible through the catalog surface itself (SHOW TABLES), then
    * read back through the 3-part name. The read resolves through the
    * hints rule BEFORE catalog resolution — the same plan the path
    * route builds (GraftCatalogSpec pins the string equality); this
    * oracle pins the VALUES end-to-end: registration + warehouse
    * convention + CTAS + named read must reproduce the raw base table
    * bit-for-bit. Confs are restored after analysis (the inlined plan
    * no longer needs them), so the oracle leaves no session residue. */
  private def catalogLake(s: SparkSession, dir: String): String =
    catalogMemo.getOrElseUpdate(s, dir) {
      val wh = freshLakeDir(s, dir, "graft_lake_cat_wh")
      withCatalogConf(s, wh) {
        val ev = Tables.events(s, dir)
        // the load splits across BOTH catalog write doors and the
        // oracle hashes their union against the untouched base table
        // (r16, VERDICT r15 #3): the even-uid slice lands via CTAS —
        // also fixing the table's schema — and the complement (odd +
        // NULL uid) via the DataFrameWriterV2 route,
        // df.writeTo(...).append(), which bridges onto the lake's
        // append transaction. Any writeTo row lost, duplicated, or
        // day-misderived breaks l_catalog_read's hash.
        val evenSide = ev.filter(coalesce(col("user_id") % 2 === 0,
          lit(false)))
        evenSide.createOrReplaceTempView("graft_cat_base")
        s.sql("CREATE TABLE graft.oracle.events_t " +
          "OPTIONS ('ordCol' 'ts') AS SELECT * FROM graft_cat_base")
        ev.filter(!coalesce(col("user_id") % 2 === 0, lit(false)))
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
          .writeTo("graft.oracle.events_t").append()
        require(s.sql("SHOW TABLES IN graft.oracle").collect()
          .map(_.getString(1)).toSeq == Seq("events_t"),
          "catalog did not list the created table")
      }
      wh
    }

  private def withCatalogConf[A](s: SparkSession, wh: String)(
      body: => A): A = {
    val prevCat = s.conf.getOption("spark.sql.catalog.graft")
    val prevWh = s.conf.getOption("spark.sql.catalog.graft.warehouse")
    s.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    try body
    finally {
      prevCat.fold(s.conf.unset("spark.sql.catalog.graft"))(
        s.conf.set("spark.sql.catalog.graft", _))
      prevWh.fold(s.conf.unset("spark.sql.catalog.graft.warehouse"))(
        s.conf.set("spark.sql.catalog.graft.warehouse", _))
    }
  }

  def lCatalogRead(s: SparkSession, dir: String): DataFrame = {
    val wh = catalogLake(s, dir)
    withCatalogConf(s, wh) {
      // analysis happens inside sql() — the returned plan carries the
      // inlined pruned scan and survives the conf restore
      s.sql(s"SELECT ${histCols.mkString(", ")} " +
        "FROM graft.oracle.events_t")
    }
  }

  /** The SQL MERGE head state under the oracle (see sqlMergeLake). */
  def lSqlMerge(s: SparkSession, dir: String): DataFrame = {
    val lake = sqlMergeLake(s, dir)
    s.sql(s"SELECT ${histCols.mkString(", ")} " +
      s"FROM `graft-lake`.`$lake`")
  }

  private val replaceMemo = new SessionMemo[String]

  /** Predicate-overwrite lake (r17, VERDICT r16 #3 — Delta's
    * replaceWhere): v1 CREATE from events → v2 the SQL door —
    * `INSERT INTO … REPLACE WHERE user_id BETWEEN 100 AND 199` with
    * the band's 'backfilled' re-derivation (value+50; the band's
    * NULL-ts rows are DELETED and not re-inserted — replace
    * semantics, not update) → v3 the writer-option door —
    * `mode("overwrite").option("replaceWhere", "day >= '2024-01-20'")`
    * reloading the tail days from base (event_type='reloaded', which
    * also overwrites v2's backfill inside the overlap band∩tail — the
    * two replaces COMPOSE). Both doors land on the same one-commit
    * deleteWhere+append transaction; DuckDB replays each replace as
    * delete-then-insert over the raw parquet, so a row leaking
    * through the predicate, a batch row landing outside it, or a
    * half-applied (non-atomic) replace breaks the hash. */
  private def replaceLake(s: SparkSession, dir: String): String =
    replaceMemo.getOrElseUpdate(s, dir) {
      val out = freshLakeDir(s, dir, "graft_lake_replace")
      val ev = Tables.events(s, dir)
      ManifestLake.create(s, out, ev, "ts", filesPerDay = 2)
      ev.filter(col("user_id").between(100, 199) && col("ts").isNotNull)
        .withColumn("event_type", lit("backfilled"))
        .withColumn("value", col("value") + lit(50.0))
        .createOrReplaceTempView("graft_replace_src")
      s.sql(s"INSERT INTO `graft-lake`.`$out` REPLACE WHERE " +
        "user_id BETWEEN 100 AND 199 SELECT * FROM graft_replace_src")
      ev.filter(col("ts").isNotNull &&
          date_format(col("ts"), "yyyy-MM-dd") >= "2024-01-20")
        .withColumn("event_type", lit("reloaded"))
        .write.format("graft-lake").mode("overwrite")
        .option("ordCol", "ts")
        .option("replaceWhere", "day >= '2024-01-20'")
        .save(out)
      out
    }

  /** The composed predicate-overwrite head state under the oracle
    * (see replaceLake); the read goes through the SQL identifier
    * route like l_sql_dml. */
  def lReplaceWhere(s: SparkSession, dir: String): DataFrame = {
    val lake = replaceLake(s, dir)
    s.sql(s"SELECT ${histCols.mkString(", ")} " +
      s"FROM `graft-lake`.`$lake`")
  }

  val queries: ListMap[String, Q] = ListMap(
    "l_scan_prune" -> (lScanPrune _),
    "l_point_lookup" -> (lPointLookup _),
    "l_time_travel" -> (lTimeTravel _),
    "l_asof_travel" -> (lAsofTravel _),
    "l_format_read" -> (lFormatRead _),
    "l_sql_travel" -> (lSqlTravel _),
    "l_sql_dml" -> (lSqlDml _),
    "l_sql_merge" -> (lSqlMerge _),
    "l_catalog_read" -> (lCatalogRead _),
    "l_merge_head" -> (lMergeHead _),
    "l_cdf" -> (lCdf _),
    "l_cdf_meta" -> (lCdfMeta _),
    "l_cdf_update" -> (lCdfUpdate _),
    "l_incr_mv" -> (lIncrMv _),
    "l_dv_takedown" -> (lDvTakedown _),
    "l_audit_travel" -> (lAuditTravel _),
    "l_merge_clauses" -> (lMergeClauses _),
    "l_restore" -> (lRestore _),
    "l_rename_read" -> (lRenameRead _),
    "l_mapping_travel" -> (lMappingTravel _),
    "l_replace_where" -> (lReplaceWhere _),
  )

  val oracles: ListMap[String, String] = ListMap(
    "l_scan_prune" ->
      s"""SELECT user_id, event_id, ts, event_type, value,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events
         |WHERE user_id < 500 AND strftime(ts, '%Y-%m-%d') >= '2024-01-10'
         |ORDER BY user_id, event_id, ts""".stripMargin,
    "l_point_lookup" ->
      s"""SELECT user_id, event_id, ts, event_type, value,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events
         |WHERE user_id IN (7, 11, 13)
         |ORDER BY user_id, event_id, ts""".stripMargin,
    "l_time_travel" ->
      s"""SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events
         |ORDER BY event_id""".stripMargin,
    // readAsOf(v1's commit instant) must answer the SAME state as the
    // versioned v1 read — one oracle text, two addressing paths
    "l_asof_travel" ->
      s"""SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events
         |ORDER BY event_id""".stripMargin,
    // the same v1 snapshot through the two front doors: the reader
    // options route and the SQL TIMESTAMP AS OF route must both
    // hash-equal the raw base table
    "l_format_read" ->
      s"""SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events
         |ORDER BY event_id""".stripMargin,
    "l_sql_travel" ->
      s"""SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events
         |ORDER BY event_id""".stripMargin,
    // the catalog-route CTAS + named read must reproduce the raw
    // base table exactly — registration/warehouse/CTAS/resolution all
    // in the loop, values under the hash
    "l_catalog_read" ->
      s"""SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events
         |ORDER BY event_id""".stripMargin,
    // replay of the SQL DML ladder: UPDATE (ord-col assignment →
    // cross-day moves) → DELETE → INSERT of a shifted-id slice
    "l_sql_dml" ->
      s"""WITH upd AS (
         |  SELECT event_id,
         |    CASE WHEN user_id % 7 = 3 AND ts IS NOT NULL
         |         THEN ts + INTERVAL 1 DAY ELSE ts END AS ts,
         |    user_id,
         |    CASE WHEN user_id % 7 = 3 AND ts IS NOT NULL
         |         THEN 'updated' ELSE event_type END AS event_type,
         |    CASE WHEN user_id % 7 = 3 AND ts IS NOT NULL
         |         THEN value + 100.0 ELSE value END AS value,
         |    props
         |  FROM events
         |), del AS (
         |  SELECT * FROM upd WHERE NOT coalesce(user_id % 5 = 0, FALSE)
         |), ins AS (
         |  SELECT event_id + 100000000 AS event_id, ts, user_id,
         |    'migrated' AS event_type, value, props
         |  FROM events
         |  WHERE user_id BETWEEN 100 AND 140 AND ts IS NOT NULL
         |)
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM (SELECT * FROM del UNION ALL SELECT * FROM ins)
         |ORDER BY event_id""".stripMargin,
    // replay of the SQL MERGE: guarded matched-delete wins first,
    // matched-update takes the source row, unmatched source inserts,
    // guarded by-source update goes 'stale'
    "l_sql_merge" ->
      s"""WITH src1 AS (
         |  SELECT event_id, ts + INTERVAL 1 DAY AS ts, user_id,
         |    'updated' AS event_type, value + 100.0 AS value, props
         |  FROM events WHERE user_id % 7 = 3 AND ts IS NOT NULL
         |), src2 AS (
         |  SELECT event_id + 200000000 AS event_id, ts, user_id,
         |    'new' AS event_type, value, props
         |  FROM events WHERE user_id BETWEEN 50 AND 60 AND ts IS NOT NULL
         |), tgt AS (
         |  SELECT t.event_id,
         |    CASE WHEN s.event_id IS NOT NULL THEN s.ts ELSE t.ts END AS ts,
         |    t.user_id,
         |    CASE WHEN s.event_id IS NOT NULL THEN s.event_type
         |         WHEN coalesce(t.user_id % 11 = 0, FALSE) THEN 'stale'
         |         ELSE t.event_type END AS event_type,
         |    CASE WHEN s.event_id IS NOT NULL THEN s.value
         |         ELSE t.value END AS value,
         |    t.props
         |  FROM events t LEFT JOIN src1 s USING (event_id)
         |  WHERE NOT (s.event_id IS NOT NULL
         |             AND coalesce(t.user_id % 2 = 0, FALSE))
         |)
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM (SELECT * FROM tgt UNION ALL SELECT * FROM src2)
         |ORDER BY event_id""".stripMargin,
    "l_merge_head" ->
      s"""WITH merged AS (
         |  SELECT event_id, ts + INTERVAL 1 DAY AS ts, user_id,
         |         'updated' AS event_type, value + 100.0 AS value, props
         |  FROM events WHERE user_id % 7 = 3 AND ts IS NOT NULL
         |  UNION ALL
         |  SELECT event_id, ts, user_id, event_type, value, props
         |  FROM events WHERE NOT (user_id % 7 = 3 AND ts IS NOT NULL)
         |)
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM merged
         |WHERE NOT coalesce(user_id % 5 = 0, FALSE)
         |ORDER BY event_id""".stripMargin,
    "l_cdf" ->
      s"""WITH v1 AS (
         |  SELECT event_id, ts, user_id, event_type, value, props FROM events
         |), head AS (
         |  SELECT event_id, ts + INTERVAL 1 DAY AS ts, user_id,
         |         'updated' AS event_type, value + 100.0 AS value, props
         |  FROM events
         |  WHERE user_id % 7 = 3 AND ts IS NOT NULL
         |    AND NOT coalesce(user_id % 5 = 0, FALSE)
         |  UNION ALL
         |  SELECT event_id, ts, user_id, event_type, value, props
         |  FROM events
         |  WHERE NOT (user_id % 7 = 3 AND ts IS NOT NULL)
         |    AND NOT coalesce(user_id % 5 = 0, FALSE)
         |), ins AS (SELECT * FROM head EXCEPT ALL SELECT * FROM v1),
         |   del AS (SELECT * FROM v1 EXCEPT ALL SELECT * FROM head)
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day, 'insert' AS _change_type FROM ins
         |UNION ALL
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day, 'delete' AS _change_type FROM del
         |ORDER BY _change_type, event_id""".stripMargin,
    // per-commit replay: v2 = the upsert's diff against v1 (both
    // directions of the EXCEPT ALL), v3 = the takedown's deletes OUT
    // OF THE V2 STATE (an updated-then-deleted row must carry the
    // updated values, attributed to v3)
    "l_cdf_meta" ->
      s"""WITH v1 AS (
         |  SELECT event_id, ts, user_id, event_type, value, props FROM events
         |), v2 AS (
         |  SELECT event_id, ts + INTERVAL 1 DAY AS ts, user_id,
         |         'updated' AS event_type, value + 100.0 AS value, props
         |  FROM events WHERE user_id % 7 = 3 AND ts IS NOT NULL
         |  UNION ALL
         |  SELECT event_id, ts, user_id, event_type, value, props
         |  FROM events WHERE NOT (user_id % 7 = 3 AND ts IS NOT NULL)
         |), c2i AS (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1),
         |   c2d AS (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2),
         |   c3d AS (SELECT * FROM v2 WHERE coalesce(user_id % 5 = 0, FALSE))
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day, 'insert' AS _change_type,
         |  CAST(2 AS BIGINT) AS _commit_version FROM c2i
         |UNION ALL
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day, 'delete' AS _change_type,
         |  CAST(2 AS BIGINT) AS _commit_version FROM c2d
         |UNION ALL
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day, 'delete' AS _change_type,
         |  CAST(3 AS BIGINT) AS _commit_version FROM c3d
         |ORDER BY _commit_version, _change_type, event_id""".stripMargin,
    // per-commit replay WITH update pairing: v2's diff keys present in
    // BOTH directions become update_pre/postimage; v2's brand-new keys
    // (the +3e8 slice) stay inserts; v3's takedown rows stay deletes,
    // carrying the v2 state's values
    "l_cdf_update" ->
      s"""WITH v1 AS (
         |  SELECT event_id, ts, user_id, event_type, value, props FROM events
         |), v2 AS (
         |  SELECT event_id, ts + INTERVAL 1 DAY AS ts, user_id,
         |         'updated' AS event_type, value + 100.0 AS value, props
         |  FROM events WHERE user_id % 7 = 3 AND ts IS NOT NULL
         |  UNION ALL
         |  SELECT event_id, ts, user_id, event_type, value, props
         |  FROM events WHERE NOT (user_id % 7 = 3 AND ts IS NOT NULL)
         |  UNION ALL
         |  SELECT event_id + 300000000 AS event_id, ts, user_id,
         |         'arrived' AS event_type, value, props
         |  FROM events WHERE user_id BETWEEN 20 AND 30 AND ts IS NOT NULL
         |), c2i AS (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1),
         |   c2d AS (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2),
         |   pk AS (SELECT event_id FROM c2i
         |          INTERSECT SELECT event_id FROM c2d),
         |   c3d AS (SELECT * FROM v2 WHERE coalesce(user_id % 5 = 0, FALSE))
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day,
         |  CASE WHEN event_id IN (SELECT event_id FROM pk)
         |       THEN 'update_postimage' ELSE 'insert' END AS _change_type,
         |  CAST(2 AS BIGINT) AS _commit_version FROM c2i
         |UNION ALL
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day,
         |  CASE WHEN event_id IN (SELECT event_id FROM pk)
         |       THEN 'update_preimage' ELSE 'delete' END AS _change_type,
         |  CAST(2 AS BIGINT) AS _commit_version FROM c2d
         |UNION ALL
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day, 'delete' AS _change_type,
         |  CAST(3 AS BIGINT) AS _commit_version FROM c3d
         |ORDER BY _commit_version, _change_type, event_id""".stripMargin,
    // the incrementally-maintained MV must equal a from-scratch
    // aggregate of the replayed head state (same merged CTE as
    // l_merge_head); sum via the cents mirror (ExactNum.sum4)
    "l_incr_mv" ->
      s"""WITH merged AS (
         |  SELECT event_id, ts + INTERVAL 1 DAY AS ts, user_id,
         |         'updated' AS event_type, value + 100.0 AS value, props
         |  FROM events WHERE user_id % 7 = 3 AND ts IS NOT NULL
         |  UNION ALL
         |  SELECT event_id, ts, user_id, event_type, value, props
         |  FROM events WHERE NOT (user_id % 7 = 3 AND ts IS NOT NULL)
         |)
         |SELECT user_id, count(*) AS cnt,
         |  round(sum(CAST(round(value*100, 0) AS BIGINT)) / 100.0, 4) AS total
         |FROM merged
         |WHERE NOT coalesce(user_id % 5 = 0, FALSE)
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin,
    "l_dv_takedown" ->
      s"""SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events
         |WHERE NOT coalesce(user_id % 7 = 2, FALSE)
         |ORDER BY event_id""".stripMargin,
    "l_audit_travel" ->
      s"""SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events
         |WHERE user_id < 40
         |ORDER BY event_id""".stripMargin,
    // the MERGE decision table replayed branch by branch: matched rows
    // (the uid%9=4 slice IS the src1 key set) split update/delete/kept
    // by first-applicable clause; unmatched rows pass the by-source
    // delete; the shifted-key slice inserts
    "l_merge_clauses" ->
      s"""WITH matched AS (
         |  SELECT event_id, ts, user_id, event_type, value, props
         |  FROM events WHERE user_id % 9 = 4 AND ts IS NOT NULL
         |), upd AS (
         |  SELECT event_id, ts, user_id, 'merged' AS event_type,
         |         value * 2 AS value, props
         |  FROM matched WHERE user_id % 2 = 0
         |), kept_m AS (
         |  SELECT * FROM matched
         |  WHERE user_id % 2 <> 0 AND user_id % 4 <> 1
         |), unmatched AS (
         |  SELECT event_id, ts, user_id, event_type, value, props
         |  FROM events
         |  WHERE NOT (user_id % 9 = 4 AND ts IS NOT NULL)
         |    AND NOT coalesce(user_id % 31 = 6, FALSE)
         |), ins AS (
         |  SELECT event_id + 100000000 AS event_id,
         |         ts + INTERVAL 3 DAY AS ts, user_id,
         |         'inserted' AS event_type, value, props
         |  FROM events WHERE user_id % 9 = 5 AND ts IS NOT NULL
         |), merged AS (
         |  SELECT * FROM upd UNION ALL SELECT * FROM kept_m
         |  UNION ALL SELECT * FROM unmatched UNION ALL SELECT * FROM ins
         |)
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM merged ORDER BY event_id""".stripMargin,
    // restore undid the mod-5 delete entirely, so the head replay is
    // the upsert alone over the FULL base table
    "l_restore" ->
      s"""WITH merged AS (
         |  SELECT event_id, ts + INTERVAL 1 DAY AS ts, user_id,
         |         'updated' AS event_type, value + 100.0 AS value, props
         |  FROM events WHERE user_id % 7 = 3 AND ts IS NOT NULL
         |  UNION ALL
         |  SELECT event_id, ts, user_id, event_type, value, props
         |  FROM events WHERE NOT (user_id % 7 = 3 AND ts IS NOT NULL)
         |)
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM merged ORDER BY event_id""".stripMargin,
    // time travel across the mapping edits: v1 IS the base table under
    // its ORIGINAL names (value, props) — identical oracle shape to
    // l_time_travel, but the versioned read now has to pick the
    // PRE-rename logical schema out of the v1 checkpoint
    "l_mapping_travel" ->
      s"""SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM events ORDER BY event_id""".stripMargin,
    // rename/drop are metadata-only on the lake side, so the oracle is
    // the same latest-wins replay with the rename applied as an ALIAS
    // and props simply not selected — if the engine's logical→physical
    // translation leaked anywhere (NULL score on old files, a split
    // column after the upsert, props resurrected), the hash breaks
    "l_rename_read" ->
      s"""WITH merged AS (
         |  SELECT event_id, ts + INTERVAL 1 DAY AS ts, user_id,
         |         'updated' AS event_type, value + 100.0 AS score
         |  FROM events WHERE user_id % 7 = 3 AND ts IS NOT NULL
         |  UNION ALL
         |  SELECT event_id, ts, user_id, event_type, value AS score
         |  FROM events WHERE NOT (user_id % 7 = 3 AND ts IS NOT NULL)
         |)
         |SELECT event_id, ts, user_id, event_type, score,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM merged ORDER BY event_id""".stripMargin,
    // replay of the composed predicate overwrites: each REPLACE WHERE
    // is delete-the-matching-rows then insert-the-batch — v2 rebuilds
    // the uid band from base (+50, 'backfilled', NULL-ts band rows
    // drop), v3 rebuilds the tail days from BASE (original values,
    // 'reloaded'), overwriting v2's backfill inside band∩tail
    "l_replace_where" ->
      s"""WITH v2 AS (
         |  SELECT event_id, ts, user_id, event_type, value, props
         |  FROM events
         |  WHERE NOT coalesce(user_id BETWEEN 100 AND 199, FALSE)
         |  UNION ALL
         |  SELECT event_id, ts, user_id, 'backfilled' AS event_type,
         |    value + 50.0 AS value, props
         |  FROM events
         |  WHERE user_id BETWEEN 100 AND 199 AND ts IS NOT NULL
         |), v3 AS (
         |  SELECT * FROM v2
         |  WHERE NOT coalesce(strftime(ts, '%Y-%m-%d') >= '2024-01-20',
         |    FALSE)
         |  UNION ALL
         |  SELECT event_id, ts, user_id, 'reloaded' AS event_type,
         |    value, props
         |  FROM events
         |  WHERE ts IS NOT NULL
         |    AND strftime(ts, '%Y-%m-%d') >= '2024-01-20'
         |)
         |SELECT event_id, ts, user_id, event_type, value, props,
         |  strftime(ts, '%Y-%m-%d') AS day
         |FROM v3 ORDER BY event_id""".stripMargin,
  )
}
