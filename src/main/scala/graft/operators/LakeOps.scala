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

  /** Build (once per session+dir) the oracle lake: events keyed by
    * ts-day, uid+ts indexed, clustered on uid. Lives under the JVM
    * tmpdir, keyed by (dir, applicationId) so concurrent sessions
    * cannot collide and a dead session's lake is plain tmp garbage. */
  private def statsLake(s: SparkSession, dir: String): String =
    lakeMemo.getOrElseUpdate(s, dir) {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft_lake_oracle/" +
        math.abs((dir + "|" + s.sparkContext.applicationId).hashCode).toString
      val p = new org.apache.hadoop.fs.Path(out)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
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
      .orderBy(col("user_id"), col("event_id"), col("ts"))

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
      .orderBy(col("user_id"), col("event_id"), col("ts"))

  val queries: ListMap[String, Q] = ListMap(
    "l_scan_prune" -> (lScanPrune _),
    "l_point_lookup" -> (lPointLookup _),
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
  )
}
