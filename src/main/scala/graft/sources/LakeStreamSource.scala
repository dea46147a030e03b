package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{
  CompositeReadLimit, ReadLimit, ReadMaxBytes, ReadMaxFiles,
  SupportsAdmissionControl, SupportsTriggerAvailableNow,
  Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink,
  Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamingDataFrames
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.sources.{BaseRelation,
  CreatableRelationProvider, DataSourceRegister, RelationProvider,
  StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("graft-lake")` — the ManifestLake as a
  * Structured Streaming SOURCE (Delta's streaming source is the
  * public design; reference consumers live on a continuous feed the
  * same way, gotimer_trigger/mq/consumer.go). The V1 `Source` API is
  * deliberate: its `getBatch` returns a DataFrame, so the per-batch
  * plan is the SAME pruned parquet scan every batch read uses
  * (checkpointed schema, DV anti-join, column mapping) with
  * pushdown intact — a DSv2 row-reader would re-implement the
  * parquet reader and lose vectorization. Offsets are manifest
  * versions; determinism comes from manifest immutability; admission
  * control (`maxDirsPerTrigger`) bounds each trigger exactly like
  * replicateOnce's backpressure, via the engine's own
  * SupportsAdmissionControl hook (the FileStreamSource/Delta path).
  *
  * Options:
  *   - `path` (required): the lake root.
  *   - `startingVersion`: "0" (default, full-snapshot bootstrap),
  *     "latest" (tail only commits after query start), or a version
  *     number N (start right after N).
  *   - `skipRewrites`: advance past rewritten days without emitting
  *     them (Delta's skipChangeCommits); default false = refuse.
  *   - `readChangeFeed`: CDF mode (Delta's streaming readChangeFeed) —
  *     each micro-batch carries the window's changes PER COMMIT,
  *     tagged `_change_type` insert/delete plus `_commit_version` /
  *     `_commit_timestamp` (r15: attribution survives a multi-version
  *     trigger window), so rewritten days stream as their
  *     delete+insert pairs instead of refusing; appends still flow as
  *     a pure incremental scan tagged insert. Mutually exclusive with
  *     skipRewrites.
  *   - `updateKeys` (r16, CDF mode only): comma-separated key
  *     columns; a commit's delete+insert rows sharing them stream as
  *     `update_preimage`/`update_postimage` (Delta's update change
  *     types — see readChangesPerCommit's pairing contract).
  *   - `maxDirsPerTrigger`: cap one micro-batch's window at this
  *     many added directories (always ≥ 1 version per trigger;
  *     rewritten days carry no added dirs, so in CDF mode a rewrite
  *     rides the window it lands in, bounded by the day's size).
  *   - `maxBytesPerTrigger` (r15): cap one micro-batch's window at
  *     this many added BYTES, from the manifest-carried size
  *     sidecars — zero listings. Soft max like Delta's: a single
  *     commit larger than the cap lands whole (a version offset
  *     cannot split). Composes with maxDirsPerTrigger (both caps
  *     bind) and with Trigger.AvailableNow (paces the catch-up).
  *   - `maxVersionsPerTrigger` (r16): cap one micro-batch's window
  *     at this many COMMITS. In CDF mode it defaults ON (128): the
  *     per-commit feed builds one scan subplan per commit in the
  *     window (attribution is a per-commit property), so an uncapped
  *     catch-up over a deep backlog would union an O(backlog) plan
  *     on the driver (ADVICE r15 #4) — the default turns that into
  *     bounded batches, and Trigger.AvailableNow still drains to its
  *     pinned ceiling (each capped batch advances). Set 0 to disable.
  *     One deliberate exception preserves the review-r13 invariant:
  *     an explicit ReadAllAvailable poll (Trigger.Once) sees the true
  *     head uncapped — a one-shot drain must not terminate believing
  *     it caught up while backlog remains; its plan width is the
  *     price of the one-shot form (prefer AvailableNow).
  */
class LakeStreamSourceProvider
    extends StreamSourceProvider with StreamSinkProvider
    with RelationProvider with CreatableRelationProvider
    with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  /** Batch `df.write.format("graft-lake")` — the last cell of the
    * read/write × batch/stream format matrix. SaveMode → lake DML:
    *   - ErrorIfExists (default): CREATE a fresh lake; refuse if one
    *     is committed.
    *   - Ignore: create if absent, no-op otherwise.
    *   - Append: plain transactional append (`ManifestLake.append` —
    *     one atomic commit, batch cursor untouched; Delta's batch
    *     append). Pass option `batchId` to opt into the cursor'd
    *     exactly-once appendBatch instead (the txnAppId/txnVersion
    *     analog).
    *   - Overwrite: atomic whole-table replace (`replaceAll`) — one
    *     commit, old generations become vacuum orphans, refuses any
    *     concurrent writer (Delta's overwrite conflict rule). With
    *     option `replaceWhere` = a predicate SQL string (r17, Delta's
    *     replaceWhere): a PREDICATE overwrite instead — atomically
    *     replace exactly the matching rows with the batch (one commit
    *     composing deleteWhere + append; batch rows must satisfy the
    *     predicate), the partition-backfill idiom.
    * Options: `ordCol` (required), `filesPerDay`, `statsCols`/
    * `bloomCols` (fresh-table layout), `batchId` (Append only),
    * `replaceWhere` (Overwrite only). */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val ordCol = opt(parameters, "ordCol").getOrElse(
      throw new IllegalArgumentException(
        "graft-lake write requires option 'ordCol' (the event-time " +
          "column day partitioning derives from)"))
    val filesPerDay =
      opt(parameters, "filesPerDay").map(_.toInt).getOrElse(1)
    def cols(name: String): Seq[String] = opt(parameters, name)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val exists = ManifestLake.tableExists(spark, path)
    val replacePred = opt(parameters, "replaceWhere").map(_.trim)
      .filter(_.nonEmpty)
    require(replacePred.isEmpty || mode == SaveMode.Overwrite,
      "graft-lake: option 'replaceWhere' is a predicate OVERWRITE — " +
        s"it requires mode overwrite (got $mode)")
    def freshCreate(): Unit = {
      ManifestLake.create(spark, path, data, ordCol, filesPerDay,
        statsCols = cols("statsCols"), bloomCols = cols("bloomCols"))
      ()
    }
    mode match {
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft-lake: a committed lake already exists at $path " +
            "(SaveMode.ErrorIfExists); use mode append/overwrite, or " +
            "SaveMode.Ignore to no-op")
        freshCreate()
      case SaveMode.Ignore =>
        if (!exists) freshCreate()
      case SaveMode.Overwrite if replacePred.isDefined =>
        // the predicate overwrite (r17, Delta's replaceWhere writer
        // option): scoped to an EXISTING lake — against an absent one
        // there is nothing the predicate could replace, and silently
        // creating would hide a mistyped path
        require(exists,
          s"graft-lake: replaceWhere against $path, but no committed " +
            "lake exists there — create it first (the predicate " +
            "overwrite replaces rows of an existing table)")
        ManifestLake.replaceWhere(spark, path, data,
          org.apache.spark.sql.functions.expr(replacePred.get), ordCol,
          filesPerDay = filesPerDay)
      case SaveMode.Overwrite =>
        if (!exists) freshCreate()
        else ManifestLake.replaceAll(spark, path, data, ordCol, filesPerDay)
      case SaveMode.Append =>
        opt(parameters, "batchId") match {
          case Some(id) =>
            // the cursor must advance atomically WITH the data even on
            // a fresh table (review r14 #2): an existence-split
            // freshCreate would commit the rows with the cursor still
            // at -1, and a crash-replay of the same batch id would
            // land them AGAIN. Commit v1 as the EMPTY schema anchor,
            // then the data rides the cursor'd append — a crash
            // between the two replays into the exists branch and the
            // id lands exactly once.
            if (!exists)
              ManifestLake.create(spark, path, data.limit(0), ordCol,
                filesPerDay, statsCols = cols("statsCols"),
                bloomCols = cols("bloomCols"))
            ManifestLake.appendBatch(spark, path, data, ordCol,
              id.toLong, filesPerDay)
          case None =>
            if (!exists) freshCreate()
            else ManifestLake.append(spark, path, data, ordCol,
              filesPerDay)
        }
    }
    GraftLakeRelation(spark, Map("path" -> path))
  }

  /** Native `writeStream.format("graft-lake")` SINK — the format-path
    * symmetry to the streaming source (VERDICT r13 #3). Wraps
    * appendBatch's batch-id contract, so exactly-once comes from the
    * LAKE's transaction, not the engine's: the micro-batch id commits
    * atomically with the data in the manifest, and a replayed batch
    * (crash between the lake commit and the engine's offset-log
    * write) is skipped outright — the guarantee CheckpointRecoverySpec
    * proves for the API route, now reachable as
    * `df.writeStream.format("graft-lake").option("ordCol", …)
    * .start(path)`.
    *
    * Options: `path` (the lake root), `ordCol` (event-time column the
    * day partitioning derives from — required), `filesPerDay`,
    * `statsCols` (comma-separated min/max index columns for a fresh
    * table's layout). Append output mode only: update/complete would
    * need a rewrite per trigger — that is the foreachBatch
    * mergeSink's job (every clause mix, still exactly-once). */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-lake sink supports Append output mode only (got " +
        s"$outputMode) — update/complete semantics go through " +
        "foreachBatch(ManifestLake.mergeSink(…)), which is exactly-once " +
        "for every clause mix")
    require(partitionColumns.isEmpty,
      "graft-lake partitions by day(ordCol) itself; partitionBy is " +
        "not accepted")
    val path = pathOf(parameters)
    val ordCol = opt(parameters, "ordCol").getOrElse(
      throw new IllegalArgumentException(
        "graft-lake sink requires option 'ordCol' (the event-time " +
          "column day partitioning derives from)"))
    val filesPerDay = opt(parameters, "filesPerDay").map(_.toInt).getOrElse(1)
    require(filesPerDay >= 1,
      s"graft-lake: filesPerDay must be >= 1, got $filesPerDay")
    val statsCols = opt(parameters, "statsCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    new GraftLakeSink(path, ordCol, filesPerDay, statsCols)
  }

  /** Batch `spark.read.format("graft-lake")` (and SQL-on-file
    * `FROM `graft-lake`.`/path``): hands back the
    * version-pinned placeholder; ResolveLakeRelation (GraftExtensions)
    * inlines it into the real pruned plan — see GraftLakeRelation's
    * doc for the two-path design. */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    GraftLakeRelation(sqlContext.sparkSession, parameters)

  private def pathOf(parameters: Map[String, String]): String =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("path") => v
    }.getOrElse(throw new IllegalArgumentException(
      "graft-lake source requires option 'path' (the lake root)"))

  private def opt(parameters: Map[String, String], name: String)
      : Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }

  private def cdfOf(parameters: Map[String, String]): Boolean = {
    val cdf = opt(parameters, "readChangeFeed").exists(_.trim.toBoolean)
    require(!(cdf && opt(parameters, "skipRewrites").exists(_.toBoolean)),
      "graft-lake: readChangeFeed and skipRewrites are contradictory — " +
        "the change feed EMITS rewrites as delete+insert rows; " +
        "skipRewrites silently advances past them")
    // validated here (sourceSchema runs synchronously at start) so a
    // misconfigured query fails at .start(), not mid-stream
    require(cdf || opt(parameters, "updateKeys").forall(_.trim.isEmpty),
      "graft-lake: updateKeys pairs a commit's delete+insert rows " +
        "into update_pre/postimage CHANGE rows — it requires " +
        "readChangeFeed=true (the append feed has no deletes to pair)")
    cdf
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "graft-lake source reads the lake's own checkpointed schema; " +
        "a user-supplied schema is not accepted")
    (shortName(),
      LakeStreamSource.pinnedSchema(
        sqlContext.sparkSession, pathOf(parameters), cdfOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val head = ManifestLake.headVersion(spark, path)
    // a blank value means unset (a plumbed-through config default)
    val fromTs = opt(parameters, "startingTimestamp")
      .map(_.trim).filter(_.nonEmpty)
    require(fromTs.isEmpty || opt(parameters, "startingVersion").isEmpty,
      "graft-lake: startingVersion and startingTimestamp are mutually " +
        "exclusive")
    val startV = opt(parameters, "startingVersion") match {
      case _ if fromTs.isDefined =>
        // Delta's startingTimestamp: commits AT or after the instant
        // are delivered — start right below the first qualifying one.
        // Accept both the SQL form and ISO-8601's 'T' separator.
        val raw = fromTs.get
        val t = try java.sql.Timestamp.valueOf(raw.replace('T', ' '))
        catch {
          case _: IllegalArgumentException =>
            throw new IllegalArgumentException(
              "graft-lake: startingTimestamp must be " +
                "'yyyy-MM-dd HH:mm:ss[.fff]' (ISO 'T' separator " +
                s"accepted), got '$raw'")
        }
        ManifestLake.startVersionForTimestamp(spark, path, t)
      case None | Some("0") => 0L
      case Some(s) if s.equalsIgnoreCase("latest") => head
      case Some(s) =>
        val v = try s.toLong catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"graft-lake: startingVersion must be a version number, " +
                s"'0' or 'latest', got '$s'")
        }
        require(v >= 0L && v <= head,
          s"graft-lake: startingVersion $v outside committed range " +
            s"[0, $head]")
        v
    }
    val skipRewrites =
      opt(parameters, "skipRewrites").exists(_.toBoolean)
    val cdf = cdfOf(parameters) // also re-checks the skipRewrites clash
    val maxDirs = opt(parameters, "maxDirsPerTrigger").map(_.toInt)
    maxDirs.foreach(n => require(n >= 1,
      s"graft-lake: maxDirsPerTrigger must be >= 1, got $n"))
    val maxBytes = opt(parameters, "maxBytesPerTrigger").map(_.toLong)
    maxBytes.foreach(n => require(n >= 1L,
      s"graft-lake: maxBytesPerTrigger must be >= 1, got $n"))
    val maxVersions = opt(parameters, "maxVersionsPerTrigger").map(_.toInt)
    maxVersions.foreach(n => require(n >= 0,
      s"graft-lake: maxVersionsPerTrigger must be >= 0 (0 disables), " +
        s"got $n"))
    val updateKeys = opt(parameters, "updateKeys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty) // cdfOf above enforces updateKeys ⇒ CDF
    new LakeStreamSource(spark, path,
      LakeStreamSource.pinnedSchema(spark, path, cdf), startV,
      skipRewrites, maxDirs, cdf, maxBytes, maxVersions, updateKeys)
  }
}

/** The V1 sink behind `writeStream.format("graft-lake")`: each
  * addBatch re-wraps the engine's incremental frame as a plain batch
  * (StreamingDataFrames.asBatch — the ForeachBatchSink move; a
  * streaming-leafed plan cannot be re-planned by df.write) and lands
  * it through ManifestLake.sink, i.e. appendBatch under the
  * micro-batch id: one atomic manifest commit per trigger, replays
  * skipped by the lake's own batch cursor. Single-writer per lake,
  * married to one checkpoint — appendBatch's standing contract. */
private[graft] class GraftLakeSink(path: String, ordCol: String,
    filesPerDay: Int, statsCols: Seq[String]) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    ManifestLake.sink(path, ordCol, filesPerDay, statsCols)(
      StreamingDataFrames.asBatch(data), batchId)
    ()
  }
  override def toString: String = s"GraftLakeSink[$path]"
}

object LakeStreamSource {
  /** Default per-trigger commit budget in CDF mode (see the provider
    * doc's maxVersionsPerTrigger entry): bounds the per-commit feed's
    * union plan at O(128) scan subplans per trigger during a deep
    * catch-up. 128 ≈ the width where driver planning time is still
    * trivially small next to executing the window's scans. */
  val DefaultCdfVersionsPerTrigger: Int = 128

  /** The schema a streaming query pins at start: the lake's current
    * checkpointed LOGICAL schema (incl. the `day` column — stream
    * rows ≡ `ManifestLake.read` rows), plus the `_change_type` tag
    * in CDF mode (Delta's readChangeFeed shape). A mid-query schema
    * change fails the query with a restart instruction
    * (streamSchemaGuard); the restarted query re-pins here. */
  private[graft] def pinnedSchema(spark: SparkSession,
      path: String, cdf: Boolean = false): StructType = {
    val snap = ManifestLake.snapshot(spark, path)
    require(snap.version >= 1L,
      s"graft-lake: no committed snapshot at $path — create the lake " +
        "first (ManifestLake.create or the streaming sink's bootstrap)")
    val base = ManifestLake.read(spark, path).schema
    if (cdf) base
      .add(ManifestLake.ChangeTypeCol,
        org.apache.spark.sql.types.StringType, nullable = false)
      .add(ManifestLake.CommitVersionCol,
        org.apache.spark.sql.types.LongType, nullable = false)
      .add(ManifestLake.CommitTimestampCol,
        org.apache.spark.sql.types.TimestampType, nullable = false)
    else base
  }
}

class LakeStreamSource(spark: SparkSession, path: String,
    fixedSchema: StructType, startV: Long, skipRewrites: Boolean,
    maxDirsPerTrigger: Option[Int], readChangeFeed: Boolean = false,
    maxBytesPerTrigger: Option[Long] = None,
    maxVersionsPerTrigger: Option[Int] = None,
    updateKeys: Seq[String] = Seq.empty)
    extends Source with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  /** The per-trigger COMMIT budget actually in force: the explicit
    * option when set (0 = disabled), else the CDF default — the
    * per-commit feed's plan width is O(window versions), so CDF mode
    * paces by default (ADVICE r15 #4); the append feed's plan width
    * is O(added dirs) regardless of window, no default needed. */
  private[graft] val effectiveVersionCap: Option[Int] =
    maxVersionsPerTrigger match {
      case Some(0) => None
      case Some(n) => Some(n)
      case None => if (readChangeFeed)
        Some(LakeStreamSource.DefaultCdfVersionsPerTrigger) else None
    }

  override def schema: StructType = fixedSchema

  /** Trigger.AvailableNow (implemented NATIVELY so the per-trigger
    * cap keeps pacing the catch-up — the engine's generic wrapper
    * would drive the drain with ReadAllAvailable and fold the whole
    * backlog into one mega-batch, FileStreamSource makes the same
    * choice): the head is pinned ONCE here, every subsequent
    * latestOffset clamps to it, and the query terminates when the
    * capped walk reaches the pinned ceiling — commits landing after
    * query start are left for the next run, the AvailableNow
    * contract. */
  private var availableNowCeiling: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCeiling = Some(ManifestLake.headVersion(spark, path))

  /** Every offset this source ever emits is a LongOffset over the
    * manifest version; after a restart the engine hands back
    * SerializedOffset / json forms — the version is the json. */
  private def ver(o: OffsetV2): Long = o.json.trim.toLong
  private def ver1(o: OffsetV1): Long = o.json.trim.toLong

  override def initialOffset(): OffsetV2 = LongOffset(startV)

  override def deserializeOffset(json: String): OffsetV2 =
    LongOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit =
    (maxDirsPerTrigger, maxBytesPerTrigger) match {
      case (Some(d), Some(b)) => ReadLimit.compositeLimit(
        Array(ReadLimit.maxFiles(d), ReadLimit.maxBytes(b)))
      case (Some(d), None) => ReadLimit.maxFiles(d)
      case (None, Some(b)) => ReadLimit.maxBytes(b)
      // with a version cap in force (CDF's default pacing) the
      // default poll must NOT advertise allAvailable: the engine
      // hands the default limit back verbatim, and latestOffset
      // exempts ReadAllAvailable (the Trigger.Once one-shot) from the
      // cap — an unbounded sentinel budget keeps the poll
      // distinguishable from an explicit drain-all while capping
      // nothing itself
      case _ if effectiveVersionCap.isDefined =>
        ReadLimit.maxFiles(Int.MaxValue)
      case _ => ReadLimit.allAvailable()
    }

  /** The engine's admission-control path (preferred over getOffset
    * when SupportsAdmissionControl is implemented): pick this
    * trigger's end version, capped by the dir and/or byte budget —
    * bytes come from the manifest-carried size sidecars (r13), so the
    * byte walk is cached metadata, zero listings (VERDICT r14 #5). */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val fromV = if (start == null) startV else ver(start)
    // headVersion, not snapshot(): the poll runs EVERY trigger, and
    // the head is one log-dir listing — a full snapshot would parse
    // the manifest and assemble every live generation's sidecar just
    // to read .version (review r13)
    val live = ManifestLake.headVersion(spark, path)
    val head = availableNowCeiling.fold(live)(math.min(live, _))
    if (head <= fromV) start
    else {
      // the Int.MaxValue dir budget is OUR default-limit sentinel
      // (see getDefaultReadLimit) — strip it so an unbudgeted CDF
      // poll doesn't pay the capped walk's manifest reads just to
      // conclude "head"
      val budgeted = (dirBudget(limit).filter(_ != Int.MaxValue),
          byteBudget(limit)) match {
        case (None, None) => head
        case (dirs, bytes) =>
          ManifestLake.cappedStreamTarget(spark, path, fromV, head, dirs,
            maxBytes = bytes)
      }
      // version cap (CDF default pacing): never applied to an
      // explicit ReadAllAvailable — Trigger.Once's one-shot must see
      // the true head (review r13's invariant); AvailableNow and
      // processing-time triggers arrive with the advertised default
      // limit and get paced. Always >= fromV + 1: one commit per
      // trigger is the progress floor.
      val vCap =
        if (limit.isInstanceOf[org.apache.spark.sql.connector.read
          .streaming.ReadAllAvailable]) None
        else effectiveVersionCap
      LongOffset(vCap.fold(budgeted)(c =>
        math.min(budgeted, fromV + math.max(1, c))))
    }
  }

  /** The true head, uncapped — Trigger.AvailableNow's wrapper fixes
    * this as the drain target once at query start, then lets the
    * per-trigger cap pace the catch-up batches toward it. */
  override def reportLatestOffset(): OffsetV2 =
    LongOffset(ManifestLake.headVersion(spark, path))

  private def dirBudget(limit: ReadLimit): Option[Int] = limit match {
    case m: ReadMaxFiles => Some(m.maxFiles)
    case c: CompositeReadLimit =>
      c.getReadLimits.collectFirst { case m: ReadMaxFiles => m.maxFiles }
    // ReadAllAvailable — Trigger.Once / the AvailableNow wrapper's
    // final catch-up — must see the TRUE head: mapping it to the
    // configured cap would let a one-shot query terminate believing
    // it caught up while backlog silently remains (review r13). The
    // cap only ever arrives back as the ReadMaxFiles the source
    // itself advertised in getDefaultReadLimit.
    case _ => None
  }

  private def byteBudget(limit: ReadLimit): Option[Long] = limit match {
    case m: ReadMaxBytes => Some(m.maxBytes)
    case c: CompositeReadLimit =>
      c.getReadLimits.collectFirst { case m: ReadMaxBytes => m.maxBytes }
    case _ => None // same ReadAllAvailable reasoning as dirBudget
  }

  /** Legacy V1 polling hook. The engine routes every poll through
    * latestOffset above (SupportsAdmissionControl is implemented), so
    * this must be unreachable — and it CANNOT be made equivalent:
    * it carries no ReadLimit and no last-committed offset, so any
    * silent fallback would fold the whole backlog into one uncapped
    * mega-batch, breaking the admission-control contract the source
    * advertises (ADVICE r13 #3). Fail loudly instead. */
  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "graft-lake: legacy Source.getOffset is not supported — the " +
        "engine must poll via latestOffset(start, limit) " +
        "(SupportsAdmissionControl); an uncapped V1 poll would ignore " +
        "maxDirsPerTrigger and the AvailableNow ceiling")

  override def getBatch(start: Option[OffsetV1], end: OffsetV1)
      : DataFrame = {
    val fromV = start.map(ver1).getOrElse(startV)
    val toV = ver1(end)
    // markStreaming tags ONLY the leftmost leaf — in CDF mode that is
    // the appended-dirs scan, never the rewrite diff's exceptAll
    // (see cdfWindowBatch's plan-shape note: a streaming-tagged
    // exceptAll would become a stateful cross-trigger aggregate)
    StreamingDataFrames.markStreaming(
      if (readChangeFeed)
        ManifestLake.cdfWindowBatch(spark, path, fromV, toV, fixedSchema,
          updateKeys)
      else
        ManifestLake.streamWindowBatch(spark, path, fromV, toV,
          fixedSchema, skipRewrites))
  }

  /** Offsets the engine has committed need nothing from the source:
    * manifest retention is the vacuum policy's job, and a consumer
    * that lags past it gets the retention story from
    * readCursorManifest, not a dangling-file error. */
  override def commit(end: OffsetV1): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"LakeStreamSource[$path]"
}
