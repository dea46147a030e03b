package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructType, TimestampType}

import graft.sources.ManifestLake

/** The maintenance-SQL half of the graft-lake front door (Delta's
  * parser extension re-expressed): Spark's grammar has no OPTIMIZE /
  * VACUUM / DESCRIBE HISTORY / RESTORE productions, so — exactly like
  * Delta — a delegating parser claims those statements for graft-lake
  * path tables and hands EVERYTHING else (including failures to
  * match) to the session parser unchanged. The statements map 1:1
  * onto the lake's maintenance APIs; the parser adds syntax, never a
  * second implementation:
  *
  *   DESCRIBE HISTORY  <tbl>
  *   DESCRIBE DETAIL   <tbl>
  *   OPTIMIZE          <tbl> [ZORDER BY (c1, c2, …)]
  *   VACUUM            <tbl> [RETAIN n HOURS] [FORCE] [DRY RUN]
  *   RESTORE [TABLE]   <tbl> TO VERSION AS OF n
  *   RESTORE [TABLE]   <tbl> TO TIMESTAMP AS OF 'ts'
  *
  * where <tbl> is either front-door identifier form: the path table
  * ``graft-lake`.`/path`` or the named table `graft.db.t` (resolved
  * against spark.graft.warehouse).
  *
  * `FORCE` is the explicit escape hatch for a sub-floor retention
  * (Delta's retentionDurationCheck conf, surfaced as a keyword so the
  * statement itself shows the reader the guard was waived). Matching
  * is anchored on the leading keyword + the `graft-lake` identifier;
  * a statement that starts like a maintenance command but fails the
  * full grammar raises a graft parse error rather than falling
  * through to Spark (which could only produce a worse one). */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseMaintenance(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String):
      org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  /** Resolve either identifier form to the lake root: the path form
    * directly, the named form through spark.graft.warehouse (an
    * explicit maintenance statement naming graft.db.t without the
    * conf errors loudly — there is nothing to fall through to). */
  private def tblPath(txt: String): String = txt.trim match {
    case PathForm(p) => p
    case named =>
      val parts = named.split('.').toSeq
        .map(_.trim.stripPrefix("`").stripSuffix("`"))
      LakeDml.lakePathOf(session, parts).getOrElse(
        throw new IllegalArgumentException(
          s"graft named table '$named' needs spark.graft.warehouse " +
            "set — it resolves to <warehouse>/<db>/<table>"))
  }

  private def parseMaintenance(sqlText: String): Option[LogicalPlan] = {
    val s = sqlText.trim.stripSuffix(";").trim
    s match {
      case DetailRe(tbl) => Some(GraftDescribeDetailCommand(tblPath(tbl)))
      case HistoryRe(tbl) => Some(GraftHistoryCommand(tblPath(tbl)))
      case OptimizeRe(tbl, zorderCols) =>
        val path = tblPath(tbl)
        val cols = Option(zorderCols).toSeq.flatMap(
          _.split(',').map(_.trim.stripPrefix("`").stripSuffix("`"))
            .filter(_.nonEmpty))
        // one column is its own optimal linear layout; 2+ interleave
        // via zValueN (bits split across the dimensions — the
        // standard Z-order tradeoff, so "few, selective columns")
        Some(GraftOptimizeCommand(path, cols))
      case VacuumRe(tbl, hours, force, dry) =>
        Some(GraftVacuumCommand(tblPath(tbl),
          Option(hours).map(h => h.trim.toLong * 3600L * 1000L),
          force = force != null, dryRun = dry != null))
      case RestoreRe(tbl, ver, ts) =>
        Some(GraftRestoreCommand(tblPath(tbl),
          Option(ver).map(_.trim.toLong),
          Option(ts).map(_.trim)))
      case _ =>
        // a maintenance keyword aimed at a graft-lake table that the
        // full grammar rejected: fail HERE with the expected shapes
        if (LooksMaintenanceRe.findFirstIn(s).isDefined)
          throw new IllegalArgumentException(
            "graft-lake maintenance statement did not parse. Expected " +
              "one of:\n  DESCRIBE HISTORY `graft-lake`.`path`\n  " +
              "DESCRIBE DETAIL `graft-lake`.`path`\n  " +
              "OPTIMIZE `graft-lake`.`path` [ZORDER BY (c1, …)]\n  " +
              "VACUUM `graft-lake`.`path` [RETAIN n HOURS] [FORCE] " +
              "[DRY RUN]\n  RESTORE [TABLE] `graft-lake`.`path` TO " +
              "VERSION AS OF n | TO TIMESTAMP AS OF 'ts'\nGot: " + s)
        else None
    }
  }
}

object GraftSqlParser {
  // the lake identifier, in either front-door form: the path table
  // `graft-lake`.`/any/path`, or the named table graft.db.t
  // (resolved against spark.graft.warehouse)
  private val Tbl = "(`graft-lake`\\s*\\.\\s*`[^`]+`|" +
    "`?graft`?\\s*\\.\\s*`?[A-Za-z0-9_]+`?\\s*\\.\\s*`?[A-Za-z0-9_]+`?)"
  private val PathForm = "(?is)^`graft-lake`\\s*\\.\\s*`([^`]+)`$".r
  private val HistoryRe =
    s"(?is)^DESCRIBE\\s+HISTORY\\s+$Tbl$$".r
  private val DetailRe =
    s"(?is)^DESCRIBE\\s+DETAIL\\s+$Tbl$$".r
  private val OptimizeRe =
    s"(?is)^OPTIMIZE\\s+$Tbl(?:\\s+ZORDER\\s+BY\\s*\\(([^)]+)\\))?$$".r
  private val VacuumRe =
    (s"(?is)^VACUUM\\s+$Tbl(?:\\s+RETAIN\\s+(\\d+)\\s+HOURS)?" +
      "(\\s+FORCE)?(\\s+DRY\\s+RUN)?$").r
  private val RestoreRe =
    (s"(?is)^RESTORE\\s+(?:TABLE\\s+)?$Tbl\\s+TO\\s+(?:VERSION\\s+AS\\s+" +
      "OF\\s+(\\d+)|TIMESTAMP\\s+AS\\s+OF\\s+'([^']+)')$").r
  private val LooksMaintenanceRe =
    ("(?is)^(?:DESCRIBE\\s+(?:HISTORY|DETAIL)|OPTIMIZE|VACUUM|RESTORE)\\b" +
      s".*(?:`graft-lake`|\\bgraft\\b\\s*\\.)").r

  private def attr(name: String,
      t: org.apache.spark.sql.types.DataType): Attribute =
    org.apache.spark.sql.catalyst.expressions
      .AttributeReference(name, t, nullable = true)()

  /** DESCRIBE DETAIL → one summary row (Delta's surface): everything
    * comes from the head manifest + the table metadata files —
    * O(manifest) driver work, zero data reads (file counts and bytes
    * are the manifest-carried sidecar numbers OPTIMIZE selection
    * already uses). */
  case class GraftDescribeDetailCommand(path: String)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("format", StringType), attr("location", StringType),
      attr("head_version", LongType), attr("last_operation", StringType),
      attr("num_days", IntegerType), attr("num_dirs", IntegerType),
      attr("num_files", LongType), attr("size_bytes", LongType),
      attr("ord_col", StringType), attr("num_dvs", IntegerType),
      attr("num_checks", IntegerType), attr("stats_cols", StringType))
    override def run(spark: SparkSession): Seq[Row] = {
      val snap = ManifestLake.snapshot(spark, path)
      Seq(Row("graft-lake", path, snap.version, snap.op,
        snap.days.size, snap.days.values.map(_.size).sum,
        snap.fileBytes.size.toLong, snap.fileBytes.values.sum,
        ManifestLake.ordColOf(spark, path).orNull,
        snap.dvs.size, snap.checks.size,
        ManifestLake.statsCols(spark, path).mkString(",")))
    }
  }

  /** DESCRIBE HISTORY → the history() frame, one row per committed
    * version (O(versions), one log listing — never a data read). */
  case class GraftHistoryCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("version", LongType), attr("operation", StringType),
      attr("committed_at", TimestampType), attr("n_days", IntegerType),
      attr("n_dirs", IntegerType), attr("last_batch", LongType),
      attr("n_dvs", IntegerType), attr("n_checks", IntegerType))
    override def run(spark: SparkSession): Seq[Row] =
      ManifestLake.history(spark, path).collect().toSeq
  }

  /** OPTIMIZE [ZORDER BY] → compactWhere: plain OPTIMIZE is
    * manifest-only small-file selection (zero listings), day-at-a-time
    * rewrites, each its own OCC commit; with ZORDER BY the user asked
    * for a LAYOUT, so every day is re-clustered regardless of
    * fragmentation (an already-compacted table would otherwise
    * silently no-op — ADVICE r14 #1). Returns the compacted day keys. */
  case class GraftOptimizeCommand(path: String, zorderBy: Seq[String])
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(attr("compacted_day",
      StringType))
    override def run(spark: SparkSession): Seq[Row] =
      ManifestLake.compactWhere(spark, path, clusterBy = zorderBy,
        zOrder = zorderBy.nonEmpty,
        recluster = zorderBy.nonEmpty).map(Row(_))
  }

  /** VACUUM → vacuum: deletes (or, under DRY RUN, lists) files no
    * retained version references. RETAIN below the safety floor
    * requires the explicit FORCE keyword. */
  case class GraftVacuumCommand(path: String, retainMs: Option[Long],
      force: Boolean, dryRun: Boolean) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(attr("path", StringType))
    override def run(spark: SparkSession): Seq[Row] = {
      val deleted = retainMs match {
        case Some(ms) => ManifestLake.vacuum(spark, path, ms, force = force,
          dryRun = dryRun)
        case None => ManifestLake.vacuum(spark, path, force = force,
          dryRun = dryRun)
      }
      deleted.map(Row(_))
    }
  }

  /** RESTORE → restore: re-commits an old version's state as a NEW
    * head version (history is append-only; a restore is itself a
    * commit, Delta's RESTORE semantics). */
  case class GraftRestoreCommand(path: String, version: Option[Long],
      timestamp: Option[String]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(attr("restored_to_version",
      LongType), attr("new_version", LongType))
    override def run(spark: SparkSession): Seq[Row] = {
      val v = version.getOrElse {
        // session-zone parse, same rule as every other timestamp door
        ManifestLake.versionAt(spark, path,
          ManifestLake.parseSessionTimestamp(spark, timestamp.get))
      }
      val nv = ManifestLake.restore(spark, path, v)
      Seq(Row(v, nv))
    }
  }
}
