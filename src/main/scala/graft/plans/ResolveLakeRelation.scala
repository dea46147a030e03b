package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel,
  UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, Cast, Expression,
  NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
  OneRowRelation, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{StringType, TimestampType}

import graft.sources.{GraftLakeRelation, ManifestLake}

/** The analyzer half of batch `format("graft-lake")` (registered by
  * GraftExtensions — the `spark.sql.extensions` route Delta itself
  * requires for its SQL surface). Two jobs:
  *
  * 1. INLINE the placeholder: `spark.read.format("graft-lake")`
  *    resolves to a `LogicalRelation(GraftLakeRelation)`; this rule
  *    swaps it for `ManifestLake.readVersion`'s own analyzed plan —
  *    day-pruned vectorized parquet scan, DV anti-join, column
  *    mapping — with the replacement's output aliased back onto the
  *    placeholder's exprIds, so downstream references resolve
  *    untouched and the format route plans IDENTICALLY to the API
  *    route (no V1 buildScan wall: pushdown, stats skipping and
  *    whole-stage codegen all reach the scan).
  *
  * 2. SQL time travel: the parser turns
  *    `SELECT … FROM `graft-lake`.`/path` TIMESTAMP AS OF t`
  *    (or VERSION AS OF n) into `RelationTimeTravel(UnresolvedRelation)`,
  *    which the built-in resolvers only serve for v2 catalog tables.
  *    For the graft-lake 2-part identifier this rule resolves the
  *    instant through the lake's strictly-monotone commit stamps
  *    (versionAt) and splices in the versioned read directly — the
  *    same front door every relational and text operator already has via SQL
  *    (SqlSurfaceSpec), now reaching the transactional tier.
  *
  * Cost shape: resolution reads ONE manifest (the log's listStatus +
  * the pinned version's manifest line) per query analysis — the same
  * metadata the API route pays; nothing per-file, nothing per-row. */
case class ResolveLakeRelation(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case lr: LogicalRelation
          if lr.relation.isInstanceOf[GraftLakeRelation] =>
        val rel = lr.relation.asInstanceOf[GraftLakeRelation]
        inlineRead(rel.path, rel.version, Some(lr.output))

      // SQL time travel over the 2-part graft-lake identifier. Must
      // run in the HINTS batch (injectHintResolutionRule): the
      // Resolution batch's built-in ResolveSQLOnFile precedes any
      // injected resolution rule and THROWS
      // UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY for a non-FileFormat
      // source before we'd ever see the node.
      case RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if isLakeIdent(u) =>
        val path = u.multipartIdentifier(1)
        val v = ver match {
          case Some(s) =>
            GraftLakeRelation.resolveVersion(session, path, Some(s), None)
          case None =>
            ManifestLake.versionAt(session, path, evalTimestamp(ts.get))
        }
        SubqueryAlias(u.multipartIdentifier.last,
          inlineRead(path, v, None))

      // plain SQL-on-file: SELECT … FROM `graft-lake`.`/path` (head
      // snapshot) — same hints-batch reasoning as above
      case u: UnresolvedRelation if isLakeIdent(u) =>
        val path = u.multipartIdentifier(1)
        val head = ManifestLake.snapshot(session, path).version
        SubqueryAlias(path, inlineRead(path, head, None))
    }

  private def isLakeIdent(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft-lake")

  /** TIMESTAMP AS OF's operand is an arbitrary foldable expression
    * (string literal, typed literal, date arithmetic); fold it to an
    * instant under the session zone exactly like the v2 resolver. */
  private def evalTimestamp(e0: Expression): java.sql.Timestamp = {
    // the hints batch sees the parser's raw operand; a non-literal
    // constant (current_date() - INTERVAL …) resolves through a
    // one-row side plan first, exactly how the v2 TimeTravelSpec
    // resolver folds it
    val e = if (e0.resolved) e0 else {
      session.sessionState.executePlan(
        Project(Seq(Alias(e0, "__graft_ts")()), OneRowRelation()))
        .analyzed.asInstanceOf[Project]
        .projectList.head.asInstanceOf[Alias].child
    }
    require(e.foldable,
      s"graft-lake: TIMESTAMP AS OF operand must be a constant, got $e")
    val zone = Some(session.sessionState.conf.sessionLocalTimeZone)
    val micros = (e.dataType match {
      case StringType => Cast(e, TimestampType, zone, ansiEnabled = true)
      case TimestampType => e
      case _ => Cast(e, TimestampType, zone, ansiEnabled = true)
    }).eval() match {
      case l: java.lang.Long => l.longValue()
      case null => throw new IllegalArgumentException(
        s"graft-lake: TIMESTAMP AS OF operand evaluated to NULL: $e")
    }
    new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
  }

  private def inlineRead(path: String, version: Long,
      expected: Option[Seq[org.apache.spark.sql.catalyst.expressions.Attribute]])
      : LogicalPlan = {
    val real =
      ManifestLake.readVersion(session, path, version).queryExecution.analyzed
    expected match {
      case None => real
      case Some(out) =>
        require(real.output.length == out.length,
          s"graft-lake: relation schema drifted between resolution and " +
            s"inlining (${out.length} vs ${real.output.length} columns) " +
            s"— a concurrent schema change; re-run the query")
        val aliases: Seq[NamedExpression] =
          real.output.zip(out).map { case (n, o) =>
            Alias(n, o.name)(exprId = o.exprId, qualifier = o.qualifier)
          }
        Project(aliases, real)
    }
  }
}
