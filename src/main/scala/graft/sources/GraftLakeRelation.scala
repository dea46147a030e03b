package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession, SQLContext}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** The batch half of `format("graft-lake")` (the streaming half is
  * LakeStreamSourceProvider — same DataSourceRegister name, Delta's
  * one-provider-many-traits shape): a V1 `BaseRelation` placeholder
  * that PINS the snapshot version at relation-creation time
  * (`versionAsOf` / `timestampAsOf` options, head otherwise — a
  * concurrent commit cannot shift a query mid-plan, Delta's snapshot
  * pinning).
  *
  * Plan fidelity is the design concern: the lake read is not a bare
  * file scan — it is day-pruned parquet + the DV anti-join + column
  * mapping + the NullPart day restore, a whole logical plan. A V1
  * relation's `buildScan` can only hand Spark an opaque RDD, which
  * would wall off that plan from the optimizer (no whole-stage
  * codegen across the boundary, filters re-derived but the scan
  * relation invisible to AQE). So the primary path is the
  * ResolveLakeRelation analyzer rule (registered by GraftExtensions,
  * the `spark.sql.extensions` route Delta itself requires): it
  * REPLACES this placeholder with `ManifestLake.readVersion`'s
  * analyzed plan, exprIds remapped, so `spark.read.format(…)` yields
  * the IDENTICAL pruned vectorized scan the API route builds —
  * pushdown, stats skipping, codegen all intact (PlanAuditSpec pins
  * plan-shape equality).
  *
  * `buildScan` below is the no-extensions fallback so a plain
  * session still reads correctly: it executes the same inner plan
  * and streams its InternalRows through (`needConversion = false`,
  * zero per-row conversion), with requested columns and every
  * translatable filter pushed INTO the inner plan — at worst the
  * boundary costs one codegen break, never a full-table scan. */
case class GraftLakeRelation(
    spark: SparkSession,
    path: String,
    version: Long,
    override val schema: StructType) extends BaseRelation
    with PrunedFilteredScan {

  override def sqlContext: SQLContext = spark.sqlContext

  override def needConversion: Boolean = false

  /** The real read this relation stands for (the rule inlines its
    * analyzed plan; the fallback executes it). */
  def readDf: DataFrame = ManifestLake.readVersion(spark, path, version)

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val base = readDf
    val filtered = filters.flatMap(GraftLakeRelation.translateTop)
      .foldLeft(base)((d, c) => d.filter(c))
    val pruned =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.toSeq.map(col): _*)
    // needConversion=false contract: hand back the inner plan's
    // InternalRows untouched — Spark wraps them without a per-row
    // Row conversion
    pruned.queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  override def toString: String = s"GraftLakeRelation($path, v$version)"
}

object GraftLakeRelation {
  /** TOP-LEVEL translation for the fallback scan: the filters array
    * is an implicit conjunction, so each top-level And may translate
    * PARTIALLY — a dropped conjunct only loses pruning (positive
    * polarity), never rows. */
  private[graft] def translateTop(f: Filter): Seq[Column] = f match {
    case And(l, r) => translateTop(l) ++ translateTop(r)
    case other => translate(other).toSeq
  }

  /** Best-effort source-Filter → Column translation for the fallback
    * scan (the engine re-evaluates every filter above the relation —
    * default `unhandledFilters` — so an untranslated filter costs
    * pruning, never correctness). Translation inside here is TOTAL:
    * an And under Not/Or must translate both sides or not at all —
    * the old partial-And rule under negation turned NOT(a AND b) into
    * NOT(a), which wrongly DROPS rows (review r14 #8); partial
    * conjunctions are only sound at the top level (translateTop). */
  private[graft] def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === v)
    case EqualNullSafe(a, v) => Some(col(a) <=> v)
    case GreaterThan(a, v) => Some(col(a) > v)
    case GreaterThanOrEqual(a, v) => Some(col(a) >= v)
    case LessThan(a, v) => Some(col(a) < v)
    case LessThanOrEqual(a, v) => Some(col(a) <= v)
    case In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case Not(c) => translate(c).map(!_)
    case And(l, r) =>
      for { a <- translate(l); b <- translate(r) } yield a && b
    case Or(l, r) =>
      for { a <- translate(l); b <- translate(r) } yield a || b
    case _ => None
  }

  /** Resolve the pinned version from the reader options (Delta's
    * option names): versionAsOf wins an explicit version, timestampAsOf
    * routes through the strictly-monotone commit stamps, neither pins
    * the current head. */
  private[graft] def resolveVersion(spark: SparkSession, path: String,
      versionAsOf: Option[String], timestampAsOf: Option[String]): Long = {
    require(versionAsOf.isEmpty || timestampAsOf.isEmpty,
      "graft-lake: versionAsOf and timestampAsOf are mutually exclusive")
    versionAsOf match {
      case Some(s) =>
        val v = try s.trim.toLong catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"graft-lake: versionAsOf must be a version number, got '$s'")
        }
        val head = ManifestLake.snapshot(spark, path).version
        require(v >= 1L && v <= head,
          s"graft-lake: versionAsOf $v outside committed range [1, $head]")
        v
      case None => timestampAsOf match {
        case Some(raw) =>
          // SESSION-zone parse (review r14 #6): the SQL TIMESTAMP AS
          // OF route folds through a session-zone Cast — the option
          // route must pin the SAME version for the same string
          ManifestLake.versionAt(spark, path,
            ManifestLake.parseSessionTimestamp(spark, raw))
        case None => ManifestLake.snapshot(spark, path).version
      }
    }
  }

  def apply(spark: SparkSession, parameters: Map[String, String])
      : GraftLakeRelation = {
    def opt(name: String): Option[String] = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }.map(_.trim).filter(_.nonEmpty)
    val path = opt("path").getOrElse(throw new IllegalArgumentException(
      "graft-lake requires a path: spark.read.format(\"graft-lake\")" +
        ".load(<lake root>)"))
    val v = resolveVersion(spark, path, opt("versionAsOf"),
      opt("timestampAsOf"))
    val schema = ManifestLake.readVersion(spark, path, v).schema
    GraftLakeRelation(spark, path, v, schema)
  }
}
