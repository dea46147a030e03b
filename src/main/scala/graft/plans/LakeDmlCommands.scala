package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute,
  AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan,
  SubqueryAlias}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.StreamingDataFrames
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

import graft.sources.ManifestLake

/** The SQL DML front door for `graft-lake` path tables (Delta's
  * `DELETE FROM delta.`/path`` surface re-expressed on the lake's own
  * transactional APIs): ResolveLakeRelation's DML pre-pass swaps the
  * parsed `DeleteFromTable` / `UpdateTable` / `MergeIntoTable` /
  * `InsertIntoStatement` node for one of these commands whenever the
  * target is a ``graft-lake`.`path`` identifier — BEFORE the built-in
  * resolvers would reject the statement ("DELETE is only supported
  * with v2 tables"). Each command is a leaf: every parsed expression
  * is translated to a name-based `Column` at rule time (aliases
  * stripped / remapped), so the node carries no unresolved Catalyst
  * expressions for checkAnalysis to trip on, and the real resolution
  * happens where it always does — inside the lake API's own plan,
  * against the table's logical schema. Commands execute eagerly at
  * `spark.sql(…)` like every Spark DML, under the SAME transaction
  * the API route takes: one atomic manifest commit, OCC
  * rebase-and-retry, day-proportional rewrites — the SQL layer adds
  * parsing, never a second write path. */
object LakeDml {

  def isLakeIdent(u: UnresolvedRelation): Boolean =
    u.multipartIdentifier.length == 2 &&
      u.multipartIdentifier.head.equalsIgnoreCase("graft-lake")

  /** NAMED tables (r14): ``graft`.`db`.`t`` resolves to
    * `<warehouse>/db/t` — the Delta-catalog UX on the path-table
    * machinery, one convention instead of a second metastore (the
    * warehouse DIRECTORY is the catalog; a table is its lake root).
    * Claimed in the hints batch before catalog resolution runs, so
    * with the r15 GraftCatalog registered (which serves SHOW TABLES /
    * DESCRIBE from the SAME warehouse) reads and DML still plan
    * through this rule — plan identity with the convention-only
    * route, pinned by GraftCatalogSpec. The warehouse comes from
    * `spark.graft.warehouse` or, failing that, the catalog
    * registration's own `spark.sql.catalog.graft.warehouse` — one
    * conf pair lights up every front door. With neither set the
    * identifier is NOT ours (a foreign catalog named `graft` keeps
    * resolving). */
  def lakePathOf(spark: SparkSession, parts: Seq[String])
      : Option[String] =
    if (parts.length == 2 && parts.head.equalsIgnoreCase("graft-lake"))
      Some(parts(1))
    else if (parts.length >= 3 && parts.head.equalsIgnoreCase("graft")) {
      // r16: any depth — `graft.a.b.t` is `<warehouse>/a/b/t`
      // (multi-level namespaces; the catalog surface mirrors this)
      spark.conf.getOption("spark.graft.warehouse")
        .orElse(
          // only OUR registration's warehouse — a foreign catalog
          // that happens to be named `graft` keeps full custody of
          // its identifiers (and its own options)
          spark.conf.getOption("spark.sql.catalog.graft")
            .filter(_ == classOf[graft.sources.GraftCatalog].getName)
            .flatMap(_ =>
              spark.conf.getOption("spark.sql.catalog.graft.warehouse")))
        .map { wh =>
          require(parts.tail.forall(p => p.nonEmpty && !p.contains('/') &&
            p != "." && p != ".."),
            s"graft named tables use plain namespace/table identifiers, " +
              s"got ${parts.mkString(".")}")
          (wh.stripSuffix("/") +: parts.tail).mkString("/")
        }
    } else None

  /** (lake path, SQL alias) when `plan` is a DML target over a
    * graft-lake identifier (path or named form); None otherwise (the
    * statement belongs to some other source — leave it alone). */
  def lakeTarget(spark: SparkSession, plan: LogicalPlan)
      : Option[(String, Option[String])] =
    plan match {
      case SubqueryAlias(id, u: UnresolvedRelation) =>
        lakePathOf(spark, u.multipartIdentifier).map(p =>
          (p, Some(id.name)))
      case u: UnresolvedRelation =>
        lakePathOf(spark, u.multipartIdentifier).map(p => (p, None))
      case _ => None
    }

  /** Single-table predicate/value translation: strip the target's SQL
    * alias (and the bare table-path qualifier) so the expression
    * resolves by NAME against the lake read the API builds
    * internally. Anything else (functions, literals, nested fields)
    * passes through untouched and resolves there too. */
  def bare(e: Expression, alias: Option[String]): Column =
    ColumnBridge.column(e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length == 2 &&
          alias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
        UnresolvedAttribute(a.nameParts.tail)
    })

  /** Bare column name of an assignment key (`t.value` → `value`),
    * refusing qualifiers that name neither the alias nor the column
    * itself. */
  def keyName(e: Expression, alias: Option[String], what: String): String =
    e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        a.nameParts.head
      case a: UnresolvedAttribute if a.nameParts.length == 2 &&
          alias.exists(_.equalsIgnoreCase(a.nameParts.head)) =>
        a.nameParts.last
      case other => throw new IllegalArgumentException(
        s"graft-lake $what: assignment target must be a plain column " +
          s"of the lake table, got $other")
    }

  /** Two-sided MERGE expression translation: the lake's mergeInto
    * applies clause Columns on `target.as("t") join source.as("s")`,
    * so the statement's aliases remap onto those two fixed qualifiers.
    * Unqualified names stay bare — they resolve on the joined frame,
    * and a name living on both sides surfaces as the standard
    * ambiguity error. */
  def mergeExpr(e: Expression, tAlias: Option[String],
      sAlias: Option[String]): Column =
    ColumnBridge.column(e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length == 2 =>
        val q = a.nameParts.head
        if (tAlias.exists(_.equalsIgnoreCase(q)))
          UnresolvedAttribute(Seq("t", a.nameParts.last))
        else if (sAlias.exists(_.equalsIgnoreCase(q)))
          UnresolvedAttribute(Seq("s", a.nameParts.last))
        else a
    })

  /** MERGE key columns from the ON condition: a conjunction of
    * same-name equalities between the two sides (`t.k = s.k`). The
    * lake's mergeInto joins on key-column NAME equality — an ON shape
    * it cannot express (cross-name keys, range terms) is refused at
    * analysis with the rewrite hint, not silently mis-joined. */
  def keyColsOf(onCond: Expression, tAlias: Option[String],
      sAlias: Option[String]): Seq[String] = {
    def split(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        split(l) ++ split(r)
      case other => Seq(other)
    }
    def bareName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        Some(a.nameParts.head)
      case a: UnresolvedAttribute if a.nameParts.length == 2 &&
          (tAlias.exists(_.equalsIgnoreCase(a.nameParts.head)) ||
            sAlias.exists(_.equalsIgnoreCase(a.nameParts.head))) =>
        Some(a.nameParts.last)
      case _ => None
    }
    split(onCond).map {
      case EqualTo(l, r) =>
        (bareName(l), bareName(r)) match {
          case (Some(a), Some(b)) if a.equalsIgnoreCase(b) => a
          case _ => throw new IllegalArgumentException(
            "graft-lake MERGE: ON must be a conjunction of same-name " +
              s"key equalities (t.k = s.k); got `$l = $r` — rename the " +
              "source column to match the target key, or merge through " +
              "the ManifestLake.mergeInto API")
        }
      case other => throw new IllegalArgumentException(
        "graft-lake MERGE: ON must be a conjunction of same-name key " +
          s"equalities (t.k = s.k); got non-equality term `$other`")
    }.distinct
  }

  /** Refuse duplicate assignment targets (`SET v = 1, v = 2`) —
    * downstream the list converts to a Map, which would silently keep
    * the last; Spark/Delta error on this (ADVICE r14 #4). Mirrors the
    * INSERT column-list duplicate check; case-insensitive, like every
    * other name rule in the DML layer. */
  def requireDistinctKeys(keys: Seq[String], what: String): Unit = {
    val dup = keys.groupBy(_.toLowerCase).collect {
      case (_, ks) if ks.length > 1 => ks.head
    }
    require(dup.isEmpty,
      s"graft-lake $what: duplicate assignment target(s) " +
        s"${dup.mkString(", ")} — each column may be assigned once")
  }

  private[plans] def ordColOrRefuse(spark: SparkSession, path: String,
      stmt: String): String =
    ManifestLake.ordColOf(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"graft-lake $stmt: table at $path carries no ord-column " +
          "metadata (created before it existed) — run the operation " +
          "through the ManifestLake API, which takes ordCol explicitly"))

  private[plans] def attr(name: String, t: DataType): Attribute =
    AttributeReference(name, t, nullable = false)()

  /** Align an INSERT-shaped query frame onto the table's insertable
    * columns — ANSI INSERT semantics, shared by GraftInsertCommand and
    * GraftReplaceWhereCommand (r17): positional (arity-checked) by
    * default, name-based under BY NAME or an explicit column list
    * (unlisted columns land NULL); every value cast to the target
    * column's declared type. `day` never appears in the insert schema
    * — it is derived from the ord column by the write path itself. */
  private[plans] def alignInsert(df0: DataFrame,
      cols: Seq[org.apache.spark.sql.types.StructField],
      userCols: Seq[String], byName: Boolean, stmt: String): DataFrame =
    if (userCols.nonEmpty) {
      require(userCols.length == df0.columns.length,
        s"graft-lake $stmt: ${userCols.length} columns listed but the " +
          s"query produces ${df0.columns.length}")
      val listed = userCols.map(_.toLowerCase).toSet
      require(listed.size == userCols.length,
        s"graft-lake $stmt: duplicate column in the insert list")
      userCols.foreach { c =>
        require(cols.exists(_.name.equalsIgnoreCase(c)),
          s"graft-lake $stmt: unknown column '$c'") }
      val named = df0.toDF(userCols: _*)
      named.select(cols.map { f =>
        if (listed.contains(f.name.toLowerCase))
          col(s"`${f.name}`").cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    } else if (byName) {
      val have = df0.columns.map(_.toLowerCase).toSet
      cols.foreach { f =>
        require(have.contains(f.name.toLowerCase),
          s"graft-lake $stmt BY NAME: query is missing column " +
            s"'${f.name}'") }
      // extra source columns are an ERROR, not a silent drop (the
      // Spark/Delta rule; review r14 #5) — additive widening goes
      // through ALTER TABLE ADD COLUMNS or the append API. The one
      // exception is the table's own derived `day`: every lake READ
      // carries it, so lake-to-lake `BY NAME SELECT *` must keep
      // working — the write path re-derives it anyway (pass-2 #2)
      val targetLower = cols.map(_.name.toLowerCase).toSet
      val extra = df0.columns.filterNot(c =>
        targetLower.contains(c.toLowerCase) ||
          c.equalsIgnoreCase("day"))
      require(extra.isEmpty,
        s"graft-lake $stmt BY NAME: query column(s) " +
          s"${extra.mkString(", ")} are not in the table — project " +
          "them away, or widen first with ALTER TABLE ADD COLUMNS")
      df0.select(cols.map(f =>
        col(s"`${f.name}`").cast(f.dataType).as(f.name)): _*)
    } else {
      require(df0.columns.length == cols.length,
        s"graft-lake $stmt: table has ${cols.length} insertable " +
          s"columns (day is derived) but the query produces " +
          s"${df0.columns.length}")
      df0.toDF(cols.map(_.name): _*).select(cols.map(f =>
        col(s"`${f.name}`").cast(f.dataType).as(f.name)): _*)
    }
}

/** `DELETE FROM \`graft-lake\`.\`path\` WHERE …` → the lake's
  * copy-on-write deleteWhere: discovery is one pruned scan, the
  * rewrite touches only the days holding matches, the commit is one
  * atomic manifest rename under OCC. Returns the deleted row count
  * (Delta's num_affected_rows). */
case class GraftDeleteCommand(path: String, cond: Column)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(LakeDml.attr("deleted_rows",
    LongType))
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(ManifestLake.deleteWhere(spark, path, cond)))
}

/** `UPDATE \`graft-lake\`.\`path\` SET … WHERE …` → updateWhere (CoW,
  * cross-day-move aware, OCC). Returns the updated row count. */
case class GraftUpdateCommand(path: String, set: Seq[(String, Column)],
    cond: Column) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(LakeDml.attr("updated_rows",
    LongType))
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(ManifestLake.updateWhere(spark, path, set.toMap, cond)))
}

/** `INSERT INTO | INSERT OVERWRITE \`graft-lake\`.\`path\` [cols]
  * SELECT …` → append / replaceAll under the table's persisted ord
  * column. Alignment follows ANSI INSERT: positional (arity-checked)
  * by default, name-based under `BY NAME` or an explicit column list
  * (unlisted columns land NULL); every value is cast to the target
  * column's declared type. `day` never appears in the insert schema —
  * it is derived from the ord column by the write path itself. */
case class GraftInsertCommand(path: String, query: LogicalPlan,
    userCols: Seq[String], overwrite: Boolean, byName: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(LakeDml.attr("version",
    LongType))
  // keep EXPLAIN to one line — the query subtree prints as its class
  override protected def stringArgs: Iterator[Any] =
    Iterator(path, userCols, overwrite, byName)

  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = StreamingDataFrames.ofRows(spark, query)
    val ord = LakeDml.ordColOrRefuse(spark, path, "INSERT")
    val target = ManifestLake.read(spark, path).schema
    val cols = target.fields.filterNot(_.name.equalsIgnoreCase("day")).toSeq
    val aligned: DataFrame =
      LakeDml.alignInsert(df0, cols, userCols, byName, "INSERT")
    val v =
      if (overwrite) ManifestLake.replaceAll(spark, path, aligned, ord)
      else ManifestLake.append(spark, path, aligned, ord)
    Seq(Row(v))
  }
}

/** `INSERT INTO \`graft-lake\`.\`path\` REPLACE WHERE pred SELECT …`
  * and `df.writeTo(…).overwrite(cond)` (r17, VERDICT r16 #3): both
  * parse/build to `OverwriteByExpression`, which ResolveLakeRelation's
  * DML pre-pass swaps for this command — BEFORE the built-in V2 write
  * resolution would demand a catalog table (and before applyReads
  * would inline the path-form target into a read plan). Lands on
  * ManifestLake.replaceWhere: one atomic commit composing
  * deleteWhere(pred) + append, batch rows validated against the
  * predicate. A literal-TRUE condition (writeTo's
  * `.overwrite(lit(true))`, Delta's truncate idiom) takes replaceAll's
  * cheaper whole-table path — no discovery scan, Serializable conflict
  * rule. The predicate is translated as a full Column (LakeDml.bare),
  * so ANY deterministic predicate works — no source-filter
  * translatability wall (the catalog's SupportsOverwrite door keeps
  * that wall and refuses loudly; this route is the remedy it names). */
case class GraftReplaceWhereCommand(path: String, query: LogicalPlan,
    cond: Column, byName: Boolean, truncate: Boolean)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(LakeDml.attr("version",
    LongType))
  override protected def stringArgs: Iterator[Any] =
    Iterator(path, byName, truncate)

  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = StreamingDataFrames.ofRows(spark, query)
    val ord = LakeDml.ordColOrRefuse(spark, path, "REPLACE WHERE")
    val target = ManifestLake.read(spark, path).schema
    val cols = target.fields.filterNot(_.name.equalsIgnoreCase("day")).toSeq
    val aligned = LakeDml.alignInsert(df0, cols, Seq.empty, byName,
      "REPLACE WHERE")
    val v =
      if (truncate) ManifestLake.replaceAll(spark, path, aligned, ord)
      else ManifestLake.replaceWhere(spark, path, aligned, cond, ord)
    Seq(Row(v))
  }
}

/** `ALTER TABLE \`graft-lake\`.\`path\` …` — the metadata-only DDL
  * verbs, each ONE manifest commit through the corresponding lake
  * API: RENAME COLUMN / DROP COLUMN ride the column-mapping tier
  * (physical names and bytes never move; the ord column renames WITH
  * its table metadata and refuses to drop), ADD COLUMNS widens the
  * checkpoint explicitly (readers see the new column as NULL before
  * any row carries it), ADD/DROP CONSTRAINT manage the CHECK set
  * every write enforces. */
case class GraftAlterCommand(path: String, action: GraftAlterCommand.Action)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(LakeDml.attr("version",
    LongType))
  override def run(spark: SparkSession): Seq[Row] = {
    import GraftAlterCommand._
    val v = action match {
      case RenameCol(from, to) =>
        ManifestLake.renameColumn(spark, path, from, to)
      case DropCols(names, ifExists) =>
        val have = ManifestLake.read(spark, path).columns
          .map(_.toLowerCase).toSet
        val (present, missing) = names.partition(n =>
          have.contains(n.toLowerCase))
        require(ifExists || missing.isEmpty,
          s"graft-lake ALTER: no such column ${missing.mkString(", ")}")
        // ONE commit for the whole list — a per-column loop could die
        // halfway and leave a half-applied DDL (review r14 #7)
        if (present.isEmpty) ManifestLake.snapshot(spark, path).version
        else ManifestLake.dropColumns(spark, path, present)
      case AddCols(schema) => ManifestLake.addColumns(spark, path, schema)
      case AddCheck(name, condition) =>
        ManifestLake.addCheck(spark, path, name, condition)
      case DropCheck(name, ifExists) =>
        if (ifExists &&
            !ManifestLake.checksOf(spark, path).exists(_._1 == name))
          ManifestLake.snapshot(spark, path).version
        else ManifestLake.dropCheck(spark, path, name)
    }
    Seq(Row(v))
  }
}

object GraftAlterCommand {
  sealed trait Action
  final case class RenameCol(from: String, to: String) extends Action
  final case class DropCols(names: Seq[String], ifExists: Boolean)
      extends Action
  final case class AddCols(schema: org.apache.spark.sql.types.StructType)
      extends Action
  final case class AddCheck(name: String, condition: String) extends Action
  final case class DropCheck(name: String, ifExists: Boolean) extends Action
}

/** `CREATE TABLE \`graft-lake\`.\`path\` … OPTIONS ('ordCol' 'ts')
  * [AS SELECT …]` → ManifestLake.create: the SQL table lifecycle's
  * missing first verb. The ord column arrives as a table OPTION (or
  * TBLPROPERTY) because it IS table metadata — the same value create
  * persists for every later statement to read back. `filesPerDay`,
  * `statsCols`, `bloomCols` options map onto create's layout/indexing
  * knobs. Column-defined (no AS) creates commit an EMPTY v1 whose
  * schema anchors every later append. IF NOT EXISTS no-ops on an
  * existing table; a bare CREATE over one refuses — the lake's
  * history is append-only and silently re-creating would orphan it. */
case class GraftCreateTableCommand(path: String, ordCol: String,
    filesPerDay: Int, statsCols: Seq[String], bloomCols: Seq[String],
    query: Option[LogicalPlan],
    emptySchema: Option[org.apache.spark.sql.types.StructType],
    ifNotExists: Boolean) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(LakeDml.attr("version",
    LongType))
  override protected def stringArgs: Iterator[Any] =
    Iterator(path, ordCol, ifNotExists)

  override def run(spark: SparkSession): Seq[Row] = {
    // tableExists, not a catch-all probe: snapshot() answers version 0
    // for an absent table, so swallowing exceptions here would only
    // mask real I/O failures as "absent" and then clobber a
    // half-readable table (review r14 #3)
    if (ManifestLake.tableExists(spark, path)) {
      val existing = ManifestLake.snapshot(spark, path).version
      if (ifNotExists) return Seq(Row(existing))
      throw new IllegalArgumentException(
        s"graft-lake CREATE TABLE: $path already holds a committed " +
          s"table (head v$existing) — the history is append-only; use " +
          "INSERT OVERWRITE to replace the data, or CREATE TABLE IF " +
          "NOT EXISTS to no-op")
    }
    val df = query.map(StreamingDataFrames.ofRows(spark, _)).getOrElse {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], emptySchema.get)
    }
    require(df.columns.exists(_.equalsIgnoreCase(ordCol)),
      s"graft-lake CREATE TABLE: ord column '$ordCol' is not among the " +
        s"table's columns (${df.columns.mkString(", ")})")
    val v = ManifestLake.create(spark, path, df, ordCol, filesPerDay,
      statsCols, bloomCols)
    Seq(Row(v))
  }
}

/** `MERGE INTO \`graft-lake\`.\`path\` t USING src s ON t.k = s.k
  * WHEN …` → the lake's clause-based mergeInto, which already carries
  * the full Delta MERGE contract (first-applicable clause precedence,
  * source-ambiguity refusal, cross-day key moves, OCC, additive
  * schema evolution for a wider source). Explicit INSERT column lists
  * must be the identity mapping of the source's columns — the lake
  * inserts the source ROW; a reshaping insert belongs in the source
  * projection (checked here against the actual source schema). */
case class GraftMergeCommand(path: String, source: LogicalPlan,
    clauses: Seq[ManifestLake.MergeClause], keyCols: Seq[String],
    insertIdentity: Seq[(String, String)]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(LakeDml.attr("version",
    LongType))
  override protected def stringArgs: Iterator[Any] =
    Iterator(path, keyCols, clauses.length)

  override def run(spark: SparkSession): Seq[Row] = {
    val src = StreamingDataFrames.ofRows(spark, source)
    val ord = LakeDml.ordColOrRefuse(spark, path, "MERGE")
    if (insertIdentity.nonEmpty) {
      val listed = insertIdentity.map(_._1.toLowerCase).toSet
      val have = src.columns.map(_.toLowerCase).toSet
      require(listed == have,
        "graft-lake MERGE: an explicit INSERT column list must name " +
          s"exactly the source's columns (${src.columns.mkString(", ")}) " +
          "— the lake inserts the source row; reshape in the USING " +
          "source projection instead")
    }
    keyCols.foreach { k =>
      require(src.columns.exists(_.equalsIgnoreCase(k)),
        s"graft-lake MERGE: key column '$k' is missing from the source") }
    val v = ManifestLake.mergeInto(spark, path, src, keyCols, ord, clauses)
    Seq(Row(v))
  }
}
