package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException,
  NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange,
  SupportsNamespaces, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The `graft` catalog as a REAL V2 TableCatalog (VERDICT r14 #3 —
  * Delta's DeltaCatalog is the published design): register with
  *
  *   spark.sql.catalog.graft = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.warehouse = /path/to/warehouse
  *
  * and `SHOW NAMESPACES IN graft`, `SHOW TABLES IN graft.db`,
  * `DESCRIBE TABLE graft.db.t` and the spark.catalog listing APIs all
  * see the warehouse's lakes — the catalog surface the warehouse
  * CONVENTION (r14's ``graft`.`db`.`t`` → `<warehouse>/db/t`) could
  * not serve, because namespace/table listing never passes through
  * relation resolution.
  *
  * Deliberate division of labor: this catalog serves METADATA
  * (namespaces, table listings, schemas, properties). Reads and DML
  * keep resolving through ResolveLakeRelation's hints-batch rule,
  * which claims the `graft.db.t` identifier BEFORE catalog
  * resolution ever runs — so registering the catalog changes not one
  * plan (GraftCatalogSpec pins plan-string equality with the
  * convention-only route). That is why `capabilities()` carries NO
  * read capability: a DSv2 read of this Table is unreachable in a
  * correctly configured session, and an exotic path that does reach
  * it gets the engine's own "table does not support batch read" with
  * the catalog name in it, not silent wrongness. Writes are the one
  * exception (r16): `df.writeTo("graft.db.t")` has no earlier
  * claimant — the V2 writer resolves straight through the catalog —
  * so the Table carries V1_BATCH_WRITE/TRUNCATE and bridges onto the
  * lake's own append/replaceAll transactions (see GraftCatalogTable's
  * doc). The warehouse itself
  * REMAINS the catalog state — a table IS its lake directory, a
  * namespace IS a directory; no second metastore to drift.
  *
  * The convention stays the no-config fallback: lakePathOf consults
  * `spark.graft.warehouse` first, then the catalog registration's
  * own `spark.sql.catalog.graft.warehouse`, so registering the
  * catalog alone (one conf pair) lights up every front door at once.
  *
  * Cost shape: every operation is O(one directory listing) or
  * O(one manifest read) — the same metadata the lake APIs pay;
  * nothing scans data. */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = "graft"
  private var warehouseOpt: Option[String] = None

  private def spark: SparkSession = SparkSession.active

  /** Warehouse resolved at CALL time, live conf first: the engine's
    * CatalogManager caches this instance for the session's lifetime,
    * so the option snapshot initialize() captured goes STALE the
    * moment the session repoints `spark.sql.catalog.<name>.warehouse`
    * — the cached catalog would keep listing the old directory
    * (found as a cross-suite interference: one suite's cached
    * instance served another suite's queries from the wrong
    * warehouse). Reading the conf live also keeps this surface
    * consistent with lakePathOf, which already resolves the
    * convention conf per query. */
  private def warehouse: String = spark.conf
    .getOption(s"spark.sql.catalog.$catalogName.warehouse")
    .orElse(warehouseOpt)
    .orElse(spark.conf.getOption("spark.graft.warehouse"))
    .getOrElse(throw new IllegalArgumentException(
      s"catalog '$catalogName' needs a warehouse: set " +
        s"spark.sql.catalog.$catalogName.warehouse (or the " +
        "spark.graft.warehouse convention conf)"))
    .stripSuffix("/")

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def dirsUnder(p: Path): Seq[String] = {
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
  }

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouseOpt = Option(options.get("warehouse")).map(_.trim)
      .filter(_.nonEmpty)
  }

  override def name(): String = catalogName

  // ---- namespaces: directory chains under the warehouse (r16:
  // multi-level — `graft.a.b.t` is `<warehouse>/a/b/t`; a namespace
  // IS a directory chain, a table IS a lake directory, so the only
  // disambiguation needed is "is this directory a committed lake?"
  // — a lake dir is a table, never a namespace) ----

  private def plainParts(parts: Seq[String]): Boolean =
    parts.nonEmpty && parts.forall(p =>
      p.nonEmpty && !p.contains('/') && p != "." && p != "..")

  private def nsPath(namespace: Array[String]): Path =
    new Path((warehouse +: namespace.toSeq).mkString("/"))

  override def listNamespaces(): Array[Array[String]] =
    dirsUnder(new Path(warehouse))
      .filterNot(d => ManifestLake.tableExists(spark, s"$warehouse/$d"))
      .map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    val base = nsPath(namespace)
    dirsUnder(base)
      .filterNot(d => ManifestLake.tableExists(spark, s"$base/$d"))
      .map(d => namespace :+ d).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    plainParts(namespace.toSeq) &&
      fs(new Path(warehouse)).exists(nsPath(namespace)) &&
      !ManifestLake.tableExists(spark, nsPath(namespace).toString)

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    Map(SupportsNamespaces.PROP_LOCATION ->
      nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    require(plainParts(namespace.toSeq),
      s"graft catalog namespaces are plain directory names, got " +
        namespace.mkString("."))
    if (namespaceExists(namespace))
      throw new NamespaceAlreadyExistsException(
        (catalogName +: namespace.toSeq).toArray)
    // a lake-table directory is a TABLE, never a namespace (ADVICE r16
    // #4): namespaceExists answers false for it, so without this check
    // the mkdirs would silently no-op and report a "created" namespace
    // that never appears in listNamespaces
    require(!ManifestLake.tableExists(spark, nsPath(namespace).toString),
      s"graft catalog: ${namespace.mkString(".")} is a lake TABLE, " +
        "not a namespace — a table directory cannot also be a " +
        "namespace; pick another name or drop the table first")
    // mkdirs creates missing parents — CREATE NAMESPACE a.b behaves
    // like mkdir -p, matching the filesystem-IS-the-catalog model
    fs(new Path(warehouse)).mkdirs(nsPath(namespace))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: a namespace is a warehouse directory — it " +
        "carries no mutable metadata to alter")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val p = nsPath(namespace)
    // non-cascade emptiness means ANY child directory, not just valid
    // lake tables (ADVICE r15 #2): listTables filters to committed
    // lakes, so a half-created lake or a scratch dir would have passed
    // the check and been recursively deleted without CASCADE
    if (!cascade && dirsUnder(p).nonEmpty)
      throw new org.apache.spark.sql.catalyst.analysis
        .NonEmptyNamespaceException((catalogName +: namespace.toSeq).toArray)
    fs(p).delete(p, true)
  }

  // ---- tables: lake roots under a namespace directory chain ----

  private def pathOf(ident: Identifier): String = {
    require(plainParts(ident.namespace.toSeq :+ ident.name),
      s"graft catalog identifiers are plain names, got $ident")
    (warehouse +: ident.namespace.toSeq :+ ident.name).mkString("/")
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    val base = nsPath(namespace)
    dirsUnder(base)
      .filter(t => ManifestLake.tableExists(spark, s"$base/$t"))
      .map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    plainParts(ident.namespace.toSeq :+ ident.name) &&
      ManifestLake.tableExists(spark, pathOf(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(
      (catalogName +: ident.namespace.toSeq) :+ ident.name)
    GraftCatalogTable(spark, s"$catalogName.${ident.namespace.head}" +
      s".${ident.name}", pathOf(ident))
  }

  /** CREATE through the catalog API (spark.catalog / programmatic
    * route; the SQL CREATE statement is claimed earlier by
    * ResolveLakeRelation and lands on the same ManifestLake.create).
    * The ord column arrives as the `ordCol` table property — it IS
    * table metadata, same as the SQL front door's OPTIONS. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(
      (catalogName +: ident.namespace.toSeq) :+ ident.name)
    require(partitions.isEmpty,
      "graft catalog: PARTITIONED BY is not accepted — the lake " +
        "partitions by day(ordCol) itself")
    val props = properties.asScala.map { case (k, v) =>
      k.toLowerCase -> v }
    val ordCol = props.getOrElse("ordcol",
      throw new IllegalArgumentException(
        "graft catalog CREATE requires table property 'ordCol' (the " +
          "event-time column day partitioning derives from)"))
    require(schema.fieldNames.exists(_.equalsIgnoreCase(ordCol)),
      s"graft catalog CREATE: ord column '$ordCol' is not in the schema")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    ManifestLake.create(spark, pathOf(ident), empty, ordCol,
      filesPerDay = props.get("filesperday").map(_.toInt).getOrElse(1),
      statsCols = props.get("statscols").toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
      bloomCols = props.get("bloomcols").toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)))
    loadTable(ident)
  }

  /** The three metadata-only column DDLs map onto the lake's own
    * one-commit APIs (same routes the SQL ALTER statements take);
    * anything else refuses loudly rather than pretending. Changes of
    * the SAME kind batch into ONE commit — the engine hands a
    * multi-column `ADD COLUMNS (a, b)` over as several AddColumn
    * changes, and a per-change commit loop could die halfway and
    * leave a half-applied DDL (the review-r14 DropCols rule, applied
    * here too). Mixed-kind statements are refused up front for the
    * same reason: the lake has no multi-kind metadata transaction. */
  override def alterTable(ident: Identifier, changes: TableChange*)
      : Table = {
    val path = pathOf(ident)
    if (!tableExists(ident)) throw new NoSuchTableException(
      (catalogName +: ident.namespace.toSeq) :+ ident.name)
    val kinds = changes.map(_.getClass.getSimpleName).distinct
    require(kinds.length <= 1,
      s"graft catalog: one ALTER may carry one change kind (got " +
        s"${kinds.mkString(", ")}) — the lake commits each kind " +
        "atomically but has no mixed-kind metadata transaction")
    changes.headOption match {
      case Some(_: TableChange.AddColumn) =>
        val fields = changes.map { c =>
          val a = c.asInstanceOf[TableChange.AddColumn]
          require(a.fieldNames.length == 1,
            "graft catalog: nested-field adds are not supported")
          // unsupported AddColumn variants fail LOUDLY like every
          // other unsupported TableChange (ADVICE r15 #3): silently
          // appending a FIRST/AFTER column at the end, or dropping a
          // COMMENT/DEFAULT, would diverge from the requested DDL
          require(a.position == null,
            "graft catalog: ADD COLUMN position (FIRST/AFTER) is not " +
              "supported — added columns append at the end; omit the " +
              "position clause")
          require(a.comment == null,
            "graft catalog: ADD COLUMN ... COMMENT is not supported — " +
              "the lake stores no column comments; omit the comment")
          require(a.defaultValue == null,
            "graft catalog: ADD COLUMN ... DEFAULT is not supported — " +
              "added columns read NULL on pre-add files; omit the " +
              "default")
          org.apache.spark.sql.types.StructField(a.fieldNames.head,
            a.dataType, a.isNullable)
        }
        ManifestLake.addColumns(spark, path, StructType(fields))
      case Some(r: TableChange.RenameColumn) =>
        require(changes.length == 1,
          "graft catalog: one rename per ALTER")
        require(r.fieldNames.length == 1,
          "graft catalog: nested-field renames are not supported")
        ManifestLake.renameColumn(spark, path, r.fieldNames.head,
          r.newName)
      case Some(_: TableChange.DeleteColumn) =>
        ManifestLake.dropColumns(spark, path, changes.map { c =>
          val d = c.asInstanceOf[TableChange.DeleteColumn]
          require(d.fieldNames.length == 1,
            "graft catalog: nested-field drops are not supported")
          d.fieldNames.head
        })
      case Some(other) => throw new UnsupportedOperationException(
        s"graft catalog: unsupported table change $other — the lake's " +
          "DDL surface is ADD/RENAME/DROP COLUMNS (plus CHECK " +
          "constraints via ALTER TABLE SQL)")
      case None => ()
    }
    loadTable(ident)
  }

  /** DROP TABLE deletes the lake directory — the whole committed
    * history goes with it (the catalog-level destructor, Delta's
    * DROP TABLE on a path table). Returns false when absent, per the
    * interface contract. */
  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val p = new Path(pathOf(ident))
    fs(p).delete(p, true)
  }

  /** Table rename is a directory move — atomic on a posix-like FS,
    * refused across namespaces only if the target's namespace dir is
    * missing. The manifest stores RELATIVE paths, so a moved lake
    * reads identically at its new root. */
  override def renameTable(oldIdent: Identifier,
      newIdent0: Identifier): Unit = {
    // `RENAME TO graft.db.t` hands the catalog name back inside the
    // identifier (the engine does not re-resolve the target) —
    // accept the redundant prefix rather than failing a natural
    // spelling
    val newIdent =
      if (newIdent0.namespace.length >= 2 &&
          newIdent0.namespace.head.equalsIgnoreCase(catalogName) &&
          !namespaceExists(newIdent0.namespace))
        Identifier.of(newIdent0.namespace.drop(1), newIdent0.name)
      else newIdent0
    if (!tableExists(oldIdent)) throw new NoSuchTableException(
      (catalogName +: oldIdent.namespace.toSeq) :+ oldIdent.name)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(
      (catalogName +: newIdent.namespace.toSeq) :+ newIdent.name)
    val dst = new Path(pathOf(newIdent))
    val f = fs(dst)
    f.mkdirs(dst.getParent)
    require(f.rename(new Path(pathOf(oldIdent)), dst),
      s"graft catalog: filesystem refused the rename $oldIdent -> " +
        s"$newIdent")
  }
}

/** The Table the catalog serves: schema and day partitioning from the
  * lake's own checkpoint (one manifest read), properties from the
  * table metadata files, and — as of r16 — the DataFrameWriterV2
  * route (`df.writeTo("graft.db.t").append()` / `.overwrite(
  * lit(true))`), a Delta user's first write idiom (VERDICT r15 #3).
  *
  * Writes take the V1Write bridge (DeltaCatalog's own historical
  * route): the WriteBuilder hands back an InsertableRelation whose
  * insert() lands on the SAME lake transactions the other three
  * write doors use — append → ManifestLake.append (one atomic
  * commit, OCC rebase), truncate-overwrite → replaceAll, and (r17)
  * filter-overwrite → replaceWhere under strict total-or-refuse
  * filter translation. A full DSv2
  * BatchWrite would re-implement the parquet writer per-partition
  * and STILL have to serialize on the manifest commit; the V1 bridge
  * keeps one write path, one conflict story. No BATCH_READ on
  * purpose — reads keep resolving through ResolveLakeRelation's
  * pruned plan (see GraftCatalog's doc; plan-string equality is
  * spec-pinned), so an exotic DSv2 read still fails loudly.
  *
  * The engine resolves writeTo frames against schema(), which
  * carries the DERIVED `day` column — a writer therefore includes
  * it (any value, usually carried from a read or date_format) and
  * the lake recomputes it from ordCol at write time, the same
  * generated-column discipline every other door applies; a `day`
  * disagreeing with day(ordCol) can never land. */
private[graft] case class GraftCatalogTable(spark: SparkSession,
    fullName: String, path: String) extends Table
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = fullName
  override def schema(): StructType = ManifestLake.read(spark, path).schema
  override def partitioning(): Array[Transform] =
    Array(Expressions.identity("day"))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Set.of(TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsOverwrite {
      private var replaceAll = false
      private var replaceCond
        : Option[org.apache.spark.sql.Column] = None
      override def truncate()
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        replaceAll = true; this
      }
      /** Predicate overwrite through the CATALOG door (r17, VERDICT
        * r16 #3 — Delta's replaceWhere): the engine hands the
        * overwrite condition as source Filters; translation here must
        * be TOTAL-or-refuse (GraftLakeRelation.translate's strict
        * form) — the read path may DROP an untranslatable conjunct
        * (costs pruning only), but an overwrite scoped by a dropped
        * conjunct would replace MORE rows than asked. In a session
        * with GraftExtensions this door is shadowed by the hints-batch
        * OverwriteByExpression claim (GraftReplaceWhereCommand, which
        * accepts ANY predicate); it exists for catalog-only sessions
        * and refuses loudly with that remedy. */
      override def overwrite(
          filters: Array[org.apache.spark.sql.sources.Filter])
          : org.apache.spark.sql.connector.write.WriteBuilder = {
        val trueish = filters.isEmpty || (filters.length == 1 &&
          filters.head.isInstanceOf[org.apache.spark.sql.sources
            .AlwaysTrue])
        if (trueish) replaceAll = true
        else {
          val cols = filters.map { f =>
            GraftLakeRelation.translate(f).getOrElse(
              throw new UnsupportedOperationException(
                s"graft catalog: overwrite predicate $f is not " +
                  "translatable to a source filter — run the " +
                  "predicate overwrite through the SQL door " +
                  "(`INSERT INTO … REPLACE WHERE …`) or " +
                  "ManifestLake.replaceWhere, which accept any " +
                  "predicate"))
          }
          replaceCond = Some(cols.reduce(_ && _))
        }
        this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.V1Write {
          override def toInsertableRelation
              : org.apache.spark.sql.sources.InsertableRelation =
            new org.apache.spark.sql.sources.InsertableRelation {
              override def insert(data: org.apache.spark.sql.DataFrame,
                  overwrite: Boolean): Unit = {
                val ord = ManifestLake.ordColOf(spark, path).getOrElse(
                  throw new IllegalStateException(
                    s"$fullName has no persisted ord column (a " +
                      "pre-metadata lake) — writeTo cannot derive the " +
                      "day partitioning; use ManifestLake.append with " +
                      "an explicit ordCol"))
                // drop the derived day column; the lake recomputes it
                // from ordCol (generated-column discipline)
                val rows = data.drop("day")
                replaceCond match {
                  case Some(cond) =>
                    ManifestLake.replaceWhere(spark, path, rows, cond,
                      ord)
                  case None =>
                    if (replaceAll || overwrite)
                      ManifestLake.replaceAll(spark, path, rows, ord)
                    else ManifestLake.append(spark, path, rows, ord)
                }
                ()
              }
            }
        }
    }
  override def properties(): java.util.Map[String, String] = {
    val snap = ManifestLake.snapshot(spark, path)
    (Map(
      TableCatalog.PROP_LOCATION -> path,
      TableCatalog.PROP_PROVIDER -> "graft-lake",
      "head_version" -> snap.version.toString) ++
      ManifestLake.ordColOf(spark, path).map("ordCol" -> _)).asJava
  }
}
