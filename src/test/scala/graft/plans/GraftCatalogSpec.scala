package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.sources.{GraftCatalog, ManifestLake}

/** The V2 TableCatalog plugin (VERDICT r14 #3): registering
  * `spark.sql.catalog.graft = graft.sources.GraftCatalog` (+ its
  * warehouse option) makes the warehouse a REAL catalog — SHOW
  * NAMESPACES / SHOW TABLES / DESCRIBE TABLE / spark.catalog APIs see
  * the lakes — while reads and DML keep planning through the
  * hints-batch rule, so the catalog changes not one plan (pinned
  * below by plan-string equality against the convention-only route).
  * No second metastore: a namespace is a warehouse directory, a
  * table is its lake root. */
class GraftCatalogSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private lazy val warehouse =
    Files.createTempDirectory("graft_cat_wh").toString

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", warehouse)
  }
  override def afterAll(): Unit = {
    spark.conf.unset("spark.sql.catalog.graft")
    spark.conf.unset("spark.sql.catalog.graft.warehouse")
    super.afterAll()
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def seed(n: Int) = (0 until n).map(i =>
    (i.toLong, ts("2024-03-01 10:00:00"), i * 1.0)).toDF("id", "ts", "v")

  test("SHOW NAMESPACES / SHOW TABLES / DESCRIBE TABLE see the " +
      "warehouse's lakes through the registered catalog") {
    seed(4).createOrReplaceTempView("cat_src")
    spark.sql("CREATE TABLE graft.sales.orders " +
      "OPTIONS ('ordCol' 'ts') AS SELECT * FROM cat_src")
    spark.sql("CREATE TABLE graft.sales.refunds " +
      "OPTIONS ('ordCol' 'ts') AS SELECT * FROM cat_src")
    // a non-lake directory in the namespace must NOT list as a table
    new java.io.File(s"$warehouse/sales/scratch").mkdirs()
    assert(spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).toSet == Set("sales"))
    assert(spark.sql("SHOW TABLES IN graft.sales").collect()
      .map(_.getString(1)).toSet == Set("orders", "refunds"))
    val desc = spark.sql("DESCRIBE TABLE graft.sales.orders").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(desc("id") == "bigint" && desc("ts") == "timestamp" &&
      desc("v") == "double" && desc("day") == "string")
    val ext = spark.sql("DESCRIBE TABLE EXTENDED graft.sales.orders")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ext.get("Provider").contains("graft-lake"))
    // day partitioning is visible catalog metadata
    assert(spark.sql("DESCRIBE TABLE graft.sales.orders").collect()
      .exists(_.getString(0).contains("Partitioning")) ||
      ext.keys.exists(_.contains("Part")))
    // SHOW TBLPROPERTIES reads the same lake metadata (ordCol, head)
    val props = spark.sql("SHOW TBLPROPERTIES graft.sales.orders")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("ordCol").contains("ts"), props)
    assert(props.get("head_version").exists(_.toLong >= 1L), props)
  }

  test("reads and DML plan IDENTICALLY with and without the catalog " +
      "registered — the hints rule claims the identifier first") {
    seed(6).createOrReplaceTempView("cat_src2")
    spark.sql("CREATE TABLE graft.sales.plan_t " +
      "OPTIONS ('ordCol' 'ts') AS SELECT * FROM cat_src2")
    def norm(p: String): String =
      p.replaceAll("#\\d+", "#x").replaceAll("plan_id=\\d+", "plan_id=x")
    val q = "SELECT id, v FROM graft.sales.plan_t WHERE id > 2"
    val withCat = norm(spark.sql(q).queryExecution.optimizedPlan.toString)
    // drop the registration (keep the convention conf) and re-plan
    spark.conf.unset("spark.sql.catalog.graft")
    spark.conf.set("spark.graft.warehouse", warehouse)
    val without = try
      norm(spark.sql(q).queryExecution.optimizedPlan.toString)
    finally {
      spark.conf.unset("spark.graft.warehouse")
      spark.conf.set("spark.sql.catalog.graft",
        classOf[GraftCatalog].getName)
    }
    assert(withCat == without,
      s"catalog registration changed the plan:\n$withCat\nvs\n$without")
    // and DML still lands through the lake command route
    assert(spark.sql("UPDATE graft.sales.plan_t SET v = v + 1 " +
      "WHERE id = 3").collect().head.getLong(0) == 1L)
  }

  test("spark.catalog API surface: listTables names the lakes, " +
      "tableExists answers") {
    assert(spark.catalog.tableExists("graft.sales.orders"))
    assert(!spark.catalog.tableExists("graft.sales.nope"))
    val listed = spark.catalog.listTables("graft.sales").collect()
      .map(_.name).toSet
    assert(listed.contains("orders") && listed.contains("refunds"))
  }

  test("catalog CRUD: CREATE TABLE (columns) via catalog property, " +
      "ALTER ADD COLUMNS, rename, DROP TABLE") {
    spark.sql("CREATE NAMESPACE graft.crud")
    spark.sql("CREATE TABLE graft.crud.t1 (id BIGINT, ts TIMESTAMP) " +
      "OPTIONS ('ordCol' 'ts')")
    assert(ManifestLake.tableExists(spark, s"$warehouse/crud/t1"))
    spark.sql("ALTER TABLE graft.crud.t1 ADD COLUMNS (note STRING)")
    assert(spark.sql("SELECT * FROM graft.crud.t1").columns
      .contains("note"))
    spark.sql("INSERT INTO graft.crud.t1 VALUES " +
      "(1, TIMESTAMP '2024-03-02 09:00:00', 'hi')")
    assert(spark.sql("SELECT note FROM graft.crud.t1").collect()
      .head.getString(0) == "hi")
    // table rename is a directory move — the manifest's relative
    // paths make the moved lake read identically at its new root
    spark.sql("ALTER TABLE graft.crud.t1 RENAME TO graft.crud.t2")
    assert(!ManifestLake.tableExists(spark, s"$warehouse/crud/t1"))
    assert(spark.sql("SELECT note FROM graft.crud.t2").collect()
      .head.getString(0) == "hi")
    // DROP TABLE removes the lake directory through the catalog
    spark.sql("DROP TABLE graft.crud.t2")
    assert(!ManifestLake.tableExists(spark, s"$warehouse/crud/t2"))
    assert(spark.sql("SHOW TABLES IN graft.crud").collect().isEmpty)
  }

  test("writeTo (r16): append lands on the lake's transaction; the " +
      "derived day column is recomputed, never trusted") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.wrt")
    spark.sql("CREATE TABLE graft.wrt.t (id BIGINT, ts TIMESTAMP, " +
      "v DOUBLE) OPTIONS ('ordCol' 'ts')")
    // writeTo resolves by name against the table schema, which
    // carries the DERIVED day — supply a deliberately WRONG day and
    // assert the lake's own derivation wins (generated-column
    // discipline: day(ordCol) is recomputed at write time)
    seed(3).withColumn("day", lit("1999-12-31"))
      .writeTo("graft.wrt.t").append()
    val got = spark.sql("SELECT id, day FROM graft.wrt.t").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(0L, 1L, 2L), got)
    assert(got.values.toSet == Set("2024-03-01"),
      s"writeTo trusted the caller's day column: $got")
    // the append rode a real lake commit: history advances and the
    // second append composes (no overwrite semantics leaked in)
    seed(5).filter(col("id") >= 3).withColumn("day",
      date_format(col("ts"), "yyyy-MM-dd")).writeTo("graft.wrt.t").append()
    assert(spark.sql("SELECT count(*) FROM graft.wrt.t").collect()
      .head.getLong(0) == 5L)
    // overwrite(lit(true)) = truncate-replace through replaceAll
    seed(2).withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .writeTo("graft.wrt.t").overwrite(lit(true))
    assert(spark.sql("SELECT count(*) FROM graft.wrt.t").collect()
      .head.getLong(0) == 2L)
    // the three pre-existing doors answer identically post-writeTo
    assert(ManifestLake.read(spark, s"$warehouse/wrt/t").count() == 2L)
  }

  test("DROP NAMESPACE without CASCADE refuses on ANY child content, " +
      "not just valid lake tables (ADVICE r15 #2)") {
    spark.sql("CREATE NAMESPACE graft.halfmade")
    // a scratch/half-created dir is NOT a listable table — the old
    // listTables emptiness check would have deleted it silently
    new java.io.File(s"$warehouse/halfmade/wip").mkdirs()
    assert(spark.sql("SHOW TABLES IN graft.halfmade").collect().isEmpty)
    val e = intercept[Exception] {
      spark.sql("DROP NAMESPACE graft.halfmade")
    }
    assert(e.getMessage.contains("halfmade"), e.getMessage)
    assert(new java.io.File(s"$warehouse/halfmade/wip").exists(),
      "non-cascade drop deleted namespace content")
    spark.sql("DROP NAMESPACE graft.halfmade CASCADE")
    assert(!new java.io.File(s"$warehouse/halfmade").exists())
  }

  test("ALTER ADD COLUMNS with position/comment refuses loudly " +
      "instead of silently appending (ADVICE r15 #3)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.addc")
    spark.sql("CREATE TABLE graft.addc.t (id BIGINT, ts TIMESTAMP) " +
      "OPTIONS ('ordCol' 'ts')")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.addc.t ADD COLUMNS (x INT FIRST)")
    }
    assert(e1.getMessage.contains("position"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE graft.addc.t ADD COLUMNS " +
        "(x INT COMMENT 'nope')")
    }
    assert(e2.getMessage.contains("comment"), e2.getMessage)
    // the plain form still works, at the end
    spark.sql("ALTER TABLE graft.addc.t ADD COLUMNS (x INT)")
    assert(spark.sql("SELECT * FROM graft.addc.t").columns.last == "x")
  }

  test("multi-level namespaces (r16): graft.a.b.t is warehouse/a/b/t " +
      "through every door — SQL DDL/DML, catalog listing, writeTo") {
    spark.sql("CREATE NAMESPACE graft.deep.prod") // mkdir -p semantics
    assert(spark.sql("SHOW NAMESPACES IN graft.deep").collect()
      .map(_.getString(0)).toSeq == Seq("deep.prod"))
    seed(4).createOrReplaceTempView("deep_src")
    spark.sql("CREATE TABLE graft.deep.prod.t " +
      "OPTIONS ('ordCol' 'ts') AS SELECT * FROM deep_src")
    assert(ManifestLake.tableExists(spark, s"$warehouse/deep/prod/t"))
    assert(spark.sql("SHOW TABLES IN graft.deep.prod").collect()
      .map(_.getString(1)).toSeq == Seq("t"))
    // a table is a table, not a namespace — it must not list as one
    assert(!spark.sql("SHOW NAMESPACES IN graft.deep.prod").collect()
      .map(_.getString(0)).exists(_.contains("t")))
    // reads + DML at depth resolve through the hints rule
    assert(spark.sql("SELECT count(*) FROM graft.deep.prod.t")
      .collect().head.getLong(0) == 4L)
    spark.sql("UPDATE graft.deep.prod.t SET v = v + 10 WHERE id = 0")
    assert(spark.sql("SELECT v FROM graft.deep.prod.t WHERE id = 0")
      .collect().head.getDouble(0) == 10.0)
    // writeTo at depth lands on the same lake transaction
    seed(6).filter(col("id") >= 4)
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .writeTo("graft.deep.prod.t").append()
    assert(spark.sql("SELECT count(*) FROM graft.deep.prod.t")
      .collect().head.getLong(0) == 6L)
    // non-cascade drop refuses while the chain holds content
    val e = intercept[Exception] {
      spark.sql("DROP NAMESPACE graft.deep.prod")
    }
    assert(e.getMessage.contains("prod"), e.getMessage)
    spark.sql("DROP NAMESPACE graft.deep CASCADE")
    assert(!new java.io.File(s"$warehouse/deep").exists())
  }

  test("a missing table/namespace errors through the standard " +
      "catalog exceptions, not a graft stack trace") {
    val e1 = intercept[Exception] {
      spark.sql("SHOW TABLES IN graft.no_such_db").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("no_such_db"))
    val e2 = intercept[Exception] {
      spark.sql("DESCRIBE TABLE graft.sales.no_such_t").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("no_such_t") ||
      e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"))
  }
}
