package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema-pinned loaders for the driver-generated parquet tables
  * (TESTDATA.md). Every operator takes `sfDir` so the same plan runs
  * at any scale factor; at 100 TB the only change is the path (and a
  * partitioned lake layout, which these loaders would pick up via
  * partition pruning — see SURVEY.md §5).
  */
object Tables {
  /** Resolved-frame memo per (session, dir#table) — r17, guide §1/§6:
    * a bare `spark.read.parquet` pays driver-side file listing +
    * footer schema inference on EVERY call — measured 145-203 ms per
    * table on this box (graft.FooterProbe; the 4 KB nation table costs
    * the same as lineitem, so it is per-call resolution, not IO) —
    * which for a 6-table join (q5) was ~1 s of pure metadata per
    * invocation. Memoizing the RESOLVED DataFrame (an unexecuted
    * plan — no data is cached; every execution still scans parquet)
    * is the catalog-metastore discipline registerViews already
    * documents. Contract: a table dir is immutable while a session is
    * live (true of the driver-generated testdata and of ScaleUp,
    * which writes each output dir once) — the same contract
    * registerViews' (session, dir) memo has carried since r10. */
  private val frameMemo = new graft.operators.SessionMemo[DataFrame]
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    frameMemo.getOrElseUpdate(spark, s"$dir#$name") {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")
  /** events.ts normalization — every operator sees a plain
    * (UTC-session) TimestampType regardless of how the generator
    * wrote the column:
    *  - TIMESTAMP(NANOS) parquet: Spark only reads it as a nanos long
    *    (spark.sql.legacy.parquet.nanosAsLong, set by Sessions.build)
    *    — reconstruct via integral `DIV` (a double division would
    *    lose precision above 2^53 ns), matching DuckDB's ns→µs
    *    truncating read;
    *  - timestamp[us] with isAdjustedToUTC=false (the generator's
    *    current output): Spark reads TIMESTAMP_NTZ — cast to the
    *    session type; the session is pinned to UTC, so the wall-clock
    *    fields are reinterpreted as the same UTC instants DuckDB's
    *    naive read produces;
    *  - adjusted-to-UTC micros: already TimestampType, pass through. */
  def events(s: SparkSession, dir: String): DataFrame = {
    val raw = load(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The SQL front door: register every table as a temp view (events
    * through its nanos→timestamp reconstruction) so a user drives the
    * whole engine with `spark.sql(...)` — the graft functions
    * (cosine_similarity, minhash_signature, cron_times, …) are
    * already in the session via GraftExtensions (Sessions.build), so
    * after this call the library's full surface is plain SQL
    * (exercised end-to-end in SqlSurfaceSpec).
    *
    * Idempotent calls are memoized per session: `spark.read.parquet`
    * reads footers EAGERLY for schema inference, so a naive
    * re-register costs ~10 footer round-trips per call — measured as
    * the bulk of q28_lateral_topn's r10 bench regression (SCALING.md
    * §cal: 1.85 s bench / 1.1 s steady → 0.6 s once registration is
    * amortized). Re-registration happens only when the dir changes
    * (specs cross dirs in one session) or the session is new; at
    * 100 TB the same discipline holds — a catalog metastore, not a
    * per-query footer sweep. */
  private val registeredDir =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  def registerViews(s: SparkSession, dir: String): Unit =
    // Memoization is keyed on (session, dir) AND verified against the
    // catalog (ADVICE r11 #3): a caller that DROPPED a canonical view
    // (dropTempView) gets the full set restored on the next call — a
    // cheap in-memory catalog lookup instead of 10 eager
    // parquet-footer reads. A caller that SHADOWED a name with its own
    // createOrReplaceTempView owns that name until it drops the
    // shadow (tableExists cannot distinguish content); that is the
    // documented contract of registerViews — shadow deliberately,
    // drop to restore.
    if (!registeredDir.get(s).contains(dir) ||
        !names.forall(s.catalog.tableExists)) {
      registeredDir.keys.filter(_.sparkContext.isStopped)
        .foreach(registeredDir.remove)
      val loaders: Map[String, (SparkSession, String) => DataFrame] =
        Map("events" -> (events _))
      names.foreach { t =>
        loaders.getOrElse(t, (ss: SparkSession, d: String) => load(ss, d, t))(s, dir)
          .createOrReplaceTempView(t)
      }
      registeredDir(s) = dir
    }
}
