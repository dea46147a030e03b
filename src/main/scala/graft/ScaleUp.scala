package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-table synthetic scale-up for a second full-set bench point
  * (SURVEY §8b): replicate every sf table `factor`× with OFFSET key
  * remapping — replica r adds r·10⁹ to every key/fkey column, so each
  * replica is a disjoint, join-consistent copy of the dataset and
  * replica 0 IS the original (ids, ANN query vectors, time range all
  * preserved). Dimension tables (region/nation) stay fixed, as in
  * TPC-H, so broadcast-side sizes are scale-invariant. Document text
  * gets a replica marker word appended (replicas form near-dup
  * cliques — the adversarial dedup shape, same as ScaleProbe);
  * embeddings replicate verbatim.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BLOWUP=10 \
  *     SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf1 sbt "runMain graft.ScaleUp"
  */
object ScaleUp {
  private val Offset = 1000000000L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_BLOWUP", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.build("graft-scaleup", cpus)
    spark.sparkContext.setLogLevel("ERROR")

    val rep = spark.range(factor).toDF("rep")
    // SPARK_GRAFT_TABLES=events,documents — rebuild only the named
    // tables (a 100× soak of one operator family shouldn't pay for a
    // 60M-row lineitem it never reads)
    val only = sys.env.get("SPARK_GRAFT_TABLES").map(_.split(",").toSet)
    def write(name: String, df: => DataFrame): Unit =
      if (only.forall(_.contains(name)))
        df.repartition(cpus.toInt).write.mode("overwrite").parquet(s"$out/$name.parquet")
    // Remap precondition (ADVICE r5): every base key must be < Offset
    // (else replicas overlap and joins silently corrupt) and the top
    // replica offset must not overflow a long. Fail LOUDLY up front.
    require(factor.toLong * Offset > 0 && (factor - 1).toLong <= Long.MaxValue / Offset,
      s"factor $factor overflows replica offsets")
    // Both ends checked: a NEGATIVE base key would land a replica-1 id
    // inside replica 0's range just as surely as an oversized one
    // (-5 + 10⁹ = 999,999,995); NULL/empty aggregates fail with a
    // clear message instead of an opaque NPE (ADVICE r6).
    def assertKeyRange(df: DataFrame, keys: Seq[String]): Unit = if (keys.nonEmpty) {
      val aggs = keys.flatMap(k => Seq(
        min(col(k).cast("long")).as(s"min_$k"), max(col(k).cast("long")).as(s"max_$k")))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      keys.zipWithIndex.foreach { case (k, i) =>
        require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
          s"key $k has no non-NULL values (empty table?) — cannot validate replica range")
        val mn = row.getLong(2 * i)
        val mx = row.getLong(2 * i + 1)
        require(mn >= 0L && mx < Offset,
          s"$k range [$mn, $mx] outside [0, $Offset) — replica key ranges would collide")
      }
    }
    def scaled(df: DataFrame, keys: String*): DataFrame = {
      assertKeyRange(df, keys)
      // repartition the BASE before the crossJoin: the blow-up stage
      // otherwise inherits the base parquet's 1-4 input partitions
      // and runs the factor× row expansion on that many cores — at
      // BLOWUP=1000 that turned a 32-core box into a 4-core one
      // (measured r15: orders alone 11+ min; the write-side
      // repartition only parallelizes AFTER the expansion)
      keys.foldLeft(df.repartition(cpus.toInt).crossJoin(rep)) { (d, k) =>
        d.withColumn(k, col(k) + col("rep") * Offset)
      }.drop("rep")
    }

    write("region", Tables.region(spark, sfDir))
    write("nation", Tables.nation(spark, sfDir))
    write("customer", scaled(Tables.customer(spark, sfDir), "c_custkey"))
    write("supplier", scaled(Tables.supplier(spark, sfDir), "s_suppkey"))
    write("part", scaled(Tables.part(spark, sfDir), "p_partkey"))
    write("orders", scaled(Tables.orders(spark, sfDir), "o_orderkey", "o_custkey"))
    write("lineitem",
      scaled(Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey", "l_suppkey"))
    // events round-trips through the loader, so ts lands as a plain
    // µs timestamp — Tables.events passes a TimestampType through.
    // SPARK_GRAFT_TIME_STRETCH=1: replica r also shifts ts by r × 32
    // days, so the factor multiplies RETENTION (distinct days/minutes)
    // instead of per-minute volume — the axis the two-level prefix-sum
    // operators (t_backlog, t_concurrency) must survive at multi-year
    // 100 TB retention. Default off: the hash-parity sf1 runs replicate
    // in place.
    val stretch = sys.env.getOrElse("SPARK_GRAFT_TIME_STRETCH", "0") == "1"
    val evScaled = scaled(Tables.events(spark, sfDir), "event_id", "user_id")
    write("events",
      if (!stretch) evScaled
      else evScaled.withColumn("ts", expr(
        s"timestampadd(DAY, CAST((event_id div ${Offset}L) * 32 AS INT), ts)")))
    assertKeyRange(Tables.documents(spark, sfDir), Seq("doc_id"))
    write("documents", Tables.documents(spark, sfDir)
      .repartition(cpus.toInt).crossJoin(rep)
      .withColumn("text", when(col("rep") === 0, col("text"))
        .otherwise(concat_ws(" ", col("text"), concat(lit("rep"), col("rep")))))
      .withColumn("doc_id", col("doc_id") + col("rep") * Offset)
      .drop("rep"))
    write("embeddings", scaled(Tables.embeddings(spark, sfDir), "vec_id"))

    val counts = Seq("lineitem", "events", "documents", "embeddings")
      .filter(t => only.forall(_.contains(t)))
      .map(t => s""""$t":${spark.read.parquet(s"$out/$t.parquet").count()}""")
    println(s"""{"metric":"scaleup","factor":$factor,${counts.mkString(",")},"dir":"$out"}""")
    spark.stop()
  }
}
