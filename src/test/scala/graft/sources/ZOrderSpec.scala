package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order clustering: measures the file-skipping the layout exists
  * for. Per-file min/max envelopes (what parquet footer stats give a
  * reader) are recomputed by reading each part file individually;
  * "prunable" = files whose envelope misses the probe range. The
  * z-layout must prune on BOTH dimensions; the linear layout prunes
  * only its sort key and is blind on the other. */
class ZOrderSpec extends SparkSpec {

  private val NumFiles = 16

  private def partFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq

  /** Files whose [min, max] of `c` overlaps [lo, hi]. */
  private def overlapping(dir: String, c: String, lo: Long, hi: Long): Int =
    partFiles(dir).count { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
      r.getLong(0) <= hi && r.getLong(1) >= lo
    }

  test("z-order prunes files on both dimensions; a linear sort only on its key") {
    val session = spark
    import session.implicits._
    // two GENUINELY independent uniform dimensions: a = id mod 141,
    // b = (id div 141) mod 141 — together they sweep the 141x141 grid
    // once. (The earlier (id*7919) % 141 collapsed to b = 23a mod 141,
    // a function of a: each linear a-slab file then held only ~9
    // scattered b-values, and whether its b-envelope covered the probe
    // depended on WHERE the range partitioner cut files — boundaries
    // are sampled with an rdd.id-derived seed, so the "blind on b"
    // assertion was suite-order flaky.)
    val df = spark.range(20000)
      .select((col("id") % 141).as("a"), expr("(id div 141) % 141").as("b"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_lin").toString
    LakeLayout.writeZOrdered(df, zDir, "a", "b", NumFiles)
    df.repartitionByRange(NumFiles, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(linDir)
    assert(partFiles(zDir).size > 1 && partFiles(linDir).size > 1)

    val (lo, hi) = (10L, 19L) // a ~7% slab of the [0, 141) domain
    val zA = overlapping(zDir, "a", lo, hi)
    val zB = overlapping(zDir, "b", lo, hi)
    val linA = overlapping(linDir, "a", lo, hi)
    val linB = overlapping(linDir, "b", lo, hi)
    val nZ = partFiles(zDir).size
    val nLin = partFiles(linDir).size
    // the linear layout is sharp on its sort key...
    assert(linA <= nLin / 4, s"linear layout should prune on a: $linA of $nLin overlap")
    // ...and blind on the other dimension (every file spans all of b)
    assert(linB == nLin, s"linear layout unexpectedly pruned on b: $linB of $nLin")
    // the z-layout prunes meaningfully on BOTH dimensions
    assert(zA <= (2 * nZ) / 3, s"z-order did not prune on a: $zA of $nZ overlap")
    assert(zB <= (2 * nZ) / 3, s"z-order did not prune on b: $zB of $nZ overlap")
    // and the rewrite loses no rows
    assert(spark.read.parquet(zDir).count() == 20000L)
  }

  test("3-column z-order prunes on ALL THREE dimensions (r14: " +
      "zValueN generalizes the pairwise interleave)") {
    // three independent uniform dims sweeping the 26^3 grid once.
    // Files are cut at ALIGNED top-4-z-bit prefixes (deterministic —
    // repartitionByRange's sampled boundaries are rdd.id-seeded and
    // suite-order flaky, the same lesson as the 2-dim test above);
    // with aligned prefixes (c4, b4, a4, c3) the expected envelopes
    // are exact: a low-band probe overlaps 8/16 files on a, 8/16 on
    // b, and 4/16 on c.
    val df = spark.range(17576)
      .select((col("id") % 26).as("a"),
        expr("(id div 26) % 26").as("b"),
        expr("(id div 676) % 26").as("c"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_z3").toString
    val z = LakeLayout.zValueN(df, Seq("a", "b", "c")).get
    val withZ = df.withColumn("__z", z)
    val zMax = withZ.agg(max(col("__z"))).head().getLong(0)
    val shift = math.max(0, 64 - java.lang.Long.numberOfLeadingZeros(zMax) - 4)
    withZ.withColumn("__zb", expr(s"shiftright(__z, $shift)"))
      .drop("__z")
      .write.mode("overwrite").partitionBy("__zb").parquet(zDir)
    def leafFiles(f: java.io.File): Seq[String] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(leafFiles)
      else if (f.getName.endsWith(".parquet")) Seq(f.getPath)
      else Seq.empty
    val files = leafFiles(new java.io.File(zDir))
    val n = files.size
    assert(n >= 8, s"expected ~16 aligned-prefix files, got $n")
    val (lo, hi) = (3L, 5L) // a low band of [0, 26) — msb 0 on every dim
    def hitting(c: String): Int = files.count { f =>
      val r = spark.read.parquet(f).agg(min(col(c)), max(col(c))).head()
      r.getLong(0) <= hi && r.getLong(1) >= lo
    }
    Seq("a", "b", "c").foreach { d =>
      val h = hitting(d)
      assert(h <= (3 * n) / 4,
        s"3-col z-order did not prune on $d: $h of $n overlap")
    }
    assert(spark.read.parquet(zDir).count() == 17576L)
  }

  test("z-order survives hostile inputs: DATE keys rank via unix_date, " +
      "wide-range BIGINT doesn't overflow, columns named i/acc aren't " +
      "captured by the fold's lambda (r14 pass-2)") {
    val session = spark
    import session.implicits._
    // DATE dimension (CAST(date AS BIGINT) is illegal — must not die)
    val dated = spark.range(1000).select(
      expr("date_add(DATE '2024-01-01', CAST(id % 200 AS INT))").as("d"),
      (col("id") % 37).as("x"))
    assert(LakeLayout.zValueN(dated, Seq("d", "x")).isDefined)
    val dDir = java.nio.file.Files.createTempDirectory("graft_zd").toString
    LakeLayout.writeZOrdered(dated, dDir, "d", "x", 4)
    assert(spark.read.parquet(dDir).count() == 1000L)
    // wide-range BIGINT: (c - lo) * 65535 would overflow ANSI long
    val wide = Seq(0L, Long.MaxValue / 2, Long.MaxValue - 1)
      .toDF("w").withColumn("x", col("w") % 7)
    val z = LakeLayout.zValueN(wide, Seq("w", "x")).get
    val zs = wide.select(z.as("z")).collect().map(_.getLong(0))
    assert(zs.forall(_ >= 0L)) // evaluated, no ArithmeticException
    // near-full-range key (hi - lo overflows long): honest None
    val full = Seq(Long.MinValue + 1, Long.MaxValue - 1).toDF("w")
      .withColumn("x", lit(1L))
    assert(LakeLayout.zValueN(full, Seq("w", "x")).isEmpty)
    // hostile column names: the fold's lambda variables must not
    // capture them
    val named = spark.range(1000)
      .select((col("id") % 31).as("i"), (col("id") % 29).as("acc"))
    val zn = LakeLayout.zValueN(named, Seq("i", "acc")).get
    val distinct = named.select(zn.as("z")).distinct().count()
    assert(distinct > 100L,
      s"z-value collapsed ($distinct distinct) — lambda capture")
  }

  test("z-order handles a constant dimension (degenerate min == max)") {
    val df = spark.range(100).select(col("id").as("a"), lit(7L).as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zc").toString
    LakeLayout.writeZOrdered(df, dir, "a", "b", 4)
    assert(spark.read.parquet(dir).count() == 100L)
  }
}
