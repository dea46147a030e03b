package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** Cross-PROCESS OCC (VERDICT r15 #4): the 7/8-writer stresses race
  * threads inside one JVM — one FileSystem instance, one page cache
  * view. The commit publish claims atomicity across processes
  * (link(2) fails EEXIST atomically on the local store; HDFS-style
  * stores get fail-if-exists rename), so this spec drives REAL
  * sibling JVMs: two OccChild processes, each its own SparkSession
  * and Hadoop FileSystem, racing appends on one shared lake behind a
  * file barrier. Contract: every append lands exactly once — N
  * writers × M appends ⇒ head advances exactly N·M versions and
  * every (writer, event_id) row is present exactly once; a lost
  * commit (two "winners" at one version, the TOCTOU the r14
  * hard-link publish closed) would drop rows or versions. */
class CrossProcessOccSpec extends SparkSpec {
  import spark.implicits._

  test("two sibling JVMs racing appends on one lake: every commit lands exactly once") {
    val dir = Files.createTempDirectory("graft_xproc_occ").toString
    val seed = Seq((0L, 1L,
      java.sql.Timestamp.valueOf("2024-05-01 09:00:00"), 0.0))
      .toDF("writer", "event_id", "ts", "v")
    ManifestLake.create(spark, dir, seed, "ts")

    val javaBin = sys.props("java.home") + "/bin/java"
    val cp = sys.props("java.class.path")
    assert(cp.contains("classes"), // forked test JVM carries the real cp
      s"unexpected test classpath: ${cp.take(200)}")
    val moduleOpts = org.apache.spark.launcher.JavaModuleOptions
      .defaultModuleOptions().split(" ").toSeq.filter(_.nonEmpty)
    val barrier = s"$dir/.start-barrier"
    val writers = 2
    val perWriter = 6
    val procs = (1 to writers).map { id =>
      val pb = new ProcessBuilder(
        (Seq(javaBin, "-Xmx1g", "-cp", cp) ++ moduleOpts ++ Seq(
          "-Dspark.ui.enabled=false",
          "-Dspark.sql.session.timeZone=UTC",
          "graft.OccChild", dir, id.toString, perWriter.toString,
          barrier)): _*)
      pb.redirectErrorStream(true)
      pb.start()
    }
    // both JVMs up (they spin on the barrier), then fire the gun
    Thread.sleep(1000)
    Files.writeString(java.nio.file.Paths.get(barrier), "go")
    val outs = procs.map { p =>
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS),
        s"child did not finish:\n${out.takeRight(2000)}")
      assert(p.exitValue() == 0,
        s"child failed (exit ${p.exitValue()}):\n${out.takeRight(2000)}")
      out
    }
    outs.foreach(o => assert(o.contains("committed"), o.takeRight(500)))
    // exactly-once, judged from the table alone: head moved exactly
    // writers×perWriter versions past the seed, and every (writer,
    // event_id) row is present exactly once
    assert(ManifestLake.snapshot(spark, dir).version ==
      1L + writers * perWriter,
      s"head=${ManifestLake.snapshot(spark, dir).version}, " +
        s"want ${1 + writers * perWriter}\n${outs.mkString("\n")}")
    val rows = ManifestLake.read(spark, dir)
      .groupBy("writer", "event_id").count().collect()
    assert(rows.forall(_.getLong(2) == 1L),
      s"duplicated rows: ${rows.filter(_.getLong(2) != 1L).mkString(",")}")
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for (w <- 1 to writers; i <- 0 until perWriter)
      yield (w.toLong, w.toLong * 1000 + i)).toSet + ((0L, 1L))
    assert(got == want, s"lost rows: ${(want -- got).mkString(",")}")
  }
}
