package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared ScalaTest base: one session per suite (getOrCreate reuses
  * the JVM-wide session across suites in a forked test run), built
  * through Sessions.build so specs see exactly the Verify/Bench
  * semantics (UTC, extensions, nanosAsLong). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = Sessions.build("graft-test", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  /** sf0.001 — the smoke scale (TESTDATA.md). */
  val sfDir = "/root/testdata/sf0.001"
}
