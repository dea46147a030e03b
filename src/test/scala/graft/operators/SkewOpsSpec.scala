package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salting must never change results — only partitioning. */
class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of fact rows share key 1 (a "wide minute"), dims are 1:1
  private lazy val fact = (1 to 10000)
    .map(i => (if (i % 10 == 0) i % 100 else 1L, s"payload_$i"))
    .toDF("k", "payload")
  private lazy val dim = (0L to 99L).map(k => (k, s"dim_$k")).toDF("k", "attr")

  test("saltedJoin == plain join, hot key spread across partitions") {
    val plain = fact.join(dim, "k")
    val salted = SkewOps.saltedJoin(fact, dim, "k", salts = 8)
    assert(salted.count() == plain.count())
    val a = salted.select("k", "payload", "attr").collect().map(_.toSeq).toSet
    val b = plain.select("k", "payload", "attr").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("saltedSumCount == plain groupBy sums/counts") {
    val valued = fact.withColumn("v", length(col("payload")).cast("double"))
    val plain = valued.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = SkewOps.saltedSumCount(valued, "k", "v", salts = 8)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      val p = plain(k)
      assert(math.abs(s - p._1) < 1e-6 && n == p._2, s"key $k: ($s,$n) vs $p")
    }
  }
}
