package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BloomFunctions

/** Bloom semantics: no false negatives ever; FP≈0 at the chosen
  * sizing (the property that makes the exact-join oracle valid). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 16

  test("no false negatives, and no false positives at test sizing") {
    val members = (0 until 500).map(i => s"key_$i")
    val nonMembers = (0 until 500).map(i => s"other_$i")
    val agg = BloomFunctions.bloomAgg(M)
    val bloom = members.toDF("k")
      .agg(agg(BloomFunctions.bloomPos1(col("k"), M),
        BloomFunctions.bloomPos2(col("k"), M)).as("bloom"))

    val probes = (members ++ nonMembers).toDF("k").crossJoin(broadcast(bloom))
      .select(col("k"),
        expr(s"bloom_might_contain(bloom, " +
          s"pmod(cast(conv(substring(sha1(cast(k as binary)), 1, 15), 16, 10) as bigint), ${M}L), " +
          s"pmod(cast(hash(k) as bigint), ${M}L))").as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap

    members.foreach(k => assert(probes(k), s"false negative for $k"))
    val fps = nonMembers.count(probes(_))
    // (2*500/65536)^2 ≈ 2.3e-4 per probe → expect 0; allow 2 for slack
    assert(fps <= 2, s"$fps false positives out of 500")
  }

  test("t_bloom_filter matches exact membership on sf0.001") {
    val out = BloomOps.tBloomFilter(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // real keys end in even ms vs shifted +1: reconstruct expectation
    val hits = rows.count(_.getBoolean(1))
    val misses = rows.length - hits
    assert(hits > 0 && misses > 0, s"degenerate probe set: $hits hits, $misses misses")
  }
}
