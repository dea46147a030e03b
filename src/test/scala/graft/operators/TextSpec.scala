package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing sketch properties (the rows-only §2e operator) plus a
  * containment check: near-dup docs share a large sketch fraction. */
class TextSpec extends SparkSpec {

  test("winnow sketches: deterministic, non-empty, near-dups overlap") {
    val a = TextOps.xWinnowFingerprint(spark, sfDir).collect()
    val b = TextOps.xWinnowFingerprint(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSet, "sketch not deterministic")

    val sketches = a.groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    // near-dup pairs from the exact jaccard operator must share sketches
    val nearDups = DedupOps.dNgramJaccard(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    nearDups.foreach { case (x, y) =>
      val (sx, sy) = (sketches(x), sketches(y))
      val overlap = (sx & sy).size.toDouble / math.min(sx.size, sy.size)
      assert(overlap >= 0.3, s"near-dup pair ($x,$y) sketch overlap $overlap")
    }
  }

  test("lang id is a deterministic argmax with lexicographic ties") {
    val out = TextOps.xLangId(spark, sfDir)
    assert(out.count() == graft.Tables.documents(spark, sfDir).count())
    val langs = out.select(collect_set(col("pred_lang"))).head().getSeq[String](0).toSet
    assert(langs.subsetOf(Set("de", "en", "es", "fr", "zh")))
  }
}
