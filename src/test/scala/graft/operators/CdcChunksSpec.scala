package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Content-defined chunking properties: (1) the operator's chunk
  * stream equals a driver-side recompute of the LBFS boundary rule on
  * a seeded random corpus; (2) chunks tile the document exactly;
  * (3) THE design property — a prepended edit leaves the shared tail's
  * chunk fingerprints intact (boundaries re-synchronize), while the
  * fixed-stride tiling loses every chunk (the negative control that
  * justifies the operator's existence next to x_chunk_dedup). */
class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private val K = TextOps.CdcK
  private val D = TextOps.CdcD

  /** The boundary rule recomputed independently: poly_hash31 fold over
    * code points of the K-gram starting at 1-based position i. */
  private def polyHash(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 1000003 + c) % 2147483647L)

  private def chunksOf(text: String): Seq[String] = {
    val n = text.length
    val starts = 1 +: (2 to n - K + 1).filter(i =>
      polyHash(text.substring(i - 1, i - 1 + K)) % D == 0)
    starts.zip(starts.drop(1) :+ (n + 1)).map { case (a, b) =>
      text.substring(a - 1, b - 1)
    }
  }

  private def opChunks(docs: Seq[(Long, String)]): Map[Long, Seq[String]] =
    TextOps.cdcChunksOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }

  private def randText(seed: Int, len: Int): String = {
    val r = new scala.util.Random(seed)
    val chars = "abcdefghijklmnopqrstuvwxyz .,"
    (0 until len).map(_ => chars(r.nextInt(chars.length))).mkString
  }

  test("operator chunk stream == driver recompute on a seeded random corpus") {
    val docs = (0 until 30).map(i => (i.toLong, randText(42 + i, 50 + i * 17)))
    val got = opChunks(docs)
    docs.foreach { case (id, text) =>
      assert(got(id) == chunksOf(text), s"doc $id chunk stream drifted")
    }
  }

  test("chunks tile the document exactly (concat == text, all non-empty)") {
    val docs = (0 until 10).map(i => (i.toLong, randText(7 * i, 300)))
    val got = opChunks(docs)
    docs.foreach { case (id, text) =>
      assert(got(id).mkString == text)
      assert(got(id).forall(_.nonEmpty))
    }
  }

  test("shift-resistance: a prepended edit preserves the shared tail's chunks; fixed stride loses all") {
    val base = randText(99, 400)
    val shifted = "byline-edit: " + base // 13-char insertion
    val got = opChunks(Seq((1L, base), (2L, shifted)))
    val (a, b) = (got(1L).toSet, got(2L).toSet)
    val shared = a.intersect(b)
    // everything after the first boundary past the edit is shared —
    // on a ~400-char doc with ~64-char chunks that is most of them
    assert(shared.size >= a.size / 2,
      s"CDC lost the shared tail: ${shared.size} of ${a.size} chunks shared")
    // negative control: the fixed-stride tiling (64-char grid) shares
    // NOTHING once the alignment shifted by 13 — this is exactly the
    // blindness x_cdc_chunks exists to fix
    def strideChunks(t: String) = t.grouped(64).toSet
    assert(strideChunks(base).intersect(strideChunks(shifted)).isEmpty,
      "stride tiling unexpectedly aligned — pick a different edit length")
    // and an untouched unrelated doc shares nothing under CDC either
    val other = opChunks(Seq((3L, randText(1234, 400))))(3L).toSet
    assert(a.intersect(other).isEmpty)
  }
}
