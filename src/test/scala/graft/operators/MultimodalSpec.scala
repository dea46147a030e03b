package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** m_phash_index: the ahash64 expression against a naive driver-side
  * recompute, and grid-aligned re-encode DETECTION on an injected
  * equal-length corpus (the real corpus's near-dups are insertions,
  * which shift the block grid — the operator's doc records the
  * measured hamming band). */
class MultimodalSpec extends SparkSpec {

  private def naiveAhash(text: String): (Long, Long) = {
    val cs = text.map(_.toLong)
    val n = cs.length.toLong
    val total = cs.sum
    var lo = 0L; var hi = 0L
    for (b <- 0 until 64) {
      val s0 = (b * n / 64).toInt
      val e0 = ((b + 1) * n / 64).toInt
      val blen = (e0 - s0).toLong
      val bsum = cs.slice(s0, e0).sum
      if (blen > 0 && bsum * n > total * blen) {
        if (b < 32) lo |= (1L << b) else hi |= (1L << (b - 32))
      }
    }
    (lo, hi)
  }

  test("phash index: ahash64 agrees with a naive recompute on the real corpus") {
    val got = MultimodalOps.mPhashIndex(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val (lo, hi) = naiveAhash(text)
      assert(got(id)._1 == lo && got(id)._2 == hi, s"doc $id signature")
      // candidates bound near-matches
      assert(got(id)._4 <= got(id)._3, s"doc $id n_near > n_candidates")
    }
  }

  test("phash index: aligned re-encodes detected on an injected equal-length corpus") {
    val session = spark
    import session.implicits._
    // base: a long "payload"; reenc: the SAME length with a few bytes
    // changed in place (a re-encode artifact) — block grid unchanged,
    // so at most the touched blocks flip; unrelated: different content
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val reenc = base.updated(10, 'x').updated(400, 'y')
    val unrelated = base.reverse.replace(' ', 'z').take(base.length)
    val dir = java.nio.file.Files.createTempDirectory("graft_phash").toString
    Seq((1L, base), (2L, reenc), (3L, unrelated))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = MultimodalOps.mPhashIndex(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // the in-place re-encode is within hamming 3 of the base and the
    // 4x16 banding (pigeonhole-complete at <= 3) surfaces it for both
    val (lo1, hi1) = (out(1L)._1, out(1L)._2)
    val (lo2, hi2) = (out(2L)._1, out(2L)._2)
    val hamming = java.lang.Long.bitCount(lo1 ^ lo2) + java.lang.Long.bitCount(hi1 ^ hi2)
    assert(hamming <= 3, s"in-place re-encode drifted to hamming $hamming")
    assert(out(1L)._4 >= 1L, "base did not see its re-encode")
    assert(out(2L)._4 >= 1L, "re-encode did not see its base")
    // the unrelated payload is near nothing
    assert(out(3L)._4 == 0L, s"unrelated matched: ${out(3L)}")
  }

  test("shift-tolerant tier: aligned AND header-shifted re-encodes land within hamming<=3") {
    val session = spark
    import session.implicits._
    val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val aligned = base.updated(10, 'x').updated(400, 'y') // in-place re-encode
    // header insertions — the byte-shift that defeats the single grid
    // (4-, 8- and 12-byte prefixes, the offsets knob's widths)
    val shift4 = "HDR " + base
    val shift8 = "HEADER8 " + base
    val shift12 = "CONTAINER12 " + base.updated(200, 'q') // shift AND re-encode
    val unrelated = base.reverse.replace(' ', 'z').take(base.length)
    val docs = Seq((1L, base), (2L, aligned), (3L, shift4), (4L, shift8),
      (5L, shift12), (6L, unrelated)).toDF("doc_id", "text")

    val pairs = MultimodalOps.phashShiftPairs(docs, Seq(0, 4, 8, 12))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    def near(a: Long, b: Long): Boolean =
      pairs.get((math.min(a, b), math.max(a, b))).exists(_ <= 3)
    // every re-encode of the base — aligned or shifted — is within the
    // hamming<=3 band of it under the multi-offset minimum
    Seq(2L, 3L, 4L, 5L).foreach { id =>
      assert(near(1L, id), s"doc $id not detected: ${pairs.filter(_._1._2 == id)}")
    }
    // the unrelated payload stays outside the band against everything
    (1L to 5L).foreach { id =>
      assert(!near(id, 6L), s"unrelated matched doc $id: ${pairs.get((id, 6L))}")
    }
    // and the single-grid index, by contrast, cannot see the shifted
    // ones (this is the documented limitation the tier closes; if this
    // ever starts passing the doc comment should change, not the test)
    val singleGrid = MultimodalOps.phashShiftPairs(docs, Seq(0))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(singleGrid.get((1L, 2L)).exists(_ <= 3), "aligned must stay detected")
    Seq(3L, 4L, 5L).foreach { id =>
      assert(!singleGrid.get((1L, id)).exists(_ <= 3),
        s"single grid unexpectedly detected shifted doc $id")
    }
  }
}
