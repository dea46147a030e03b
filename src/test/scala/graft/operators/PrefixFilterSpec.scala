package graft.operators

import org.apache.spark.sql.functions.lit

import graft.SparkSpec

/** Exactness of the prefix-filtered ngram-Jaccard tier (AllPairs/
  * PPJoin candidate generation) against (a) the fused group-count
  * kernel the DuckDB oracle mirrors and (b) a driver-side
  * from-scratch Jaccard recompute independent of BOTH DataFrame
  * formulations — at the registered τ = 1/2 AND the τ = 4/5 tier the
  * dispatch actually ships. The prefix filter is only correct if the
  * globally smallest common shingle of every true pair lands inside
  * both docs' n−⌈τ·n⌉+1 rarest-first prefixes — these specs are the
  * executable form of that theorem. */
class PrefixFilterSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def prefixPairs(dir: String, p: Int, q: Int) =
    DedupOps.ngramVerify(spark, dir, p, q,
      DedupOps.ngramPrefixCandidates(spark, dir, p, q))

  test("prefix tier equals the kernel on the corpus at both τ tiers (rows and jaccard)") {
    for ((p, q) <- Seq((1, 2), (4, 5))) {
      val fast = rows(prefixPairs(sfDir, p, q))
      val kernel = rows(DedupOps.ngramKernelPairs(spark, sfDir, p, q))
      assert(kernel.nonEmpty, s"corpus has no τ=$p/$q pairs — test data assumption broken")
      assert(fast == kernel,
        s"τ=$p/$q missed: ${(kernel -- fast).take(5)}; spurious: ${(fast -- kernel).take(5)}")
    }
  }

  test("registered queries dispatch to the documented tier and agree with the kernel") {
    // τ = 1/2 < crossover → kernel; τ = 4/5 ≥ crossover → prefix.
    // Both registered entries must equal the kernel at their τ.
    assert(rows(DedupOps.dNgramJaccard(spark, sfDir)) ==
      rows(DedupOps.ngramKernelPairs(spark, sfDir, 1, 2)))
    assert(rows(DedupOps.dNgramJaccardHi(spark, sfDir)) ==
      rows(DedupOps.ngramKernelPairs(spark, sfDir, 4, 5)))
  }

  test("prefix filter survives an adversarial boilerplate corpus (common-shingle cliques, length-filter edges)") {
    val session = spark
    import session.implicits._
    // 120 docs all sharing one corpus-common trigram (the bucket that
    // makes the kernel quadratic), two planted true near-dup pairs,
    // and a pair sitting exactly ON the 2·min = max length boundary
    // at τ = 1/2 (sizes 3 vs 6 — J reaches 1/2 only by containment,
    // which holds here)
    val common = "shared boilerplate header"
    val docs =
      (0L until 120L).map(i => (i, s"$common unique$i filler$i tail$i words$i here$i")) ++
      Seq(
        (200L, "alpha bravo charlie delta echo foxtrot golf hotel"),
        (201L, "alpha bravo charlie delta echo foxtrot golf extra"),
        (300L, "one two three four five"),                        // 3 shingles
        (301L, "one two three four five six seven eight"),        // 6 shingles, contains all 3
        (400L, "nine ten eleven twelve"),
        (401L, "totally different words entirely now"))
    val dir = java.nio.file.Files.createTempDirectory("graft_prefix").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    for ((p, q) <- Seq((1, 2), (4, 5))) {
      val fast = rows(prefixPairs(dir, p, q))
      val kernel = rows(DedupOps.ngramKernelPairs(spark, dir, p, q))
      assert(fast == kernel,
        s"τ=$p/$q missed: ${(kernel -- fast).take(5)}; spurious: ${(fast -- kernel).take(5)}")
    }
    // the planted pairs must actually be in the τ=1/2 output (non-vacuity)
    val ids = rows(prefixPairs(dir, 1, 2)).map(t => (t._1, t._2))
    assert(ids.contains((200L, 201L)), "planted near-dup pair missing")
    assert(ids.contains((300L, 301L)), "containment pair on the length boundary missing")
  }

  test("prefix tier equals a driver-side recompute on a seeded random corpus at both τ tiers") {
    val session = spark
    import session.implicits._
    // deterministic pseudo-random corpus from a small vocabulary so
    // shingle collisions (and near-dups) are frequent
    val rnd = new scala.util.Random(20260814L)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docs = (0L until 80L).map { i =>
      val n = 3 + rnd.nextInt(10)
      (i, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_prefix_rnd").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // independent model: distinct word-3-gram sets, all-pairs J ≥ τ
    def shingles(t: String): Set[String] = {
      val w = t.split(" ")
      val n = math.max(w.length - 2, 1)
      (0 until n).map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }
    for ((p, q) <- Seq((1, 2), (4, 5))) {
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        inter = (sa & sb).size; uni = (sa | sb).size
        if inter * q >= uni * p
      } yield (a, b)).toSet
      val got = rows(prefixPairs(dir, p, q)).map(t => (t._1, t._2))
      if (p == 1) assert(want.nonEmpty, "seeded corpus produced no pairs — seed assumption broken")
      assert(got == want, s"τ=$p/$q: got ${got.size}, want ${want.size}")
    }
  }
}
