package graft.operators

import graft.SparkSpec

/** Correctness of the approximate dedup paths against their exact
  * counterparts — the verification SURVEY §2c promises for the
  * rows-only operators. */
class DedupSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  lazy val exact: Set[(Long, Long)] = pairs(DedupOps.dNgramJaccard(spark, sfDir))

  test("corpus satisfies the SQL-mirror preconditions (ASCII, no empty tokens)") {
    // The DuckDB oracles for simhash/minhash/winnow fold per
    // character via string_split('') + unicode(): per GRAPHEME, with
    // unicode('') = −1 — the JVM expressions fold per CODE POINT and
    // fold nothing for ''. The mirrors are exact iff the corpus has
    // no multi-codepoint grapheme clusters (ASCII suffices) and space
    // splitting yields no empty tokens. Pin both so a testdata change
    // fails HERE, not as an unexplained oracle hash mismatch.
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val bad = docs.filter(
      col("text").rlike("[^\\x00-\\x7F]") ||
        col("text").rlike("^ | $|  ")).count()
    assert(bad == 0, s"$bad docs violate the ASCII/no-empty-token precondition")
  }

  test("minhash-lsh recall vs exact ngram-jaccard >= 0.9, no false positives") {
    val lsh = pairs(DedupOps.dMinhashLsh(spark, sfDir))
    assert(exact.nonEmpty, "corpus has no near-dup pairs — test data assumption broken")
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} exact pairs")
    // candidates are exact-Jaccard verified, so no false positives
    assert((lsh -- exact).isEmpty, s"unexpected pairs: ${(lsh -- exact).take(5)}")
  }

  test("embed-cosine hi: LSH candidates reproduce the exact all-pairs output EXACTLY (recall 1.0)") {
    // the oracle for d_embed_cosine_hi is the exact all-pairs SQL over
    // the same augmented input, so the bucketed tier must have recall
    // 1.0 at τ=0.9 on this corpus — row-for-row, cosine-for-cosine
    // (precision 1.0 is structural: the refine computes the same
    // exact cosine). The planted slice guarantees the result is
    // NON-vacuous: the corpus's own pair-cos ceiling is ~0.63.
    val bucketed = DedupOps.dEmbedCosineHi(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exactPairs = DedupOps.dEmbedCosineHiExact(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exactPairs.nonEmpty)
    assert(bucketed == exactPairs,
      s"missed: ${(exactPairs -- bucketed).take(5)}; spurious: ${(bucketed -- exactPairs).take(5)}")
    // every planted origin id must appear as id_a of some pair — the
    // planted slice is what makes the τ=0.9 pin non-empty
    val origins = bucketed.map(_._1)
    val planted = graft.Tables.embeddings(spark, sfDir)
      .filter(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.lit(5)) === 0)
      .collect().map(_.getLong(0)).toSet
    assert(planted.subsetOf(origins), s"missing planted origins: ${(planted -- origins).take(5)}")
  }

  test("simhash hamming<=3 pairs are high-jaccard near-dups") {
    val sim = pairs(DedupOps.dSimhash(spark, sfDir))
    assert(sim.nonEmpty, "simhash found no near-dup pairs")
    // every simhash pair should be a real near-dup (precision vs exact)
    val precision = (sim & exact).size.toDouble / sim.size
    assert(precision >= 0.8, s"simhash precision $precision (${sim.size} pairs)")
    // and it should recover a reasonable share of the exact pairs
    val recall = (sim & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"simhash recall $recall")
  }

  test("dup groups are consistent connected components of the pair graph") {
    val out = DedupOps.dDupGroups(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val label = out.map(t => t._1 -> t._2).toMap
    // exactly the vertices of the pair graph are labeled
    val vertices = exact.flatMap(p => Set(p._1, p._2))
    assert(label.keySet == vertices, "labeled set != pair-graph vertex set")
    // both endpoints of every pair share a group
    exact.foreach { case (a, b) =>
      assert(label(a) == label(b), s"pair ($a,$b) split across groups")
    }
    // group_id is the min member of its group; sizes match membership
    val members = out.groupBy(_._2).map { case (g, m) => g -> m.map(_._1).toSet }
    members.foreach { case (g, m) =>
      assert(m.min == g, s"group $g min member ${m.min}")
    }
    out.foreach { case (d, g, n) =>
      assert(members(g).size == n, s"doc $d group $g size $n != ${members(g).size}")
    }
  }

  test("boilerplate bucket cap bounds LSH candidates without losing pairs outside the clique") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions.lit
    // 200 identical boilerplate docs (every band bucket has 200
    // members → C(200,2) candidate pairs per band uncapped) plus one
    // real dup pair outside the clique (identical text ⇒ identical
    // signature ⇒ detection is deterministic — this spec pins the CAP
    // semantics, recall is pinned by the lsh-recall test above)
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val docs = Seq((1L, base), (2L, base)) ++
      (1000L until 1200L).map(i => (i, "the same boilerplate header text on every page of this corpus"))
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val uncapped = pairs(DedupOps.minhashLshPairs(spark, dir, Int.MaxValue))
    val capped = pairs(DedupOps.minhashLshPairs(spark, dir, 50))
    assert(uncapped.size == 199 * 100 + 1, s"uncapped ${uncapped.size}") // C(200,2) clique + 1
    assert(capped == Set((1L, 2L)), s"capped: size ${capped.size}")
  }

  test("star-contraction CC equals propagation labels; a 200-node chain graduates instead of throwing") {
    // equality of the two algorithms on the real near-dup pair graph
    val realPairs = DedupOps.dNgramJaccard(spark, sfDir).select("id_a", "id_b")
    val prop = DedupOps.connectedComponents(realPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val star = DedupOps.connectedComponentsStar(realPairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(star == prop,
      s"star≠propagation; diff: ${((star -- prop) ++ (prop -- star)).take(5)}")
    // a 200-node chain (diameter 199 ≫ the 16-iteration propagation
    // cap) must GRADUATE to star contraction and still label every
    // node with the component min — the r4 formulation threw here
    val session = spark
    import session.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = DedupOps.connectedComponents(chain).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 200)
    assert(labels.forall(_._2 == 0L),
      s"mislabeled: ${labels.filter(_._2 != 0L).take(5).mkString(",")}")
  }

  test("recursive-CTE components equal the iterative d_dup_groups fixpoint (depth bound converged)") {
    // the depth-4 bounded UNION ALL walk must reach the true
    // connected-components fixpoint on this corpus — if a component's
    // min-label eccentricity ever exceeded the bound, this is the
    // test that catches it (the hash oracle would stay green, since
    // the oracle shares the same bound by construction)
    val rec = DedupOps.dCcRecursive(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val iter = DedupOps.dDupGroups(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rec.nonEmpty)
    assert(rec == iter,
      s"rec-only ${(rec -- iter).take(3)}, iter-only ${(iter -- rec).take(3)}")
  }

  test("exact dedup groups cover all docs exactly once") {
    val out = DedupOps.dExactDedup(spark, sfDir).collect()
    val total = out.map(_.getLong(2)).sum
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(total == nDocs, s"group sizes sum $total != $nDocs docs")
  }

  test("incremental dedup: one row per incoming doc; statuses match a naive recompute") {
    import org.apache.spark.sql.functions._
    val got = DedupOps.dIncrementalDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3)))
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (incoming, base) = docs.partition(_._1 % 10 >= 8)
    // result sets are unordered as of r17 (the gate sorts before
    // hashing); compare the sorted spine
    assert(got.map(_._1).toSeq.sorted == incoming.map(_._1).sorted.toSeq,
      "spine is not exactly the incoming slice")
    // naive exact: same md5 ⇔ same text
    val baseByText = base.groupBy(_._2).map { case (t, ds) => t -> ds.map(_._1).min }
    // naive near: exact jaccard over the same shingle-hash sets
    val hashes = DedupOps.minhashSigs(spark, sfDir)
      .select(col("doc_id"), col("hashes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    got.foreach { case (id, exactOf, nearOf, status) =>
      val text = incoming.find(_._1 == id).get._2
      val wantExact = baseByText.get(text)
      assert(exactOf == wantExact, s"doc $id exact_of")
      val wantNear = base.map(_._1).filter { b =>
        val (hi, hb) = (hashes(id), hashes(b))
        2 * (hi & hb).size >= (hi | hb).size
      }.sorted.headOption
      assert(nearOf == wantNear, s"doc $id near_of")
      val want = if (wantExact.isDefined) "exact"
        else if (wantNear.isDefined) "near" else "new"
      assert(status == want, s"doc $id status")
    }
  }

  test("minhash signature frame is memoized per (session, dir)") {
    // ADVICE r8: the three LSH consumers must share ONE cached frame,
    // not stack a fresh .cache() per call
    assert(DedupOps.minhashSigs(spark, sfDir) eq DedupOps.minhashSigs(spark, sfDir))
  }

  test("url dedup: all four surface forms canonicalize together; counts match a driver recompute") {
    val rows = DedupOps.dUrlDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // canonical forms carry no case noise, no :80, no utm, no fragment,
    // no trailing slash, params sorted
    rows.foreach { case (c, _, _, _) =>
      assert(c.startsWith("http://example.com/"), c)
      assert(!c.contains(":80") && !c.contains("utm_") && !c.contains("#"), c)
      assert(!c.split("\\?")(0).endsWith("/"), c)
    }
    // driver recompute: group = (source, doc_id % 50); every group of
    // ≥ 2 docs must surface with exactly its doc count, its distinct
    // surface-form count, and its min doc_id
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = docs.groupBy { case (id, src) => (src, id % 50) }
      .filter(_._2.size >= 2)
      .map { case ((src, g), members) =>
        val canonical = s"http://example.com/$src/page-$g?a=1&b=2"
        val forms = members.map { case (id, _) => ((id / 100) % 4).toInt }.distinct.size
        canonical -> ((members.size.toLong, forms.toLong, members.map(_._1).min))
      }
    assert(rows.length == expect.size, s"${rows.length} vs ${expect.size}")
    rows.foreach { case (c, n, f, first) =>
      assert(expect(c) == ((n, f, first)), s"$c: got ($n,$f,$first) exp ${expect(c)}")
    }
    // non-vacuous: some group actually has >1 surface FORM (else the
    // canonicalization under test never fired)
    assert(rows.exists(_._3 >= 2), "no group with multiple surface forms")
  }
}
