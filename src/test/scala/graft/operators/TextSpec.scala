package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing sketch properties (the rows-only §2e operator) plus a
  * containment check: near-dup docs share a large sketch fraction. */
class TextSpec extends SparkSpec {

  test("quality-LR inference: score is the exact hashed-feature mean; invariant to token order; bounded") {
    val rows = TextOps.xQualityLr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // exact recomputation on a sample: the per-doc score must equal
    // the driver-side model applied to the same tokens
    def polyHash31(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 1000003 + c) % 2147483647L)
    def weight(tok: String): Long =
      ((polyHash31(tok) % 256 + 1) * 2654435761L) % 1999L
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.take(50).foreach { r =>
      val toks = docs(r.getLong(0)).split(" ", -1)
      val wSum = toks.map(weight).sum
      assert(r.getLong(1) == toks.length.toLong, s"n_tokens @ ${r.getLong(0)}")
      assert(r.getLong(2) == wSum, s"w_sum @ ${r.getLong(0)}")
      assert(r.getLong(3) == wSum * 1000000L / toks.length,
        s"score_ppm @ ${r.getLong(0)}")
      assert(r.getBoolean(4) == (r.getLong(3) >= 999000000L))
    }
    // scores live in the model's range (weights ∈ [0, 1998] ⇒ mean ppm
    // ∈ [0, 1998·10⁶]) and both classes are populated at this corpus —
    // a degenerate all-keep/all-drop scorer filters nothing
    assert(rows.forall(r => r.getLong(3) >= 0L &&
      r.getLong(3) <= 1998L * 1000000L))
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "threshold splits nothing at sf0.001")
  }

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

  test("doc chunks cover every token: stride tiling, overlap 16, no cross-doc chunks") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextOps.xDocChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1).toInt, r.getInt(2), r.getString(3)))
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = docs(id)
      // chunk count = 1 + floor((n-1)/48); all full except possibly last
      assert(cs.length == 1 + (n - 1) / 48, s"doc $id: ${cs.length} chunks for $n tokens")
      cs.sortBy(_._2).zipWithIndex.foreach { case ((_, idx, nt, txt), i) =>
        assert(idx == i)
        assert(nt == math.min(64, n - i * 48), s"doc $id chunk $i size $nt")
        assert(txt.split(" ", -1).length == nt)
      }
    }
    assert(chunks.map(_._1).toSet == docs.keySet)
  }

  test("chunk-oracle headroom covers the longest doc at every test scale (ADVICE r6)") {
    // The x_doc_chunks/x_chunk_dedup DuckDB mirrors tile chunk indexes
    // from a STATIC range(0, ChunkHeadroom); a doc needing more chunks
    // would silently desync the oracle. Pin the assumption against
    // every sf dir the gates run on, with slack so growth trips the
    // test before it trips the hash diff.
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && new java.io.File(f, "documents.parquet").exists())
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val maxChunks = graft.Tables.documents(spark, d.getPath)
        .select(max(expr("1 + (size(split(text, ' ')) - 1) div 48")).cast("long"))
        .head().getLong(0)
      assert(maxChunks <= TextOps.ChunkHeadroom,
        s"${d.getName}: longest doc needs $maxChunks chunks > ChunkHeadroom ${TextOps.ChunkHeadroom}")
    }
  }

  test("sequence packing: bins exactly full except the last; per-doc tokens conserved") {
    val rows = TextOps.xSeqPack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // conservation: a doc's allocations sum to its token count
    rows.groupBy(_._2).foreach { case (doc, as) =>
      assert(as.map(_._4).sum == as.head._3, s"doc $doc allocation != n_tok")
    }
    // every bin except the highest holds exactly the 2048 budget
    val perBin = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val lastBin = perBin.keys.max
    perBin.foreach { case (bin, tot) =>
      if (bin != lastBin) assert(tot == 2048L, s"bin $bin holds $tot")
      else assert(tot <= 2048L)
    }
  }

  test("pii scrub counts and redacts emails, phones, and IPs (injected corpus)") {
    val session = spark
    import session.implicits._
    import org.apache.spark.sql.functions.lit
    val d1 = "contact bob.smith@example.com or alice@sub.domain.org today"
    val d3 = "clean document with no pii at all"
    val docs = Seq(
      (1L, d1),
      (2L, "call 555-123-4567 re server 10.0.255.3 at 192.168.1.1"),
      (3L, d3))
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.xPiiScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L)._1 == 2 && out(1L)._2 == 0 && out(1L)._3 == 0, out(1L).toString)
    assert(out(2L)._1 == 0 && out(2L)._2 == 1 && out(2L)._3 == 2, out(2L).toString)
    assert(out(3L) == ((0, 0, 0, d3.length)), out(3L).toString)
    // redacted length = the Java-side substitution with the same pattern
    assert(out(1L)._4 == d1.replaceAll(TextOps.EmailRe, "<email>").length)
  }

  test("repetition ratios agree with naive recomputation") {
    def r4(n: Long, d: Long): Double = ((n * 20000L + d) / (2L * d)) / 10000.0
    val out = TextOps.xRepetition(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, nTok, dupTok, dupGram) =>
      val w = docs(id).split(" ", -1)
      val g = (1 to math.max(w.length - 2, 1))
        .map(i => w.slice(i - 1, i + 2).mkString(" "))
      assert(nTok == w.length)
      assert(dupTok == r4(w.length - w.distinct.length, w.length), s"doc $id token ratio")
      assert(dupGram == r4(g.length - g.distinct.length, g.length), s"doc $id gram ratio")
    }
  }

  test("sharded packing: per-shard invariants hold; 1-shard ≡ global; shards are disjoint doc sets") {
    val rows = TextOps.xSeqPackSharded4(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // shard assignment is doc_id mod 4, so a doc appears in exactly one shard
    rows.foreach { case (shard, _, doc, _, _) => assert(shard == doc % 4) }
    // conservation within the shard: a doc's allocations sum to its n_tok
    rows.groupBy(_._3).foreach { case (doc, as) =>
      assert(as.map(_._5).sum == as.head._4, s"doc $doc allocation != n_tok")
    }
    // per shard: bins tile 0..max contiguously and all but the last are full
    rows.groupBy(_._1).foreach { case (shard, srows) =>
      val perBin = srows.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
      val lastBin = perBin.keys.max
      assert(perBin.keySet == (0L to lastBin).toSet, s"shard $shard bins not contiguous")
      perBin.foreach { case (bin, tot) =>
        if (bin != lastBin) assert(tot == 2048L, s"shard $shard bin $bin holds $tot")
        else assert(tot <= 2048L)
      }
    }
    // the 1-shard parameterization IS the global packing, row for row
    val one = TextOps.xSeqPackSharded(1)(spark, sfDir).drop("shard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val global = TextOps.xSeqPack(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(one.sorted.sameElements(global.sorted), "1-shard packing != global packing")
  }

  test("ngram topk: 20 rows, counts non-increasing, agree with naive recount") {
    val rows = TextOps.xNgramTopk(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    assert(rows.map(_._2).sliding(2).forall(p => p.head >= p.last),
      "top-k counts not non-increasing")
    // naive recount of every trigram on the driver (smoke sf only)
    val texts = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach { t =>
      val w = t.split(" ", -1)
      val n = math.max(w.length - 2, 1)
      (0 until n).foreach { i =>
        val g = w.slice(i, i + 3).mkString(" ")
        counts(g) = counts.getOrElse(g, 0L) + 1
      }
    }
    val expected = counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(20)
    assert(rows.toSeq == expected, "top-20 disagrees with driver recount")
  }

  test("chunk dedup: flagged fps match a naive recompute; counts consistent") {
    val rows = TextOps.xChunkDedup(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (fp, occ, docs, _) =>
      assert(docs >= 2 && occ >= docs, s"chunk $fp occ=$occ docs=$docs")
    }
    // recompute the tiling + dup detection on the driver
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val chunks = docs.flatMap { case (id, t) =>
      val w = t.split(" ", -1)
      (0 to (w.length - 1) / 48).map(i => (id, w.slice(i * 48, i * 48 + 64).mkString(" ")))
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = chunks.groupBy(c => md5hex(c._2))
      .collect { case (fp, cs) if cs.map(_._1).distinct.length >= 2 =>
        (fp, cs.length.toLong, cs.map(_._1).distinct.length.toLong, cs.map(_._1).min)
      }.toSeq.sortBy(_._1)
    assert(rows.toSeq.sortBy(_._1) == expected, "chunk dedup != driver recompute")
  }

  test("tfidf: dense ranks 1..K per source, integer score consistent with tf and df") {
    val rows = TextOps.xTfidf(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length),
        s"$src ranks ${rs.map(_._2).toSeq}")
      assert(rs.length <= TextOps.TfidfTopK)
      // score is exactly the integer formula, and rank order follows it
      rs.foreach { case (_, _, term, tf, df, score) =>
        assert(score == tf * TextOps.TfidfScale / df, s"$src/$term score")
      }
      val ordered = rs.sortBy(_._2).toSeq
      ordered.zip(ordered.drop(1)).foreach {
        case ((_, _, t1, _, _, s1), (_, _, t2, _, _, s2)) =>
          assert(s1 > s2 || (s1 == s2 && t1 < t2), s"$src order violated")
      }
    }
    // df is a corpus-level property: identical wherever the term appears
    rows.groupBy(_._3).foreach { case (term, rs) =>
      assert(rs.map(_._5).distinct.length == 1, s"df differs for $term")
    }
  }

  test("inverted index: postings sorted, capped, consistent with df and a naive recount") {
    val rows = TextOps.xInvertedIndex(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    val naive = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(t => (t, r.getLong(0))))
    val byTerm = naive.groupBy(_._1)
    assert(rows.length == byTerm.size, "vocabulary size")
    rows.foreach { case (term, df, totalTf, postings) =>
      val docs = byTerm(term).map(_._2)
      assert(df == docs.distinct.length, s"$term df")
      assert(totalTf == docs.length, s"$term total_tf")
      val ids = postings.split(",").map(_.toLong).toSeq
      assert(ids == ids.sorted, s"$term postings unsorted")
      assert(ids.length == math.min(df, TextOps.PostingCap), s"$term cap")
      assert(ids == docs.distinct.sorted.take(TextOps.PostingCap).toSeq,
        s"$term postings are not the first-K sorted doc ids")
    }
  }

  test("cms estimate: never underestimates, matches a naive in-memory sketch, ε-bounded") {
    val got = TextOps.xCmsEstimate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 20)
    // naive rebuild: same grams, same hash family, same 4×512 array
    val (pa, pb) = graft.functions.MinHashSignature.coeffs(4, 7)
    def polyHash(sIn: String): Long =
      sIn.foldLeft(0L)((acc, ch) => (acc * 1000003L + ch.toLong) % 2147483647L)
    val grams = graft.Tables.documents(spark, sfDir)
      .select("text").collect().flatMap { r =>
        val w = r.getString(0).split(" ", -1)
        (1 to math.max(w.length - 2, 1)).map(i => w.slice(i - 1, i + 2).mkString(" "))
      }
    val counters = Array.fill(4, 512)(0L)
    grams.foreach { gm =>
      val h = polyHash(gm)
      for (r <- 0 until 4) counters(r)((((pa(r) * h + pb(r)) % 2147483647L) % 512L).toInt) += 1
    }
    val exact = grams.groupBy(identity).map { case (gm, o) => gm -> o.length.toLong }
    got.foreach { case (gm, n, est, over) =>
      assert(n == exact(gm), s"$gm exact count")
      val h = polyHash(gm)
      val want = (0 until 4)
        .map(r => counters(r)((((pa(r) * h + pb(r)) % 2147483647L) % 512L).toInt)).min
      assert(est == want, s"$gm naive sketch min")
      assert(over >= 0L, s"$gm underestimate")
      // ε-bound cushion: expected overcount ≈ N/width per row; the min
      // over 4 rows stays well under 4·N/width on any real stream
      assert(over <= 4L * grams.length / 512L + 1L, s"$gm overcount $over too large")
    }
  }

  test("hll distinct: matches a naive in-memory sketch; raw regime; 3σ-bounded error") {
    val got = TextOps.xHllDistinct(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    def polyHash(sIn: String): Long =
      sIn.foldLeft(0L)((acc, ch) => (acc * 1000003L + ch.toLong) % 2147483647L)
    val bySource = graft.Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .groupBy(_.getString(0)).map { case (src, rows) =>
        val grams = rows.flatMap { r =>
          val w = r.getString(1).split(" ", -1)
          (1 to math.max(w.length - 2, 1)).map(i => w.slice(i - 1, i + 2).mkString(" "))
        }
        src -> grams
      }
    got.foreach { case (src, est, td, errBp, zeros, sumScaled) =>
      val grams = bySource(src)
      // naive register rebuild: low 8 hash bits pick, high 23 rank
      val regs = Array.fill(256)(0L)
      grams.foreach { gm =>
        val h = polyHash(gm)
        val b = (h % 256).toInt
        val w23 = h / 256
        val rho = if (w23 == 0) 24L else 24L - java.lang.Long.toBinaryString(w23).length
        if (rho > regs(b)) regs(b) = rho
      }
      val wantSum = regs.map(r => 1L << (30 - r)).sum
      assert(sumScaled == wantSum, s"$src harmonic sum")
      assert(zeros == regs.count(_ == 0L), s"$src zero registers")
      assert(est == TextOps.HllNq / wantSum, s"$src estimate")
      assert(td == grams.distinct.length, s"$src exact distinct")
      assert(errBp == math.abs(est - td) * 10000 / td, s"$src err_bp")
      // raw-regime precondition the operator documents: est > 2.5m
      assert(est > 640, s"$src fell into the small-range regime")
      // 3σ ≈ 3·1.04/√256 ≈ 19.5% — a deterministic dataset either
      // passes forever or the sketch params are wrong
      assert(errBp < 1950, s"$src err $errBp bp exceeds 3σ")
    }
  }

  test("vocab coverage: naive recompute agrees; coverage discriminates docs") {
    val got = TextOps.xVocabCoverage(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    assert(got.length == docs.length)
    val freq = docs.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.length }
    val vocab = freq.toSeq.sortBy { case (t, n) => (-n, t) }
      .take(TextOps.VocabK).map(_._1).toSet
    got.foreach { case (id, nTok, nIn, cov) =>
      val toks = docs.find(_._1 == id).get._2
      assert(nTok == toks.length, s"doc $id token count")
      assert(nIn == toks.count(vocab), s"doc $id in-vocab count")
      assert(cov >= 0.0 && cov <= 1.0)
    }
    // the signal separates docs on this corpus (not degenerate 1.0s)
    assert(got.map(_._4).distinct.length > 10, "coverage is degenerate")
  }

  test("length buckets: powers of two, conservation, waste accounting") {
    val rows = TextOps.xLengthBuckets(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val lens = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0).split(" ", -1).length.toLong)
    assert(rows.map(_._2).sum == lens.length, "doc conservation")
    assert(rows.map(_._3).sum == lens.sum, "token conservation")
    rows.foreach { case (bucket, nDocs, totalTokens, padWaste, wasteFrac) =>
      assert((bucket & (bucket - 1)) == 0L, s"bucket $bucket not a power of two")
      // waste = slots − real tokens for this bucket's docs
      assert(padWaste == bucket * nDocs - totalTokens, s"bucket $bucket waste")
      assert(wasteFrac >= 0.0 && wasteFrac < 1.0, s"bucket $bucket frac")
      // every doc in the bucket fits, and wouldn't fit the next smaller
      def bucketOf(n: Long): Long =
        TextOps.BucketLadder.find(_ >= n).getOrElse(TextOps.BucketLadder.last)
      val members = lens.filter(n => bucketOf(n) == bucket)
      assert(members.length.toLong == nDocs, s"bucket $bucket membership")
      // the ladder always fits the doc (no negative waste possible
      // below the 2^20 ceiling)
      members.foreach(n => assert(bucket >= n, s"doc of $n tokens in short bucket $bucket"))
    }
  }

  test("length buckets: a doc past the top rung fails loudly, not negative waste") {
    import spark.implicits._
    val over = TextOps.BucketLadder.last + 1
    val df = Seq(over).toDF("n")
      .selectExpr(s"${TextOps.bucketCaseSql} AS bucket")
    val e = intercept[Exception] { df.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("token count exceeds bucket ladder")),
      s"expected the ladder-overflow error, got: ${messages(e).mkString(" | ")}")
    // and the top rung itself still buckets normally
    val ok = Seq(TextOps.BucketLadder.last).toDF("n")
      .selectExpr(s"${TextOps.bucketCaseSql} AS bucket").collect()
    assert(ok.head.getLong(0) == TextOps.BucketLadder.last)
  }

  test("gopher rules: flags match a naive recompute; wc/stop discriminate") {
    val got = TextOps.xGopherRules(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))).toMap
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val w = text.split(" ", -1)
      val n = w.length.toLong
      val ch = text.replace(" ", "").length.toLong
      val nsym = text.count(c => c == '#' || c == '…').toLong
      val nalpha = w.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val nstop = w.distinct.count(TextOps.GopherStopwords.contains).toLong
      val (gn, wc, mwl, sym, alpha, stop, kept) = got(id)
      assert(gn == n, s"doc $id n_tokens")
      assert(wc == (n >= TextOps.GopherMinWords && n <= TextOps.GopherMaxWords), s"doc $id wc")
      assert(mwl == (ch >= 3 * n && ch <= 10 * n), s"doc $id mwl")
      assert(sym == (10 * nsym <= n), s"doc $id sym")
      assert(alpha == (5 * nalpha >= 4 * n), s"doc $id alpha")
      assert(stop == (nstop >= 2), s"doc $id stop")
      assert(kept == (wc && mwl && sym && alpha && stop), s"doc $id kept")
    }
    // the rule set separates docs on this corpus (not all-pass)
    assert(got.values.exists(!_._7) && got.values.exists(_._7), "kept is degenerate")
  }

  test("rule attrition: waterfall conserves docs; first-fails partition the rejected") {
    val rows = TextOps.xRuleAttrition(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (0 until 5), "rule order")
    assert(rows.map(_._2).toSeq == Seq("wc", "mwl", "sym", "alpha", "stop"))
    val flags = TextOps.xGopherRules(spark, sfDir).collect()
    val nDocs = flags.length.toLong
    val nKept = flags.count(_.getBoolean(7)).toLong
    // every rejected doc is attributed to exactly one (first) rule
    assert(rows.map(_._4).sum == nDocs - nKept, "first-fails != rejected")
    // the waterfall is non-increasing and each step drops exactly its first-fails
    val remain = rows.map(_._5)
    rows.indices.foreach { i =>
      val before = if (i == 0) nDocs else remain(i - 1)
      assert(remain(i) == before - rows(i)._4, s"step $i conservation")
    }
    assert(remain.last == nKept, "survivors != kept")
    // attributed ≤ total failures per rule
    rows.foreach { case (_, r, f, a, _) => assert(a <= f, s"rule $r: a > f") }
  }

  test("dup spans: disjoint in-bounds spans; symmetric; agrees with a naive recompute") {
    val got = TextOps.xDupSpans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.nonEmpty)
    // naive driver-side recompute of the whole operator
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val k = TextOps.DupSpanK
    val posGrams = docs.map { case (id, w) =>
      val nPos = math.max(w.length - k + 1, 1)
      id -> (1 to nPos).map(i => i.toLong -> w.slice(i - 1, i - 1 + k).mkString(" "))
    }.toMap
    val df = posGrams.toSeq.flatMap { case (id, gs) => gs.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.size }
    val expected = docs.flatMap { case (id, w) =>
      val n = w.length.toLong
      val hits = posGrams(id).filter { case (_, g) => df(g) >= 2 }
        .map { case (p, _) => (p, math.min(p + k - 1, n)) }
      if (hits.isEmpty) None else {
        // merge overlapping/adjacent
        val spans = hits.tail.foldLeft(List(hits.head)) { case (acc, (p, e)) =>
          if (p <= acc.head._2 + 1) (acc.head._1, math.max(acc.head._2, e)) :: acc.tail
          else (p, e) :: acc
        }.reverse
        val dupToks = spans.map { case (s0, e0) => e0 - s0 + 1 }.sum
        Some(id -> ((n, spans.size.toLong, dupToks)))
      }
    }.toMap
    assert(got.keySet == expected.keySet,
      s"docs differ: got-only=${got.keySet -- expected.keySet} exp-only=${expected.keySet -- got.keySet}")
    expected.foreach { case (id, (n, nSpans, dupToks)) =>
      val (gn, gs, gd, ratio) = got(id)
      assert(gn == n && gs == nSpans && gd == dupToks, s"doc $id: got ($gn,$gs,$gd) want ($n,$nSpans,$dupToks)")
      assert(gd <= gn, s"doc $id: dup_tokens > n_tokens")
      assert(math.abs(ratio - dupToks.toDouble / n) < 1e-3, s"doc $id ratio")
    }
    // symmetry: duplication is cross-document, so ≥ 2 docs are always reported
    assert(got.size >= 2)
  }

  test("bpe pairs: agree with a naive recompute; end-of-word marker present") {
    val texts = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.split(" ").filter(_.nonEmpty)
      .foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1))
    val pairs = scala.collection.mutable.Map.empty[String, Long]
    freq.foreach { case (w, f) =>
      val syms = w.map(_.toString) :+ "</w>"
      syms.sliding(2).foreach { p =>
        val k = p.mkString(" ")
        pairs(k) = pairs.getOrElse(k, 0L) + f
      }
    }
    val expected = pairs.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = TextOps.xBpePairs(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected, s"got=$got\nexp=$expected")
    assert(got.exists(_._1.endsWith(" </w>")), "no end-of-word pair in top-20")
  }

  /** Independent in-memory BPE: the Sennrich 2016 §3.2 loop over the
    * collected corpus, sharing no code with the engine (plain Scala
    * collections; greedy merge via explicit index walk). */
  private def naiveBpe(words: Seq[String], nMerges: Int)
      : (Seq[(String, String)], Map[String, Seq[String]]) = {
    val freq = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[String, Vector[String]] =
      freq.keys.map(w => w -> (w.map(_.toString).toVector :+ "</w>")).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    (1 to nMerges).foreach { _ =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (w, syms) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + freq(w)
        }
      }
      val (a, b) = pairs.toSeq.sortBy { case ((x, y), n) => (-n, x, y) }.head._1
      merges += ((a, b))
      vocab = vocab.view.mapValues { syms =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.size) {
          if (i + 1 < syms.size && syms(i) == a && syms(i + 1) == b) {
            out += a + b; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toVector
      }.toMap
    }
    (merges.toSeq, vocab)
  }

  test("bpe train/encode agree with a naive full-loop recompute; merge 1 = x_bpe_pairs top-1") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq.filter(_.nonEmpty)).toMap
    val allWords = docs.values.flatten.toSeq
    val (expMerges, finalVocab) = naiveBpe(allWords, 10)
    val gotMerges = TextOps.xBpeTrain(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3))).toSeq
    assert(gotMerges.map(m => (m._2, m._3)) == expMerges,
      s"merge tables differ:\n got=$gotMerges\n exp=$expMerges")
    assert(gotMerges.forall(m => m._4 == m._2 + m._3))
    // merge rule 1 must be exactly x_bpe_pairs' top pair — the
    // declared "x_bpe_pairs is the per-iteration workload" contract
    val topPair = TextOps.xBpePairs(spark, sfDir).collect()(0).getString(0)
    assert(topPair == expMerges.head._1 + " " + expMerges.head._2)
    // encode: per-doc token count + id sum from the naive final vocab
    val symtab = finalVocab.values.flatten.toSet.toSeq.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1).toLong }.toMap
    val got = TextOps.xBpeEncode(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == docs.keySet, "every doc reported")
    docs.foreach { case (id, ws) =>
      val syms = ws.flatMap(finalVocab(_))
      val exp = (syms.size.toLong, syms.map(symtab).sum)
      assert(got(id) == exp, s"doc $id: got ${got(id)} want $exp")
    }
    // the tokenizer must actually compress: some multi-char symbols exist
    assert(finalVocab.values.exists(_.exists(_.length > 1)), "no merge ever applied")
  }

  test("bpe train survives single-symbol words and pair exhaustion (ANSI sequence(1,0) regression)") {
    import org.apache.spark.sql.functions.lit
    val session = spark
    import session.implicits._
    // 'a' → syms [a, </w>]; its merge wins round 1 (freq 9) and the
    // word collapses to ONE symbol — the next round's pair explode
    // evaluated sequence(1, 0) = [1, 0] and element_at(syms, 0) threw
    // under ANSI before the size >= 2 guard. The tiny vocab also runs
    // dry before the 10-merge budget, exercising the early-stop.
    val docs = Seq((1L, "a a a a a a bc bc de"), (2L, "a a a bc de de"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_1sym").toString
    docs.toDF("doc_id", "text").withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = TextOps.xBpeTrain(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    assert(merges.nonEmpty && merges.head == (("a", "</w>")),
      s"top merge should be (a, </w>): ${merges.toSeq}")
    assert(merges.length < 10, "tiny vocab must exhaust before the merge budget")
    // apply-encode over the same learned merges must also survive
    val enc = TextOps.xBpeEncode(spark, dir).collect()
    assert(enc.map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("bigram lm: counts and scores agree with a naive model recompute") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val bigrams = docs.view.mapValues(w =>
      if (w.size < 2) Seq.empty[String]
      else w.sliding(2).map(_.mkString(" ")).toSeq).toMap
    val c2 = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c2.groupBy(_._1.split(" ")(0)).view.mapValues(_.values.sum).toMap
    val model = c2.toSeq.sortBy { case (b, n) => (-n, b) }.take(TextOps.BigramK)
      .map { case (b, n) => b -> (n * 1000000L) / c1(b.split(" ")(0)) }.toMap
    val got = TextOps.xBigramLm(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == docs.keySet, "every doc reported")
    docs.keys.foreach { id =>
      val bs = bigrams(id)
      val expN = bs.size.toLong
      val expSum = bs.map(b => model.getOrElse(b, 0L)).sum
      assert(got(id) == ((expN, expSum)), s"doc $id: got ${got(id)} want ($expN,$expSum)")
    }
    // the model must actually discriminate: some bigrams are out-of-model
    assert(c2.size > TextOps.BigramK, "corpus too small to exercise truncation")
  }

  test("ppl buckets: two-level rank matches a naive global sort, sizes are ntile's") {
    val scored = TextOps.xBigramLm(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) -1.0 else r.getDouble(3))) // NULL ranks last
    // naive reference: one global sort desc (score, asc doc_id), ntile cuts
    val order = scored.sortBy { case (id, s) => (-s, id) }
    val n = order.length
    val (q, r) = (n / 3, n % 3)
    val r1 = q + (if (r > 0) 1 else 0)
    val r2 = 2 * q + (if (r > 0) 1 else 0) + (if (r > 1) 1 else 0)
    val expect = order.zipWithIndex.map { case ((id, _), i) =>
      id -> (if (i < r1) "head" else if (i < r2) "middle" else "tail")
    }.toMap
    val got = TextOps.xPplBuckets(spark, sfDir).collect()
      .map(rw => (rw.getLong(0), rw.getLong(2), rw.getString(3)))
    assert(got.length == n, "every doc bucketed")
    got.foreach { case (id, rnk, bucket) =>
      assert(bucket == expect(id), s"doc $id rank $rnk: $bucket != ${expect(id)}")
    }
    // distributed ranks are the exact 1..n permutation of the sort
    assert(got.map(_._2).sorted.toSeq == (1L to n.toLong),
      "ranks are not a permutation")
    val sizes = got.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes == Map("head" -> r1, "middle" -> (r2 - r1),
      "tail" -> (n - r2)), sizes.toString)
  }

  test("ppl buckets: 0-bigram docs (NULL score) rank into the tail, never vanish") {
    // a synthetic documents table holding the degenerate shapes the
    // real corpus happens to lack: an empty doc and a one-word doc
    // have NO bigrams → lm_ppm NULL → a bare equi-join on the score
    // would silently drop them (the r11 review finding)
    val session = spark
    import session.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ppl_degen").toString
    Seq(
      (1L, "the cat sat on the mat", "en", "web", 22L),
      (2L, "", "en", "web", 0L),
      (3L, "singleton", "en", "web", 9L),
      (4L, "the cat sat on the mat again", "en", "web", 28L),
      (5L, "a b a b a b", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(1).write.parquet(s"$dir/documents.parquet")
    val got = TextOps.xPplBuckets(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.isNullAt(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got.size == 5, s"docs dropped: ${got.keys.toSeq.sorted}")
    // the two degenerate docs carry NULL scores and the LAST ranks
    // (4 and 5 of 5 — under ntile sizes 2/2/1 that is one middle,
    // one tail; the point is they RANK LAST, not a fixed bucket)
    assert(got(2L)._1 && got(3L)._1, "degenerate docs should score NULL")
    assert(Seq(got(2L)._2, got(3L)._2).sorted == Seq(4L, 5L),
      s"NULL-score docs must rank last: $got")
    assert(got(2L)._3 == "middle" && got(3L)._3 == "tail", got.toString)
    // scored docs hold the head and ranks are the full permutation
    assert(got.values.count(_._3 == "head") == 2) // n=5 → 2/2/1
    assert(got.values.map(_._2).toSeq.sorted == (1L to 5L))
  }

  test("dup-span oracle headroom covers the longest doc at every test scale") {
    val dirs = new java.io.File("/root/testdata").listFiles()
      .filter(f => f.isDirectory && new java.io.File(f, "documents.parquet").exists())
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val maxPos = graft.Tables.documents(spark, d.getPath)
        .select(max(greatest(expr(s"size(split(text, ' ')) - ${TextOps.DupSpanK - 1}"), lit(1))).cast("long"))
        .head().getLong(0)
      assert(maxPos <= TextOps.DupSpanHeadroom,
        s"${d.getName}: $maxPos gram positions > DupSpanHeadroom ${TextOps.DupSpanHeadroom}")
    }
  }

  test("char entropy: constant text scores 0, uniform alphabet scores ln(k), micro-nat parity with a naive recompute") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaa"),             // one symbol: H = 0
      (2L, "abcdabcdabcdabcd"),             // uniform over 4: H = ln 4
      (3L, "the quick brown fox jumps"),    // generic mixed text
      (4L, "aab"))                          // tiny asymmetric case
      .toDF("doc_id", "text")
    val d = java.nio.file.Files.createTempDirectory("graft_entropy").toString
    docs.write.parquet(s"$d/documents.parquet")
    val got = TextOps.xCharEntropy(spark, d)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // naive driver-side recompute with the SAME micro-nat construction
    def naive(text: String): (Long, Long, Long) = {
      val counts = text.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val s = counts.map(c => math.round(1e6 * c * math.log(c.toDouble))).sum
      val h = math.round(1e6 * math.log(n.toDouble)) - math.round(s.toDouble / n)
      (n, s, h)
    }
    Map(1L -> "aaaaaaaaaaaaaaaa", 2L -> "abcdabcdabcdabcd",
      3L -> "the quick brown fox jumps", 4L -> "aab").foreach {
      case (id, text) =>
        assert(got(id) == naive(text), s"doc $id: ${got(id)} != ${naive(text)}")
    }
    // the two closed-form anchors, in micro-nats — within the ±2
    // micro-nat slack the per-term rounding construction itself
    // carries (the construction is exact and engine-identical; it is
    // not the infinite-precision entropy to the last micro-nat)
    assert(math.abs(got(1L)._3) <= 2L, s"constant text must score ~0: ${got(1L)}")
    assert(math.abs(got(2L)._3 - math.round(1e6 * math.log(4.0))) <= 2L,
      s"uniform-4 text must score ~ln(4): ${got(2L)}")
  }

  test("bm25: integer score matches an independent driver recompute; stopword idf < rare-term idf") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toLong
    val totL = docs.map(_._2.length.toLong).sum
    val dfm = docs.flatMap { case (id, w) => w.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    val byDf = dfm.toSeq.sortBy { case (t, df) => (-df, t) }
    val stop3 = byDf.take(3)
    val rare3 = dfm.toSeq.sortBy { case (t, df) => (df, t) }.take(3)
    def idfMicro(df: Long): Long =
      math.round(1e6 * math.log(1.0 + (n.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5)))
    // stopword vs rare regime: the selection is non-vacuous only if
    // their idf genuinely separates
    val stopIdf = stop3.map(x => idfMicro(x._2)).max
    val rareIdf = rare3.map(x => idfMicro(x._2)).min
    assert(stopIdf < rareIdf, s"idf does not separate: $stopIdf >= $rareIdf")
    // exact integer recompute (BigInt – no headroom concerns at all)
    val qset = (stop3 ++ rare3).map(x => x._1 -> BigInt(idfMicro(x._2))).toMap
    val scores = docs.flatMap { case (id, w) =>
      val dl = BigInt(w.length)
      val tfs = w.filter(qset.contains).groupBy(identity)
        .map { case (t, xs) => t -> BigInt(xs.length) }
      if (tfs.isEmpty) None else {
        val s = tfs.map { case (t, tf) =>
          qset(t) * ((BigInt(1000000) * 44 * tf * totL) /
            (BigInt(20) * tf * totL + BigInt(6) * totL + BigInt(18) * dl * n))
        }.sum
        Some((id, tfs.size.toLong, s))
      }
    }
    val expect = scores.sortBy { case (id, _, s) => (-s, id) }.take(20)
      .zipWithIndex.map { case ((id, nt, s), i) => (i + 1, id, nt, s.toLong) }.toSeq
    val got = TextOps.xBm25(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect, s"bm25 drifted:\n got=$got\n exp=$expect")
  }

  test("collocations: PMI agrees with a driver recompute; min-count floor kills hapax pairs") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sfDir).select("text").collect().map(_.getString(0))
    val toks = docs.map(_.split(" ", -1).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bi = toks.filter(_.size >= 2)
      .flatMap(w => w.sliding(2).map(p => p.mkString(" ")))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val n1 = toks.map(_.size.toLong).sum
    val n2 = toks.map(w => math.max(w.size - 1, 0).toLong).sum
    def pmi(b: String, c12: Long): Long = {
      val Array(a, bb) = b.split(" ", 2)
      math.round(1000000.0 * math.log(
        (c12.toDouble * n1.toDouble * n1.toDouble) /
          (n2.toDouble * uni(a).toDouble * uni(bb).toDouble)))
    }
    val expect = bi.toSeq.filter(_._2 >= TextOps.CollocMinCount)
      .map { case (b, c) => (b, c, pmi(b, c)) }
      .sortBy { case (b, _, p) => (-p, b) }.take(TextOps.CollocK)
    val got = TextOps.xCollocations(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"collocation drift:\n got ${got.take(5)}\n exp ${expect.take(5)}")
    // the floor is load-bearing: hapax pairs exist and would flood the
    // top-k with pmi = ln(N1^2/N2·ca·cb) maxima if not filtered
    assert(bi.exists(_._2 < TextOps.CollocMinCount), "corpus has no sub-floor bigrams")
  }

  test("readability: hand-computed Flesch on a punctuation-rich micro-corpus; driver recompute at sf") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_flesch").toString
    // doc 1: "The cat sat. The dog ran!" W=6 S=2 Y=6 -> 206835 - 3045 - 84600 = 119190
    // doc 2: vowel-free token "xyz" takes the min-1 floor: W=2 S=1 Y=1+1=2
    Seq((1L, "The cat sat. The dog ran!"), (2L, "xyz grr"))
      .toDF("doc_id", "text").withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = TextOps.xReadability(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))).toMap
    assert(out(1L) == ((6L, 2L, 6L, 206835L - (1015L * 6 / 2) - (84600L * 6 / 6), "very_easy")), out(1L).toString)
    assert(out(2L)._3 == 2L, s"vowel-free floor broken: ${out(2L)}")
    assert(out(2L)._4 == 206835L - 1015L * 2 - 84600L, out(2L).toString)
    // full-corpus driver recompute (the spec's real teeth)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextOps.xReadability(spark, sfDir).collect()
    assert(got.length == docs.size)
    got.foreach { r =>
      val t = docs(r.getLong(0))
      val w = t.split(" ", -1)
      val wn = w.length.toLong
      val sn = math.max("[.!?]+".r.findAllIn(t).size, 1).toLong
      val syl = "[aeiouy]+".r.findAllIn(t.toLowerCase).size.toLong +
        w.count(x => !x.toLowerCase.exists("aeiouy".contains(_)))
      assert(r.getLong(1) == wn && r.getLong(2) == sn && r.getLong(3) == syl,
        s"doc ${r.getLong(0)}: counts drifted")
      assert(r.getLong(4) == 206835L - (1015L * wn / sn) - (84600L * syl / wn))
    }
  }

  test("textrank: integer PageRank over the co-occurrence graph matches a driver recompute") {
    val texts = graft.Tables.documents(spark, sfDir).select("text").collect().map(_.getString(0))
    val toks = texts.map(_.split(" ", -1).toSeq)
    val counts = toks.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nodes = counts.filter(_._2 >= TextOps.TextRankMinCount).keySet
    val pairs = toks.filter(_.size >= 2)
      .flatMap(w => w.sliding(2).map(p => (p(0), p(1))))
      .filter { case (a, b) => a != b && nodes(a) && nodes(b) }
      .toSet
    val edges = pairs ++ pairs.map { case (a, b) => (b, a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size.toLong
    val r0 = TrainingPipeline.RankScale / n
    val base = (15L * r0) / 100L
    var rank: Map[String, Long] = deg.map { case (k, _) => k -> r0 }
    (1 to TrainingPipeline.RankIters).foreach { _ =>
      val contrib = rank.map { case (k, r) => k -> r / deg(k) }
      val inbound = edges.toSeq.groupBy(_._2)
        .map { case (dst, es) => dst -> es.map(e => contrib(e._1)).sum }
      rank = deg.map { case (k, _) => k -> (base + (85L * inbound.getOrElse(k, 0L)) / 100L) }
    }
    val expect = rank.toSeq.map { case (w, r) => (w, deg(w), r) }
      .sortBy { case (w, _, r) => (-r, w) }.take(TextOps.TextRankK)
    val got = TextOps.xTextrank(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"textrank drift:\n got ${got.take(5)}\n exp ${expect.take(5)}")
    // the floor is load-bearing: a hapax word must be excluded from the
    // graph entirely (the spec corpus's vocabulary is all-frequent, so
    // pin it on a synthetic one)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_textrank").toString
    Seq((1L, "alpha beta alpha beta alpha beta rareword alpha beta alpha beta"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val words = TextOps.xTextrank(spark, dir).collect().map(_.getString(0)).toSet
    assert(words == Set("alpha", "beta"), words.toString)
  }
}
