package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end funnel invariants: each stage's decision column must
  * agree with the standalone §2 operator it composes, and the funnel
  * must be monotone. */
class TrainingPipelineSpec extends SparkSpec {

  private lazy val annotated = TrainingPipeline.annotate(spark, sfDir).cache()

  test("funnel counts are monotone and consistent with run()") {
    val f = TrainingPipeline.funnel(spark, sfDir).collect()(0)
    val (n, ex, nd, lg, kept) =
      (f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3), f.getLong(4))
    assert(n >= ex && ex >= nd && nd >= lg && lg >= kept,
      s"funnel not monotone: $n >= $ex >= $nd >= $lg >= $kept")
    assert(kept > 0, "pipeline kept nothing — config or data assumption broken")
    assert(TrainingPipeline.run(spark, sfDir).count() == kept)
  }

  test("kept set carries no exact duplicates and no near-dup group siblings") {
    val kept = TrainingPipeline.run(spark, sfDir)
    // no two kept docs share a canonical fingerprint
    val fpDups = kept
      .withColumn("fp",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary")))
      .groupBy("fp").count().filter(col("count") > 1).count()
    assert(fpDups == 0, s"$fpDups fingerprints still duplicated")
    // no two kept docs share an LSH dup group
    val groups = DedupOps.connectedComponents(
      DedupOps.dMinhashLsh(spark, sfDir).select(col("id_a"), col("id_b")))
    val groupDups = kept.join(groups, "doc_id")
      .groupBy("group_id").count().filter(col("count") > 1).count()
    assert(groupDups == 0, s"$groupDups near-dup groups with multiple survivors")
  }

  test("pipeline lang expression agrees with the xLangId operator") {
    val opLang = TextOps.xLangId(spark, sfDir)
      .select(col("doc_id"), col("pred_lang").as("op_lang"))
    val disagree = annotated.select(col("doc_id"), col("pred_lang"))
      .join(opLang, "doc_id")
      .filter(col("pred_lang") =!= col("op_lang")).count()
    assert(disagree == 0, s"$disagree docs with diverging language ID")
  }

  test("mix sampling respects per-source quotas with contiguous ranks") {
    val rows = TrainingPipeline.mixSources(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_._1)
    val stratum = graft.Tables.documents(spark, sfDir)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    bySource.foreach { case (src, srows) =>
      val quota = 5 + (src.drop(3).toInt % 3) * 5
      assert(srows.length == math.min(quota.toLong, stratum(src)),
        s"$src: ${srows.length} sampled, quota $quota, stratum ${stratum(src)}")
      // ranks are 1..k over doc_id-ascending — the deterministic first-k
      assert(srows.sortBy(_._2).map(_._3).toSeq == (1 to srows.length),
        s"$src ranks not contiguous")
    }
  }

  test("decontamination flags exactly the train docs sharing an 8-gram with the eval slice") {
    val out = TrainingPipeline.decontaminate(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty, "no contamination found — eval-slice assumption broken")
    // recompute ground truth naively on the collected corpus
    def grams(t: String): Set[String] =
      t.split(" ").sliding(8).map(_.mkString(" ")).toSet match {
        case s if s.nonEmpty => s
        case _ => Set(t)
      }
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> grams(r.getString(1)))
    val evalGrams = docs.filter(_._1 % 20 == 0).flatMap(_._2).toSet
    val truth = docs.filter { case (id, gs) =>
      id % 20 != 0 && gs.exists(evalGrams.contains)
    }.map(_._1).toSet
    assert(out.map(_._1).toSet == truth,
      s"flagged ${out.map(_._1).toSet} vs truth $truth")
    // eval docs themselves are never flagged
    assert(out.forall(_._1 % 20 != 0))
  }

  test("pipeline quality agrees with the xQualityScore operator") {
    val opQ = TextOps.xQualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality").as("op_quality"))
    val disagree = annotated.select(col("doc_id"), col("quality"))
      .join(opQ, "doc_id")
      .filter(col("quality") =!= col("op_quality")).count()
    assert(disagree == 0, s"$disagree docs with diverging quality score")
  }

  test("stratified sample: subset per stratum, rate formula holds, stable under reorder") {
    val rows = TrainingPipeline.stratifiedSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val trueCounts = graft.Tables.documents(spark, sfDir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (src, srows) =>
      val n = trueCounts(src)
      val rate = math.min(10000L, 100000L / n)
      srows.foreach { case (_, _, nSrc, rateBp) =>
        assert(nSrc == n && rateBp == rate, s"$src n=$nSrc rate=$rateBp")
      }
      assert(srows.length <= n)
      // rate 100% keeps the whole stratum
      if (rate == 10000L) assert(srows.length == n, s"$src lost rows at rate 1.0")
    }
    // hash-membership sampling is invariant to input order: applying
    // the same per-stratum rate to the REVERSED corpus selects the
    // exact same doc_ids (testdata strata are equal-sized, so one
    // shared rate covers all sources)
    assert(trueCounts.values.toSet.size == 1, "testdata strata no longer equal-sized")
    val rate = math.min(10000L, 100000L / trueCounts.head._2)
    val reassembled = graft.Tables.documents(spark, sfDir)
      .orderBy(col("doc_id").desc)
      .filter(expr(
        "pmod(pmod(doc_id, 2147483648L) * 2654435761L, 2147483648L) % 10000") < lit(rate))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(reassembled == rows.map(_._2).toSet, "sample not stable under corpus reorder")
  }

  test("sampling hash survives ScaleUp-range doc_ids under ANSI arithmetic (ADVICE r6)") {
    // replica ids reach base + 9·10⁹; the unreduced doc_id * 2654435761
    // overflowed a signed long there. The mod-2³¹ pre-reduction caps the
    // product at ~5.7e18 < Long.MaxValue, and is the identity for ids
    // below 2³¹ — so sf-scale output is unchanged.
    import spark.implicits._
    val big = Seq(9000000123L, Long.MaxValue / 2654435761L * 2, 2147483647L, 42L)
      .toDF("doc_id")
    val out = big.select(expr(
      "pmod(pmod(doc_id, 2147483648L) * 2654435761L, 2147483648L) % 10000").as("h"))
      .collect().map(_.getLong(0))
    assert(out.forall(h => h >= 0 && h < 10000))
    // identity below 2³¹: reduced ≡ unreduced form
    val small = Seq(0L, 1L, 12345L, 2147483647L).toDF("doc_id")
    val both = small.select(
      expr("pmod(pmod(doc_id, 2147483648L) * 2654435761L, 2147483648L)").as("red"),
      expr("pmod(doc_id * 2654435761L, 2147483648L)").as("unred")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("data split: total partition, ~98/1/1 fractions, assignment a pure function of doc_id") {
    val split = TrainingPipeline.dataSplit(spark, sfDir).cache()
    val n = split.count()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(n == nDocs, s"split rows $n != corpus $nDocs — not a total partition")
    val byName = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName.keySet.subsetOf(Set("train", "val", "test")))
    val train = byName.getOrElse("train", 0L).toDouble / n
    assert(train > 0.95 && train < 0.995, s"train fraction $train outside the 98% band")
    assert(byName.getOrElse("val", 0L) + byName.getOrElse("test", 0L) == n - byName("train"))
    // h_bp stays inside the basis-point domain
    assert(split.filter(col("h_bp") < 0 || col("h_bp") >= 10000).count() == 0)
    // membership is a function of doc_id ALONE: recomputing on an
    // arbitrarily filtered + reshuffled corpus slice reassigns every
    // surviving doc identically — the no-drift / no-leakage property
    val slice = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 3 === 1).repartition(7)
    val reassigned = slice
      .withColumn("h_bp", expr(
        "pmod(pmod(doc_id, 2147483648L) * 3432918353L, 2147483648L) % 10000"))
      .withColumn("split2",
        when(col("h_bp") < 9800, "train").when(col("h_bp") < 9900, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("split2"))
    val drift = split.join(reassigned, "doc_id")
      .filter(col("split") =!= col("split2")).count()
    assert(drift == 0, s"$drift docs changed split on a re-ingested slice")
    split.unpersist()
  }

  test("epoch shuffle: each epoch is a full permutation, shards partition it, epochs differ") {
    val rows = TrainingPipeline.epochShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val allDocs = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    byEpoch.foreach { case (e, rs) =>
      assert(rs.map(_._4).toSet == allDocs, s"epoch $e is not a permutation")
      // pos is contiguous 1..n within every (epoch, shard)
      rs.groupBy(_._2).foreach { case (sh, ss) =>
        assert(ss.map(_._3).sorted.toSeq == (1 to ss.length), s"epoch $e shard $sh pos")
      }
    }
    // the two epochs order at least some shard differently
    def order(e: Long) = byEpoch(e).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(order(0L) != order(1L), "epochs produced the identical order")
    // deterministic: a second evaluation is bit-identical
    val again = TrainingPipeline.epochShuffle(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq)
  }

  test("fuzzy decontamination == naive exact train×eval jaccard on this corpus") {
    import org.apache.spark.sql.functions._
    // naive oracle: ALL train×eval pairs, exact shingle-hash jaccard,
    // no LSH — equality holds on the test corpus because every true
    // pair sits far above τ=0.5 (banding catches jaccard≥0.9 pairs
    // w.p. > 1 - 1e-4; there are no borderline pairs to miss)
    val sigs = DedupOps.minhashSigs(spark, sfDir)
    val isEval = pmod(col("doc_id"), lit(20L)) === 0 && col("doc_id") < lit(640L)
    val ev = sigs.filter(isEval).select(col("doc_id").as("eval_id"), col("hashes").as("h_e"))
    val naive = sigs.filter(pmod(col("doc_id"), lit(20L)) =!= 0)
      .select(col("doc_id"), col("hashes").as("h_t"))
      .crossJoin(broadcast(ev))
      .withColumn("n_inter", size(array_intersect(col("h_t"), col("h_e"))).cast("long"))
      .withColumn("uni", size(array_union(col("h_t"), col("h_e"))).cast("long"))
      .filter(col("n_inter") * 2 >= col("uni"))
      .select(col("doc_id"), col("eval_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = TrainingPipeline.fuzzyDecontaminate(spark, sfDir).collect()
    assert(got.nonEmpty)
    val flagged = got.map(_.getLong(0)).toSet
    assert(flagged == naive.map(_._1), "flagged train docs differ from naive exact")
    got.foreach { r =>
      val (docId, nNear, bestEval, maxJ) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(docId % 20 != 0, "eval doc flagged as train")
      assert(bestEval % 20 == 0 && bestEval < 640, "best_eval_id outside eval slice")
      assert(maxJ >= 0.5, s"doc $docId below threshold")
      assert(nNear == naive.count(_._1 == docId), s"doc $docId pair count")
    }
  }

  test("takedown manifest == naive closure: every exact/near copy of a seed, nothing else") {
    import org.apache.spark.sql.functions._
    val isSeed = (id: Long) => id % 83 == 0 && id < 83 * 32
    val got = TrainingPipeline.takedown(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.nonEmpty)
    val seeds = got.filter(_._3 == "seed").map(_._1).toSet
    assert(seeds.nonEmpty && seeds.forall(isSeed))

    // naive exact closure: brute md5 compare
    val fps = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val seedFps = fps.filter(p => isSeed(p._1)).map(_._2).toSet
    val naiveExact = fps.filter(p => !isSeed(p._1) && seedFps(p._2)).map(_._1).toSet
    assert(got.filter(_._3 == "exact").map(_._1).toSet == naiveExact)

    // naive near closure: all non-seed × seed pairs, exact
    // shingle-hash jaccard, no LSH (equality holds on this corpus —
    // same argument as the fuzzy-decontamination naive test)
    val sigs = DedupOps.minhashSigs(spark, sfDir)
    val sd = sigs.filter(pmod(col("doc_id"), lit(83L)) === 0 && col("doc_id") < 83L * 32)
      .select(col("doc_id").as("seed_id"), col("hashes").as("h_s"))
    val naiveNear = sigs
      .filter(!(pmod(col("doc_id"), lit(83L)) === 0 && col("doc_id") < 83L * 32))
      .select(col("doc_id"), col("hashes").as("h_d"))
      .crossJoin(broadcast(sd))
      .withColumn("n_inter", size(array_intersect(col("h_d"), col("h_s"))).cast("long"))
      .withColumn("uni", size(array_union(col("h_d"), col("h_s"))).cast("long"))
      .filter(col("n_inter") * 2 >= col("uni"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet -- naiveExact
    assert(got.filter(_._3 == "near").map(_._1).toSet == naiveNear)

    // provenance: every matched_seed is a seed; a seed's provenance is itself
    got.foreach { case (id, m, reason) =>
      assert(isSeed(m), s"doc $id matched_seed $m is not a seed")
      if (reason == "seed") assert(id == m)
    }
  }

  test("curriculum: stages are fixed quality quartiles, within-shard order is quality-ascending") {
    val rows = TrainingPipeline.curriculum(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    assert(rows.length == graft.Tables.documents(spark, sfDir).count())
    rows.foreach { case (stage, shard, _, docId, q) =>
      assert(stage == math.min(3L, math.floor(q * 4).toLong), s"doc $docId stage")
      assert(shard == docId % TrainingPipeline.ShuffleShards)
      assert(stage >= 0L && stage <= 3L)
    }
    rows.groupBy(r => (r._1, r._2)).foreach { case ((stage, shard), rs) =>
      val ordered = rs.sortBy(_._3).toSeq
      assert(ordered.map(_._3) == (1 to rs.length), s"($stage,$shard) pos gap")
      ordered.zip(ordered.drop(1)).foreach { case (a, b) =>
        assert(a._5 < b._5 || (a._5 == b._5 && a._4 < b._4),
          s"($stage,$shard) not quality-ascending")
      }
    }
  }

  test("containment: per-pair scores match a naive recompute and sum to decontaminate hits") {
    def grams8(text: String): Set[String] = {
      val w = text.split(" ", -1)
      (0 to math.max(w.length - 8, 0)).map(i => w.slice(i, i + 8).mkString(" ")).toSet
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val eval = docs.filter { case (id, _) => id % 20 == 0 && id < 20 * 32 }
      .map { case (id, t) => (id, grams8(t)) }
    val got = TrainingPipeline.containment(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(0)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
    val naive = (for {
      (tid, text) <- docs if tid % 20 != 0
      tg = grams8(text)
      (eid, eg) <- eval
      shared = (tg & eg).size if shared > 0
    } yield (eid, tid) -> ((shared.toLong, eg.size.toLong))).toMap
    assert(got.length == naive.size, s"pair count ${got.length} vs ${naive.size}")
    got.foreach { case (k, (shared, nEval, c)) =>
      val (wShared, wEval) = naive(k)
      assert(shared == wShared && nEval == wEval, s"pair $k")
      // exact integer half-up ratio (ratio4's integer formula)
      assert(c == ((shared * 20000L + nEval) / (2L * nEval)).toDouble / 10000.0,
        s"pair $k ratio")
    }
    // consistency with the binary flag: per train doc, summed shared
    // grams == decontaminate's n_hits
    val hits = TrainingPipeline.decontaminate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val summed = got.groupBy(_._1._2).map { case (tid, ps) => tid -> ps.map(_._2._1).sum }
    assert(summed == hits, "containment pairs disagree with decontaminate hits")
  }

  test("graph rank: matches a naive integer PageRank; hubs outrank leaves; mass bounded") {
    val got = TrainingPipeline.graphRank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "no near-dup pairs at test scale?")
    // naive recompute with the SAME integer arithmetic over the same
    // pair graph
    val pairs = DedupOps.dMinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSeq }
    val n = adj.size.toLong
    val r0 = TrainingPipeline.RankScale / n
    val base = (15L * r0) / 100L
    var rank = adj.map { case (k, _) => k -> r0 }
    (1 to TrainingPipeline.RankIters).foreach { _ =>
      val contrib = rank.map { case (k, r) => k -> r / adj(k).length }
      rank = adj.map { case (k, neigh) =>
        k -> (base + (85L * neigh.map(contrib).sum) / 100L)
      }
    }
    got.foreach { case (id, deg, r) =>
      assert(deg == adj(id).length.toLong, s"deg($id)")
      assert(r == rank(id), s"rank($id): got $r want ${rank(id)}")
    }
    // total mass stays ≈ RankScale (floor-division leakage only ever
    // loses mass, never creates it)
    assert(got.map(_._3).sum <= TrainingPipeline.RankScale)
    // result sets are unordered as of r17 (the former rank-descending
    // tail sort was presentational; the gate sorts before hashing)
  }

  test("temperature mix: weights normalize, targets conserve, sqrt flattens the head") {
    val rows = TrainingPipeline.temperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val docsTot = rows.map(_._2).sum
    // weights sum to 1 within the 4-dp per-source rounding budget
    assert(math.abs(rows.map(_._4).sum - 1.0) <= rows.length * 1e-4 + 1e-9)
    // floor-division targets never over-allocate, and land within one
    // doc per source of the total
    val tgt = rows.map(_._5).sum
    assert(tgt <= docsTot && tgt >= docsTot - rows.length, s"targets $tgt vs docs $docsTot")
    // the α = 0.5 effect: for any two sources the weight ratio is the
    // sqrt of the token ratio — strictly flatter than proportional
    val (big, small) = (rows.maxBy(_._3), rows.minBy(_._3))
    if (big._3 > small._3) {
      val rawRatio = big._3.toDouble / small._3
      val wRatio = big._4 / small._4
      assert(wRatio < rawRatio, s"weights not flattened: $wRatio vs raw $rawRatio")
      assert(math.abs(wRatio - math.sqrt(rawRatio)) < 0.01 * math.sqrt(rawRatio),
        s"weight ratio $wRatio far from sqrt of $rawRatio")
    }
    // naive recompute of one source's si chain
    rows.foreach { case (_, _, nTok, w, _) =>
      val si = math.floor(math.sqrt(nTok.toDouble) * 10000).toLong
      val sTot = rows.map(r => math.floor(math.sqrt(r._3.toDouble) * 10000).toLong).sum
      val expect = ((si * 20000L + sTot) / (2 * sTot)).toDouble / 10000.0
      assert(math.abs(w - expect) < 1e-9, s"weight $w vs naive $expect")
    }
  }

  test("dsir: weights match an independent driver recompute; target-source docs score higher on average") {
    def ph(sIn: String): Long =
      sIn.codePoints().toArray.foldLeft(0L)((acc, c) => (acc * 1000003L + c) % 2147483647L)
    val b = TrainingPipeline.DsirBuckets
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).toSeq))
    val tsrc = docs.map(_._2).filter(_ != null).min
    def buckets(w: Seq[String]): Seq[Long] = {
      val grams = w ++ (if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSeq
                        else Seq.empty)
      grams.map(g => ph(g) % b)
    }
    val perDoc = docs.map { case (id, src, w) =>
      (id, src, buckets(w).groupBy(identity).map { case (k, v) => k -> v.length.toLong })
    }
    val qc = perDoc.flatMap(_._3).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sum }
    val tcm = perDoc.filter(_._2 == tsrc).flatMap(_._3).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).sum }
    val bigQ = qc.values.sum
    val bigT = tcm.values.sum
    val r = qc.map { case (k, q) =>
      val t = tcm.getOrElse(k, 0L)
      k -> math.round(1e6 * math.log(((t.toDouble + 1.0) * (bigQ.toDouble + b)) /
        ((q.toDouble + 1.0) * (bigT.toDouble + b))))
    }
    val expect = perDoc.map { case (id, _, cnts) =>
      id -> (cnts.values.sum, cnts.map { case (k, c) => c * r(k) }.sum)
    }.toMap
    val got = TrainingPipeline.dsirWeights(spark, sfDir).collect()
      .map(row => row.getLong(0) -> (row.getLong(1), row.getLong(2))).toMap
    assert(got == expect, s"dsir drifted (|got|=${got.size} |exp|=${expect.size})")
    // non-vacuous: the weights genuinely pull toward the target —
    // mean weight of target-source docs exceeds the rest
    val (tW, oW) = (perDoc.filter(_._2 == tsrc).map(d => expect(d._1)._2),
      perDoc.filter(_._2 != tsrc).map(d => expect(d._1)._2))
    assert(tW.nonEmpty && oW.nonEmpty &&
      tW.sum.toDouble / tW.length > oW.sum.toDouble / oW.length,
      "target docs do not score higher on average — selection is vacuous")
  }
}
