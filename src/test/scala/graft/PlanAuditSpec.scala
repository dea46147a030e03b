package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.operators._

/** Physical-plan audit (SURVEY §6): the properties that make these
  * operators scale are asserted on the actual plans, so a regression
  * that silently de-optimizes (lost pushdown, broadcast degrading to
  * shuffle, top-k degrading to global sort) fails CI.
  */
class PlanAuditSpec extends SparkSpec {

  /** Static physical plan (pre-AQE) — join strategies + scans. */
  private def plan(df: DataFrame): String = df.queryExecution.sparkPlan.toString

  /** Full pushed-filter metadata of every parquet scan in the plan
    * (the toString rendering truncates it). */
  private def pushed(df: DataFrame): String =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f.metadata.getOrElse("PushedFilters", "")
    }.mkString(";")

  /** Columns actually read from parquet. */
  private def readSchema(df: DataFrame): String =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f.metadata.getOrElse("ReadSchema", "")
    }.mkString(";")

  test("q1: shipdate predicate pushed to parquet scan; partial aggregation; pruned columns") {
    val df = RelationalOps.q1Agg(spark, sfDir)
    assert(pushed(df).contains("LessThanOrEqual(l_shipdate"), pushed(df))
    assert(plan(df).contains("partial_sum"), plan(df))
    // projection pruning: 16-column table, only the 7 used reach the scan
    assert(!readSchema(df).contains("l_orderkey"), readSchema(df))
  }

  test("q2: global top-k plans as TakeOrderedAndProject, not a full sort") {
    assert(plan(RelationalOps.q2Topk(spark, sfDir)).contains("TakeOrderedAndProject"))
  }

  test("q3: dimension joins are broadcast, not shuffled") {
    assert(plan(RelationalOps.q3BroadcastJoin(spark, sfDir)).contains("BroadcastHashJoin"))
  }

  test("q6: all three predicates reach the scan") {
    val p = pushed(RelationalOps.q6FilterAgg(spark, sfDir))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("GreaterThanOrEqual(l_discount"), p)
    assert(p.contains("LessThan(l_quantity"), p)
  }

  test("q7/q8: semi and anti joins plan as semi/anti, not inner+dedup") {
    assert(plan(RelationalOps.q7SemiJoin(spark, sfDir)).contains("LeftSemi"))
    assert(plan(RelationalOps.q8AntiJoin(spark, sfDir)).contains("LeftAnti"))
  }

  test("q10: per-group top-N uses WindowGroupLimit (rank pushdown), one shuffle") {
    val p = plan(RelationalOps.q10WindowRank(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("t_minute: partial-agg pipeline, minimal shuffles") {
    val p = plan(TimerOps.tMinuteTaskCnt(spark, sfDir))
    assert(p.contains("HashAggregate"), p)
    assert(p.split("Exchange").length - 1 <= 2, p) // agg + final sort only
  }

  test("t_minute_task_cnt_tz: the zone shift is a scan-side scalar — plan identical to UTC") {
    val p = plan(TimerOps.tMinuteTaskCnt(spark, sfDir, "Asia/Shanghai"))
    assert(p.contains("HashAggregate"), p)
    assert(p.split("Exchange").length - 1 <= 2, p) // agg + final sort only
    // the conversion compiles to from_utc_timestamp inside the
    // projection, never a join or extra shuffle
    assert(p.contains("from_utc_timestamp"), p)
  }

  test("t_pending_overdue: paged scan is a top-k; raw-nanos time bound pushed") {
    val df = TimerOps.tPendingOverdue(spark, sfDir)
    assert(plan(df).contains("TakeOrderedAndProject"), plan(df))
    // NanosTimestampPushdown derives ns < 1000·C on the raw long column
    assert(pushed(df).contains("LessThan(ts"), pushed(df))
  }

  test("t_time_window_slice: both range bounds pushed to the events scan as raw nanos") {
    val df = TimerOps.tTimeWindowSlice(spark, sfDir)
    val p = pushed(df)
    assert(p.contains("GreaterThanOrEqual(ts") && p.contains("LessThan(ts"), p)
  }

  test("s_ann_bruteforce: query set broadcast; cosine inside whole-stage codegen") {
    val df = SimilarityOps.sAnnBruteforce(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("cosine_similarity"), p)
    df.collect() // finalize AQE
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan)
    assert(finalPlan.contains("*("), "no WholeStageCodegen stage markers:\n" + finalPlan)
  }

  test("d_minhash_lsh: candidates from an equi-join on band keys, never cartesian") {
    val p = plan(DedupOps.dMinhashLsh(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("band_idx") && p.contains("band_key"), p)
  }

  test("d_ngram_jaccard: τ=1/2 dispatches to the fused kernel — equi-join + map-side partial count") {
    val p = plan(DedupOps.dNgramJaccard(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("partial_count"), p)
    // the kernel has no window machinery — that is the prefix tier's
    assert(!p.contains("windowspecdefinition"), p)
  }

  test("d_ngram_jaccard_hi: τ=4/5 dispatches to the prefix tier — per-doc windows, hash-keyed equi-join") {
    val p = plan(DedupOps.dNgramJaccardHi(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // prefix selection windows partition by doc_id (bounded by doc
    // length), never a global window
    assert(p.contains("windowspecdefinition(doc_id"), p)
    // the candidate join is keyed on xxhash64(shingle) with the
    // p·max ≤ q·min length filter attached as its residual condition
    assert(p.contains("xxhash64"), p)
    assert(p.contains("greatest") && p.contains("least"), p)
  }

  test("d_simhash: banded blocking equi-join, never cartesian") {
    assert(!plan(DedupOps.dSimhash(spark, sfDir)).contains("CartesianProduct"))
  }

  test("p_decontaminate: eval grams broadcast — the training corpus is never shuffled") {
    val p = plan(TrainingPipeline.decontaminate(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("p_mix_sources: quota sampling is a window PARTITIONED by source") {
    val p = plan(TrainingPipeline.mixSources(spark, sfDir))
    assert(p.contains("windowspecdefinition(source"), p)
  }

  test("d_embed_cosine: τ-adaptive dispatch picks the right tier per threshold") {
    // τ = 0.4 < crossover: exact tier (output is Ω(n²)-ish, bucketing
    // cannot prune) — the LSH machinery must NOT be in this plan
    val lo = plan(DedupOps.dEmbedCosine(spark, sfDir))
    assert(!lo.contains("hyperplane_lsh"), lo)
    // τ = 0.9 ≥ crossover: candidates from an LSH-bucket EQUI-join,
    // no nested-loop all-pairs anywhere
    val hi = plan(DedupOps.dEmbedCosineHi(spark, sfDir))
    assert(hi.contains("hyperplane_lsh"), hi)
    assert(!hi.contains("BroadcastNestedLoopJoin") && !hi.contains("CartesianProduct"), hi)
  }

  test("t_time_bucket_shard: exact distinct without an Expand (single-copy shuffle)") {
    val p = plan(TimerOps.tTimeBucketShard(spark, sfDir))
    assert(!p.contains("Expand"), p)
  }

  test("m_json_extract: zero shuffles — pure map-side extraction") {
    val p = plan(MultimodalOps.mJsonExtract(spark, sfDir))
    assert(!p.contains("Exchange"), p)
  }

  test("t_asof_def: piggyback as-of is windows, not a nested-loop range join") {
    val p = plan(TimerOps.tAsofDef(spark, sfDir))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("s_ann_ivf: quantizer trains on a BOUNDED sample plan, never the table") {
    val df = SimilarityOps.ivfTrainSample(spark, sfDir)
    // the one collect the operator performs reads through this plan —
    // a TakeOrdered caps driver-side rows at SampleCap no matter the
    // corpus size (the r4 full-table-collect regression guard)
    assert(plan(df).contains("TakeOrderedAndProject"), plan(df))
    assert(df.count() < Tables.embeddings(spark, sfDir).count())
  }

  test("x_seq_pack_sharded: the prefix-sum window is PARTITIONED, not a global single-task window") {
    val p = plan(TextOps.xSeqPackSharded4(spark, sfDir))
    assert(p.contains("windowspecdefinition(shard"), p)
  }

  test("q23_range_join: chunked interval join is an equi-join, not a nested loop") {
    val p = plan(RelationalOps.q23RangeJoin(spark, sfDir))
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // the equi-key join on chunk (broadcast or shuffled hash are both fine)
    assert(p.contains("HashJoin"), p)
  }

  test("q24_cube: single scan + Expand with partial aggregation before the exchange") {
    val df = RelationalOps.q24Cube(spark, sfDir)
    val p = plan(df)
    assert(p.contains("Expand"), p)
    assert(p.contains("partial_count"), p)
    // one scan of orders feeds all four grouping sets; only 3 columns read
    assert(p.split("Scan parquet").length - 1 == 1, p)
    assert(!readSchema(df).contains("o_orderdate"), readSchema(df))
  }

  test("p_stratified_sample: rate table broadcast back, corpus side never shuffled pre-join") {
    val p = plan(TrainingPipeline.stratifiedSample(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x_ngram_topk: top-20 is a TakeOrdered over a partial-agged gram count") {
    val p = plan(TextOps.xNgramTopk(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count"), p)
  }

  test("x_chunk_dedup: hash-agg on the chunk fingerprint with map-side partials") {
    val p = plan(TextOps.xChunkDedup(spark, sfDir))
    assert(p.contains("partial_count"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("s_kmeans_assign: full table flows through NearestCentroid, no join against centroids") {
    val p = plan(SimilarityOps.sKmeansAssign(spark, sfDir))
    // centroids live inside the expression — assignment is a map, not a join
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count"), p)
  }

  test("x_tfidf: vocabulary-sized equi-joins only, top-K window partitioned by source") {
    val p = plan(TextOps.xTfidf(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("windowspecdefinition(source"), p)
  }

  test("x_inverted_index: posting cap is a per-term window, no joins at all") {
    val p = plan(TextOps.xInvertedIndex(spark, sfDir))
    assert(p.contains("windowspecdefinition(term"), p)
    assert(!p.contains("Join"), p)
  }

  test("p_epoch_shuffle / p_curriculum: position windows are sharded, never global") {
    val pe = plan(TrainingPipeline.epochShuffle(spark, sfDir))
    assert(pe.contains("windowspecdefinition(epoch"), pe)
    val pc = plan(TrainingPipeline.curriculum(spark, sfDir))
    assert(pc.contains("windowspecdefinition(stage"), pc)
  }

  test("s_sq4_codebook / s_pq_codebook: encode is a pure map over the scan — no joins") {
    assert(!plan(SimilarityOps.sSq4Codebook(spark, sfDir)).contains("Join"))
    assert(!plan(SimilarityOps.sPqCodebook(spark, sfDir)).contains("Join"))
  }

  test("s_ann_pq: broadcast query tables, per-query top-k via WindowGroupLimit") {
    val p = plan(SimilarityOps.sAnnPq(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q25/q26: set operators plan as semi/anti joins over dedup, no multiplicity") {
    val p25 = plan(RelationalOps.q25Intersect(spark, sfDir))
    assert(p25.contains("LeftSemi"), p25)
    val p26 = plan(RelationalOps.q26Except(spark, sfDir))
    assert(p26.contains("LeftAnti"), p26)
  }

  test("t_coverage: partial-agg rollup, bounded distinct state, no joins") {
    val p = plan(TimerOps.tCoverage(spark, sfDir))
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_count"), p)
  }

  test("x_cms_estimate: sketch is a partial-agged groupBy; probes equi-join the counters") {
    val p = plan(TextOps.xCmsEstimate(spark, sfDir))
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x_vocab_coverage: vocab is a TakeOrdered constant broadcast onto the token stream") {
    val p = plan(TextOps.xVocabCoverage(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("t_miss_rate: expansion joins observed on (timer, minute) — equi, with pushed scan bounds") {
    val df = CronOps.tMissRate(spark, sfDir)
    assert(!plan(df).contains("CartesianProduct") && !plan(df).contains("NestedLoop"), plan(df))
    // the observed-side window bound reaches the events scan as raw nanos
    assert(pushed(df).contains("GreaterThanOrEqual(ts"), pushed(df))
  }

  test("m_payload_dedup: digest groupBy with map-side partials, payload bytes never shuffle") {
    val df = MultimodalOps.mPayloadDedup(spark, sfDir)
    val p = plan(df)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Join"), p)
  }

  test("d_incremental_dedup: fingerprint + band joins are equi-joins, never incoming×base") {
    val p = plan(DedupOps.dIncrementalDedup(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("d_semantic_dedup: candidates from a cell equi-join, never all-pairs") {
    val p = plan(SimilarityOps.dSemanticDedup(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("t_concurrency: sweep windows are (app, day)-sharded; carry joins broadcast; no range join") {
    val p = plan(TimerOps.tConcurrency(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("windowspecdefinition(app"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("p_fuzzy_decontaminate: eval bands/sigs broadcast against the train side") {
    val p = plan(TrainingPipeline.fuzzyDecontaminate(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q27: RANGE frame windows shuffle on o_custkey, never a single partition") {
    val p = plan(RelationalOps.q27RangeFrame(spark, sfDir))
    assert(p.contains("RangeFrame"), p)
    assert(p.contains("windowspecdefinition(o_custkey"), p)
  }

  test("t_sliding_rate: window expansion feeds a partial aggregation — groups shuffle, not 5x events") {
    val p = plan(TimerOps.tSlidingRate(spark, sfDir))
    assert(p.contains("Expand"), p)
    assert(p.contains("partial_count"), p)
  }

  test("x_gopher_rules: per-row rule flags — single 2-column scan, no joins, no aggregation") {
    val df = TextOps.xGopherRules(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
    assert(readSchema(df) == "struct<doc_id:bigint,text:string>", readSchema(df))
  }

  test("p_containment: eval grams+sizes broadcast, eval cap pushed to the scan") {
    val df = TrainingPipeline.containment(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(pushed(df).contains("LessThan(doc_id"), pushed(df))
  }

  test("s_ann_ivfpq: probe rows broadcast-joined on cell; top-k via WindowGroupLimit; no all-pairs") {
    val p = plan(SimilarityOps.sAnnIvfPq(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("BroadcastHashJoin [cell"), p)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("x_dup_spans: gram equi-joins only (linear, never all-pairs); span merge windows are per-doc") {
    val p = plan(TextOps.xDupSpans(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("windowspecdefinition(doc_id"), p)
    assert(p.contains("partial_count"), p)
  }

  test("x_rule_attrition: one scan, no joins, single-row conditional aggregate") {
    val p = plan(TextOps.xRuleAttrition(spark, sfDir))
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("m_phash_index: signatures map-side; candidates from band equi-join, never all-pairs") {
    val p = plan(MultimodalOps.mPhashIndex(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("ahash64"), p)
  }

  test("p_temperature_mix: one partial-agged scan; the 1-row total broadcast back") {
    val p = plan(TrainingPipeline.temperatureMix(spark, sfDir))
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q29: unpivot plans one Expand pass, no shuffle before the aggregate's own exchange") {
    val p = plan(RelationalOps.q29Unpivot(spark, sfDir))
    assert(p.contains("Expand"), p)
    // exactly one Exchange: the 12-row (flag, measure) agg shuffle
    assert(p.sliding("Exchange".length).count(_ == "Exchange") <= 2, p)
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
  }

  test("q28: the correlated LATERAL LIMIT decorrelates to WindowGroupLimit, no per-row rescan") {
    val p = plan(RelationalOps.q28LateralTopn(spark, sfDir))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("q32_pivot: explicit pivot values — one aggregate, no distinct-collect pre-job") {
    val df = RelationalOps.q32Pivot(spark, sfDir)
    val p = plan(df)
    // the pivot lowers to PivotFirst partials inside a normal
    // two-phase aggregate — same shape as the manual-CASE q17
    assert(p.toLowerCase.contains("pivotfirst"), p)
    // two hash exchanges, both carrying GROUPS, never rows: the
    // multi-agg pivot lowers to groupBy(priority, status) partials
    // (exchange 1: ≤ 5×3 groups after map-side agg) then a
    // pivotfirst regroup on priority (exchange 2: ≤ 5 groups); the
    // only other exchange is the presentational range sort. An
    // INFERRED value list would additionally run a distinct-collect
    // job before planning — explicit values make that impossible by
    // construction
    val prepared = df.queryExecution.executedPlan.toString
    val hashEx = prepared.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 2, s"$hashEx hash exchanges:\n$prepared")
    assert(prepared.contains("partial_count") || prepared.contains("partial_pivotfirst")
      || prepared.toLowerCase.contains("pivotfirst"), prepared)
  }

  test("t_upsert_merge: all three window functions share ONE key shuffle") {
    val df = TimerOps.tUpsertMerge(spark, sfDir)
    val p = plan(df)
    assert(p.contains("windowspecdefinition(timer_id"), p)
    assert(!p.contains("Join"), p)
    // sparkPlan is pre-EnsureRequirements (no exchanges yet) — count
    // them on the prepared plan: exactly one hash exchange (the merge
    // key, shared by both Window nodes); the only other exchange is
    // the presentational range sort
    val prepared = df.queryExecution.executedPlan.toString
    val hashEx = prepared.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 1, s"$hashEx hash exchanges:\n$prepared")
  }

  test("x_bpe_pairs: corpus collapses to the vocab before the pair explode; top-20 is TakeOrdered") {
    val p = plan(TextOps.xBpePairs(spark, sfDir))
    assert(p.contains("TakeOrdered"), p)
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Join"), p)
    // the pair Generate consumes the aggregated (word, freq) rows,
    // not the document scan: it must sit ABOVE the word aggregate
    val gen = p.indexOf("Generate explode")
    val agg = p.lastIndexOf("HashAggregate")
    assert(gen >= 0 && agg > gen, s"explode/agg order:\n$p")
  }

  test("x_bigram_lm: the truncated model is broadcast onto the bigram stream") {
    val p = plan(TextOps.xBigramLm(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
  }

  test("x_bigram_lm: trainer and scorer share ONE corpus explode via exchange reuse") {
    // the double corpus scan was the r9-measured hotspot: the
    // (doc_id, bigram, cnt) exchange must be computed once and
    // ReusedExchange'd into the second consumer. Reuse is applied at
    // execution (AQE), so run the query and audit the FINAL plan.
    val df = TextOps.xBigramLm(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("ReusedExchange") || fin.contains("StageReuse") ||
      fin.contains("reused"), s"no exchange reuse in final plan:\n$fin")
  }

  test("x_ppl_buckets: the only unpartitioned window runs over the bucket rollup, not docs") {
    // the naive tercile split is `ntile OVER (ORDER BY score)` — one
    // task holding the corpus. The two-level form may keep exactly ONE
    // unpartitioned window, and its input must be the integer-ppm
    // bucket table (sorted on `b`, ≤10⁶ rows by DOMAIN); every other
    // window (within-bucket, within-score tiebreak) must be partitioned.
    val df = TextOps.xPplBuckets(spark, sfDir)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.size >= 3, s"expected the 3-window decomposition: $wins")
    val unpart = wins.filter(_.partitionSpec.isEmpty)
    assert(unpart.size == 1, s"${unpart.size} unpartitioned windows")
    val sortCols = unpart.flatMap(_.orderSpec.map(_.child)).collect {
      case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
    }
    assert(sortCols == Seq("b"), s"global window sorts on $sortCols, not the bucket key")
    // double partition keys come wrapped (KnownFloatingPointNormalized
    // over NormalizeNaNAndZero) — collect the underlying references
    val partCols = wins.filterNot(_.partitionSpec.isEmpty)
      .flatMap(_.partitionSpec).flatMap(_.references.toSeq.map(_.name)).toSet
    assert(partCols.contains("rk"), s"tiebreak window not score-partitioned: $partCols")
    assert(!plan(df).contains("CartesianProduct"), "cartesian in plan")
  }

  test("s_ann_multiprobe: probe expansion is query-side; candidates from the bucket equi-join") {
    val p = plan(SimilarityOps.sAnnMultiprobe(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    assert(p.contains("hyperplane_lsh"), p)
  }

  test("s_knn_classify: query set broadcast; vote aggregates only the top-k survivors") {
    val p = plan(SimilarityOps.sKnnClassify(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the deliberate 5-row broadcast
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("cosine_similarity"), p)
  }

  test("q30: ntile/rank/count share one priority shuffle; price filter pushed to the scan") {
    val df = RelationalOps.q30RankProfile(spark, sfDir)
    assert(pushed(df).contains("GreaterThan(o_totalprice"), pushed(df))
    val prepared = df.queryExecution.executedPlan.toString
    val hashEx = prepared.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning")
    assert(hashEx == 1, s"$hashEx hash exchanges:\n$prepared")
  }

  test("t_next_fire: per-row cron expansion, no join anywhere in the plan") {
    // another suite may have cached the events table — a cache hit
    // replaces the file scan and empties readSchema (order-dependent)
    spark.catalog.clearCache()
    val df = CronOps.tNextFire(spark, sfDir)
    val p = plan(df)
    assert(p.contains("cron_times"), p)
    assert(!p.contains("Join"), p)
    // the only columns read are the distinct-timer input
    assert(readSchema(df) == "struct<user_id:bigint>", readSchema(df))
  }

  test("p_data_split: one pruned scan, per-row expression — no join, no aggregate") {
    val df = TrainingPipeline.dataSplit(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("Join") && !p.contains("HashAggregate"), p)
    assert(readSchema(df) == "struct<doc_id:bigint,source:string>", readSchema(df))
  }

  test("s_range_search: broadcast radius scan with NO window — filter replaces top-k") {
    val df = SimilarityOps.sRangeSearch(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the deliberate 5-row broadcast
    assert(p.contains("cosine_similarity"), p)
    assert(!p.contains("Window"), p)
    assert(pushed(df).contains("LessThan(vec_id,5)"), pushed(df))
  }

  test("q31: both halves partial-agg to customer rows BEFORE the full-outer join") {
    val df = RelationalOps.q31FullOuter(spark, sfDir)
    val p = plan(df)
    assert(p.contains("FullOuter"), p)
    assert(pushed(df).contains("GreaterThanOrEqual(o_orderdate"), pushed(df))
    // the join consumes aggregates, not order scans: the partial
    // counts sit BELOW the full-outer join node (plans print top-down)
    val join = p.indexOf("FullOuter")
    val aggBelow = p.lastIndexOf("partial_count")
    assert(join >= 0 && aggBelow > join, s"join/agg order:\n$p")
  }

  test("t_gap_fill: events pre-agg to (app, minute) before the grid join; LOCF window per app") {
    val df = TimerOps.tGapFill(spark, sfDir)
    val p = plan(df)
    assert(p.contains("last(observed"), p)
    assert(p.contains("partial_count"), p)
    // the only nested-loop is the deliberate constant-sized grid cross
    // (8 apps x 1440 minutes, both local relations)
    assert(pushed(df).contains("GreaterThanOrEqual(ts"), pushed(df))
  }

  test("t_backlog: the running-sum window consumes the minute ROLLUP, not the events") {
    val df = TimerOps.tBacklog(spark, sfDir)
    val p = plan(df)
    // events partial-agg (map-side combine) into minute groups BEFORE
    // the single-series window: the Window node must sit ABOVE the
    // final HashAggregate in the plan (plans print top-down), so the
    // window's input is calendar-sized, never corpus-sized
    val win = p.indexOf("Window")
    val agg = p.lastIndexOf("partial_count")
    assert(win >= 0 && agg > win, s"window/agg order:\n$p")
    assert(p.contains("partial_count"), p)
  }

  test("deletion-vector read: the position anti-join broadcasts the DV side, never sort-merges") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_pa_dv").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val base = (0 until 2000).map(i => (i.toLong,
      new java.sql.Timestamp(t0 + (i % 3) * 86400000L), i % 11))
      .toDF("id", "ts", "tag")
    graft.sources.ManifestLake.create(spark, dir, base, "ts")
    graft.sources.ManifestLake.deleteWhereDV(spark, dir, col("tag") === 7)
    val df = graft.sources.ManifestLake.read(spark, dir)
    df.collect()
    // AQE sizes the DV side at runtime: positions of matched rows are
    // O(deleted), so the anti-join must come out broadcast — a
    // sort-merge here would shuffle the whole fact scan per read
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("BroadcastHashJoin") && fin.contains("LeftAnti"), fin)
    assert(!fin.contains("SortMergeJoin"), fin)
  }

  test("s_ann_dot: broadcast query set, WindowGroupLimit top-k, no shuffle of the scaled vectors") {
    val df = graft.operators.SimilarityOps.sAnnDot(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
  }

  test("s_ann_l2: broadcast query set, WindowGroupLimit top-k, no sort-merge or cartesian") {
    val df = graft.operators.SimilarityOps.sAnnL2(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
  }

  test("x_bm25: query set and totals broadcast onto the corpus explode; top-k is TakeOrdered, never a corpus window") {
    val df = graft.operators.TextOps.xBm25(spark, sfDir)
    val p = plan(df)
    // the 6-term query set must reach the gram stream as a broadcast —
    // a sort-merge here would shuffle the corpus on the term key
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // top-20 is TakeOrdered(AndProject); the only windows allowed are
    // over constant-size frames (the 52-row selection, the 20-row rank)
    assert(p.contains("TakeOrdered"), p)
  }

  test("p_dsir: the bucket ratio table broadcasts back onto the feature frame; no corpus shuffle on the bucket key") {
    val df = graft.operators.TrainingPipeline.dsirWeights(spark, sfDir)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the scoring join keys on the ≤256-row bucket table — if the
    // corpus side had to exchange on `b` for it the plan regressed
    val gen = p.indexOf("Generate")
    assert(gen >= 0, s"no explode found:\n$p")
  }

  test("p_dsir: target/raw aggregates and scoring share the one (doc,bucket) exchange") {
    val df = graft.operators.TrainingPipeline.dsirWeights(spark, sfDir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
    assert(fin.contains("ReusedExchange") || fin.contains("StageReuse") ||
      fin.contains("reused"), s"no exchange reuse in final plan:\n$fin")
  }

  test("l_incr_mv: maintenance reads the feed and the v1 aggregate — never a second base-table scan per maintained group") {
    val df = graft.operators.LakeOps.lIncrMv(spark, sfDir)
    val p = plan(df)
    // the merge is a key-equi join of two aggregates; a nested-loop or
    // cartesian here means the null-safe key equality fell off the
    // equi-join path
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("merge discovery: ONE table scan, source broadcast, no sort-merge (the r11 27→10 s fusion)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft_pa_merge").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val base = (0 until 2000).map(i => (i.toLong,
      new java.sql.Timestamp(t0 + (i % 3) * 86400000L), i % 11))
      .toDF("id", "ts", "tag")
    graft.sources.ManifestLake.create(spark, dir, base, "ts")
    val src = Seq((5L, new java.sql.Timestamp(t0), 99))
      .toDF("id", "ts", "tag").withColumn("__m", lit(1))
    val disc = graft.sources.ManifestLake.mergeDiscovery(
      graft.sources.ManifestLake.read(spark, dir), src,
      Seq("id"), col("s.tag") === 99)
    val p = plan(disc)
    // the Delta findTouchedFiles shape: the whole discovery is the
    // lake scan ⋈ broadcast(source) — exactly one file scan, the
    // source side broadcast, nothing sort-merged. The pre-r11 forked
    // form re-scanned the table per derived set (matchedDays,
    // matchedKeys, ambiguity) — 27.3 s vs 10.3 s at the 100× lake.
    val scans = disc.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.size == 1, s"${scans.size} table scans:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("l_merge_clauses / l_restore: the committed table reads as a plain pruned scan — no join, no window") {
    // after the DML ladder ran, READING the result must cost exactly a
    // parquet scan + the day-restore projection + the presentational
    // sort: any join/window here would mean merge/restore left
    // per-read debt behind (the lake pays at write time, not per read)
    for (q <- Seq("l_merge_clauses", "l_restore")) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val p = plan(df)
      assert(!p.contains("Join"), s"$q reads with a join:\n$p")
      assert(!p.contains("Window"), s"$q reads with a window:\n$p")
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges <= 1, s"$q: $exchanges exchanges (sort only):\n$p")
    }
  }

  test("x_cdc_chunks: boundary+chunk extraction is one projection — no join, no window, two exchanges") {
    val df = graft.operators.TextOps.xCdcChunks(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("Join") && !p.contains("Window"), p)
    // the only exchanges are the md5-groupBy's own hash shuffle and
    // the presentational sort — the doc text never shuffles pre-agg
    // (partial HashAggregate sits below the first Exchange)
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"$exchanges exchanges:\n$p")
    val firstEx = p.indexOf("Exchange")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstEx) >= 0,
      s"no partial agg around the shuffle:\n$p")
  }

  test("x_quality_lr: supplied weights are a literal change, not a plan change (VERDICT r12 #4)") {
    val std = TextOps.xQualityLr(spark, sfDir)
    // the supplied vector IS the stand-in formula, so results must be
    // bit-identical while the plan proves the lookup stayed an
    // expression
    val w = (0 until 256).map(b => ((b + 1).toLong * 2654435761L) % 1999L)
    val ext = TextOps.xQualityLrWeighted(spark, sfDir, w, 999000000L)
    def shape(df: DataFrame): (Int, Int, Int) = {
      val p = plan(df)
      ("Exchange".r.findAllIn(p).size,
        "Join".r.findAllIn(p).size,
        "HashAggregate".r.findAllIn(p).size)
    }
    assert(shape(std) == shape(ext),
      s"plan shape drifted: ${shape(std)} vs ${shape(ext)}")
    assert(!plan(ext).contains("Join"),
      "the weight lookup became a join:\n" + plan(ext))
    assert(ext.collect().toSeq == std.collect().toSeq,
      "supplied-weights variant diverged from the stand-in formula")
  }
}
