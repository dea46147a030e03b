package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The §2c–e operators composed into the end-to-end preprocessing
  * funnel a training-data pipeline actually runs:
  *
  *   ingest → exact dedup (canonical fingerprint, keep min doc_id)
  *          → near-dup suppression (MinHash-LSH pairs → connected
  *            components, keep the canonical group member)
  *          → per-doc features (language ID, token count, quality)
  *          → policy filter (language allowlist, min quality)
  *
  * Everything is ONE annotated DataFrame pass: each stage contributes
  * a decision column instead of materializing an intermediate table,
  * so `run` (the kept docs), and `funnel` (per-stage survivor counts)
  * share the same plan. Scale shape: one window on the fingerprint
  * (shuffle on fp), the LSH candidate machinery of dMinhashLsh (band
  * bucket joins — never all-pairs), label propagation on the
  * (tiny) pair graph, and per-row feature expressions — nothing
  * quadratic, nothing driver-side except the CC iteration actions.
  */
object TrainingPipeline {

  case class Config(
      minQuality: Double = 0.05,
      langs: Seq[String] = Seq("de", "en", "es", "fr", "zh"))

  /** Every doc with its per-stage decisions. Columns: doc_id, text,
    * fp, exact_keep, group_id, neardup_keep, pred_lang, n_tokens,
    * quality, kept. */
  def annotate(s: SparkSession, dir: String, cfg: Config = Config()): DataFrame = {
    val byFp = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    val withFp = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("fp", TextOps.canonicalFpExpr)
      .withColumn("exact_keep", row_number().over(byFp) === 1)
    // near-dup groups from the LSH scale path; docs outside any pair
    // group are their own canonical representative
    val groups = DedupOps.connectedComponents(
      DedupOps.dMinhashLsh(s, dir).select(col("id_a"), col("id_b")))
    withFp
      .join(groups.withColumnRenamed("doc_id", "gid"),
        col("doc_id") === col("gid"), "left")
      .drop("gid")
      .withColumn("neardup_keep",
        col("group_id").isNull || col("group_id") === col("doc_id"))
      .withColumn("pred_lang", TextOps.langIdExpr)
      .withColumn("n_tokens", TextOps.nTokensExpr)
      .withColumn("quality", TextOps.quality4Expr)
      .withColumn("kept",
        col("exact_keep") && col("neardup_keep") &&
          col("pred_lang").isInCollection(cfg.langs) &&
          col("quality") >= cfg.minQuality)
  }

  /** The surviving training set with its features. */
  def run(s: SparkSession, dir: String, cfg: Config = Config()): DataFrame =
    annotate(s, dir, cfg)
      .filter(col("kept"))
      .select(col("doc_id"), col("text"), col("pred_lang"),
        col("n_tokens"), col("quality"))

  /** The stateless feature + policy-filter tail of the funnel over
    * any frame with (doc_id, text) — shared by the batch pipeline
    * and streaming.Streams.streamingFunnel (same expressions, so the
    * two tiers can't drift). */
  def featureAndFilter(docs: DataFrame, minQuality: Double,
      langs: Seq[String]): DataFrame =
    docs
      .withColumn("pred_lang", TextOps.langIdExpr)
      .withColumn("n_tokens", TextOps.nTokensExpr)
      .withColumn("quality", TextOps.quality4Expr)
      .filter(col("pred_lang").isInCollection(langs) &&
        col("quality") >= minQuality)
      .select(col("doc_id"), col("text"), col("pred_lang"),
        col("n_tokens"), col("quality"))

  /** Training-mix construction — the data-mixing stage of a
    * pretraining recipe: deterministic per-source quota sampling
    * (first-k by doc_id within each source; quota = 5 + (src_idx mod
    * 3)·5 stands in for per-corpus mixing weights). One window
    * PARTITIONED BY source: strata sample in parallel and no global
    * shuffle exists anywhere in the plan; at 100 TB the only change
    * is quota values (and a per-stratum top-k replaces the full
    * within-stratum sort the same way WindowGroupLimit already does
    * for constant limits). */
  def mixSources(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("quota",
        lit(5) + pmod(expr("CAST(substring(source, 4) AS INT)"), lit(3)) * 5)
      .withColumn("mix_rank", row_number().over(w))
      .filter(col("mix_rank") <= col("quota"))
      .select(col("source"), col("doc_id"), col("mix_rank"))
  }

  /** Temperature-based mixture reweighting (the multilingual /
    * DoReMi-family sampling-design step: raw source proportions
    * over-train the head, so sample ∝ n^α with α < 1 — here α = 0.5,
    * the classic multilingual-BERT exponent). Per source: doc and
    * whitespace-token counts, the normalized √tokens weight, and the
    * integer target doc count a sampler would draw. Exact across
    * engines because IEEE-754 sqrt is CORRECTLY ROUNDED (identical
    * bits on both), the scaled weight is floored into integer space
    * (floor, not a float round that could land on a .5 tie; not a
    * raw cast — Spark truncates double→long where DuckDB rounds),
    * and weight/targets are integer ratios from there. Plan: one
    * map-side-partial groupBy to ≤ #sources rows, the 1-row total
    * broadcast back — the corpus is scanned once and never
    * shuffled. */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("si", floor(sqrt(col("n_tokens")) * 10000).cast("long"))
    val tot = per.agg(sum(col("si")).as("s_tot"), sum(col("n_docs")).as("docs_tot"))
    per.crossJoin(broadcast(tot))
      .withColumn("weight", ExactNum.ratio4(col("si"), col("s_tot")))
      .withColumn("target_docs", expr("si * docs_tot div s_tot"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("weight"), col("target_docs"))
  }

  /** Fixed benchmark size for decontaminate: at most EvalDocs docs in
    * the stand-in eval slice, so the broadcast gram set is bounded by
    * a CONSTANT (≤ EvalDocs × grams-per-doc) regardless of corpus
    * size — at sf ≤ 0.01 every 20th doc is under the cap, so the
    * output is unchanged from the uncapped form there (ADVICE r5). */
  private val EvalDocs = 32L

  /** Benchmark decontamination — the pipeline stage that flags
    * training documents overlapping the evaluation set (word-8-gram
    * containment, the n-gram rule GPT-3/PaLM-style pipelines apply
    * before training). Eval slice = the first EvalDocs docs with
    * doc_id % 20 == 0 (a deterministic FIXED-SIZE stand-in
    * benchmark — a real deployment swaps in the actual eval set,
    * which is likewise fixed-size); a train doc is contaminated iff
    * it shares ≥ 1 distinct 8-gram with any eval doc. The eval gram
    * set is benchmark-sized (constant-bounded, ≪ corpus) and
    * BROADCAST to the train-side gram scan — the training corpus is
    * never shuffled at all; output is per-doc collision counts + the
    * smallest contaminating eval id. */
  /** The distinct word-8-gram stream per doc — shared by
    * decontaminate and containment so the gram definition cannot
    * drift between the flag and the score. */
  private def docGrams(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(1, greatest(size(w) - 7, 1)), " +
          "i -> concat_ws(' ', slice(w, i, 8))))")).as("gram"))

  // first-EvalDocs cap as a pure doc_id predicate (doc_id < 20·cap
  // ∧ doc_id % 20 = 0 ⇒ ≤ cap docs) — stays a pushed-down scan
  // filter, no sort/limit needed
  private def isEvalDoc: org.apache.spark.sql.Column =
    pmod(col("doc_id"), lit(20L)) === 0 && col("doc_id") < lit(20L * EvalDocs)

  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = docGrams(s, dir)
    val evalGrams = grams.filter(isEvalDoc)
      .select(col("doc_id").as("eval_id"), col("gram"))
    grams.filter(pmod(col("doc_id"), lit(20L)) =!= 0)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("eval_id")).as("first_eval_id"))
  }

  /** n-gram CONTAINMENT decontamination score — the asymmetric
    * companion of `decontaminate`'s binary flag (and the metric that
    * matters for SHORT eval docs: Jaccard of a 40-gram eval doc
    * against a 4000-gram train doc is ≈ 0.01 even at full leakage,
    * while containment |∩| / |eval grams| reads 1.0 — the
    * Brown/Dodge et al. C4-contamination framing). Per (train, eval)
    * pair sharing ≥ 1 distinct 8-gram: shared-gram count, the eval
    * doc's gram count, and their exact integer ratio. Same plan shape
    * as decontaminate: the constant-bounded eval side (grams AND the
    * EvalDocs-row size table) broadcasts; the train corpus is never
    * shuffled — the groupBy keys are (train doc, eval doc) pairs that
    * exist only where a gram collided. */
  def containment(s: SparkSession, dir: String): DataFrame = {
    val grams = docGrams(s, dir)
    val evalGrams = grams.filter(isEvalDoc)
      .select(col("doc_id").as("eval_id"), col("gram"))
    val evalSizes = evalGrams.groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_eval_grams"))
    grams.filter(pmod(col("doc_id"), lit(20L)) =!= 0)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(evalSizes), "eval_id")
      .withColumn("containment", ExactNum.ratio4(col("n_shared"), col("n_eval_grams")))
      .select(col("doc_id"), col("eval_id"), col("n_shared"),
        col("n_eval_grams"), col("containment"))
  }

  /** Fuzzy benchmark decontamination — the near-duplicate complement
    * of `decontaminate`: exact 8-gram containment misses lightly
    * paraphrased or reformatted eval leakage, so production pipelines
    * ALSO run the eval set through the same MinHash-LSH machinery as
    * corpus dedup (the 13-gram Jaccard rule of GPT-3 appendix C /
    * Llama-style decontamination). Shares the exact signature
    * pipeline of d_minhash_lsh (DedupOps.minhashSigs/minhashBands —
    * same 64 perms, seed 42, 8×8 bands): candidates are band-key
    * collisions between a train doc and an eval doc, verified by
    * exact Jaccard ≥ 0.5 on the shingle-hash sets. Eval side =
    * the same fixed-size slice as `decontaminate` (doc_id % 20 == 0,
    * capped), so its bands and signatures are constant-bounded and
    * BROADCAST; the training corpus is never shuffled by this
    * operator beyond the signature scan itself. Output: per
    * contaminated train doc, the number of near-matching eval docs,
    * the best-matching eval id (max Jaccard, ties → smallest id) and
    * that Jaccard. */
  def fuzzyDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val sigs = DedupOps.minhashSigs(s, dir)
    val bands = DedupOps.minhashBands(sigs)
    val isEval = pmod(col("doc_id"), lit(20L)) === 0 &&
      col("doc_id") < lit(20L * EvalDocs)
    val evalBands = bands.filter(isEval)
      .select(col("band_idx"), col("band_key"), col("doc_id").as("eval_id"))
    val cands = bands.filter(pmod(col("doc_id"), lit(20L)) =!= 0)
      .join(broadcast(evalBands), Seq("band_idx", "band_key"))
      .select(col("doc_id"), col("eval_id"))
      .distinct()
    // shared verify (τ = 0.5, the d_minhash_lsh convention); the
    // constant-bounded eval sig side rides in as a broadcast
    val verified = DedupOps.jaccardVerify(cands,
      sigs, broadcast(sigs.filter(isEval)), "doc_id", "eval_id")
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("eval_id"))
    verified.withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_near"),
        max(when(col("rn") === 1, col("eval_id"))).as("best_eval_id"),
        max(col("jaccard")).as("max_jaccard"))
  }

  /** Takedown seed set: a constant-bounded "removal request" list
    * (≤ TakedownCap docs regardless of corpus size — a real request
    * names specific documents), deterministic so the oracle can
    * mirror it. */
  /** takedown's seed-bounded exact-match frame, memoized per
    * (session, dir) — see the comment at the use site. */
  private val takedownExactCache = new SessionMemo[DataFrame]

  private val TakedownMod = 83L
  private val TakedownCap = 32L

  /** Content-level takedown — the compliance pass a training corpus
    * runs when a removal request arrives (DMCA / GDPR / opt-out):
    * removing only the named doc_ids is NOT enough, because the
    * corpus holds exact re-crawls and near-duplicate copies of the
    * same content under different ids. Every named seed is expanded
    * to (a) its exact-fingerprint copies (the md5 the corpus already
    * stores for d_exact_dedup) and (b) its MinHash-LSH near-dup
    * copies (same signatures/bands as d_minhash_lsh, Jaccard ≥ 0.5
    * verified), with `exact` taking precedence and the smallest
    * matching seed kept for audit provenance. The output is the full
    * removal manifest (seed / exact / near rows) — feed its ids to
    * LakeLayout.deleteWhere for the physical delete.
    *
    * Scale shape: the seed side is constant-bounded, so its
    * fingerprints, bands and signatures all BROADCAST — the corpus
    * is never shuffled by the matching itself; only the verified
    * collision candidates (≪ corpus) reach the signature equi-joins.
    * Same plan family as fuzzyDecontaminate, pointed at removal
    * instead of eval overlap. */
  def takedown(s: SparkSession, dir: String): DataFrame = {
    val isSeed = pmod(col("doc_id"), lit(TakedownMod)) === 0 &&
      col("doc_id") < lit(TakedownMod * TakedownCap)
    val docs = Tables.documents(s, dir)
    val fps = docs.select(col("doc_id"),
      md5(col("text").cast("binary")).as("fp"))
    // cached + MEMOIZED per (session, dir): referenced twice in one
    // action (the union output AND the near-precedence anti-join) —
    // without the cache the corpus-wide fingerprint scan + broadcast
    // join runs twice (review r9); without the memo every invocation
    // stacked a fresh cached frame in executor memory for the session
    // lifetime (ADVICE r9 — the bench loop runs the full inventory in
    // one session). Same discipline as DedupOps.minhashSigs; the
    // frame itself is seed-bounded, so the one cache is tiny.
    val exact = SessionMemo.frame(TrainingPipeline.takedownExactCache, s, dir) {
      fps.filter(!isSeed)
        .join(broadcast(fps.filter(isSeed)
          .select(col("fp"), col("doc_id").as("seed_id"))), Seq("fp"))
        .groupBy(col("doc_id")).agg(min(col("seed_id")).as("matched_seed"))
        .withColumn("reason", lit("exact"))
    }
    val sigs = DedupOps.minhashSigs(s, dir)
    val bands = DedupOps.minhashBands(sigs)
    val cand = bands.filter(!isSeed)
      .join(broadcast(bands.filter(isSeed)
        .select(col("band_idx"), col("band_key"), col("doc_id").as("seed_id"))),
        Seq("band_idx", "band_key"))
      .select(col("doc_id"), col("seed_id")).distinct()
    val near = DedupOps.jaccardVerify(cand, sigs,
        broadcast(sigs.filter(isSeed)), "doc_id", "seed_id")
      .groupBy(col("doc_id")).agg(min(col("seed_id")).as("matched_seed"))
      .join(exact.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("reason", lit("near"))
    docs.filter(isSeed)
      .select(col("doc_id"), col("doc_id").as("matched_seed"),
        lit("seed").as("reason"))
      .unionByName(exact.select(col("doc_id"), col("matched_seed"), col("reason")))
      .unionByName(near.select(col("doc_id"), col("matched_seed"), col("reason")))
  }

  /** Deterministic stratified sampling to a per-stratum TARGET count
    * — the "balance the sources" stage of a data mix (cap every
    * source at ≈ SampleTarget docs): rate_bp = min(1, target/n) in
    * basis points via pure INTEGER division (both engines floor
    * identically — no float rate), membership by a Knuth
    * multiplicative hash of doc_id mod 10⁴ (seedless, mirrorable
    * arithmetic — a production run swaps in xxhash64, same shape).
    * The doc_id is reduced mod 2³¹ BEFORE the multiply so the product
    * stays ≤ 2³¹·2654435761 ≈ 5.7e18 < Long.MaxValue for ANY key —
    * the ScaleUp replica ids reach ~9e9 and the unreduced form
    * overflows under ANSI arithmetic (ADVICE r6).
    * Plan: one tiny per-source count (20 rows), broadcast back onto
    * the scan, per-row filter — the corpus is never shuffled, and the
    * sample rate adapts per stratum with NO second pass over the
    * data. Sampling is by doc_id hash, not row position, so the
    * sample is stable under corpus re-partitioning/re-ordering. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n_src"))
      .withColumn("rate_bp", least(lit(10000L), expr("100000L div n_src")))
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"))
      .join(broadcast(counts), "source")
      .filter(expr(
        "pmod(pmod(doc_id, 2147483648L) * 2654435761L, 2147483648L) % 10000") < col("rate_bp"))
      .select(col("source"), col("doc_id"), col("n_src"), col("rate_bp"))
  }

  /** Per-epoch multiplicative-hash constants (Knuth 2654435761 and
    * the xxhash32 prime 2246822519 — both public) — one deterministic
    * permutation per epoch, shared verbatim with the oracle. */
  private[operators] val EpochMuls = Seq(2654435761L, 2246822519L)
  private[operators] val ShuffleShards = 8L

  /** Epoch shuffle — the "shuffle the corpus differently every
    * epoch" stage of a training run, as a DETERMINISTIC artifact: the
    * training order is a pure function of (doc_id, epoch), so any
    * worker can recompute any shard's order without coordination and
    * a resumed run sees the identical sequence. Order key = the
    * overflow-safe multiplicative hash of doc_id (doc_id reduced mod
    * 2³¹ BEFORE the multiply — the ScaleUp replica range overflows
    * the naive form under ANSI, same hazard as stratifiedSample);
    * each epoch uses its own public multiplier, so epochs are
    * independent permutations. The position counter is a window
    * PARTITIONED BY (epoch, shard): shards order independently and in
    * parallel — the corpus never routes through one task, and at
    * 100 TB the shard count is the parallelism knob (a data-parallel
    * trainer reads shard s of epoch e as one ordered stream). */
  def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    val epochs = EpochMuls.zipWithIndex.map { case (m, e) =>
      s"struct(CAST($e AS BIGINT) AS epoch, " +
        s"pmod(pmod(doc_id, 2147483648L) * ${m}L, 2147483648L) AS h)"
    }
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("h"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr(epochs.mkString("array(", ", ", ")"))).as("x"))
      .select(col("doc_id"), col("x.epoch").as("epoch"), col("x.h").as("h"))
      .withColumn("shard", col("h") % ShuffleShards) // h ≥ 0 ⇒ % ≡ pmod
      .withColumn("pos", row_number().over(w))
      .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
  }

  /** Curriculum assignment — order the corpus easy→hard by quality
    * (Bengio et al. 2009 shape): stage = the doc's quality quartile
    * by FIXED thresholds (0.25/0.5/0.75), not by rank — a per-row
    * expression, so stage assignment needs no global sort/ntile and
    * is stable when the corpus grows (a rank-based quartile would
    * reshuffle every doc's stage on every ingest). Within a stage,
    * the read order is (quality, doc_id) ascending, positioned by a
    * window PARTITIONED BY (stage, shard) — same sharded-window scale
    * shape as epochShuffle. The stage boundary floor(q·4) is
    * float-safe: q = r/10⁴ exactly as a double on both engines, and
    * q·4 is integral only at q ∈ {0, .25, .5, .75, 1}, every one of
    * which is an exact binary double. */
  def curriculum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("stage"), col("shard"))
      .orderBy(col("quality"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), TextOps.quality4Expr.as("quality"))
      .withColumn("stage", least(lit(3L), floor(col("quality") * 4).cast("long")))
      .withColumn("shard", pmod(col("doc_id"), lit(ShuffleShards)))
      .withColumn("pos", row_number().over(w))
      .select(col("stage"), col("shard"), col("pos"), col("doc_id"), col("quality"))
  }

  /** Holdout-split hash multiplier — murmur3's public c1 constant
    * (0xcc9e2d51); distinct from the sampling/epoch multipliers so
    * split membership is uncorrelated with sample membership and
    * epoch order. 2³¹·c1 ≈ 7.4e18 < Long.MaxValue, so the mod-2³¹
    * pre-reduction keeps the product ANSI-safe at any doc_id. */
  private[operators] val SplitMul = 3432918353L
  /** Basis-point split boundaries: train < 9800 ≤ val < 9900 ≤ test. */
  private[operators] val TrainBp = 9800L
  private[operators] val ValBp = 9900L

  /** Train/val/test holdout split — the assignment every training run
    * makes before anything else, as a DETERMINISTIC per-row artifact:
    * split = f(doc_id) alone (multiplicative hash mod 10⁴ against
    * fixed 98/1/1 basis-point boundaries), so a document can never
    * drift between splits across runs, re-partitions, or corpus
    * growth — the property that prevents silent train-on-test
    * contamination when the corpus is re-ingested. Zero shuffle: the
    * assignment is one per-row integer expression on the scan (the
    * presentational sort is the only exchange); at 100 TB the split
    * is computed on read, never materialized as a routing step. */
  def dataSplit(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("h_bp", expr(
        s"pmod(pmod(doc_id, 2147483648L) * ${SplitMul}L, 2147483648L) % 10000"))
      .withColumn("split",
        when(col("h_bp") < TrainBp, "train")
          .when(col("h_bp") < ValBp, "val")
          .otherwise("test"))

  /** Fixed-point scale for graphRank ranks (10¹² units ≡ rank 1.0). */
  private[operators] val RankScale = 1000000000000L
  /** Damping 0.85 as the integer pair 85/100; 4 unrolled iterations. */
  private[operators] val RankIters = 4

  /** PageRank over the near-dup pair graph — centrality-based
    * boilerplate triage: in a corpus's MinHash-LSH graph, template
    * hubs (docs near-duplicating MANY others) outrank members of
    * small mutual-dup cliques, so rank orders what d_dup_groups can
    * only cluster. Iterative-graph beyond connected components: the
    * same edges frame drives K fixed rank-propagation rounds.
    *
    * All-integer fixed point (RankScale units) so 4 unrolled SQL
    * iterations reproduce every rank bit-for-bit: r₀ = S div n;
    * contrib = r div deg; r' = (15·(S div n)) div 100 +
    * (85·Σ contrib) div 100. Sums of longs are order-independent,
    * division is floor — no float accumulation anywhere.
    *
    * Scale shape: the EDGE table — the only term that grows with the
    * corpus — is hash-partitioned on src ONCE and cached in that
    * layout, so every iteration's edges⋈contrib probe finds its
    * required partitioning already in place and only the NODE-sized
    * frames (contrib, inbound, state) shuffle per round (r11: the
    * previous form re-exchanged the cached-but-unpartitioned edges
    * every iteration and joined deg back twice per round; the rewrite
    * removes the edge-sized exchanges and one join per round —
    * measured ~15% at sf0.1 against a slower calibration anchor
    * [4.40 → 3.82 s while calibration_sec rose 0.32 → 0.37], modest
    * locally because stage-scheduling overhead dominates a tiny
    * graph, and exactly the terms that dominate once edges are
    * corpus-sized). deg rides inside the rank state,
    * so an iteration is exactly two node-keyed joins + one
    * map-side-partial sum — the standard distributed PageRank
    * shape. K is fixed so lineage stays linear
    * (the CC contraction loop's localCheckpoint lesson does not
    * arise). Edges come from the SAME shared signature pipeline as
    * d_minhash_lsh (memoized cache); n is a one-scalar driver
    * aggregate (the BloomOps pattern). Ranks are NOT broadcast
    * deliberately: at 100 TB the node table is itself billions of
    * rows — node-keyed shuffles are the scale-safe side of that
    * trade. */
  def graphRank(s: SparkSession, dir: String): DataFrame = {
    val pairs = DedupOps.minhashLshPairs(s, dir, Int.MaxValue)
      .select(col("id_a"), col("id_b"))
    val edges = pairs
      .unionAll(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .repartition(col("src"))
      .cache()
    val out = pageRankOver(edges)
    edges.unpersist(false)
    out.select(col("id").as("doc_id"), col("deg"), col("rank"))
  }

  /** The integer fixed-point PageRank core (damping 0.85, RankIters
    * rounds, RankScale units) over a SYMMETRIC cached edge list —
    * shared by p_graph_rank (doc near-dup graph, long ids) and
    * x_textrank (word co-occurrence graph, string ids); the id type
    * only has to equi-join. Arithmetic is bit-identical to the
    * unrolled rankItersSql oracle; deg rides IN the state so no
    * per-iteration deg joins are needed. Returns (id, deg, rank)
    * UNSORTED, materialized via localCheckpoint with the per-call
    * caches released (the ADVICE-r8 cache-stacking rule). */
  private[operators] def pageRankOver(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
    val n = deg.count() // one scalar; the graph node count
    if (n == 0) {
      val empty = deg.select(col("src").as("id"), col("deg"), lit(0L).as("rank")).limit(0)
      deg.unpersist(false)
      return empty
    }
    val r0 = RankScale / n
    val base = (15L * r0) / 100L
    var state = deg.select(col("src").as("id"), col("deg"), lit(r0).as("rank"))
    (1 to RankIters).foreach { _ =>
      val contrib = state.select(col("id"), expr("rank div deg").as("c"))
      val inbound = edges.join(contrib, edges("src") === contrib("id"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      state = state.select(col("id"), col("deg"))
        .join(inbound, col("id") === col("dst"), "left")
        .select(col("id"), col("deg"),
          expr(s"${base}L + (85L * coalesce(sc, 0L)) div 100L").as("rank"))
    }
    val out = state.localCheckpoint(true)
    deg.unpersist(false)
    out
  }

  private[operators] val DsirBuckets = 256L

  /** DSIR — Data Selection via Importance Resampling (Xie et al.
    * 2023, the data-selection method behind DoReMi-era pretraining
    * mixes): score every raw document by how much more likely its
    * hashed n-gram features are under a TARGET distribution than
    * under the raw-corpus distribution; resampling by these weights
    * shifts the corpus toward the target domain without training a
    * classifier. Features = unigrams + word bigrams hashed into
    * 256 buckets (poly_hash31 — the engine's shared mirrorable
    * hash); target = the lexicographically-first `source` (a
    * deterministic stand-in for "the Wikipedia slice"; a deployment
    * swaps in its real target corpus). Per-bucket log-likelihood
    * ratio with add-one smoothing:
    * r(b) = ln( (tc(b)+1)(Q+B) / ((qc(b)+1)(T+B)) ), and the doc's
    * log importance weight is Σ cnt_doc(b)·r(b).
    *
    * Exactness discipline: r(b) is rounded to integer MICRO-nats per
    * BUCKET (≤ 256 values — the x_char_entropy boundary-margin
    * device; the ln argument is an exact integer rational evaluated
    * in one identical double expression on both engines), so every
    * per-doc weight is a sum of integer products — order-free,
    * bit-equal, no float accumulation.
    *
    * Scale shape: ONE gram explode collapses map-side to (doc,
    * bucket) counts; that single exchange feeds the target aggregate,
    * the raw aggregate, and the scoring join (ReusedExchange — the
    * x_bigram_lm audit precedent); the ratio table is ≤ B rows and
    * BROADCASTS back, so the corpus never shuffles on the bucket key
    * and the per-doc rollup is the only doc-keyed exchange. At
    * 100 TB the bucket table is still 256 rows — the method's whole
    * point is that the target fingerprint is a constant-size
    * artifact. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val feats = Tables.documents(s, dir)
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"), col("source"), explode(expr(
        """concat(w, if(size(w) >= 2,
          |  transform(sequence(1, size(w) - 1),
          |    i -> concat(element_at(w, i), ' ', element_at(w, i + 1))),
          |  slice(w, 1, 0)))""".stripMargin)).as("gram"))
      .withColumn("b", pmod(expr("poly_hash31(gram)"), lit(DsirBuckets)))
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val target = Tables.documents(s, dir).agg(min(col("source")).as("tsrc"))
    // qc, tc AND the Q/T totals all fold out of ONE per-bucket pass
    // (tc as a conditional sum, totals as a second agg over the
    // ≤256-row bucket table) — the first cut computed them as three
    // separate consumers of the feats subtree with a crossJoin in
    // between, which defeats ReusedExchange (the subtrees are not
    // identical) and re-evaluated the corpus explode: measured
    // 17 → 6.5 s at 30× docs
    val bstats = feats.crossJoin(broadcast(target))
      .groupBy(col("b"))
      .agg(sum(col("cnt")).as("qc"),
        sum(when(col("source") === col("tsrc"), col("cnt"))
          .otherwise(0L)).as("tc"))
    val tot = bstats.agg(sum(col("qc")).as("Q"), sum(col("tc")).as("T"))
    val ratios = bstats
      .crossJoin(broadcast(tot))
      .withColumn("r_micro", expr(
        s"CAST(round(1000000.0 * ln(((CAST(tc AS DOUBLE) + 1.0) * (CAST(Q AS DOUBLE) + $DsirBuckets.0)) / ((CAST(qc AS DOUBLE) + 1.0) * (CAST(T AS DOUBLE) + $DsirBuckets.0))), 0) AS BIGINT)"))
      .select(col("b"), col("r_micro"))
    feats.join(broadcast(ratios), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * col("r_micro")).as("weight_micro"))
  }

  /** Driver-visible entry. */
  val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      "p_training_funnel" -> ((s, dir) => run(s, dir)),
      "p_funnel_report" -> ((s, dir) => funnel(s, dir)),
      "p_mix_sources" -> (mixSources _),
      "p_temperature_mix" -> (temperatureMix _),
      "p_decontaminate" -> (decontaminate _),
      "p_containment" -> (containment _),
      "p_fuzzy_decontaminate" -> (fuzzyDecontaminate _),
      "p_takedown" -> (takedown _),
      "p_stratified_sample" -> (stratifiedSample _),
      "p_data_split" -> (dataSplit _),
      "p_epoch_shuffle" -> (epochShuffle _),
      "p_curriculum" -> (curriculum _),
      "p_graph_rank" -> (graphRank _),
      "p_dsir" -> (dsirWeights _))

  /** The 4 unrolled PageRank iterations over the shared lshpairs
    * CTEs — n, base, and damping are interpolated from the SAME
    * Scala constants the operator uses. */
  /** The deg/base/r0 + unrolled-iteration CTE tail of the PageRank
    * oracle — expects an `edges(src, dst)` CTE upstream; shared by
    * the p_graph_rank and x_textrank mirrors so the fixed-point
    * arithmetic cannot drift between them. */
  private[operators] lazy val rankCtes: String = {
    // AS MATERIALIZED: deg is referenced 2× per unrolled iteration and
    // edges 1× — with DuckDB's default CTE inlining each reference
    // re-expands the whole upstream edge-construction subtree (the
    // minhash-pairs chain for p_graph_rank), measured 6.0 s → 0.26 s
    // at sf0.01 once materialized. Same bomb class as the r11 s_mmr
    // oracle; OracleBudgetSpec bounds the static expansion factor.
    val iters = (1 to RankIters).map { i =>
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS MATERIALIZED (SELECT r.id, r.rank // d.deg AS c
         |  FROM $prev r JOIN deg d ON r.id = d.src),
         |a$i AS MATERIALIZED (SELECT e.dst AS id, sum(c.c) AS sc
         |  FROM edges e JOIN c$i c ON e.src = c.id GROUP BY e.dst),
         |r$i AS MATERIALIZED (SELECT d.src AS id,
         |    CAST(b.b + (85 * coalesce(a.sc, 0)) // 100 AS BIGINT) AS rank
         |  FROM deg d CROSS JOIN base b LEFT JOIN a$i a ON d.src = a.id)""".stripMargin
    }.mkString(",\n")
    s"""deg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |nn AS MATERIALIZED (SELECT count(*) AS n FROM deg),
       |base AS MATERIALIZED (SELECT (15 * ($RankScale // n)) // 100 AS b FROM nn),
       |r0 AS MATERIALIZED (SELECT src AS id, $RankScale // n AS rank FROM deg CROSS JOIN nn),
       |$iters""".stripMargin
  }

  private lazy val graphRankSql: String = {
    s"""WITH ${graft.operators.DedupOps.minhashPairsCtes},
       |edges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM lshpairs
       |          UNION ALL SELECT id_b, id_a FROM lshpairs),
       |$rankCtes
       |SELECT r.id AS doc_id, d.deg, r.rank
       |FROM r$RankIters r JOIN deg d ON r.id = d.src
       |ORDER BY r.rank DESC, doc_id""".stripMargin
  }

  private lazy val oracleLangList =
    Config().langs.map(l => s"'$l'").mkString(", ")

  /** Shared g/e/t gram CTEs of the two exact-decontamination oracles
    * (mirrors docGrams + the eval predicate). */
  private lazy val gramCtes: String =
    s"""g AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |             range(1, greatest(len(w) - 6, 2)),
       |             i -> array_to_string(list_slice(w, i, i + 7), ' ')))) AS gram
       |           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
       |e AS (SELECT doc_id AS eval_id, gram FROM g
       |      WHERE doc_id % 20 = 0 AND doc_id < ${20L * EvalDocs}),
       |t AS (SELECT doc_id, gram FROM g WHERE doc_id % 20 <> 0)""".stripMargin

  /** The shared CTE prefix of both funnel oracles: MinHash-LSH pairs
    * (DedupOps.minhashPairsCtes — identical constants), connected
    * components as a recursive reachability closure, canonical-fp
    * dedup rank, language argmax, quality — ending with feat/plang/
    * qual ready to join. */
  private lazy val funnelCtes: String = {
    val scores = TextOps.markerLangs.map(TextOps.scoreSql).mkString(",\n  ")
    val unions = TextOps.markerLangs.map(l =>
      s"SELECT doc_id, '$l' AS cand_lang, s_$l AS score FROM ls")
      .mkString("\n  UNION ALL ")
    s"""${DedupOps.minhashPairsCtes},
       |sym AS (SELECT id_a AS src, id_b AS dst FROM lshpairs
       |        UNION ALL SELECT id_b, id_a FROM lshpairs),
       |reach AS (SELECT src, dst FROM sym
       |          UNION
       |          SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src),
       |groups AS (SELECT src AS doc_id, min(dst) AS group_id FROM reach GROUP BY src),
       |ls AS (SELECT doc_id,
       |  $scores
       |FROM documents),
       |lu AS (
       |  $unions),
       |lr AS (SELECT doc_id, cand_lang, score,
       |         row_number() OVER (PARTITION BY doc_id
       |           ORDER BY score DESC, cand_lang) AS rn
       |       FROM lu),
       |plang AS (SELECT doc_id, cand_lang AS pred_lang FROM lr WHERE rn = 1),
       |feat AS (SELECT d.doc_id, d.text,
       |           row_number() OVER (
       |             PARTITION BY md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g'))
       |             ORDER BY d.doc_id) AS fprn,
       |           g.group_id
       |         FROM documents d LEFT JOIN groups g ON d.doc_id = g.doc_id),
       |qual AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
       |           ${TextOps.qualitySqlExpr} AS quality
       |         FROM documents)""".stripMargin
  }

  /** Full SQL mirrors of run() and funnel() over the same CTE prefix
    * (the two cannot drift from each other; the feature tail shares
    * strings with the x_* oracles so they cannot drift either). */
  val oracles: scala.collection.immutable.ListMap[String, String] =
    scala.collection.immutable.ListMap(
      "p_training_funnel" ->
        s"""WITH RECURSIVE $funnelCtes
           |SELECT f.doc_id, f.text, p.pred_lang, q.n_tokens, q.quality
           |FROM feat f
           |JOIN plang p ON f.doc_id = p.doc_id
           |JOIN qual q ON f.doc_id = q.doc_id
           |WHERE f.fprn = 1 AND (f.group_id IS NULL OR f.group_id = f.doc_id)
           |  AND p.pred_lang IN ($oracleLangList) AND q.quality >= ${Config().minQuality}
           |ORDER BY f.doc_id""".stripMargin,
      // the one-row per-stage survivor report (CASTs pin duck's
      // sum→HUGEINT back to BIGINT — the driver-hash type hazard)
      "p_funnel_report" -> {
        val exact = "f.fprn = 1"
        val near = s"$exact AND (f.group_id IS NULL OR f.group_id = f.doc_id)"
        val lang = s"$near AND p.pred_lang IN ($oracleLangList)"
        val kept = s"$lang AND q.quality >= ${Config().minQuality}"
        def cnt(cond: String, as: String) =
          s"CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS $as"
        s"""WITH RECURSIVE $funnelCtes
           |SELECT CAST(count(*) AS BIGINT) AS n_ingested,
           |  ${cnt(exact, "after_exact_dedup")},
           |  ${cnt(near, "after_neardup")},
           |  ${cnt(lang, "after_lang_filter")},
           |  ${cnt(kept, "kept")}
           |FROM feat f
           |JOIN plang p ON f.doc_id = p.doc_id
           |JOIN qual q ON f.doc_id = q.doc_id""".stripMargin
      },
      "p_mix_sources" ->
        """SELECT source, doc_id, mix_rank FROM (
          |  SELECT source, doc_id,
          |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS mix_rank,
          |    5 + (CAST(substr(source, 4) AS INT) % 3) * 5 AS quota
          |  FROM documents)
          |WHERE mix_rank <= quota
          |ORDER BY source, doc_id""".stripMargin,
      // identical arithmetic path: correctly-rounded sqrt → ×10⁴ →
      // floor → integer ratio/floor-div (all operands non-negative,
      // so // ≡ Spark's div)
      "p_temperature_mix" ->
        s"""WITH per AS (SELECT source, count(*) AS n_docs,
          |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          |  FROM documents GROUP BY source),
          |si AS (SELECT source, n_docs, n_tokens,
          |    CAST(floor(sqrt(n_tokens) * 10000) AS BIGINT) AS si FROM per),
          |tot AS (SELECT CAST(sum(si) AS BIGINT) AS s_tot,
          |    CAST(sum(n_docs) AS BIGINT) AS docs_tot FROM si)
          |SELECT source, n_docs, n_tokens,
          |  ${ExactNum.ratioSql("si", "s_tot")} AS weight,
          |  (si * docs_tot) // s_tot AS target_docs
          |FROM si CROSS JOIN tot ORDER BY source""".stripMargin,
      // 8-gram mirror of the shingled() pattern (range end exclusive:
      // greatest(len-6, 2) ≡ Spark's greatest(size-7, 1) inclusive);
      // gramCtes shared with p_containment so the gram definition
      // cannot drift between the flag and the score
      "p_decontaminate" ->
        s"""WITH $gramCtes
          |SELECT t.doc_id, count(*) AS n_hits, min(e.eval_id) AS first_eval_id
          |FROM t JOIN e ON t.gram = e.gram
          |GROUP BY t.doc_id
          |ORDER BY doc_id""".stripMargin,
      // same shared gram CTEs; containment = shared / eval-doc gram
      // count as the exact integer ratio
      "p_containment" ->
        s"""WITH $gramCtes,
          |esz AS (SELECT eval_id, count(*) AS n_eval_grams FROM e GROUP BY eval_id),
          |hits AS (SELECT t.doc_id, e.eval_id, count(*) AS n_shared
          |         FROM t JOIN e ON t.gram = e.gram
          |         GROUP BY t.doc_id, e.eval_id)
          |SELECT h.doc_id, h.eval_id, h.n_shared, s.n_eval_grams,
          |  ${ExactNum.ratioSql("h.n_shared", "s.n_eval_grams")} AS containment
          |FROM hits h JOIN esz s USING (eval_id)
          |ORDER BY doc_id, eval_id""".stripMargin,
      // shares DedupOps.minhashSigCtes verbatim with the d_minhash_lsh
      // oracle (constants cannot drift); the train×eval candidate join
      // replaces the self-join tail
      "p_fuzzy_decontaminate" ->
        s"""WITH ${DedupOps.minhashSigCtes},
          |ecand AS (SELECT DISTINCT t.doc_id, e.doc_id AS eval_id
          |          FROM bandkey t JOIN bandkey e
          |            ON t.band_idx = e.band_idx AND t.band_key = e.band_key
          |          WHERE e.doc_id % 20 = 0 AND e.doc_id < ${20L * EvalDocs}
          |            AND t.doc_id % 20 <> 0),
          |${DedupOps.jaccardVerifySql("ecand", "doc_id", "eval_id")},
          |rnk AS (SELECT doc_id, eval_id, jaccard,
          |          row_number() OVER (PARTITION BY doc_id
          |            ORDER BY jaccard DESC, eval_id) AS rn
          |        FROM ver_ecand)
          |SELECT doc_id, count(*) AS n_eval_near,
          |  max(CASE WHEN rn = 1 THEN eval_id END) AS best_eval_id,
          |  max(jaccard) AS max_jaccard
          |FROM rnk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      // shared fingerprint + sig CTEs; seed predicate interpolated
      // from the SAME Scala constants; exact-over-near precedence via
      // NOT IN (the exact set is seed-bounded, so the subquery is
      // constant-sized)
      "p_takedown" ->
        s"""WITH ${DedupOps.minhashSigCtes},
          |fpx AS (SELECT doc_id, md5(text) AS f FROM documents),
          |ex AS (SELECT t.doc_id, min(s.doc_id) AS matched_seed
          |       FROM fpx t JOIN fpx s ON t.f = s.f
          |       WHERE s.doc_id % $TakedownMod = 0
          |         AND s.doc_id < ${TakedownMod * TakedownCap}
          |         AND NOT (t.doc_id % $TakedownMod = 0
          |           AND t.doc_id < ${TakedownMod * TakedownCap})
          |       GROUP BY 1),
          |scand AS (SELECT DISTINCT t.doc_id, s.doc_id AS seed_id
          |          FROM bandkey t JOIN bandkey s
          |            ON t.band_idx = s.band_idx AND t.band_key = s.band_key
          |          WHERE s.doc_id % $TakedownMod = 0
          |            AND s.doc_id < ${TakedownMod * TakedownCap}
          |            AND NOT (t.doc_id % $TakedownMod = 0
          |              AND t.doc_id < ${TakedownMod * TakedownCap})),
          |${DedupOps.jaccardVerifySql("scand", "doc_id", "seed_id")},
          |nr AS (SELECT v.doc_id, min(v.seed_id) AS matched_seed
          |       FROM ver_scand v
          |       WHERE v.doc_id NOT IN (SELECT doc_id FROM ex)
          |       GROUP BY 1)
          |SELECT doc_id, CAST(doc_id AS BIGINT) AS matched_seed,
          |  'seed' AS reason
          |FROM documents
          |WHERE doc_id % $TakedownMod = 0
          |  AND doc_id < ${TakedownMod * TakedownCap}
          |UNION ALL SELECT doc_id, matched_seed, 'exact' FROM ex
          |UNION ALL SELECT doc_id, matched_seed, 'near' FROM nr
          |ORDER BY doc_id""".stripMargin,
      // integer-division rate + multiplicative-hash membership —
      // byte-identical arithmetic on both engines (// is duck's
      // integer div; all operands positive so % = pmod, and the
      // mod-2³¹ pre-reduction keeps the product < Long.MaxValue on
      // BOTH engines, ADVICE r6)
      "p_stratified_sample" ->
        """WITH c AS (SELECT source, count(*) AS n_src,
          |             least(10000, 100000 // count(*)) AS rate_bp
          |           FROM documents GROUP BY source)
          |SELECT d.source, d.doc_id, c.n_src, c.rate_bp
          |FROM documents d JOIN c USING (source)
          |WHERE (((d.doc_id % 2147483648) * 2654435761) % 2147483648) % 10000 < c.rate_bp
          |ORDER BY d.source, d.doc_id""".stripMargin,
      // same overflow-safe hash chain, murmur3-c1 multiplier and the
      // 98/1/1 boundaries interpolated from the Scala constants
      "p_data_split" ->
        s"""SELECT doc_id, source,
           |  (((doc_id % 2147483648) * $SplitMul) % 2147483648) % 10000 AS h_bp,
           |  CASE WHEN (((doc_id % 2147483648) * $SplitMul) % 2147483648) % 10000 < $TrainBp
           |         THEN 'train'
           |       WHEN (((doc_id % 2147483648) * $SplitMul) % 2147483648) % 10000 < $ValBp
           |         THEN 'val'
           |       ELSE 'test' END AS split
           |FROM documents ORDER BY doc_id""".stripMargin,
      // per-epoch multipliers interpolated from EpochMuls (the same
      // constants the operator compiles in — they cannot drift); the
      // mod-2³¹ pre-reduction mirrors the overflow-safe Spark form
      "p_epoch_shuffle" -> {
        val cases = EpochMuls.zipWithIndex
          .map { case (m, e) => s"WHEN $e THEN $m" }.mkString(" ")
        s"""WITH e AS (SELECT unnest(range(0, ${EpochMuls.length})) AS epoch),
           |h AS (SELECT d.doc_id, e.epoch,
           |        ((d.doc_id % 2147483648) *
           |         CASE e.epoch $cases END) % 2147483648 AS h
           |      FROM documents d CROSS JOIN e),
           |r AS (SELECT epoch, h % $ShuffleShards AS shard, doc_id,
           |        row_number() OVER (PARTITION BY epoch, h % $ShuffleShards
           |          ORDER BY h, doc_id) AS pos
           |      FROM h)
           |SELECT epoch, shard, pos, doc_id FROM r
           |ORDER BY epoch, shard, pos""".stripMargin
      },
      // quality mirror = qualitySqlExpr (the shared fragment); stage
      // thresholds are the float-safe fixed quartiles (operator doc)
      "p_graph_rank" -> graphRankSql,
      "p_curriculum" ->
        s"""WITH q AS (SELECT doc_id, ${TextOps.qualitySqlExpr} AS quality
           |           FROM documents),
           |s AS (SELECT doc_id, quality,
           |        least(3, CAST(floor(quality * 4) AS BIGINT)) AS stage,
           |        doc_id % $ShuffleShards AS shard
           |      FROM q),
           |r AS (SELECT stage, shard, doc_id, quality,
           |        row_number() OVER (PARTITION BY stage, shard
           |          ORDER BY quality, doc_id) AS pos
           |      FROM s)
           |SELECT stage, shard, pos, doc_id, quality FROM r
           |ORDER BY stage, shard, pos""".stripMargin,
      // identical gram stream (unigrams + bigrams; duck's half-open
      // range needs no size guard), the shared poly_hash31 fold, the
      // same one-expression double ln over exact integer rationals,
      // CASTs pinning HUGEINT sums back to the Spark BIGINTs
      "p_dsir" -> {
        val fold =
          """list_reduce(list_prepend(CAST(0 AS BIGINT),
            |  list_transform(string_split(gram, ''), ch -> CAST(unicode(ch) AS BIGINT))),
            |  (acc, ch) -> (acc * 1000003 + ch) % 2147483647)""".stripMargin
        s"""WITH d AS MATERIALIZED (SELECT doc_id, source, string_split(text, ' ') AS w
           |           FROM documents),
           |g AS MATERIALIZED (SELECT doc_id, source,
           |        unnest(list_concat(w, list_transform(range(1, len(w)),
           |          i -> w[i] || ' ' || w[i + 1]))) AS gram
           |      FROM d),
           |gh AS MATERIALIZED (SELECT doc_id, source, ($fold) % $DsirBuckets AS b FROM g),
           |cnt AS MATERIALIZED (SELECT doc_id, source, b, count(*) AS cnt
           |        FROM gh GROUP BY doc_id, source, b),
           |tsrc AS (SELECT min(source) AS tsrc FROM documents),
           |qc AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS qc FROM cnt GROUP BY b),
           |tc AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS tc
           |       FROM cnt CROSS JOIN tsrc WHERE source = tsrc GROUP BY b),
           |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS Q,
           |          CAST(sum(CASE WHEN source = tsrc THEN cnt ELSE 0 END) AS BIGINT) AS T
           |        FROM cnt CROSS JOIN tsrc),
           |r AS (SELECT qc.b,
           |        CAST(round(1000000.0 * ln(((CAST(coalesce(tc.tc, 0) AS DOUBLE) + 1.0) * (CAST(Q AS DOUBLE) + $DsirBuckets.0)) / ((CAST(qc.qc AS DOUBLE) + 1.0) * (CAST(T AS DOUBLE) + $DsirBuckets.0))), 0) AS BIGINT) AS r_micro
           |      FROM qc LEFT JOIN tc ON qc.b = tc.b CROSS JOIN tot)
           |SELECT cnt.doc_id, CAST(sum(cnt.cnt) AS BIGINT) AS n_feats,
           |  CAST(sum(cnt.cnt * r.r_micro) AS BIGINT) AS weight_micro
           |FROM cnt JOIN r ON cnt.b = r.b
           |GROUP BY cnt.doc_id
           |ORDER BY cnt.doc_id""".stripMargin
      })

  /** One-row funnel report: how many docs survive each stage (each
    * count applies all previous stages too — a true funnel). */
  def funnel(s: SparkSession, dir: String, cfg: Config = Config()): DataFrame = {
    val a = annotate(s, dir, cfg)
    val exact = col("exact_keep")
    val near = exact && col("neardup_keep")
    val lang = near && col("pred_lang").isInCollection(cfg.langs)
    def cnt(c: org.apache.spark.sql.Column) = sum(c.cast("long"))
    a.agg(
      count(lit(1)).as("n_ingested"),
      cnt(exact).as("after_exact_dedup"),
      cnt(near).as("after_neardup"),
      cnt(lang).as("after_lang_filter"),
      cnt(col("kept")).as("kept"))
  }
}
