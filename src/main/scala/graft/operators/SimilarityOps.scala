package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** §2d similarity search over the embeddings table.
  *
  * s_ann_bruteforce — the exact baseline: a TINY query set (5
  * vectors) broadcast against the full vector table; cosine via the
  * codegen'd graft expression; per-query top-k by window rank. Scales
  * linearly in table size with zero shuffle of the vectors (the only
  * shuffle is the per-query top-k, k rows per partition).
  *
  * s_ann_lsh — the 100 TB path: random-hyperplane LSH, L=8 tables ×
  * 4 bits; vectors are bucketed once (one shuffle), queries probe
  * only their own buckets; then exact re-rank of candidates.
  * Parameters are density-tuned for the test corpus (500+ vectors,
  * neighbors at cos 0.3–0.5); recall ≥ 0.6 vs bruteforce is pinned
  * in SimilaritySpec.
  */
object SimilarityOps {

  type Q = (SparkSession, String) => DataFrame

  private val K = 10
  private val NumQueries = 5
  private val Tables_L = 8
  private val Bits = 4

  private def queryVecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  def sAnnBruteforce(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    Tables.embeddings(s, dir)
      .crossJoin(broadcast(queryVecs(s, dir)))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_similarity(q_emb, embedding)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
  }

  /** Radius threshold for the range query — below the d_embed dedup
    * τ=0.4 so the result set is a working neighborhood (≈55 rows at
    * sf0.01), not just near-dups; 0.25 = 2⁻² is exactly representable,
    * so the boundary compare has no float-literal hazard at all. */
  private[operators] val RangeTau = 0.25

  /** Range search (FAISS `range_search` analog) — ALL neighbors
    * within cosine ≥ τ of each query, not a fixed top-k: the shape
    * retrieval uses when the answer is "everything this close"
    * (dedup candidates, recall-complete retrieval) rather than "the
    * k best". Same linear broadcast scan as the bruteforce baseline
    * but with NO window at all — the per-row filter replaces the
    * top-k rank, so the only exchange in the plan is the
    * presentational sort; at 100 TB the scan partitions stream
    * independently and emit only in-radius rows. The result is a
    * SET (no rank column): ordered by (q_id, vec_id). */
  def sRangeSearch(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .crossJoin(broadcast(queryVecs(s, dir)))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_similarity(q_emb, embedding)"))
      .filter(col("cos") >= RangeTau)
      .select(col("q_id"), col("vec_id"), round(col("cos"), 4).as("cos"))

  /** Maximum-inner-product top-k (MIPS) — the retrieval scoring for
    * UN-normalized embeddings (dot-product-trained two-tower and
    * recommender models), which the cosine family deliberately cannot
    * answer: cosine divides magnitude out, and under a dot objective a
    * high-norm item IS the signal. The testdata ships unit-norm
    * vectors (dot would be vacuously ≡ cosine), so the corpus is
    * deterministically DE-normalized first — each vector scaled by
    * 1 + (vec_id mod 7), norms 1..7 — and the spec pins that the dot
    * ranking genuinely differs from the cosine ranking on it.
    * Same broadcast linear-scan plan as s_ann_bruteforce with the
    * codegen'd dot_product as the score. Scale path: MIPS reduces to
    * cosine ANN by asymmetric augmentation (Bachrach 2014 /
    * Shrivastava & Li 2014) — append sqrt(M² − ‖x‖²) to each data
    * vector (M = the corpus max norm, a one-row agg) and 0 to every
    * query; augmented data vectors all have norm exactly M, so cosine
    * order ≡ dot order and the EXISTING hyperplane-LSH / IVF tiers
    * apply unchanged to augmented vectors. The reduction is
    * spec-pinned (rank-for-rank equality with this exact scan);
    * the scan is the oracled baseline. */
  def sAnnDot(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("dot").desc, col("vec_id"))
    Tables.embeddings(s, dir)
      .withColumn("scaled", expr(
        "transform(embedding, x -> CAST(x AS DOUBLE) * (1.0D + CAST(vec_id % 7 AS DOUBLE)))"))
      .crossJoin(broadcast(queryVecs(s, dir)))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dot", expr("dot_product(q_emb, scaled)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("dot"), 4).as("dot"))
  }

  /** Euclidean nearest-neighbor top-k — the THIRD metric of the
    * family (cosine = angle, dot = MIPS, L2 = distance), the default
    * of L2-trained embedding spaces and of most FAISS index types.
    * On the unit-norm testdata L2 order would be vacuously the cosine
    * order (‖a−b‖² = 2−2cos there), so the scan runs over the SAME
    * deterministic de-normalization as s_ann_dot (scale 1+(id mod 7))
    * where the three rankings genuinely diverge — spec-pinned. Plan
    * is the broadcast linear scan with the codegen'd l2_distance and
    * a per-query WindowGroupLimit top-k; the scale path is the same
    * index ladder as cosine: hyperplane LSH does not apply to L2, but
    * the IVF/PQ tiers do verbatim (k-means cells ARE L2 Voronoi
    * cells, and the PQ ADC table is squared-L2 by construction), so
    * the bucketed variants reuse the existing machinery unchanged. */
  def sAnnL2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("l2").asc, col("vec_id"))
    Tables.embeddings(s, dir)
      .withColumn("scaled", expr(
        "transform(embedding, x -> CAST(x AS DOUBLE) * (1.0D + CAST(vec_id % 7 AS DOUBLE)))"))
      .crossJoin(broadcast(queryVecs(s, dir)))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("l2", expr("l2_distance(q_emb, scaled)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("l2"), 4).as("l2"))
  }

  /** Candidate-pool size and selection depth for MMR. The pool is
    * what bounds EVERYTHING downstream of the scan: the greedy
    * re-rank touches only MmrPool rows per query, never the corpus. */
  private[operators] val MmrPool = 30
  private[operators] val MmrK = 8

  /** Maximal Marginal Relevance diversified top-k (Carbonell &
    * Goldstein 1998) — the standard retrieval RE-RANK: pure top-k by
    * relevance returns near-duplicate neighbors (the corpus's dup
    * cliques all rank together); MMR greedily picks, at each step,
    * the candidate maximizing λ·rel − (1−λ)·max-similarity-to-the-
    * already-selected. λ = ½, so the integer objective is
    * rel_ppm − maxsim_ppm (the ½ scales out of the argmax), with
    * every similarity floored to ppm (floor(cos·10⁶) — both engines
    * floor the SAME IEEE double, the round(cos,4) precedent) so the
    * greedy compares integers, never float sums.
    *
    * Two-stage plan, the production shape: (1) the broadcast linear
    * scan ranks a top-MmrPool relevance pool per query (rel_ppm
    * DESC, vec_id tiebreak — the floored key, so pool membership is
    * integer-deterministic); (2) the pool packs into ONE array row
    * per query (sort_array on the unique pool rank → deterministic
    * array order) and the entire greedy — P×P sim matrix AND the K
    * selection rounds, both inside the native mmr_greedy
    * expression — runs INSIDE that row: zero joins, zero windows,
    * zero extra shuffles after the pool window. (The greedy was
    * first an aggregate()/transform() lambda fold — semantically
    * identical, but interpreted HOF evaluation of the nested fold
    * measured ~90 ms per eval, and explode's generator plus the
    * InferFiltersFromGenerate filter re-evaluate per output row:
    * ~8 s for 5 queries at ANY scale. The expression evaluates the
    * same greedy in microseconds — see MmrGreedy.) Ties in the
    * greedy argmax resolve to the earliest pool position (higher
    * rel, then smaller vec_id) via strict-> in array order,
    * mirrored by ORDER BY sc DESC, pr in the oracle's unrolled-CTE
    * greedy.
    *
    * Scale shape (100 TB): stage 1 is the s_ann_bruteforce scan
    * (or, at 10⁹ vectors, ANY of the existing ANN tiers — the pool
    * is just "candidates", LSH/IVF produce the same shape); stage 2
    * is O(queries) rows × O(P²+K·P) integer work per row —
    * data-parallel across queries, constant per query, no shuffle.
    * The naive alternative (K rounds of join-against-selected over
    * the corpus) would be K corpus-sized shuffles. */
  private def sMmrSelected(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("rel_ppm").desc, col("vec_id"))
    val pool = Tables.embeddings(s, dir)
      .crossJoin(broadcast(queryVecs(s, dir)))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("rel_ppm", expr(
        "CAST(floor(cosine_similarity(q_emb, embedding) * 1000000.0D) AS BIGINT)"))
      .withColumn("pr", row_number().over(w))
      .filter(col("pr") <= MmrPool)
    val packed = pool.groupBy(col("q_id"))
      .agg(sort_array(collect_list(struct(
        col("pr"), col("vec_id"), col("rel_ppm"), col("embedding")))).as("cands"))
    packed.withColumn("sel", expr(
      s"mmr_greedy(transform(cands, c -> c.rel_ppm), transform(cands, c -> c.embedding), $MmrK)"))
  }

  def sMmr(s: SparkSession, dir: String): DataFrame =
    sMmrSelected(s, dir)
      .select(col("q_id"), col("cands"), explode(col("sel")).as("s"))
      .select(col("q_id"), col("s.r").as("sel_rank"),
        expr("element_at(cands, s.i + 1).vec_id").as("vec_id"),
        col("s.sc").as("mmr_ppm"))

  /** One row per (table, bucket) per vector: bucketed ONCE, reused by
    * every query — the single shuffle of the vector table. Table
    * seeds must be literals (each expression instance owns its
    * deterministic plane matrix) → unroll the L tables. Shared by
    * sAnnLsh and sAnnMultiprobe. */
  private def bucketedLsh(df: DataFrame, vecCol: String): DataFrame = {
    val tables = (0 until Tables_L).map(t =>
      s"struct($t as tbl, hyperplane_lsh($vecCol, ${100 + t}, $Bits) as bucket)")
    df.select(col("*"), explode(expr(tables.mkString("array(", ", ", ")"))).as("h"))
      .select(df.columns.map(col).toIndexedSeq :+ col("h.tbl") :+ col("h.bucket"): _*)
  }

  def sAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val vecs = bucketedLsh(Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")), "embedding")
    val qs = bucketedLsh(queryVecs(s, dir), "q_emb")

    val cands = qs.join(vecs, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("vec_id"), col("embedding"))
      .distinct()

    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    cands
      .withColumn("cos", expr("cosine_similarity(q_emb, embedding)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
  }

  /** Multi-probe LSH (Lv et al. 2007, the memory-side of the
    * recall/space trade): instead of buying recall with MORE tables
    * (each one a full extra copy of the bucketed index), each query
    * also probes the buckets at hamming distance 1 from its own code —
    * a near-miss on one hyperplane lands in a neighbor bucket, and
    * flipping each of the Bits code bits reaches exactly those. Probe
    * set per (query, table) = 1 + Bits codes, expanded on the QUERY
    * side only (constant-sized — NumQueries × L × (Bits+1) rows); the
    * vector index is the same single-shuffle bucketed table sAnnLsh
    * builds, untouched. Candidates are a strict superset of the
    * single-probe ones (the identity probe is in the set), so recall
    * can only improve — SimilaritySpec pins recall(multiprobe) ≥
    * recall(lsh) against the bruteforce ground truth. At 100 TB the
    * same index serves both operating points: probe count is a query-
    * time knob, table count is a storage decision. */
  def sAnnMultiprobe(s: SparkSession, dir: String): DataFrame = {
    val vecs = bucketedLsh(Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")), "embedding")
    val qs = bucketedLsh(queryVecs(s, dir), "q_emb")
      .withColumn("probe", explode(expr(
        s"""concat(array(bucket),
           |  transform(sequence(0, ${Bits - 1}),
           |    j -> CAST(bucket ^ shiftleft(1, j) AS INT)))""".stripMargin)))
      .drop("bucket").withColumnRenamed("probe", "bucket")

    val cands = qs.join(vecs, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_emb"), col("vec_id"), col("embedding"))
      .distinct()

    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    cands
      .withColumn("cos", expr("cosine_similarity(q_emb, embedding)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
  }

  /** Recall@K evaluation of the ANN tiers against exact ground truth
    * — the acceptance metric every ANN deployment publishes before a
    * parameter change ships (FAISS benchmarks report exactly this;
    * SimilaritySpec's recall floor becomes a first-class oracled
    * QUERY here, so the driver's hash gate pins the measured recall
    * itself, not just a ≥ bound). Per query: the fraction of the
    * exact cosine top-K (sAnnBruteforce) recovered by the
    * single-probe LSH index and by the hamming-1 multiprobe sweep of
    * the SAME index — the two operating points a production tuner
    * chooses between (multiprobe buys recall query-side; more tables
    * buy it storage-side).
    *
    * Scale shape: the three underlying pipelines run as-is (each
    * documented at its own def); their OUTPUTS are K·NumQueries-row
    * frames, so the recall join+agg is constant-sized — at 100 TB
    * the eval costs one exact scan (the ground truth, over a
    * SAMPLED query set exactly like this one) plus the index probes
    * being evaluated. recall_lsh/recall_multi stay in integer space
    * until the final ratio4 (hits and K are exact longs); multiprobe
    * recall ≥ LSH recall BY CONSTRUCTION (superset candidates) —
    * spec-pinned, and visible directly in the oracled output. */
  def sRecallEval(s: SparkSession, dir: String): DataFrame = {
    val truth = sAnnBruteforce(s, dir).select(col("q_id"), col("vec_id"))
    val lsh = sAnnLsh(s, dir)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit_lsh"))
    val mp = sAnnMultiprobe(s, dir)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit_multi"))
    truth
      .join(lsh, Seq("q_id", "vec_id"), "left")
      .join(mp, Seq("q_id", "vec_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit_lsh"), lit(0L))).as("n_hit_lsh"),
        sum(coalesce(col("hit_multi"), lit(0L))).as("n_hit_multi"))
      .select(col("q_id"),
        ExactNum.ratio4(col("n_hit_lsh"), col("k")).as("recall_lsh"),
        ExactNum.ratio4(col("n_hit_multi"), col("k")).as("recall_multi"))
  }

  /** kNN label classification over the embedding space — the
    * classifier-curation step of modern data pipelines (DCLM/
    * fastText-style quality and domain classifiers assign each
    * document a label from its nearest labeled neighbors; here the
    * labels ride the embeddings table): majority vote over the top-K
    * cosine neighbors, ties broken (votes desc, label asc) so the
    * prediction is deterministic. Emits the query's own label too, so
    * accuracy is read directly off the result.
    *
    * Scale shape: the scored scan is sAnnBruteforce's — a constant
    * query set broadcast against the partitioned vectors, per-query
    * top-K via the rank window (WindowGroupLimit); the vote then
    * aggregates ≤ NumQueries × K rows. Swapping the scored CTE for
    * the LSH/IVF candidate generators turns this into approximate
    * kNN classification with the same vote — the production path at
    * 10⁹ vectors. */
  def sKnnClassify(s: SparkSession, dir: String): DataFrame = {
    val q = Tables.embeddings(s, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("true_label"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val neighbors = Tables.embeddings(s, dir)
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_similarity(q_emb, embedding)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
    val vw = Window.partitionBy(col("q_id"))
      .orderBy(col("n_votes").desc, col("label"))
    neighbors.groupBy(col("q_id"), col("true_label"), col("label"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(vw))
      .filter(col("vr") === 1)
      .select(col("q_id"), col("true_label"), col("label").as("pred_label"),
        col("n_votes"))
  }

  /** Deterministic BOUNDED quantizer-training sample: every
    * SampleMod-th vector in vec_id order, capped at SampleCap rows.
    * The driver never materializes the table — the collect below this
    * plan is a TakeOrderedAndProject of ≤ SampleCap rows regardless of
    * corpus size (at 10⁹ vectors the mod prunes 1/4 and the limit caps
    * the rest). Mod-based (not Bernoulli/rand) so the DuckDB oracle
    * mirrors the EXACT same sample: WHERE vec_id % 4 = 0
    * ORDER BY vec_id LIMIT 4096. */
  private val SampleMod = 4L
  private val SampleCap = 4096
  private[graft] def ivfTrainSample(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      .filter(pmod(col("vec_id"), lit(SampleMod)) === 0)
      .orderBy(col("vec_id"))
      .limit(SampleCap)

  /** IVF-flavored ANN — the second scale path SURVEY §2d names:
    * a coarse quantizer (k-means, nlist cells) trained once on a
    * deterministic bounded sample (ivfTrainSample — never the full
    * table; the r4 full-table collect was the one true driver-side
    * data bottleneck in the repo), vectors bucketed into cells by the
    * NearestCentroid expression (one shuffle, reused by all queries),
    * queries probing their nprobe nearest cells (computed from the
    * NumQueries-row query set — constant-sized by construction),
    * exact re-rank inside the probed cells. */
  /** Deterministic Lloyd k-means over the BOUNDED ivfTrainSample
    * (sorted init, 5 iterations, L2) — the shared coarse quantizer
    * for sAnnIvf and sKmeansAssign. Driver-side on ≤ SampleCap rows
    * by design; the full table only ever flows through the
    * NearestCentroid expression. */
  /** The bounded training sample, collected ONCE — PQ trains four
    * subspace codebooks off the same rows, which would otherwise be
    * four identical scan+collect jobs (review r8). */
  private[graft] def collectTrainSample(
      s: SparkSession, dir: String): Array[(Long, Array[Float])] =
    ivfTrainSample(s, dir).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  private[graft] def trainCentroids(
      s: SparkSession, dir: String, nlist: Int,
      off: Int = 0, len: Int = -1): Array[Array[Double]] =
    trainCentroidsFrom(collectTrainSample(s, dir), nlist, off, len)

  private[graft] def trainCentroidsFrom(
      raw: Array[(Long, Array[Float])], nlist: Int,
      off: Int = 0, len: Int = -1): Array[Array[Double]] = {
    val sample = raw.map { case (id, full) =>
      val sub = if (len < 0) full else full.slice(off, off + len)
      (id, sub.map(_.toDouble))
    }
    var cents: Array[Array[Double]] = sample.take(nlist).map(_._2.clone())
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    def nearest(v: Array[Double]): Int = cents.indices.minBy(c => l2(v, cents(c)))
    for (_ <- 1 to 5) {
      val assigned = sample.groupBy { case (_, v) => nearest(v) }
      cents = cents.indices.map { c =>
        assigned.get(c) match {
          case Some(members) =>
            val dim = members.head._2.length
            val mean = new Array[Double](dim)
            members.foreach { case (_, v) => var i = 0; while (i < dim) { mean(i) += v(i); i += 1 } }
            mean.map(_ / members.length)
          case None => cents(c) // empty cell keeps its centroid
        }
      }.toArray
    }
    cents
  }

  private[operators] def cellOfExpr(cents: Array[Array[Double]])(
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.NearestCentroid(
      ColumnBridge.expression(c), cents.map(_.toSeq).toSeq))
  }

  def sAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val nlist = 16
    val nprobe = 4

    val cents = trainCentroids(s, dir, nlist)
    def cellOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      cellOfExpr(cents)(c)
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }

    val bucketed = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), cellOf(col("embedding")).as("cell"))

    // nprobe nearest cells per query, computed on the QUERY set only
    // (NumQueries rows — bounded by construction, not by the corpus;
    // the training sample no longer contains the query vectors)
    val qvecs = queryVecs(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    val probeRows = qvecs.flatMap { case (qId, v) =>
      cents.indices.sortBy(c => l2(v, cents(c))).take(nprobe).map(c => (qId, c))
    }
    val session = s
    import session.implicits._
    val probes = probeRows.toSeq.toDF("q_id", "cell")
      .join(queryVecs(s, dir), "q_id")

    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    probes.join(bucketed, "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", expr("cosine_similarity(q_emb, embedding)"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("q_id"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
  }

  /** Scalar int8 quantization of the embedding column — the
    * compression step a production ANN system applies before indexing
    * (4× memory cut at 64-dim float32 → int8; IVF cells + quantized
    * residuals is the classic FAISS layout). Per-vector min/max
    * scaling, q_i = ⌊(x_i − mn)·255/(mx − mn) + ½⌋, plus the
    * dequantization MSE as the fidelity measure. Pure per-row array
    * built-ins — zero shuffle, linear scan; every float op is
    * left-associated identically in the DuckDB mirror (the fold runs
    * in index order both sides). Degenerate constant vectors (mx=mn)
    * quantize to NULL explicitly on both engines.
    *
    * The codes are emitted as a comma-joined VARCHAR (`q`) rather
    * than INT[]: the driver's pandas-based comparer cannot hash a
    * list cell (ADVICE r5 — CORRECTNESS_r05 recorded an
    * 'unhashable type: numpy.ndarray' error for the array form), and
    * a canonical string is bit-equivalent information for an int8
    * code vector. */
  def sQuantize(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("mn", expr("array_min(e)"))
      .withColumn("mx", expr("array_max(e)"))
      .withColumn("qarr", expr(
        "CASE WHEN mx > mn THEN transform(e, x -> CAST(floor((x - mn) * 255 / (mx - mn) + 0.5D) AS INT)) END"))
      .withColumn("q", expr(
        "CASE WHEN mx > mn THEN array_join(transform(qarr, v -> CAST(v AS STRING)), ',') END"))
      .withColumn("mse", expr(
        "CASE WHEN mx > mn THEN round(aggregate(zip_with(e, qarr, (x, qi) -> " +
          "((mn + qi * (mx - mn) / 255) - x) * ((mn + qi * (mx - mn) / 255) - x)), " +
          "0D, (acc, v) -> acc + v) / size(e), 4) END"))
      .select(col("vec_id"), col("q"), col("mse"))

  /** Topic clustering for corpus curation — the "cluster the
    * embedding space, inspect/weight clusters" stage of a
    * training-data pipeline (SemDeDup/D4-style cluster-then-prune
    * runs on exactly this layout). Reuses the IVF coarse quantizer
    * (deterministic k-means on the bounded sample) and assigns EVERY
    * vector to its nearest centroid via the codegen'd NearestCentroid
    * expression — a single scan, no shuffle until the per-cluster
    * rollup (≤ nlist × n_labels groups, collapsed map-side). Output
    * per cluster: population, dominant ground-truth label and its
    * count (the purity diagnostic a curation run reads). */
  def sKmeansAssign(s: SparkSession, dir: String): DataFrame = {
    val nlist = 16
    val cents = trainCentroids(s, dir, nlist)
    val assigned = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        cellOfExpr(cents)(col("embedding")).as("cluster"))
    val byLabel = assigned.groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("label_n"))
    val w = Window.partitionBy(col("cluster"))
      .orderBy(col("label_n").desc, col("label"))
    byLabel
      .withColumn("rn", row_number().over(w))
      .groupBy(col("cluster"))
      .agg(sum(col("label_n")).as("n_vecs"),
        max(when(col("rn") === 1, col("label"))).as("top_label"),
        max(when(col("rn") === 1, col("label_n"))).as("top_label_n"))
  }

  /** Global-codebook 4-bit scalar quantization (FAISS-SQ4 shape) —
    * the index-compression step of an ANN deployment, complementing
    * s_quantize (which is per-VECTOR int8, usable without training):
    * the codebook here is 64 per-DIMENSION (min, max) ranges learned
    * from the corpus in ONE bounded aggregate, so codes are
    * comparable ACROSS vectors and an asymmetric-distance scan can
    * decode against a 64×16 lookup table. Code_d = ⌊(x−mn_d)·15/
    * (mx_d−mn_d) + ½⌋ ∈ 0..15 → 16× smaller than float32. Plan: the
    * codebook is a 64-row aggregate (posexplode → per-dim min/max) —
    * collecting it to the driver is an AGGREGATE result, not data,
    * and stays 64 rows at any corpus size; the encode pass is then a
    * per-row expression over the scan with the ranges inlined as
    * literals (broadcast-by-constant), zero shuffle. Codes emit as
    * comma-joined VARCHAR (driver comparer can't hash list cells —
    * s_quantize convention); mse = mean reconstruction error, the
    * left-assoc float fold both engines compute identically. */
  def sSq4Codebook(s: SparkSession, dir: String): DataFrame = {
    val Dim = 64
    val stats = Tables.embeddings(s, dir)
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      .orderBy(col("d"))
      .collect()
    require(stats.length == Dim, s"embedding dim ${stats.length} != $Dim")
    val mns = stats.map(_.getDouble(1))
    val mxs = stats.map(_.getDouble(2))
    // float→double is exact, and lit() carries the exact binary
    // double — the same value duck's min/max aggregate produces
    val mnArr = array(mns.toIndexedSeq.map(lit(_)): _*)
    val mxArr = array(mxs.toIndexedSeq.map(lit(_)): _*)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("mns", mnArr)
      .withColumn("mxs", mxArr)
      // element_at is 1-based on both engines; arithmetic order is
      // identical to the oracle ((x−mn)·15/(mx−mn)+½, then mn+q·(mx−mn)/15)
      .withColumn("qarr", expr(
        s"""transform(sequence(1, $Dim), d -> CASE
           |  WHEN element_at(mxs, d) > element_at(mns, d)
           |  THEN CAST(floor((element_at(e, d) - element_at(mns, d)) * 15
           |       / (element_at(mxs, d) - element_at(mns, d)) + 0.5D) AS INT)
           |  ELSE 0 END)""".stripMargin))
      .withColumn("q", expr("array_join(transform(qarr, v -> CAST(v AS STRING)), ',')"))
      .withColumn("mse", expr(
        s"""round(aggregate(sequence(1, $Dim), 0D, (acc, d) -> acc +
           |  ((element_at(mns, d) + element_at(qarr, d) * (element_at(mxs, d) - element_at(mns, d)) / 15) - element_at(e, d))
           |  * ((element_at(mns, d) + element_at(qarr, d) * (element_at(mxs, d) - element_at(mns, d)) / 15) - element_at(e, d)))
           |  / $Dim, 4)""".stripMargin))
      .select(col("vec_id"), col("q"), col("mse"))
  }

  // ---- product quantization (s_pq_codebook) ----
  private[operators] val PqM = 4 // subspaces
  private[operators] val PqSub = 16 // dims per subspace
  private[operators] val PqK = 16 // centroids per subspace (4-bit codes)

  /** Product quantization (Jégou et al. 2011; the PQ in FAISS
    * IVF-PQ — the standard billion-scale ANN code layout): the vector
    * is split into PqM=4 16-dim subspaces, each with its OWN k-means
    * codebook (PqK=16 → a 4-bit code per subspace, 2 bytes per
    * vector vs 256 — the compression that makes a 10⁹-vector index
    * fit executor memory). Completes the quantization family:
    * s_quantize (per-vector scalar int8, 64 B) → s_sq4_codebook
    * (global per-dimension scalar, 32 B) → PQ (per-subspace VECTOR
    * codebooks, 2 B — 16× smaller than SQ4, trading reconstruction
    * error for the footprint that actually matters at 10⁹ vectors;
    * the spec pins that the trained codebooks clearly beat the
    * untrained k=1 sample-mean baseline).
    *
    * Each codebook trains on the SAME deterministic bounded sample as
    * the IVF coarse quantizer (ivfTrainSample — never the full
    * table), sliced to its subspace; encoding is one scan with four
    * NearestCentroid expressions (codebooks ride the plan as
    * literals, broadcast-by-constant) — zero shuffle, nothing
    * driver-side but the ≤ SampleCap-row sample. mse reconstructs
    * from the chosen centroids and folds left in dimension order,
    * exactly as the oracle's list_reduce. */
  /** PQ codebooks (trained on the bounded sample) + the encoded table:
    * vec_id, embedding, c0..c3 (codes), r0..r3 (chosen centroid rows).
    * Shared by sPqCodebook (reconstruction) and sAnnPq (ADC scan). */
  private def pqEncoded(s: SparkSession, dir: String)
      : (IndexedSeq[Array[Array[Double]]], DataFrame) = {
    val sample = collectTrainSample(s, dir)
    val cents = (0 until PqM).map(m => trainCentroidsFrom(sample, PqK, m * PqSub, PqSub))
    val centArrs = cents.map(cb =>
      array(cb.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit(_)): _*)): _*))
    var df = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    for (m <- 0 until PqM) {
      df = df
        .withColumn(s"c$m",
          cellOfExpr(cents(m))(expr(s"slice(embedding, ${m * PqSub + 1}, $PqSub)")))
        // centroid row for this code: 0-based array extraction
        .withColumn(s"r$m", centArrs(m)(col(s"c$m")))
    }
    (cents, df)
  }

  def sPqCodebook(s: SparkSession, dir: String): DataFrame = {
    val (_, df) = pqEncoded(s, dir)
    df.withColumn("recon", expr("concat(r0, r1, r2, r3)"))
      .withColumn("mse", expr(
        s"""round(aggregate(sequence(1, ${PqM * PqSub}), 0D, (acc, i) -> acc +
           |  (element_at(recon, i) - CAST(element_at(embedding, i) AS DOUBLE))
           |  * (element_at(recon, i) - CAST(element_at(embedding, i) AS DOUBLE)))
           |  / ${PqM * PqSub}, 4)""".stripMargin))
      .select(col("vec_id"),
        concat_ws(",", (0 until PqM).map(m => col(s"c$m").cast("string")): _*).as("codes"),
        col("mse"))
  }

  /** ADC scan over the PQ codes (Jégou 2011 §IV: asymmetric distance
    * computation — the query side stays float, the database side is
    * the 2-byte codes): per query, a (PqM × PqK) lookup table of
    * squared subvector distances to every centroid is precomputed —
    * constant-sized, like the bruteforce probe set — and a row's
    * distance is FOUR table lookups + three adds, never touching the
    * float vector. This is the scan that makes a 10⁹-vector search
    * affordable: the table read is 2 B/row instead of 256 B, the
    * per-row work is O(PqM), and the plan is scan → per-row
    * expression → per-query top-k (WindowGroupLimit keeps k rows per
    * partition) with the query tables broadcast. Exactness caveat is
    * PQ's own: distances are to RECONSTRUCTED vectors; the spec pins
    * that each query's own row still ranks first and that ADC agrees
    * with a naive driver-side re-score bit-for-bit. */
  /** The collected query set (NumQueries rows — constant-sized). */
  private def collectQueries(s: SparkSession, dir: String): Array[(Long, Array[Float])] =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < NumQueries)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Per-query ADC lookup tables (Jégou 2011 §IV): for each query and
    * subspace, the squared distance to every codebook centroid — the
    * (PqM × PqK) table the scan reads instead of the float vectors.
    * Left-associated index-order folds, same as the oracle. Shared by
    * sAnnPq (full scan) and sAnnIvfPq (cell-probed scan). */
  private def adcTables(qs: Array[(Long, Array[Float])],
      cents: IndexedSeq[Array[Array[Double]]])
      : Seq[(Long, Seq[Double], Seq[Double], Seq[Double], Seq[Double])] =
    qs.toSeq.map { case (qid, q) =>
      val tabs = (0 until PqM).map { m =>
        cents(m).map { cent =>
          var d = 0.0
          var i = 0
          while (i < PqSub) { val x = q(m * PqSub + i).toDouble - cent(i); d += x * x; i += 1 }
          d
        }.toSeq
      }
      (qid, tabs(0), tabs(1), tabs(2), tabs(3))
    }

  /** The four-lookup ADC distance over code columns c0..c3 and table
    * columns t0..t3 (element_at is 1-based). */
  private val adcExpr =
    "element_at(t0, c0 + 1) + element_at(t1, c1 + 1) + " +
      "element_at(t2, c2 + 1) + element_at(t3, c3 + 1)"

  def sAnnPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (cents, enc) = pqEncoded(s, dir)
    val qdf = adcTables(collectQueries(s, dir), cents)
      .toDF("q_id", "t0", "t1", "t2", "t3")
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    enc.crossJoin(broadcast(qdf))
      .withColumn("adc", expr(adcExpr))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("q_id"), col("rnk"), col("vec_id"), round(col("adc"), 4).as("adc"))
  }

  /** IVF-PQ — the two stages composed into the index FAISS actually
    * ships at billion scale (Jégou 2011 §V: an IVF coarse quantizer
    * prunes the search to nprobe cells, and inside those cells the
    * ADC scan reads 2-byte PQ codes, never floats). Everything is the
    * repo's existing machinery glued end-to-end: the coarse quantizer
    * AND the four subspace codebooks train on ONE collect of the
    * deterministic bounded sample; the encode pass is a single scan
    * with five NearestCentroid expressions (cell + 4 codes); the
    * probe side is (query × nprobe cells) rows carrying the query's
    * ADC lookup tables — constant-sized, broadcast. The scan's join
    * on `cell` touches only probed cells (the pruning that makes the
    * scan sub-linear), ADC is computed BEFORE the per-query top-k
    * window so only (q_id, vec_id, adc) rows shuffle. Codes are raw
    * vectors' codes (FAISS by_residual=false layout) so the codebooks
    * and distances mirror s_ann_pq's exactly — the oracle shares both
    * k-means chains verbatim. Exactness caveat is inherited from both
    * stages: candidates only from probed cells, distances to
    * reconstructions; the spec pins consistency against s_ann_pq's
    * full scan on exactly those terms. */
  def sAnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nlist = 16
    val nprobe = 4
    val sample = collectTrainSample(s, dir)
    val coarse = trainCentroidsFrom(sample, nlist)
    val cents = (0 until PqM).map(m => trainCentroidsFrom(sample, PqK, m * PqSub, PqSub))
    var enc = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      .withColumn("cell", cellOfExpr(coarse)(col("embedding")))
    for (m <- 0 until PqM)
      enc = enc.withColumn(s"c$m",
        cellOfExpr(cents(m))(expr(s"slice(embedding, ${m * PqSub + 1}, $PqSub)")))
    val qs = collectQueries(s, dir)
    val luts = adcTables(qs, cents).map(t => t._1 -> t).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
      d
    }
    // nprobe nearest coarse cells per query (first-min tie rule, same
    // as the oracle's (dist, cell) order), each probe row carrying the
    // query's lookup tables
    val probeRows = qs.flatMap { case (qid, v) =>
      val vd = v.map(_.toDouble)
      coarse.indices.sortBy(c => l2(vd, coarse(c))).take(nprobe).map { c =>
        val t = luts(qid)
        (qid, c, t._2, t._3, t._4, t._5)
      }
    }.toSeq.toDF("q_id", "cell", "t0", "t1", "t2", "t3")
    val w = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    enc.join(broadcast(probeRows), "cell")
      .withColumn("adc", expr(adcExpr))
      .select(col("q_id"), col("vec_id"), col("adc"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= K)
      .select(col("q_id"), col("rnk"), col("vec_id"), round(col("adc"), 4).as("adc"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023 shape):
    * embedding near-dup pairs with candidates generated from k-means
    * CLUSTERS — assign every vector to its nearest coarse centroid
    * (the shared deterministic quantizer), then compare pairs only
    * WITHIN a cluster. The contract is explicitly cluster-scoped
    * (that is the SemDeDup algorithm: cross-cluster near-dups are
    * traded away for never forming cross-cluster candidates), so the
    * oracle applies the identical cluster restriction — this
    * complements d_embed_cosine (exact all-pairs baseline) and its
    * LSH-bucketed form with the third standard candidate generator.
    * Scale shape: one NearestCentroid pass (zero shuffle), one
    * shuffle on cell for the self-join; per-cell work is
    * (n/nlist)²-ish and nlist is the knob that caps it — at 100 TB
    * nlist grows with the corpus (FAISS's √n rule) so cells stay
    * bounded. */
  def dSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val nlist = 16
    val cents = trainCentroids(s, dir, nlist)
    val assigned = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        cellOfExpr(cents)(col("embedding")).as("cell"))
      .cache() // one assignment pass feeds both join sides
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", expr("cosine_similarity(emb_a, emb_b)"))
      .filter(col("cos") >= SemTau)
      .select(col("cell"), col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  private[operators] val SemTau = 0.4

  val queries: ListMap[String, Q] = ListMap(
    "s_ann_bruteforce" -> (sAnnBruteforce _),
    "s_range_search" -> (sRangeSearch _),
    "s_ann_dot" -> (sAnnDot _),
    "s_ann_l2" -> (sAnnL2 _),
    "s_mmr" -> (sMmr _),
    "s_ann_lsh" -> (sAnnLsh _),
    "s_ann_multiprobe" -> (sAnnMultiprobe _),
    "s_recall_eval" -> (sRecallEval _),
    "s_knn_classify" -> (sKnnClassify _),
    "s_ann_ivf" -> (sAnnIvf _),
    "s_quantize" -> (sQuantize _),
    "s_kmeans_assign" -> (sKmeansAssign _),
    "s_sq4_codebook" -> (sSq4Codebook _),
    "s_pq_codebook" -> (sPqCodebook _),
    "s_ann_pq" -> (sAnnPq _),
    "s_ann_ivfpq" -> (sAnnIvfPq _),
    "d_semantic_dedup" -> (dSemanticDedup _),
  )

  // ---- shared in-SQL k-means mirror (s_ann_ivf + s_kmeans_assign) ----
  // Reproduces trainCentroids bit-for-bit: sorted init, 5 unrolled
  // Lloyd iterations with ORDERED float folds (list_reduce over
  // list(val ORDER BY vec_id)), first-min tie rule (dist, cell); then
  // `bucketed` assigns the FULL table to cells exactly as the
  // NearestCentroid expression does.
  private val KmeansIters = 5
  private val KmeansDim = 64
  private val KmeansNlist = 16

  private def dist(e: String, c: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${KmeansDim + 1}),
       |      i -> (CAST($e.embedding[i] AS DOUBLE) - $c.cent[i])
       |         * (CAST($e.embedding[i] AS DOUBLE) - $c.cent[i]))),
       |      (x, y) -> x + y)""".stripMargin

  // Every CTE in the k-means chains is AS MATERIALIZED: c(k−1) is
  // referenced twice per iteration (assignment a_k + carry-forward
  // c_k), so DuckDB's default inlining doubles the plan per iteration
  // (2^KmeansIters); the PQ variant runs 4 such chains. Materialized
  // the oracle cost is linear in iterations. Output is identical —
  // OracleBudgetSpec enforces the per-oracle time budget.
  private lazy val smpCte =
    s"""smp AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings
       |  WHERE vec_id % $SampleMod = 0 ORDER BY vec_id LIMIT $SampleCap)""".stripMargin

  private lazy val kmeansInit =
    s"""$smpCte,
       |c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent
       |  FROM (SELECT vec_id, embedding FROM smp ORDER BY vec_id LIMIT $KmeansNlist))""".stripMargin

  private def kmeansIteration(k: Int): String =
    s"""a$k AS MATERIALIZED (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist("e", "c")}, c.cell) AS rn
       |    FROM smp e CROSS JOIN c${k - 1} c) WHERE rn = 1),
       |m$k AS MATERIALIZED (
       |  SELECT cell, d,
       |    list_reduce(list_prepend(0.0, list(CAST(embedding[d] AS DOUBLE) ORDER BY vec_id)),
       |      (x, y) -> x + y) / count(*) AS mu
       |  FROM a$k CROSS JOIN (SELECT unnest(range(1, ${KmeansDim + 1})) AS d)
       |  GROUP BY cell, d),
       |c$k AS MATERIALIZED (
       |  SELECT p.cell, coalesce(nm.cent, p.cent) AS cent
       |  FROM c${k - 1} p LEFT JOIN (SELECT cell, list(mu ORDER BY d) AS cent
       |                              FROM m$k GROUP BY cell) nm
       |    ON p.cell = nm.cell)""".stripMargin

  private lazy val kmeansBucketed =
    s"""bucketed AS MATERIALIZED (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dist("e", "c")}, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN c$KmeansIters c) WHERE rn = 1)""".stripMargin

  private lazy val kmeansCtePrefix: String =
    ((kmeansInit +: (1 to KmeansIters).map(kmeansIteration)) :+ kmeansBucketed)
      .mkString(",\n")

  // ---- per-subspace k-means mirror (s_pq_codebook) ----
  // Same trainCentroids reproduction as the IVF chain, but over the
  // subvector embedding[off+1 .. off+PqSub] for each subspace m.
  private def pqDist(e: String, c: String, off: Int): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${PqSub + 1}),
       |      i -> (CAST($e.embedding[i + $off] AS DOUBLE) - $c.cent[i])
       |         * (CAST($e.embedding[i + $off] AS DOUBLE) - $c.cent[i]))),
       |      (x, y) -> x + y)""".stripMargin

  /** ADC term for subspace at `off`: squared distance from the query
    * vector q.qe to the row's chosen centroid j.$cent — the SQL form
    * of one lookup-table read (left-assoc index-order fold). Shared
    * by the s_ann_pq and s_ann_ivfpq oracles. */
  private def ldist(off: Int, cent: String): String =
    s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${PqSub + 1}),
       |    i -> (CAST(q.qe[i + $off] AS DOUBLE) - j.$cent[i])
       |       * (CAST(q.qe[i + $off] AS DOUBLE) - j.$cent[i]))),
       |    (x, y) -> x + y)""".stripMargin

  private def pqKmeansCtes(m: Int): String = {
    val off = m * PqSub
    val init =
      s"""p${m}c0 AS MATERIALIZED (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         |  list_transform(range(1, ${PqSub + 1}), i -> CAST(embedding[i + $off] AS DOUBLE)) AS cent
         |  FROM (SELECT vec_id, embedding FROM smp ORDER BY vec_id LIMIT $PqK))""".stripMargin
    val iters = (1 to KmeansIters).map { k =>
      s"""p${m}a$k AS MATERIALIZED (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${pqDist("e", "c", off)}, c.cell) AS rn
         |    FROM smp e CROSS JOIN p${m}c${k - 1} c) WHERE rn = 1),
         |p${m}m$k AS MATERIALIZED (
         |  SELECT cell, d,
         |    list_reduce(list_prepend(0.0, list(CAST(embedding[d + $off] AS DOUBLE) ORDER BY vec_id)),
         |      (x, y) -> x + y) / count(*) AS mu
         |  FROM p${m}a$k CROSS JOIN (SELECT unnest(range(1, ${PqSub + 1})) AS d)
         |  GROUP BY cell, d),
         |p${m}c$k AS MATERIALIZED (
         |  SELECT p.cell, coalesce(nm.cent, p.cent) AS cent
         |  FROM p${m}c${k - 1} p LEFT JOIN (SELECT cell, list(mu ORDER BY d) AS cent
         |                              FROM p${m}m$k GROUP BY cell) nm
         |    ON p.cell = nm.cell)""".stripMargin
    }
    val enc =
      s"""p${m}enc AS MATERIALIZED (
         |  SELECT vec_id, cell AS c$m, cent AS r$m FROM (
         |    SELECT e.vec_id, c.cell, c.cent,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${pqDist("e", "c", off)}, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN p${m}c$KmeansIters c) WHERE rn = 1)""".stripMargin
    (init +: iters :+ enc).mkString(",\n")
  }

  /** Shared oracle prefix for the hyperplane-LSH family: every table's
    * bucket code recomputed with the engine's own seeded plane matrix
    * inlined (HyperplaneLsh.planesFor), each bucket bit an explicit
    * left-associated dot-product chain (same accumulation order as the
    * eval loop, so sign decisions match bit-for-bit). Plane components
    * ride as CAST('repr' AS DOUBLE) STRING literals: strtod on the
    * shortest-round-trip repr re-reads the exact double; a bare
    * 17-digit numeric literal would be parsed as DECIMAL first and can
    * double-round to a neighboring double, flipping a near-zero dot
    * product's sign (ADVICE r4). Dim is pinned to the embeddings
    * table's 64 — a different dim would diff loudly. */
  private lazy val lshBucketedCtes: String = {
    val dim = 64
    def dot(plane: Array[Double]): String =
      plane.zipWithIndex
        .map { case (p, i) => s"CAST(embedding[${i + 1}] AS DOUBLE) * CAST('$p' AS DOUBLE)" }
        .mkString("(", " + ", ")")
    def bucketExpr(seed: Int): String = {
      val planes = graft.functions.HyperplaneLsh.planesFor(seed, Bits, dim)
      (0 until Bits)
        .map(j => s"CASE WHEN ${dot(planes(j))} >= 0 THEN ${1 << j} ELSE 0 END")
        .mkString("(", " + ", ")")
    }
    val bucketCols = (0 until Tables_L)
      .map(t => s"${bucketExpr(100 + t)} AS b$t").mkString(",\n  ")
    val bucketCase = (0 until Tables_L)
      .map(t => s"WHEN $t THEN b$t").mkString(" ")
    s"""b AS MATERIALIZED (SELECT vec_id, embedding,
       |  $bucketCols
       |FROM embeddings),
       |v AS MATERIALIZED (SELECT vec_id, embedding, t.tbl,
       |        CASE t.tbl $bucketCase END AS bucket
       |      FROM b CROSS JOIN (SELECT unnest(range(0, $Tables_L)) AS tbl) t)""".stripMargin
  }

  /** Shared oracle suffix: bucket-collision candidates (dedup'd) +
    * exact cosine re-rank — identical for single- and multi-probe. */
  private lazy val lshRerankCtes: String =
    s"""cand AS (SELECT DISTINCT q.q_id, q.q_emb, v.vec_id, v.embedding
       |         FROM q JOIN v ON q.tbl = v.tbl AND q.bucket = v.bucket
       |           AND v.vec_id <> q.q_id),
       |scored AS (
       |  SELECT q_id, vec_id,
       |    list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
       |                           CAST(embedding AS DOUBLE[])) AS cos,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
       |                                      CAST(embedding AS DOUBLE[])) DESC,
       |        vec_id) AS rank
       |  FROM cand)
       |SELECT q_id, rank, vec_id, round(cos, 4) AS cos
       |FROM scored WHERE rank <= $K""".stripMargin

  // The three ANN result-set mirrors, bound to vals so the recall
  // oracle can compose them as nested-WITH CTE bodies (DuckDB
  // supports WITH inside a CTE definition).
  private lazy val annBruteforceSql: String =
    s"""WITH q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |           WHERE vec_id < $NumQueries),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |    list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
       |                           CAST(e.embedding AS DOUBLE[])) AS cos,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
       |                                      CAST(e.embedding AS DOUBLE[])) DESC,
       |        e.vec_id) AS rank
       |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id)
       |SELECT q_id, rank, vec_id, round(cos, 4) AS cos
       |FROM scored WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin

  private lazy val annDotSql: String =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |           WHERE vec_id < $NumQueries),
       |sc AS (SELECT vec_id,
       |         list_transform(CAST(embedding AS DOUBLE[]),
       |           x -> x * (1.0 + CAST(vec_id % 7 AS DOUBLE))) AS scaled
       |       FROM embeddings),
       |scored AS (
       |  SELECT q.q_id, e.vec_id,
       |    list_dot_product(CAST(q.q_emb AS DOUBLE[]), e.scaled) AS dot,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_dot_product(CAST(q.q_emb AS DOUBLE[]),
       |                                e.scaled) DESC,
       |        e.vec_id) AS rank
       |  FROM q JOIN sc e ON e.vec_id <> q.q_id)
       |SELECT q_id, rank, vec_id, round(dot, 4) AS dot
       |FROM scored WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin

  // Euclidean mirror: the distance is recomputed as an EXPLICIT
  // index-order left-fold of (a[i]-b[i])² (the kmeans-mirror device)
  // rather than list_distance, so the accumulation order is pinned to
  // the expression's loop — rounded values then hash bit-for-bit.
  private lazy val annL2Sql: String = {
    val dim = 64
    val d2 =
      s"""list_reduce(list_prepend(0.0, list_transform(range(1, ${dim + 1}),
         |      i -> (CAST(q.q_emb[i] AS DOUBLE) - e.scaled[i])
         |         * (CAST(q.q_emb[i] AS DOUBLE) - e.scaled[i]))),
         |      (x, y) -> x + y)""".stripMargin
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |           WHERE vec_id < $NumQueries),
       |sc AS (SELECT vec_id,
       |         list_transform(CAST(embedding AS DOUBLE[]),
       |           x -> x * (1.0 + CAST(vec_id % 7 AS DOUBLE))) AS scaled
       |       FROM embeddings),
       |scored AS (
       |  SELECT q.q_id, e.vec_id, sqrt($d2) AS l2,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY sqrt($d2) ASC, e.vec_id) AS rank
       |  FROM q JOIN sc e ON e.vec_id <> q.q_id)
       |SELECT q_id, rank, vec_id, round(l2, 4) AS l2
       |FROM scored WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin
  }

  // MMR mirror: the same integer objective (rel_ppm − maxsim_ppm,
  // everything floor(cos·10⁶)), with the greedy UNROLLED as MmrK
  // chained CTEs — step t joins the pool to the step-(t−1) selection
  // through the P×P pairsim CTE, excludes the already-picked via NOT
  // EXISTS, and picks argmax by (sc DESC, pool rank) — exactly the
  // strict-> array-order tiebreak of the Spark fold.
  //
  // Every CTE is AS MATERIALIZED (the x_bpe_train precedent,
  // TextOps.scala): each sN is referenced 3× by step N+1 (UNION ALL +
  // sim join + NOT EXISTS), so DuckDB's default CTE inlining expands
  // the s8 plan ~3⁷-fold over the corpus×query scoring subtree —
  // measured ~20 min then OOM at an 8 GiB limit. Materialized: 0.17 s,
  // bit-identical output. OracleBudgetSpec pins the suite-wide budget
  // so this class of oracle-side plan bomb can't ship again.
  private lazy val mmrSql: String = {
    val relExpr =
      """CAST(floor(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
        |  CAST(e.embedding AS DOUBLE[])) * 1000000.0) AS BIGINT)""".stripMargin
    val steps = (2 to MmrK).map { t =>
      s"""c$t AS MATERIALIZED (
         |  SELECT p.q_id, p.vec_id, p.pr, p.rel_ppm - max(m.sp) AS sc
         |  FROM pool p
         |  JOIN sim m ON m.q_id = p.q_id AND m.ia = p.vec_id
         |  JOIN s${t - 1} s ON s.q_id = m.q_id AND s.vec_id = m.ib
         |  WHERE NOT EXISTS (SELECT 1 FROM s${t - 1} d
         |                    WHERE d.q_id = p.q_id AND d.vec_id = p.vec_id)
         |  GROUP BY p.q_id, p.vec_id, p.pr, p.rel_ppm),
         |s$t AS MATERIALIZED (
         |  SELECT * FROM s${t - 1}
         |  UNION ALL
         |  SELECT q_id, vec_id, $t AS r, sc FROM
         |    (SELECT q_id, vec_id, sc,
         |       row_number() OVER (PARTITION BY q_id ORDER BY sc DESC, pr) AS rn
         |     FROM c$t)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS MATERIALIZED (
       |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
       |  WHERE vec_id < $NumQueries),
       |scored AS MATERIALIZED (
       |  SELECT q.q_id, e.vec_id, e.embedding, $relExpr AS rel_ppm,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY $relExpr DESC, e.vec_id) AS pr
       |  FROM q JOIN embeddings e ON e.vec_id <> q.q_id),
       |pool AS MATERIALIZED (SELECT * FROM scored WHERE pr <= $MmrPool),
       |sim AS MATERIALIZED (
       |  SELECT a.q_id, a.vec_id AS ia, b.vec_id AS ib,
       |    CAST(floor(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |      CAST(b.embedding AS DOUBLE[])) * 1000000.0) AS BIGINT) AS sp
       |  FROM pool a JOIN pool b ON a.q_id = b.q_id),
       |s1 AS MATERIALIZED (SELECT q_id, vec_id, 1 AS r, rel_ppm AS sc
       |       FROM pool WHERE pr = 1),
       |$steps
       |SELECT q_id, r AS sel_rank, vec_id, sc AS mmr_ppm
       |FROM s$MmrK ORDER BY q_id, sel_rank""".stripMargin
  }

  private lazy val annLshSql: String =
    s"""WITH $lshBucketedCtes,
       |q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb, tbl, bucket
       |      FROM v WHERE vec_id < $NumQueries),
       |$lshRerankCtes
       |ORDER BY q_id, rank""".stripMargin

  private lazy val annMultiprobeSql: String =
    s"""WITH $lshBucketedCtes,
       |q AS MATERIALIZED (SELECT vec_id AS q_id, embedding AS q_emb, tbl,
       |        CASE WHEN j = $Bits THEN bucket
       |             ELSE xor(bucket, 1 << j) END AS bucket
       |      FROM v CROSS JOIN (SELECT unnest(range(0, ${Bits + 1})) AS j)
       |      WHERE vec_id < $NumQueries),
       |$lshRerankCtes
       |ORDER BY q_id, rank""".stripMargin

  val oracles: ListMap[String, String] = ListMap(
    // identical left-associated float arithmetic and index-order fold
    // as the Spark expressions; dim pinned to 64 (a different dim
    // diffs loudly via the range bound)
    "s_quantize" -> {
      val dim = 64
      def qi(x: String): String =
        s"CAST(floor(($x - mn) * 255 / (mx - mn) + 0.5) AS INTEGER)"
      val err = s"((mn + ${qi("e[i]")} * (mx - mn) / 255) - e[i])"
      s"""WITH v AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |m AS (SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM v)
         |SELECT vec_id,
         |  CASE WHEN mx > mn THEN array_to_string(
         |    list_transform(e, x -> CAST(${qi("x")} AS VARCHAR)), ',') END AS q,
         |  CASE WHEN mx > mn THEN round(list_reduce(list_prepend(0.0,
         |    list_transform(range(1, ${dim + 1}), i -> $err * $err)),
         |    (acc, v) -> acc + v) / ${dim}.0, 4) END AS mse
         |FROM m
         |ORDER BY vec_id""".stripMargin
    },
    "s_ann_bruteforce" -> annBruteforceSql,
    // same exact scored scan, radius filter instead of top-k rank;
    // τ interpolated from RangeTau (the threshold literal parses to
    // the identical IEEE double on both engines — the d_embed_cosine
    // precedent)
    "s_range_search" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id < $NumQueries)
         |SELECT q.q_id, e.vec_id,
         |  round(list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
         |                               CAST(e.embedding AS DOUBLE[])), 4) AS cos
         |FROM q JOIN embeddings e ON e.vec_id <> q.q_id
         |WHERE list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
         |                             CAST(e.embedding AS DOUBLE[])) >= $RangeTau
         |ORDER BY q.q_id, e.vec_id""".stripMargin,
    "s_ann_dot" -> annDotSql,
    "s_ann_l2" -> annL2Sql,
    // unrolled-CTE greedy, same integer objective — see mmrSql
    "s_mmr" -> mmrSql,
    // Exact mirror of the LSH path: every hyperplane component is
    // inlined (HyperplaneLsh.planesFor — identical seeded matrix),
    // each bucket bit recomputed as an explicit left-associated
    // dot-product chain (same accumulation order as the eval loop, so
    // sign decisions match bit-for-bit), then the same bucket join +
    // exact re-rank as the bruteforce oracle. Dim is pinned to the
    // embeddings table's 64 — a different dim would diff loudly.
    "s_ann_lsh" -> annLshSql,
    // same shared bucketed index + re-rank as s_ann_lsh; only the q
    // CTE differs — each query probes its own code plus the Bits
    // hamming-1 neighbors (xor of each code bit), so candidates are a
    // superset of the single-probe run's by construction
    "s_ann_multiprobe" -> annMultiprobeSql,
    // the three result-set mirrors above, composed as nested-WITH CTE
    // bodies; hits stay integer until the final ratio4 mirror
    "s_recall_eval" ->
      s"""WITH truth AS MATERIALIZED ($annBruteforceSql),
         |lsh AS MATERIALIZED ($annLshSql),
         |mp AS MATERIALIZED ($annMultiprobeSql),
         |j AS MATERIALIZED (SELECT t.q_id,
         |        CASE WHEN l.vec_id IS NULL THEN 0 ELSE 1 END AS hit_lsh,
         |        CASE WHEN m.vec_id IS NULL THEN 0 ELSE 1 END AS hit_multi
         |      FROM truth t
         |      LEFT JOIN lsh l ON l.q_id = t.q_id AND l.vec_id = t.vec_id
         |      LEFT JOIN mp m ON m.q_id = t.q_id AND m.vec_id = t.vec_id)
         |SELECT q_id,
         |  ${ExactNum.ratioSql("sum(hit_lsh)", "count(*)")} AS recall_lsh,
         |  ${ExactNum.ratioSql("sum(hit_multi)", "count(*)")} AS recall_multi
         |FROM j GROUP BY q_id ORDER BY q_id""".stripMargin,
    // same exact-scored scan as the bruteforce mirror, then the
    // majority vote; prediction ties (votes desc, label asc)
    "s_knn_classify" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb,
         |    label AS true_label FROM embeddings WHERE vec_id < $NumQueries),
         |s AS (SELECT q.q_id, q.true_label, e.vec_id, e.label,
         |    list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
         |                           CAST(e.embedding AS DOUBLE[])) AS cos
         |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
         |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, vec_id) AS rank FROM s),
         |v AS (SELECT q_id, true_label, label,
         |    CAST(count(*) AS BIGINT) AS n_votes
         |  FROM r WHERE rank <= $K GROUP BY 1, 2, 3),
         |p AS (SELECT q_id, true_label, label AS pred_label, n_votes,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY n_votes DESC, label) AS vr FROM v)
         |SELECT q_id, true_label, pred_label, n_votes
         |FROM p WHERE vr = 1 ORDER BY q_id""".stripMargin,
    // Full SQL mirror of the IVF path INCLUDING the k-means training
    // over the SAME deterministic mod-sample (smp CTE ≡ ivfTrainSample):
    // the Scala quantizer is deterministic (sorted init, strict-<
    // first-min assignment, means folded in vec_id order), and every
    // float op is order-pinned, so 5 unrolled SQL iterations with
    // ORDERED folds (list_reduce over list(val ORDER BY vec_id) /
    // index-ascending list_transform) reproduce the centroid matrix
    // BIT-FOR-BIT — then bucketing, nprobe cell selection, and cosine
    // re-rank mirror the operator. Ties (dist, cell) = the eval
    // loop's first-min rule.
    "s_ann_ivf" -> {
      val nprobe = 4
      val iters = KmeansIters
      val tail =
        s"""probes AS (
           |  SELECT q_id, q_emb, cell FROM (
           |    SELECT e.vec_id AS q_id, e.embedding AS q_emb, c.cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${dist("e", "c")}, c.cell) AS rn
           |    FROM embeddings e CROSS JOIN c$iters c
           |    WHERE e.vec_id < $NumQueries) WHERE rn <= $nprobe),
           |scored AS (
           |  SELECT q_id, vec_id,
           |    list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
           |                           CAST(embedding AS DOUBLE[])) AS cos,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
           |                                      CAST(embedding AS DOUBLE[])) DESC,
           |        vec_id) AS rank
           |  FROM (SELECT DISTINCT p.q_id, p.q_emb, b.vec_id, b.embedding
           |        FROM probes p JOIN bucketed b
           |          ON p.cell = b.cell AND b.vec_id <> p.q_id))
           |SELECT q_id, rank, vec_id, round(cos, 4) AS cos
           |FROM scored WHERE rank <= $K
           |ORDER BY q_id, rank""".stripMargin
      "WITH " + kmeansCtePrefix + ",\n" + tail
    },
    // same trained centroids + full-table assignment as the operator
    // (shared kmeansCtePrefix), then the identical label-majority
    // rollup; sums CAST back to BIGINT (duck HUGEINT hazard)
    "s_kmeans_assign" ->
      ("WITH " + kmeansCtePrefix + s""",
        |lbl AS (SELECT b.cell AS cluster, e.label, count(*) AS label_n
        |        FROM bucketed b JOIN embeddings e ON b.vec_id = e.vec_id
        |        GROUP BY b.cell, e.label),
        |rk AS (SELECT cluster, label, label_n,
        |         row_number() OVER (PARTITION BY cluster
        |           ORDER BY label_n DESC, label) AS rn
        |       FROM lbl)
        |SELECT cluster,
        |  CAST(sum(label_n) AS BIGINT) AS n_vecs,
        |  max(CASE WHEN rn = 1 THEN label END) AS top_label,
        |  CAST(max(CASE WHEN rn = 1 THEN label_n END) AS BIGINT) AS top_label_n
        |FROM rk
        |GROUP BY cluster
        |ORDER BY cluster""".stripMargin),
    // the codebook is recomputed in-SQL (per-dim min/max over the
    // same floats → identical doubles as the driver-collected
    // literals); encode + reconstruction use the identical
    // arithmetic order, and the mse fold is the usual ordered
    // list_reduce left-fold
    "s_sq4_codebook" ->
      """WITH stats AS (
        |  SELECT d, min(CAST(embedding[d] AS DOUBLE)) AS mn,
        |         max(CAST(embedding[d] AS DOUBLE)) AS mx
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) AS d)
        |  GROUP BY d),
        |sarr AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
        |         FROM stats),
        |c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
        |             mns, mxs
        |      FROM embeddings CROSS JOIN sarr),
        |q AS (SELECT vec_id, e, mns, mxs,
        |        list_transform(range(1, 65), d -> CASE WHEN mxs[d] > mns[d]
        |          THEN CAST(floor((e[d] - mns[d]) * 15 / (mxs[d] - mns[d]) + 0.5) AS INTEGER)
        |          ELSE 0 END) AS qarr
        |      FROM c)
        |SELECT vec_id,
        |  array_to_string(list_transform(qarr, v -> CAST(v AS VARCHAR)), ',') AS q,
        |  round(list_reduce(list_prepend(0.0, list_transform(range(1, 65),
        |    d -> ((mns[d] + qarr[d] * (mxs[d] - mns[d]) / 15) - e[d])
        |       * ((mns[d] + qarr[d] * (mxs[d] - mns[d]) / 15) - e[d]))),
        |    (x, y) -> x + y) / 64, 4) AS mse
        |FROM q ORDER BY vec_id""".stripMargin,
    // four per-subspace k-means chains (same trainCentroids
    // reproduction as the IVF mirror, over embedding[off+1..off+16]),
    // then the encode join + left-assoc reconstruction fold
    "s_pq_codebook" ->
      (s"WITH $smpCte,\n" +
        (0 until PqM).map(pqKmeansCtes).mkString(",\n") + s""",
        |j AS (SELECT e.vec_id, e.embedding,
        |        p0.c0, p1.c1, p2.c2, p3.c3,
        |        p0.r0 || p1.r1 || p2.r2 || p3.r3 AS recon
        |      FROM embeddings e
        |      JOIN p0enc p0 USING (vec_id)
        |      JOIN p1enc p1 USING (vec_id)
        |      JOIN p2enc p2 USING (vec_id)
        |      JOIN p3enc p3 USING (vec_id))
        |SELECT vec_id,
        |  CAST(c0 AS VARCHAR) || ',' || CAST(c1 AS VARCHAR) || ',' ||
        |  CAST(c2 AS VARCHAR) || ',' || CAST(c3 AS VARCHAR) AS codes,
        |  round(list_reduce(list_prepend(0.0, list_transform(range(1, ${PqM * PqSub + 1}),
        |    i -> (recon[i] - CAST(embedding[i] AS DOUBLE))
        |       * (recon[i] - CAST(embedding[i] AS DOUBLE)))),
        |    (x, y) -> x + y) / ${PqM * PqSub}, 4) AS mse
        |FROM j ORDER BY vec_id""").stripMargin,
    // same per-subspace chains + encode join as s_pq_codebook, then
    // the ADC fold: per (query, row), squared distance to the row's
    // chosen centroid per subspace (≡ the lookup-table values the
    // operator precomputes — same left-assoc adds in the same order)
    "s_ann_pq" -> {
      (s"WITH $smpCte,\n" +
        (0 until PqM).map(pqKmeansCtes).mkString(",\n") + s""",
        |j AS (SELECT e.vec_id,
        |        p0.r0, p1.r1, p2.r2, p3.r3
        |      FROM embeddings e
        |      JOIN p0enc p0 USING (vec_id)
        |      JOIN p1enc p1 USING (vec_id)
        |      JOIN p2enc p2 USING (vec_id)
        |      JOIN p3enc p3 USING (vec_id)),
        |q AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings
        |      WHERE vec_id < $NumQueries),
        |scored AS (SELECT q.q_id, j.vec_id,
        |    ${ldist(0, "r0")} + ${ldist(PqSub, "r1")}
        |    + ${ldist(2 * PqSub, "r2")} + ${ldist(3 * PqSub, "r3")} AS adc
        |  FROM q CROSS JOIN j),
        |rk AS (SELECT q_id, vec_id, adc,
        |         row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rnk
        |       FROM scored)
        |SELECT q_id, rnk, vec_id, round(adc, 4) AS adc
        |FROM rk WHERE rnk <= $K ORDER BY q_id, rnk""").stripMargin
    },
    // IVF-PQ mirror = the s_ann_ivf chain (shared kmeansCtePrefix:
    // coarse training + full-table cell assignment + nprobe probe
    // selection) composed with the s_ann_pq chains (shared
    // pqKmeansCtes: subspace training + encode) — the scored join is
    // restricted to probed cells and the distance is the same ADC
    // fold. Every constant and fold is shared with the two parents,
    // so the composite cannot drift from either.
    "s_ann_ivfpq" -> {
      val nprobe = 4
      ("WITH " + kmeansCtePrefix + ",\n" +
        (0 until PqM).map(pqKmeansCtes).mkString(",\n") + s""",
        |probes AS (
        |  SELECT q_id, qe, cell FROM (
        |    SELECT e.vec_id AS q_id, e.embedding AS qe, c.cell,
        |      row_number() OVER (PARTITION BY e.vec_id
        |        ORDER BY ${dist("e", "c")}, c.cell) AS rn
        |    FROM embeddings e CROSS JOIN c$KmeansIters c
        |    WHERE e.vec_id < $NumQueries) WHERE rn <= $nprobe),
        |j AS (SELECT b.vec_id, b.cell,
        |        p0.r0, p1.r1, p2.r2, p3.r3
        |      FROM bucketed b
        |      JOIN p0enc p0 USING (vec_id)
        |      JOIN p1enc p1 USING (vec_id)
        |      JOIN p2enc p2 USING (vec_id)
        |      JOIN p3enc p3 USING (vec_id)),
        |scored AS (SELECT q.q_id, j.vec_id,
        |    ${ldist(0, "r0")} + ${ldist(PqSub, "r1")}
        |    + ${ldist(2 * PqSub, "r2")} + ${ldist(3 * PqSub, "r3")} AS adc
        |  FROM probes q JOIN j ON j.cell = q.cell),
        |rk AS (SELECT q_id, vec_id, adc,
        |         row_number() OVER (PARTITION BY q_id ORDER BY adc, vec_id) AS rnk
        |       FROM scored)
        |SELECT q_id, rnk, vec_id, round(adc, 4) AS adc
        |FROM rk WHERE rnk <= $K ORDER BY q_id, rnk""").stripMargin
    },
    // identical trained centroids + full-table cell assignment as the
    // operator (shared kmeansCtePrefix), then the cluster-scoped
    // pairwise cosine — duck's list_cosine_similarity mirrors the
    // graft cosine_similarity expression bit-for-bit (d_embed_cosine
    // proves the pairing)
    "d_semantic_dedup" ->
      ("WITH " + kmeansCtePrefix + s""",
        |pairs AS (
        |  SELECT a.cell, a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                           CAST(b.embedding AS DOUBLE[])) AS cos
        |  FROM bucketed a JOIN bucketed b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id)
        |SELECT cell, id_a, id_b, round(cos, 4) AS cos
        |FROM pairs WHERE cos >= $SemTau
        |ORDER BY id_a, id_b""".stripMargin),
  )
}
