package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** §2e text analysis over the documents table — the language-ID /
  * quality / token-count / fingerprint stages of a training-data
  * pipeline. Everything is per-row array/regex built-ins (whole-stage
  * codegen, zero UDFs, zero shuffles until the final rollups), so the
  * plans scale linearly with document count.
  */
object TextOps {

  type Q = (SparkSession, String) => DataFrame

  /** Marker lexicons per language (drawn from the corpus vocabulary;
    * the operator contract is the deterministic argmax scoring, not a
    * linguistic claim). */
  private val Markers: ListMap[String, Seq[String]] = ListMap(
    "de" -> Seq("row", "batch", "scan"),
    "en" -> Seq("the", "a", "fast"),
    "es" -> Seq("table", "data", "value"),
    "fr" -> Seq("join", "hash", "merge"),
    "zh" -> Seq("stream", "window", "query"))

  private def tokens: Column = split(col("text"), " ")

  private def markerScore(words: Seq[String]): Column =
    size(filter(tokens, t => t.isInCollection(words)))

  /** Language ID as a single shuffle-free expression (shared with
    * TrainingPipeline): sort (−score, lang) structs — struct ordering
    * gives score-desc with lexicographic tie-break, identical to the
    * stack+window formulation of xLangId (equivalence asserted in
    * TrainingPipelineSpec). */
  private[operators] def langIdExpr: Column =
    element_at(sort_array(array(Markers.toSeq.map { case (l, ws) =>
      struct((-markerScore(ws)).as("neg"), lit(l).as("lang"))
    }: _*)), 1).getField("lang")

  /** Per-doc token count (shared with TrainingPipeline). */
  private[operators] def nTokensExpr: Column = size(tokens)

  /** Unrounded composite quality score (shared core of
    * xQualityScore and TrainingPipeline). */
  private[operators] def qualityExpr: Column = {
    val nTok = size(tokens).cast("double")
    val stopRatio = size(filter(tokens, t => t.isInCollection(Seq("the", "a"))))
      .cast("double") / nTok
    val punctRatio = regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double") /
      length(col("text")).cast("double")
    least(nTok, lit(100.0)) / lit(100.0) * (lit(1.0) - stopRatio) * (lit(1.0) - punctRatio)
  }

  /** Marker-word language ID: per-language token-occurrence score,
    * argmax with lexicographic tie-break (explode + row_number so the
    * tie rule is explicit and identical in the oracle). */
  def xLangId(s: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(s, dir).select(
      col("doc_id") +: Markers.toSeq.map { case (l, ws) => markerScore(ws).as(s"s_$l") }: _*)
    val stackArgs = Markers.keys.map(l => s"'$l', s_$l").mkString(", ")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("cand_lang"))
    scored
      .select(col("doc_id"),
        expr(s"stack(${Markers.size}, $stackArgs)").as(Seq("cand_lang", "score")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("cand_lang").as("pred_lang"), col("score"))
      .orderBy(col("doc_id"))
  }

  /** Quality features + composite score: token count, stopword ratio,
    * punctuation ratio, mean word length. All ratios computed in
    * explicit double arithmetic so Spark and DuckDB agree bit-for-bit
    * after 4dp rounding. */
  def xQualityScore(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(tokens).cast("double")
    val stopRatio = size(filter(tokens, t => t.isInCollection(Seq("the", "a")))).cast("double") / nTok
    val punctRatio = regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double") /
      length(col("text")).cast("double")
    val meanWordLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nTok
    val quality = qualityExpr
    Tables.documents(s, dir).select(
      col("doc_id"), size(tokens).as("n_tokens"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(punctRatio, 4).as("punct_ratio"),
      round(meanWordLen, 4).as("mean_word_len"),
      round(quality, 4).as("quality"))
      .orderBy(col("doc_id"))
  }

  /** Whitespace + BPE-ish regex token counts, rolled up per language. */
  def xTokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), size(tokens).as("ws_tokens"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).as("re_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("re_tokens")).as("total_re_tokens"),
        round(avg(col("ws_tokens")), 4).as("avg_ws_tokens"))
      .orderBy(col("lang"))

  /** THE canonical-fingerprint expression — single definition shared
    * by xFingerprint, TrainingPipeline.annotate, and (as a spec-pinned
    * JVM mirror) streaming.Streams.canonicalKey, so batch and stream
    * cannot drift on what counts as a duplicate: md5 of lowercased,
    * space-trimmed, whitespace-collapsed text. */
  private[graft] def canonicalFpExpr: Column =
    md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ").cast("binary"))

  /** Canonicalization fingerprint: md5 of lowercased,
    * whitespace-collapsed text → dup groups (keep min doc_id). */
  def xFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), canonicalFpExpr.as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .orderBy(col("keep_id"))

  /** Winnowing document sketches (Schleimer et al., MOSS): char
    * 8-gram Karp-Rabin rolling hashes, window-4 minima, distinct —
    * via the single-pass winnow_sketch expression (the built-ins
    * formulation went quadratic under projection collapse, see
    * WinnowSketch doc). Rows-only oracle; containment properties
    * pinned in TextSpec. */
  def xWinnowFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(expr("winnow_sketch(text, 8, 4)")).as("sketch_hash"))
      .orderBy(col("doc_id"), col("sketch_hash"))

  val queries: ListMap[String, Q] = ListMap(
    "x_lang_id" -> (xLangId _),
    "x_quality_score" -> (xQualityScore _),
    "x_token_count" -> (xTokenCount _),
    "x_fingerprint" -> (xFingerprint _),
    "x_winnow_fingerprint" -> (xWinnowFingerprint _),
  )

  private[operators] def scoreSql(l: String): String = {
    val list = Markers(l).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), w -> w IN ($list))) AS s_$l"
  }

  private[operators] def markerLangs: Seq[String] = Markers.keys.toSeq

  /** The composite-quality column (SQL mirror of qualityExpr, rounded
    * 4dp) — shared by the x_quality_score oracle and the training
    * funnel oracle so the two cannot drift. */
  private[operators] val qualitySqlExpr: String =
    """round(least(CAST(len(string_split(text, ' ')) AS DOUBLE), 100.0) / 100.0
      |    * (1.0 - CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
      |        / len(string_split(text, ' ')))
      |    * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
      |        / length(text)), 4)""".stripMargin

  val oracles: ListMap[String, String] = ListMap(
    "x_lang_id" -> {
      val scores = Markers.keys.map(scoreSql).mkString(",\n  ")
      val unions = Markers.keys.map(l =>
        s"SELECT doc_id, '$l' AS cand_lang, s_$l AS score FROM s").mkString("\n  UNION ALL ")
      s"""WITH s AS (SELECT doc_id,
         |  $scores
         |FROM documents),
         |u AS (
         |  $unions),
         |r AS (SELECT doc_id, cand_lang, score,
         |        row_number() OVER (PARTITION BY doc_id
         |          ORDER BY score DESC, cand_lang) AS rn
         |      FROM u)
         |SELECT doc_id, cand_lang AS pred_lang, score FROM r WHERE rn = 1
         |ORDER BY doc_id""".stripMargin
    },
    "x_quality_score" ->
      s"""SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  round(CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) AS DOUBLE)
        |    / len(string_split(text, ' ')), 4) AS stopword_ratio,
        |  round(CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
        |    / length(text), 4) AS punct_ratio,
        |  round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / len(string_split(text, ' ')), 4) AS mean_word_len,
        |  $qualitySqlExpr AS quality
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "x_token_count" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
        |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS total_re_tokens,
        |  round(avg(len(string_split(text, ' '))), 4) AS avg_ws_tokens
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "x_fingerprint" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM documents
        |GROUP BY 1
        |ORDER BY keep_id""".stripMargin,
    // Exact mirror of winnow_sketch(text, 8, 4): each code-point
    // 8-gram hash is recomputed independently as the poly_hash31 fold
    // over a list_slice (a Karp-Rabin rolling value equals the direct
    // fold of its substring), window-4 minima via a ROWS frame,
    // distinct. Static gram-index series (1..4096) instead of a
    // lateral range on len (duck v1.0 can't lateral-unnest a column
    // arg); 4096 covers max doc length with 7× headroom — a longer
    // doc would drop grams and fail the diff loudly, not silently.
    "x_winnow_fingerprint" ->
      """WITH codes AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS cs
        |  FROM documents),
        |sized AS (SELECT doc_id, cs, len(cs) AS n FROM codes),
        |grams AS (
        |  SELECT doc_id, i, n - 8 + 1 AS ng,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(cs, i, i + 7)),
        |      (acc, c) -> (acc * 1000003 + c) % 2147483647) AS h
        |  FROM sized CROSS JOIN (SELECT unnest(range(1, 4097)) AS i)
        |  WHERE i <= n - 8 + 1),
        |win AS (
        |  SELECT doc_id, i, ng,
        |    min(h) OVER (PARTITION BY doc_id ORDER BY i
        |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS wmin
        |  FROM grams)
        |SELECT DISTINCT doc_id, wmin AS sketch_hash
        |FROM win WHERE i >= least(4, ng)
        |ORDER BY doc_id, sketch_hash""".stripMargin,
  )
}
