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
      .withColumn("quality", round(TextOps.qualityExpr, 4))
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
      .withColumn("quality", round(TextOps.qualityExpr, 4))
      .filter(col("pred_lang").isInCollection(langs) &&
        col("quality") >= minQuality)
      .select(col("doc_id"), col("text"), col("pred_lang"),
        col("n_tokens"), col("quality"))

  /** Driver-visible entry (rows-only: the MinHash stage is seeded
    * hashing, not SQL-expressible; stage agreement with the §2
    * operators is asserted in TrainingPipelineSpec instead). */
  val queries: scala.collection.immutable.ListMap[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap(
      "p_training_funnel" -> ((s, dir) => run(s, dir)))

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
