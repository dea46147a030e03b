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
      .orderBy(col("q_id"), col("rank"))
  }

  def sAnnLsh(s: SparkSession, dir: String): DataFrame = {
    // one row per (table, bucket) per vector: bucketed ONCE, reused
    // by every query — the single shuffle of the vector table
    def bucketed(df: DataFrame, vecCol: String): DataFrame = {
      // table seeds must be literals (each expression instance owns
      // its deterministic plane matrix) → unroll the L tables
      val tables = (0 until Tables_L).map(t =>
        s"struct($t as tbl, hyperplane_lsh($vecCol, ${100 + t}, $Bits) as bucket)")
      df.select(col("*"), explode(expr(tables.mkString("array(", ", ", ")"))).as("h"))
        .select(df.columns.map(col) :+ col("h.tbl") :+ col("h.bucket"): _*)
    }

    val vecs = bucketed(Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding")), "embedding")
    val qs = bucketed(queryVecs(s, dir), "q_emb")

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
      .orderBy(col("q_id"), col("rank"))
  }

  val queries: ListMap[String, Q] = ListMap(
    "s_ann_bruteforce" -> (sAnnBruteforce _),
    "s_ann_lsh" -> (sAnnLsh _),
  )

  val oracles: ListMap[String, String] = ListMap(
    "s_ann_bruteforce" ->
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
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
         |ORDER BY q_id, rank""".stripMargin,
    // s_ann_lsh: rows-only; recall ≥ 0.6 vs bruteforce in SimilaritySpec.
  )
}
