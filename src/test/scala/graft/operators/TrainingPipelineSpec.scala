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

  test("pipeline quality agrees with the xQualityScore operator") {
    val opQ = TextOps.xQualityScore(spark, sfDir)
      .select(col("doc_id"), col("quality").as("op_quality"))
    val disagree = annotated.select(col("doc_id"), col("quality"))
      .join(opQ, "doc_id")
      .filter(col("quality") =!= col("op_quality")).count()
    assert(disagree == 0, s"$disagree docs with diverging quality score")
  }
}
