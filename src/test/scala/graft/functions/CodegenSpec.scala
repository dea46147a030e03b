package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Every custom expression implements doGenCode (round 9 — before
  * that they were CodegenFallback, which breaks the whole-stage
  * pipeline around the hottest loops in the engine: shingle hashing,
  * minhash, sketches). Spark silently falls back to interpreted
  * execution when generated code fails to compile, so this spec runs
  * each expression with `spark.sql.codegen.fallback=false` (Janino
  * errors become test failures) and `codegenFactoryMode=CODEGEN_ONLY`,
  * then cross-checks the generated results against the interpreted
  * helper — proving both that codegen COMPILES and that it computes
  * the same thing. */
class CodegenSpec extends SparkSpec {

  private def withCodegenForced[A](body: => A): A = {
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevMode = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevMode)
    }
  }

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "a",
    "")

  test("poly_hash31 / simhash64 / winnow_sketch / ahash64 codegen-compile and match interpreted") {
    withCodegenForced {
      val session = spark
      import session.implicits._
      val got = docs.toDF("s")
        .select(col("s"), expr("poly_hash31(s)").as("ph"),
          expr("simhash64(split(s, ' '))").as("sh"),
          expr("winnow_sketch(s, 5, 4)").as("wk"),
          expr("ahash64(s)").as("ah"))
        .collect()
      got.foreach { r =>
        val s = r.getString(0)
        assert(r.getLong(1) ==
          PolyHash31.hash(org.apache.spark.unsafe.types.UTF8String.fromString(s)),
          s"poly_hash31($s)")
      }
      // winnow: non-empty for long docs, empty for short ones (n < k)
      assert(got(0).getSeq[Long](3).nonEmpty)
      assert(got(3).getSeq[Long](3).isEmpty)
    }
  }

  test("minhash_signature / hyperplane_lsh / nearest_centroid / bloom codegen-compile") {
    withCodegenForced {
      val session = spark
      import session.implicits._
      val sig = docs.toDF("s")
        .select(expr("minhash_signature(transform(split(s, ' '), t -> poly_hash31(t)), 8, 42)"))
        .collect()
      assert(sig.forall(_.getSeq[Long](0).length == 8))

      val vecs = Seq(Seq(1.0f, 0.0f, 2.0f), Seq(-1.0f, 3.0f, 0.5f)).toDF("v")
      val lsh = vecs.select(expr("hyperplane_lsh(v, 7, 4)")).collect()
      assert(lsh.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))

      import org.apache.spark.sql.graftbridge.ColumnBridge
      val nc = vecs.select(ColumnBridge.column(NearestCentroid(
        ColumnBridge.expression(col("v")),
        Seq(Seq(1.0, 0.0, 2.0), Seq(-1.0, 3.0, 0.5)))))
        .collect()
      assert(nc.map(_.getInt(0)).toSeq == Seq(0, 1))

      // 2-byte bitset 0b00000001_00001000: bits 3 and 8 set
      val probes = Seq((Array[Byte](0x08, 0x01), 3L, 8L, true),
        (Array[Byte](0x08, 0x01), 3L, 9L, false)).toDF("bloom", "p1", "p2", "want")
      val bm = probes
        .select(expr("bloom_might_contain(bloom, p1, p2)").as("got"), col("want"))
        .collect()
      bm.foreach(r => assert(r.getBoolean(0) == r.getBoolean(1), "bloom probe"))
    }
  }

  test("generated results are bit-identical to the interpreted path (fallback forced)") {
    // same expressions evaluated with codegen disabled entirely
    val q = "select poly_hash31(s) ph, simhash64(split(s, ' ')) sh, " +
      "winnow_sketch(s, 5, 4) wk, ahash64(s) ah, " +
      "minhash_signature(transform(split(s, ' '), t -> poly_hash31(t)), 8, 42) mh " +
      "from docs"
    val session = spark
    import session.implicits._
    docs.toDF("s").createOrReplaceTempView("docs")
    val gen = withCodegenForced { spark.sql(q).collect() }
    val prevMode = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp =
      try spark.sql(q).collect()
      finally spark.conf.set("spark.sql.codegen.factoryMode", prevMode)
    assert(gen.map(_.toString).toSeq == interp.map(_.toString).toSeq)
  }
}
