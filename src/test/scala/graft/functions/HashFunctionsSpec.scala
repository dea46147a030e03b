package graft.functions

import org.apache.spark.sql.functions.{col, expr}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Independent JVM reference models for the round-4 hash expressions:
  * each native expression (optimized single-pass / rolling form) must
  * equal a naive direct-fold model on random ASCII strings — the same
  * contract the DuckDB oracles mirror. (Generators sampled directly
  * with fixed seeds; the scalatest/scalacheck bridge isn't offline.)
  */
class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val M31 = 2147483647L
  private val B = 1000003L

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val asciiText: Gen[String] =
    Gen.chooseNum(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        8 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('.')))
        .map(_.mkString))

  private def polyRef(s: String): Long =
    s.foldLeft(0L)((acc, c) => (acc * B + c.toInt) % M31)

  test("poly_hash31 equals the direct per-char fold") {
    val xs = (1 to 40).map(i => sample(asciiText, 7000 + i))
    val got = xs.toDF("s").select(expr("poly_hash31(s)")).as[Long].collect()
    assert(got.toSeq == xs.map(polyRef), "poly_hash31 diverged from the fold model")
  }

  test("winnow_sketch rolling minima equal the direct recompute model") {
    val k = 8
    val w = 4
    def ref(s: String): Seq[Long] = {
      val cps = s.map(_.toLong)
      if (cps.length < k) return Seq.empty
      val grams = (0 to cps.length - k)
        .map(i => cps.slice(i, i + k).foldLeft(0L)((acc, c) => (acc * B + c) % M31))
      val winW = math.min(w, grams.length)
      (winW - 1 until grams.length)
        .map(e => grams.slice(e - winW + 1, e + 1).min)
        .distinct
    }
    val xs = (1 to 40).map(i => sample(asciiText, 8000 + i))
    val got = xs.toDF("s")
      .select(expr(s"winnow_sketch(s, $k, $w)")).as[Seq[Long]].collect()
    xs.zip(got).foreach { case (s, g) =>
      assert(g.toSet == ref(s).toSet, s"winnow mismatch on '${s.take(40)}…'")
    }
  }

  test("simhash64 equals the FNV-1a-over-code-points vote model") {
    def fnv(tok: String): Long = {
      var h = 0xcbf29ce484222325L
      tok.codePoints().toArray.foreach { cp => h ^= cp; h *= 0x100000001b3L }
      h
    }
    def ref(toks: Seq[String]): Long = {
      val votes = new Array[Int](64)
      toks.foreach { t =>
        val h = fnv(t)
        (0 until 64).foreach(j =>
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1)
      }
      (0 until 64).foldLeft(0L)((s, j) => if (votes(j) > 0) s | (1L << j) else s)
    }
    val xs = (1 to 30).map(i => sample(asciiText, 9000 + i))
    val got = xs.toDF("s")
      .select(expr("simhash64(split(s, ' '))")).as[Long].collect()
    val exp = xs.map(s => ref(s.split(" ", -1).toSeq))
    assert(got.toSeq == exp, "simhash64 diverged from the vote model")
  }
}
