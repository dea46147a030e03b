package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The determinism core: for 2-dp inputs, the cents/units aggregates
  * must equal the mathematically exact result — independent of
  * partitioning (accumulation order), which is the property the
  * DuckDB hash gate depends on. (Generators sampled directly with a
  * fixed seed — the scalatest/scalacheck bridge isn't in the offline
  * dependency set.) */
class ExactNumSpec extends SparkSpec {
  import spark.implicits._

  // 2-dp doubles as the testdata carries them
  private val twoDp: Gen[Double] = Gen.chooseNum(1L, 50000000L).map(_ / 100.0)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("sum4/avg4 equal exact BigDecimal math for random 2-dp data, any partitioning") {
    (1 to 12).foreach { i =>
      val xs = sample(Gen.nonEmptyListOf(twoDp), 1000 + i)
      val parts = 1 + i % 7
      val df = xs.toDF("v").repartition(parts)
      val row = df.agg(
        ExactNum.sum4(col("v")).as("s"),
        ExactNum.avg4(col("v")).as("a")).collect()(0)
      // reference models: sum4 rounds the float quotient (power-of-10
      // denominator — tie-free, see ExactNum doc); avg4 is ratio4, so
      // its contract is HALF_UP on the EXACT rational
      val centsSum = xs.map(x => math.round(x * 100)).sum
      def round4(d: Double): Double =
        new java.math.BigDecimal(java.lang.Double.toString(d))
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      val expSum = round4(centsSum.toDouble / 100.0)
      val expAvg = new java.math.BigDecimal(centsSum)
        .divide(new java.math.BigDecimal(100L * xs.size), 4,
          java.math.RoundingMode.HALF_UP).doubleValue()
      assert(row.getDouble(0) == expSum, s"[$i] sum4 ${row.getDouble(0)} != $expSum")
      assert(row.getDouble(1) == expAvg, s"[$i] avg4 ${row.getDouble(1)} != $expAvg")
    }
  }

  test("ratio4 is HALF_UP on the exact rational — incl. odd/32 float-tie quotients") {
    // odd/32 quotients are the only doubles whose decimal expansion
    // terminates exactly at the 5th place — the float-tie class where
    // engines' round() can part ways; ratio4 must not care
    val ties = Seq((17L, 32L), (3L, 32L), (1L, 32L), (31L, 32L), (25L, 160L))
    val others = Seq((1L, 3L), (2L, 3L), (7L, 8L), (123456L, 7L), (0L, 5L),
      (50L, 10000L), (-17L, 32L), (-1L, 3L), (999999L, 1000000L))
    (ties ++ others).foreach { case (n, d) =>
      val got = Seq((n, d)).toDF("n", "d")
        .select(ExactNum.ratio4(col("n"), col("d")).as("r"))
        .collect()(0).getDouble(0)
      val exp = new java.math.BigDecimal(n)
        .divide(new java.math.BigDecimal(d), 4, java.math.RoundingMode.HALF_UP)
        .doubleValue()
      assert(got == exp, s"ratio4($n/$d): $got != $exp")
    }
  }

  // half-away-from-zero at the last 2 unit digits, the contract both
  // engines implement (|S| rounding + sign restore)
  private def halfAway(s: BigInt): Double = {
    val t = (s.abs + 50) / 100
    (if (s.signum < 0) -t else t).toDouble / 10000.0
  }

  test("sumUnits4 equals exact integer math and is partitioning-invariant") {
    (1 to 12).foreach { i =>
      val rows = sample(Gen.nonEmptyListOf(Gen.zip(twoDp, Gen.chooseNum(0L, 10L))), 2000 + i)
      val parts = 1 + i % 7
      // mirrors the discounted-price shape: cents(a) * (100 - d_c)
      val df = rows.toDF("a", "d").repartition(parts)
      val units = ExactNum.cents(col("a")) * (lit(100L) - col("d"))
      val got = df.agg(ExactNum.sumUnits4(units).as("s")).collect()(0).getDouble(0)
      val exactUnits = rows.map { case (a, d) =>
        BigInt(math.round(a * 100)) * (100 - d)
      }.sum
      assert(got == halfAway(exactUnits), s"[$i] sumUnits4 $got != ${halfAway(exactUnits)}")
    }
  }

  test("sumUnits4 is sign-correct for negative sums (floor vs trunc trap)") {
    // Spark floor goes toward −∞, DuckDB // toward zero — naive
    // (S+50) div 100 diverges by one unit on negative sums; the
    // |S|-then-sign formulation must not
    (1 to 8).foreach { i =>
      val rows = sample(Gen.nonEmptyListOf(twoDp), 3000 + i)
      val df = rows.toDF("a").repartition(1 + i % 5)
      val units = -ExactNum.cents(col("a")) * lit(3L)
      val got = df.agg(ExactNum.sumUnits4(units).as("s")).collect()(0).getDouble(0)
      val exactUnits = -rows.map(a => BigInt(math.round(a * 100)) * 3).sum
      assert(got == halfAway(exactUnits), s"[$i] $got != ${halfAway(exactUnits)}")
    }
  }
}
