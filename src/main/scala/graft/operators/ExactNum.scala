package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Order-independent numeric aggregation over the testdata's double
  * columns.
  *
  * Every monetary/measure double in the testdata carries exactly two
  * decimal digits (verified: max |x − round(x,2)| = 0 on every such
  * column), so casting to DECIMAL(18,2) is lossless, and decimal sums
  * are EXACT — the result no longer depends on accumulation order.
  * Plain double sums differ run-to-run in the last few ulps with
  * parallel partial aggregation (both in Spark and in the DuckDB
  * oracle), and a result that lands within an ulp of a 4-dp rounding
  * boundary then hashes differently between engines — the
  * CORRECTNESS_r02 t_sessionize hash_match=false failure mode. With
  * exact decimal math both engines compute the identical value on
  * every run, so fixed data ⇒ fixed hash.
  *
  * Results are rounded (HALF_UP in Spark, half-away-from-zero in
  * DuckDB — identical for every sign) in DECIMAL space and only then
  * cast back to double, so output schemas are unchanged and the
  * double conversion (nearest-even) is applied to the same exact
  * value on both sides.
  *
  * Scale note (100 TB): decimal sums partial-aggregate exactly like
  * double sums (sum is associative over decimals), stay inside
  * whole-stage codegen, and DECIMAL(18,2) sums widen to
  * DECIMAL(28,2)/DECIMAL(38,2) — headroom to ~1e26, far beyond any
  * 100 TB fact table's total.
  */
object ExactNum {

  /** Lossless integer-cents view: round(x·100) is exactly integral
    * (x carries 2 decimals, so x·100 sits within 1e-9 of an integer —
    * never near a rounding tie), and the long cast is then exact in
    * both engines. Long sums are codegen-hot (a decimal-sum q1 ran 3×
    * slower than double-sum; cents restores it) and overflow only past
    * 9.2e18 cents ≈ 9e16 dollar-units — beyond any real fact table's
    * total. Products (q1/q5/q6) multiply cents as LONGS per row
    * (~1e9 max) and accumulate through sumUnits4's wide-decimal sum,
    * which cannot overflow at any row count. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact, order-independent sum of a 2-dp double, emitted with the
    * engine-wide 4-dp-double output convention.
    * SQL mirror: round(sum(CAST(round(x*100,0) AS BIGINT))/100.0, 4). */
  def sum4(c: Column): Column = round(sum(cents(c)) / 100.0, 4)

  /** Exact sum of a LONG column holding scale-4 integer units (e.g. a
    * cents×cents product), emitted as a 4-dp double. Per-row work is
    * pure long arithmetic (no BigDecimal on the hot path — measured
    * ~0.5 s off q1 at sf0.1); the accumulator is a wide decimal so
    * the SUM can't overflow at any row count even though each row
    * fits a long. The trailing half-away-from-zero to 4 dp happens in
    * INTEGER space — a float-space round here can land on an exact .5
    * tie (~1% of groups: S ≡ ±50 mod 100) where Spark and DuckDB
    * round differently. Sign-correct: the rounding is applied to |S|
    * and the sign restored, because Spark's floor (toward −∞) and
    * DuckDB's `//` (toward zero) disagree on negative operands — on
    * the non-negative branch they coincide.
    * SQL mirror: CAST(CASE WHEN sum(u) >= 0 THEN (sum(u) + 50) // 100
    * ELSE -((-sum(u) + 50) // 100) END AS DOUBLE) / 10000.0
    * (DuckDB sums BIGINT into HUGEINT — also unoverflowable). */
  def sumUnits4(units: Column): Column = {
    val s = sum(units.cast(DecimalType(30, 0)))
    def half(nonNeg: Column): Column = floor((nonNeg + lit(50)) / lit(100))
    when(s >= 0, half(s)).otherwise(-half(-s)).cast("double") / 10000.0
  }

  /** Average as exact cents sum over non-null count, divided in double
    * space (IEEE division of two exactly-agreed operands). SQL mirror:
    * round(sum(CAST(round(x*100,0) AS BIGINT))/(100.0*count(x)), 4). */
  def avg4(c: Column): Column =
    round(sum(cents(c)) / (lit(100.0) * count(c)), 4)
}
