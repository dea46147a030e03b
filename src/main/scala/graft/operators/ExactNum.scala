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

  /** Lossless 2-dp decimal view of a testdata double column. */
  def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Narrower operand for decimal products (keeps p1+p2 ≤ 38 in both
    * engines); still lossless for values < 1e10. */
  def d2n(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Lossless integer-cents view: round(x·100) is exactly integral
    * (x carries 2 decimals, so x·100 sits within 1e-9 of an integer —
    * never near a rounding tie), and the long cast is then exact in
    * both engines. Long sums are codegen-hot (a decimal-sum q1 ran 3×
    * slower than double-sum; cents restores it) and overflow only past
    * 9.2e18 cents ≈ 9e16 dollar-units — beyond any real fact table's
    * total. Products still use d2n decimals: per-row cent-products
    * reach ~1e9, which times 1e12 rows would overflow a long. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Exact, order-independent sum of a 2-dp double, emitted with the
    * engine-wide 4-dp-double output convention.
    * SQL mirror: round(sum(CAST(round(x*100,0) AS BIGINT))/100.0, 4). */
  def sum4(c: Column): Column = round(sum(cents(c)) / 100.0, 4)

  /** Exact sum of an already-decimal expression (e.g. a product of
    * d2n operands), 4-dp double output. */
  def sumExpr4(e: Column): Column = round(sum(e), 4).cast("double")

  /** Exact sum of a LONG column holding scale-4 integer units (e.g. a
    * cents×cents product), emitted as a 4-dp double. Per-row work is
    * pure long arithmetic (no BigDecimal on the hot path — measured
    * ~0.5 s off q1 at sf0.1); the accumulator is a wide decimal so
    * the SUM can't overflow at any row count even though each row
    * fits a long. The trailing half-up to 4 dp happens in INTEGER
    * space ((S+50) div 100) — a float-space round here can land on an
    * exact .5 tie (~1% of groups: S ≡ 50 mod 100) where Spark and
    * DuckDB round differently. Assumes non-negative sums (prices).
    * SQL mirror: CAST((sum(<units>) + 50) // 100 AS DOUBLE) / 10000.0
    * (DuckDB sums BIGINT into HUGEINT — also unoverflowable). */
  def sumUnits4(units: Column): Column =
    floor((sum(units.cast(DecimalType(30, 0))) + lit(50)) / lit(100))
      .cast("double") / 10000.0

  /** Average as exact cents sum over non-null count, divided in double
    * space (IEEE division of two exactly-agreed operands). SQL mirror:
    * round(sum(CAST(round(x*100,0) AS BIGINT))/(100.0*count(x)), 4). */
  def avg4(c: Column): Column =
    round(sum(cents(c)) / (lit(100.0) * count(c)), 4)
}
