package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom filter building blocks mirroring the reference's per-day
  * Redis bloom (gotimer_executor/pkg/bloom/filter.go:31-41): k=2 hash
  * functions — SHA1 and murmur3 — each mod the bitset size.
  *
  * The reference's m is 2^31 (a 256 MB Redis string); here m is
  * configurable and BloomOps picks 2^22 (512 KB) which keeps the
  * same FP≈0 guarantee at test scale (n≈10^3/day → FP ≈ 2.5e-8).
  * At the reference's n=10^6/day you'd set m back to 2^31 — the
  * aggregate below is size-agnostic.
  */
object BloomFunctions {

  /** Distributed bitset-OR aggregate: each input row contributes its
    * k=2 bit positions; partials are fixed-size byte arrays OR-merged
    * map-side — the Spark-native analog of pipelined Redis SETBITs. */
  class BloomBitsetAgg(m: Int) extends Aggregator[(Long, Long), Array[Byte], Array[Byte]] {
    require(m % 8 == 0, "bitset size must be byte-aligned")
    override def zero: Array[Byte] = new Array[Byte](m >> 3)
    private def set(b: Array[Byte], pos: Long): Unit = {
      val p = pos.toInt
      b(p >> 3) = (b(p >> 3) | (1 << (p & 7))).toByte
    }
    override def reduce(b: Array[Byte], a: (Long, Long)): Array[Byte] = {
      // negative positions are the NULL-input sentinel (ManifestLake's
      // multi-column bloom build coalesces a null key's positions to
      // −1 so one pass can aggregate every column): contribute nothing
      if (a._1 >= 0) { set(b, a._1); set(b, a._2) }
      b
    }
    override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < x.length) { x(i) = (x(i) | y(i)).toByte; i += 1 }
      x
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** bloom_agg(p1, p2) as an untyped aggregate Column. */
  def bloomAgg(m: Int): (Column, Column) => Column = {
    val agg = udaf(new BloomBitsetAgg(m),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    (p1, p2) => agg(p1, p2)
  }

  /** Bit position 1 — SHA1 route (pkg/bloom/filter.go rawVal1):
    * first 15 hex chars of sha1 (60 bits) mod m. Pure built-ins →
    * whole-stage codegen. */
  def bloomPos1(key: Column, m: Int): Column =
    pmod(conv(substring(sha1(key.cast(BinaryType)), 1, 15), 16, 10).cast(LongType), lit(m.toLong))

  /** Bit position 2 — murmur3 route (rawVal2): Spark's hash() IS
    * murmur3_32. */
  def bloomPos2(key: Column, m: Int): Column =
    pmod(hash(key).cast(LongType), lit(m.toLong))

  /** md5-route bit position (ManifestLake's file bloom index): same
    * first-15-hex-chars construction as bloomPos1 but over md5, so a
    * DRIVER-side prober can recompute both positions with plain
    * MessageDigest — no dependency on Spark's typed murmur3. */
  def bloomPosMd5(key: Column, m: Int): Column =
    pmod(conv(substring(md5(key.cast(BinaryType)), 1, 15), 16, 10).cast(LongType), lit(m.toLong))
}

/** bloom_might_contain(bloom, p1, p2): true iff both bit positions
  * are set — the Exist check (filter.go:31-41). Native expression so
  * probing needs no UDF row-codec. */
case class BloomMightContain(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == BinaryType &&
      second.dataType == LongType && third.dataType == LongType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (binary, bigint, bigint), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  private def bit(b: Array[Byte], pos: Long): Boolean = {
    val p = pos.toInt
    (b(p >> 3) & (1 << (p & 7))) != 0
  }

  override protected def nullSafeEval(bloom: Any, p1: Any, p2: Any): Any = {
    val b = bloom.asInstanceOf[Array[Byte]]
    bit(b, p1.asInstanceOf[Long]) && bit(b, p2.asInstanceOf[Long])
  }

  // two bit probes, inlined straight into the generated pipeline
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, p1, p2) => {
      val i1 = ctx.freshName("i1")
      val i2 = ctx.freshName("i2")
      s"""
         |int $i1 = (int) $p1; int $i2 = (int) $p2;
         |${ev.value} = ($b[$i1 >> 3] & (1 << ($i1 & 7))) != 0
         |  && ($b[$i2 >> 3] & (1 << ($i2 & 7))) != 0;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
