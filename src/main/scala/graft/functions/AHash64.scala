package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ahash64(text) → struct<lo: bigint, hi: bigint>: the 64-bit
  * blockwise average-hash (aHash) of the payload, carried as two
  * 32-bit halves so neither engine ever shifts past bit 31 (DuckDB
  * raises on 1<<63). Block b of 64 covers code points
  * [⌊b·n/64⌋, ⌊(b+1)·n/64⌋); its bit is 1 iff the block mean exceeds
  * the global mean, decided by integer cross-multiply
  * (block_sum·n > total·block_len — no float division). lo packs
  * blocks 0..31 at bits 0..31, hi packs 32..63.
  *
  * One O(n) pass per row (a builtins formulation re-evaluated the
  * 64-block transform inside every packed-bit reference after
  * projection collapse — the same blowup winnow_sketch fixed in r2).
  * Exactly mirrorable in DuckDB as list_slice sums over unicode(c)
  * for the spec-pinned ASCII corpus (code point ≡ byte).
  */
case class AHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("lo", LongType, nullable = false),
    StructField("hi", LongType, nullable = false)))
  override def prettyName: String = "ahash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ahash64 expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    AHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AHash64 {

  /** The blockwise transform — called from generated code (static
    * forwarder). */
  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    // code-point values + prefix sums, one pass
    val n = s.codePointCount(0, s.length).toLong
    val cps = new Array[Long](n.toInt + 1) // prefix sums: cps(i) = sum of first i
    var i = 0
    var idx = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(idx + 1) = cps(idx) + cp
      idx += 1
      i += Character.charCount(cp)
    }
    val total = cps(n.toInt)
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 64) {
      val start = (b * n / 64).toInt
      val end = ((b + 1) * n / 64).toInt
      val blen = (end - start).toLong
      if (blen > 0 && (cps(end) - cps(start)) * n > total * blen) {
        if (b < 32) lo |= (1L << b) else hi |= (1L << (b - 32))
      }
      b += 1
    }
    InternalRow(lo, hi)
  }
}
