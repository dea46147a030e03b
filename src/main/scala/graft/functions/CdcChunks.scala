package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** cdc_chunks(text, k, d) → array<string>: content-defined chunking
  * (the LBFS/rsync boundary rule, Muthitacharoen 2001) in ONE O(n)
  * pass — a chunk boundary opens at code-point position i ≥ 2
  * (1-based) whenever the Karp-Rabin hash of the k-gram starting at i
  * is ≡ 0 (mod d); chunks are the substrings between boundaries.
  *
  * Why a native expression (the winnow_sketch lesson, round 11): the
  * built-ins formulation hashed `substring(text, i, k)` per position,
  * and UTF8String.substringSQL must SCAN from the string start to
  * find code-point i — O(i) per gram, O(n²) per document (measured
  * 4.6 s at sf0.1 for what is linear work). Here the code points
  * decode once and the hash ROLLS in O(1) per position:
  * h_{j+1} = (h_j − cp_j·Base^(k-1))·Base + cp_{j+k} (mod M31).
  *
  * The gram hash is the same fold as PolyHash31 (acc·Base + cp mod
  * M31), so a boundary's rolling value equals poly_hash31 of that
  * substring and the DuckDB oracle recomputes every gram
  * independently (list_reduce over the code-point slice) — identical
  * chunks by construction. Mod-M31 keeps the oracle's BIGINT
  * arithmetic overflow-free, exactly like the winnow sketch.
  */
case class CdcChunks(child: Expression, k: Int, d: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || d < 1)
      TypeCheckResult.TypeCheckFailure(
        s"cdc_chunks expects k >= 1 and d >= 1, got k=$k, d=$d")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"cdc_chunks expects string, got $t")
    }

  private val Base = PolyHash31.Base
  private val M31 = PolyHash31.M31
  private val BasePowK1: Long = {
    var p = 1L
    var i = 0
    while (i < k - 1) { p = (p * Base) % M31; i += 1 }
    p
  }

  /** Decode once, roll the hash, cut chunks — called per-row from
    * both the interpreted path and the generated pipeline. */
  def chunks(u: UTF8String): ArrayData = {
    val cps = u.toString.codePoints().toArray
    val n = cps.length
    val starts = scala.collection.mutable.ArrayBuffer(1)
    if (n >= k + 1) {
      var h = 0L
      var i = 0
      while (i < k) { h = (h * Base + cps(i)) % M31; i += 1 }
      // h is now the gram at position 1; boundaries are positions ≥ 2
      var j = 2
      while (j <= n - k + 1) {
        val dropped = (cps(j - 2) * BasePowK1) % M31
        h = ((h - dropped + M31) * Base + cps(j + k - 2)) % M31
        if (h % d == 0) starts += j
        j += 1
      }
    }
    val out = new Array[AnyRef](starts.length)
    var x = 0
    while (x < starts.length) {
      val s0 = starts(x) - 1
      val e0 = (if (x + 1 < starts.length) starts(x + 1) else n + 1) - 1
      out(x) = UTF8String.fromString(new String(cps, s0, e0 - s0))
      x += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdc", this, classOf[CdcChunks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.chunks($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
