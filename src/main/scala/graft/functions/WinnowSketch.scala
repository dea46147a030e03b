package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** winnow_sketch(text) → array<long>: winnowing document sketch
  * (Schleimer, Wilkerson, Aiken — the MOSS fingerprinting paper):
  * Karp-Rabin rolling hash over code-point k-grams, minimum per
  * sliding window of w hashes, distinct minima.
  *
  * Single O(n) pass: the rolling hash updates in O(1) per char and a
  * monotonic deque yields each window minimum in amortized O(1). The
  * array-built-ins formulation of the same sketch
  * (transform+slice+array_min) turned quadratic once Catalyst
  * collapsed the gram array into the window lambda — recomputing
  * every gram per window — which is why this is a native expression.
  *
  * The gram hash is the SAME fold as PolyHash31 (acc·B + cp mod M31)
  * — a k-gram's rolling value equals poly_hash31 of that substring,
  * so the DuckDB oracle can recompute every gram independently
  * (list_reduce over a slice) and mirror the window minima exactly.
  * Mod-M31 (not wraparound-64) precisely so the oracle's BIGINT
  * arithmetic never overflows.
  */
case class WinnowSketch(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1 || w < 1)
      // analysis-time rejection: k ≤ 0 reads bytes(-1) in the rolling
      // hash and w ≤ 0 evicts the deque's only element before the
      // window-minimum read (executor NPE) — fail the query instead
      TypeCheckResult.TypeCheckFailure(
        s"winnow_sketch expects k >= 1 and w >= 1, got k=$k, w=$w")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"winnow_sketch expects string, got $t")
    }

  private val Base = PolyHash31.Base
  private val M31 = PolyHash31.M31
  // Base^(k-1) mod M31 for removing the outgoing char
  private val BasePowK1: Long = {
    var p = 1L
    var i = 0
    while (i < k - 1) { p = (p * Base) % M31; i += 1 }
    p
  }

  /** Roll + window-min in one pass — called per-row from both the
    * interpreted path and the generated pipeline (reference object). */
  def sketch(u: UTF8String): ArrayData = {
    val cps = u.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Long])

    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    // Karp-Rabin mod M31: h_0 = Σ cp_i·Base^(k-1-i);
    // h_{j+1} = (h_j − cp_j·Base^(k-1))·Base + cp_{j+k}  (all mod M31)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + cps(i)) % M31; i += 1 }
    hashes(0) = h
    var j = 1
    while (j < nGrams) {
      val dropped = (cps(j - 1) * BasePowK1) % M31
      h = ((h - dropped + M31) * Base + cps(j + k - 1)) % M31
      hashes(j) = h
      j += 1
    }

    // sliding-window minimum via monotonic index deque
    val winW = math.min(w, nGrams)
    val out = new java.util.LinkedHashSet[Long]()
    val deque = new java.util.ArrayDeque[Int]()
    var idx = 0
    while (idx < nGrams) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(idx)) deque.pollLast()
      deque.addLast(idx)
      if (deque.peekFirst() <= idx - winW) deque.pollFirst()
      if (idx >= winW - 1) out.add(hashes(deque.peekFirst()))
      idx += 1
    }

    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var o = 0
    while (it.hasNext) { arr(o) = it.next(); o += 1 }
    new GenericArrayData(arr)
  }

  override protected def nullSafeEval(input: Any): Any =
    sketch(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[WinnowSketch].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sketch($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
