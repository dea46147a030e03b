package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** poly_hash31(str) → long: polynomial string hash over Unicode code
  * points, H = fold(acc·B + cp) mod M31 with B = 1000003 and
  * M31 = 2³¹−1 (Rabin-Karp-style; acc < 2³¹ keeps every intermediate
  * product < 2⁵² — no overflow, no wraparound). Chosen over
  * xxhash64 for the shingle→hash step because the SAME fold is
  * expressible in the DuckDB oracle (list_reduce over unicode(char)),
  * so MinHash-LSH gets a full hash-equality oracle instead of a
  * rows-only check. 31-bit range also feeds minhash permutations
  * (a·h+b mod M31) without the floorMod pre-fold.
  */
case class PolyHash31(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash31"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash31 expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    PolyHash31.hash(input.asInstanceOf[UTF8String])

  // stays inside whole-stage codegen: the generated pipeline calls the
  // static forwarder directly — no per-row fallback eval, no boxing
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash31.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash31 {
  val Base = 1000003L
  val M31 = 2147483647L // 2^31 - 1, prime

  /** The fold itself — called from generated code (static forwarder). */
  def hash(u: UTF8String): Long = {
    val s = u.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * Base + cp) % M31
      i += Character.charCount(cp)
    }
    h
  }
}

/** minhash_signature(hashes) → array<long>: NumPerms-permutation
  * MinHash signature from an array of 32-bit-ish element hashes.
  * Permutation p is h ↦ (a_p·h + b_p) mod M31 with M31 = 2^31−1
  * (products of two sub-2^31 values stay inside a long), (a_p, b_p)
  * generated deterministically from the fixed seed — every executor
  * derives identical permutations. One pass over the input per
  * signature: O(|shingles|·perms) with zero allocation beyond the
  * 64-long output.
  */
case class MinHashSignature(child: Expression, numPerms: Int, seed: Int)
    extends UnaryExpression {

  private val M31 = 2147483647L // 2^31 - 1, prime

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects array<long|int>, got $t")
  }

  @transient private[this] lazy val ab: (Array[Long], Array[Long]) =
    MinHashSignature.coeffs(numPerms, seed)

  private lazy val isInt = child.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  /** One pass over the element hashes; called per-row from BOTH the
    * interpreted path and the generated pipeline (reference object). */
  def compute(hs: ArrayData): ArrayData = {
    val (a, b) = ab
    val sig = Array.fill(numPerms)(M31)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val raw = if (isInt) hs.getInt(i).toLong else hs.getLong(i)
      val h = java.lang.Math.floorMod(raw, M31)
      var p = 0
      while (p < numPerms) {
        val v = (a(p) * h + b(p)) % M31
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  private val M31 = 2147483647L

  /** The permutation coefficients, exposed so the DuckDB oracle can
    * inline the IDENTICAL (a, b) constants as a VALUES table — the
    * seeded generation happens once here, not re-derived in SQL. */
  def coeffs(numPerms: Int, seed: Int): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val a = Array.fill(numPerms)(1L + (rnd.nextLong().abs % (M31 - 1)))
    val b = Array.fill(numPerms)(rnd.nextLong().abs % M31)
    (a, b)
  }
}

/** simhash64(tokens) → long: 64-bit SimHash over an array of string
  * tokens (Charikar). Each token is hashed to 64 bits with FNV-1a
  * folded over UNICODE CODE POINTS (not UTF-8 bytes) — pure
  * public-domain arithmetic, identical on every JVM, and exactly
  * mirrorable in the DuckDB oracle as a list_reduce over
  * unicode(char) with HUGEINT mod-2^64 wraparound (the oracle splits
  * per grapheme cluster, so the mirror is exact whenever no token
  * contains a multi-codepoint cluster — trivially true for the ASCII
  * corpus, asserted in DedupSpec). Bit j of the result is the sign of
  * the ±1 vote sum over tokens. Unigram multiset → order-invariant,
  * robust to permutation near-dups.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {

  private def fnv1aCp(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h ^= cp
      h *= 0x100000001b3L
      i += Character.charCount(cp)
    }
    h
  }

  /** Vote-and-sign over the token multiset — called from generated
    * code via the static forwarder. */
  def hash(toks: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val h = fnv1aCp(toks.getUTF8String(i).toString)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
