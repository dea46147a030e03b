package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** cosine_similarity(a, b) → double over array<float|double> vectors.
  *
  * Implemented with doGenCode (not a UDF, not CodegenFallback): the
  * ANN operators evaluate this once per (query, vector) pair — the
  * single hottest expression in the engine — so it stays inside
  * whole-stage codegen with a tight primitive loop over the unsafe
  * array data, no boxing, no row codecs.
  *
  * Accumulation is sequential (index order) in double precision,
  * matching DuckDB's list_cosine_similarity on DOUBLE[] for oracle
  * hash-equality. Zero-norm inputs yield 0.0.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float|double>, got (${left.dataType}, ${right.dataType})")
  }

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = get(a, i, ta); val y = get(b, i, tb)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String) = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = ${getter(elemType(left), a, i)};
         |  double y = ${getter(elemType(right), b, i)};
         |  $dot += x * y; $na += x * x; $nb += y * y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** dot_product(a, b) → double over array<float|double> vectors — the
  * raw inner product, the score function of MIPS retrieval (recall
  * that cosine deliberately destroys magnitude; recommender/retrieval
  * models trained with dot-product objectives need it kept). Same
  * codegen discipline as CosineSimilarity: primitive loop in
  * whole-stage codegen, index-order double accumulation so the DuckDB
  * mirror (list_dot_product on DOUBLE[]) agrees bit-for-bit at the
  * rounded precision the oracles compare. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double>, got (${left.dataType}, ${right.dataType})")
  }

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += get(a, i, ta) * get(b, i, tb)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String) = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getter(elemType(left), a, i)} * ${getter(elemType(right), b, i)};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** l2_distance(a, b) → double over array<float|double> vectors — the
  * Euclidean distance, the metric of L2-trained embedding spaces
  * (image models, most FAISS indexes' default). Completes the metric
  * family next to cosine (angle) and dot (MIPS): on unit-norm vectors
  * L2 order is cosine order, but on raw/de-normalized vectors the
  * three rankings genuinely differ (spec-pinned non-vacuous). Same
  * codegen discipline: primitive loop in whole-stage codegen,
  * index-order double accumulation of (x−y)², sqrt at the end — the
  * DuckDB mirror reproduces the identical left-fold so the rounded
  * values hash-match. */
case class L2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_distance"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_distance expects array<float|double>, got (${left.dataType}, ${right.dataType})")
  }

  private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = get(a, i, ta) - get(b, i, tb)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String) = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${getter(elemType(left), a, i)} - ${getter(elemType(right), b, i)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** hyperplane_lsh(vec, seed, bits) → int bucket: random-hyperplane
  * (sign-of-dot-product) LSH for cosine distance. The hyperplane
  * matrix is generated deterministically from (seed, dim) with
  * java.util.Random gaussians — every executor derives the identical
  * planes, nothing is shipped.
  */
case class HyperplaneLsh(child: Expression, seed: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_lsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_lsh expects array<float|double>, got $t")
  }

  @transient private[this] var planes: Array[Array[Double]] = _
  @transient private[this] var planesDim: Int = -1

  private def planesFor(dim: Int): Array[Array[Double]] = {
    if (planes == null || planesDim != dim) {
      planes = HyperplaneLsh.planesFor(seed, bits, dim)
      planesDim = dim
    }
    planes
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Sign-of-dot-product bucketing — called per-row from both the
    * interpreted path and the generated pipeline (reference object). */
  def bucket(v: ArrayData): Int = {
    val dim = v.numElements()
    val p = planesFor(dim)
    var bucket = 0
    var j = 0
    while (j < bits) {
      var dot = 0.0
      var i = 0
      while (i < dim) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        dot += x * p(j)(i)
        i += 1
      }
      if (dot >= 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def nullSafeEval(input: Any): Any =
    bucket(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lsh", this, classOf[HyperplaneLsh].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.bucket($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneLsh {
  /** The deterministic plane matrix, exposed so the DuckDB oracle can
    * inline the IDENTICAL plane components as literals (shortest
    * round-trip Double.toString → strtod re-reads the same double,
    * and the oracle's left-associated `+` chain reproduces the eval
    * loop's accumulation order — sign decisions match bit-for-bit). */
  def planesFor(seed: Int, bits: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed.toLong * 0x9E3779B9L + dim)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }
}

/** mmr_greedy(rels, vecs, k) → array<struct<r int, i int, sc bigint>>:
  * the Maximal-Marginal-Relevance greedy selection over a bounded
  * candidate pool — rels(i) the integer (ppm) relevance of candidate
  * i, vecs(i) its embedding, k the selection depth. The pairwise
  * similarity is floor(cosine·10⁶) with the EXACT accumulation of
  * CosineSimilarity (index-order dot/norms in double), so the DuckDB
  * mirror's floor(list_cosine_similarity(...)·10⁶) reproduces every
  * entry bit-for-bit. Step t picks argmax over unselected i of
  * rels(i) − max_{j∈selected} sim(i)(j) (0 when nothing is selected
  * yet, so the first pick is pure relevance); ties resolve to the
  * LOWEST index — array order is the (rel desc, vec_id) pool order,
  * mirrored by the oracle's ORDER BY sc DESC, pr.
  *
  * A native expression, NOT the equivalent aggregate/transform
  * lambda program: interpreted higher-order-function evaluation of
  * the nested fold measured ~90 ms PER EVALUATION (and the explode
  * above re-evaluates its generator per output row +
  * InferFiltersFromGenerate re-evaluates it in the inferred filter),
  * turning a 5-query re-rank into seconds at ANY corpus size; this
  * tight-loop eval (P² cosines + K·P·K greedy) is microseconds.
  * CodegenFallback is deliberate (the NextCronTimes argument): it
  * evaluates once per QUERY row — O(|queries|), never O(corpus) —
  * so whole-stage codegen has nothing to win.
  */
case class MmrGreedy(rels: Expression, vecs: Expression, k: Int)
    extends BinaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def left: Expression = rels
  override def right: Expression = vecs
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("r", IntegerType, nullable = false),
    StructField("i", IntegerType, nullable = false),
    StructField("sc", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "mmr_greedy"

  override def checkInputDataTypes(): TypeCheckResult = {
    val relsOk = rels.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    val vecsOk = vecs.dataType match {
      case ArrayType(ArrayType(FloatType | DoubleType, _), _) => true
      case _ => false
    }
    if (relsOk && vecsOk && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mmr_greedy expects (array<bigint>, array<array<float|double>>, k>0), got (${rels.dataType}, ${vecs.dataType}, $k)")
  }

  private def elemIsFloat: Boolean = vecs.dataType match {
    case ArrayType(ArrayType(FloatType, _), _) => true
    case _ => false
  }

  /** floor(10⁶ · cos) with CosineSimilarity's exact index-order
    * double accumulation — the oracle-parity contract. */
  private def simPpm(a: ArrayData, b: ArrayData, isFloat: Boolean): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val c = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    math.floor(c * 1000000.0).toLong
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val rel = l.asInstanceOf[ArrayData]
    val vs = r.asInstanceOf[ArrayData]
    // min of both lengths (the CosineSimilarity guard): a mismatched
    // public-SQL call degrades to the covered prefix, never an AIOOBE
    val n = math.min(rel.numElements(), vs.numElements())
    val kk = math.min(k, n)
    val isFloat = elemIsFloat
    val rows = Array.tabulate(n)(i => vs.getArray(i))
    val sim = Array.tabulate(n, n)((i, j) => simPpm(rows(i), rows(j), isFloat))
    val used = new Array[Boolean](n)
    val out = new Array[Any](kk)
    var t = 0
    while (t < kk) {
      var bi = -1
      var bs = 0L
      var i = 0
      while (i < n) {
        if (!used(i)) {
          var ms = 0L
          if (t > 0) {
            ms = Long.MinValue
            var j = 0
            while (j < n) {
              if (used(j)) { val s = sim(i)(j); if (s > ms) ms = s }
              j += 1
            }
          }
          val sc = rel.getLong(i) - ms
          // bi < 0 seeds the argmax with the first unselected
          // candidate, so degenerate scores (rel = Long.MinValue)
          // still pick SOMETHING instead of crashing on used(-1)
          if (bi < 0 || sc > bs) { bs = sc; bi = i }
        }
        i += 1
      }
      used(bi) = true
      out(t) = org.apache.spark.sql.catalyst.InternalRow(t + 1, bi, bs)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(rels = newLeft, vecs = newRight)
}
