package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector math for the similarity/ANN hot paths.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is CodegenFallback: every cosine evaluates ~3·dim interpreted
  * lambdas with boxing. At |corpus|·|queries| pair counts that is the
  * dominant cost of every ANN operator. This expression computes the
  * identical sequential fold (same double-accumulation order:
  * dot / (sqrt(Σa²)·sqrt(Σb²)), left-to-right) in one primitive loop
  * with `doGenCode`, so results are bit-equal to the HOF version —
  * locked by VectorExprSpec and the DuckDB `list_cosine_similarity`
  * oracle (qX_ann_cosine).
  */
object VectorExprUtil {
  /** Null contract mirrors the HOF fold: unequal lengths (zip_with
    * pads with null) or any null element poison the result. */
  def cosineOrNull(a: ArrayData, b: ArrayData, isFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (isFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      sa += x * x
      sb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(sa) * math.sqrt(sb)))
  }

  /** m-bit sign-LSH signature — native twin of
    * `Similarity.randomHyperplaneLsh` (equivalence locked in
    * VectorExprSpec). Plane components are the same md5-derived
    * pseudo-randoms as the Column formulation:
    * md5_32("hp:p:d") mod 2^20 over 2^20 − 0.5 (dyadic: exact in both
    * float and double, and recomputable from md5() by the DuckDB
    * oracle); bit p = sign of the sequential-fold dot product
    * (identical accumulation order → identical sign at the boundary).
    * The m×dim plane table is computed once per (m, dim) and cached —
    * the per-row work is just the dot products. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  def signLshPlanes(m: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((m, dim), { case (mm, nn) =>
      Array.tabulate(mm, nn) { (p, d) =>
        (PortableHash.md5_32("hp:" + p + ":" + d) % 1048576L).toDouble / 1048576.0 - 0.5
      }
    })

  def signLsh(v: ArrayData, m: Int, isFloat: Boolean): Long = {
    val n = v.numElements()
    val planes = signLshPlanes(m, n)
    var sig = 0L
    var p = 0
    while (p < m) {
      val plane = planes(p)
      var proj = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) v.getFloat(d).toDouble else v.getDouble(d)
        proj += x * plane(d)
        d += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Packed sign bits (binary quantization): bit `i & 63` of word
    * `i >> 6` set iff `v(i) >= 0`. Null elements poison the result
    * (the HOF-twin contract). */
  def signPackOrNull(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long]((n + 63) >>> 6)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (x >= 0) out(i >>> 6) |= (1L << (i & 63))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Hilbert curve index of a non-negative (x, y) pair over a
    * 2^bits × 2^bits grid — the classic xy2d bit transform (per level:
    * quadrant digit `(3·rx) xor ry`, then the masked rotate/flip of
    * the sub-square). Kept in the masked form (low bits only survive
    * each level), which is arithmetically identical to the textbook
    * all-ones-complement form and is what the unrolled SQL oracle
    * replays level by level. Inputs are masked to `bits` low bits. */
  def hilbertIndex(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      val xm = x & (s - 1)
      val ym = y & (s - 1)
      if (ry == 0L) {
        if (rx == 1L) { x = (s - 1) - ym; y = (s - 1) - xm }
        else { x = ym; y = xm }
      } else { x = xm; y = ym }
      i -= 1
    }
    d
  }

  /** Hamming distance of two packed bit codes (array<long>): Σ
    * popcount(a⊕b). Length mismatch or null word poisons. */
  def hammingOrNull(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var h = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      h += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  /** k-row basis × centered vector. Null contract mirrors the HOF
    * fold: a basis-width/vector-length mismatch or any null element
    * poisons the result. Accumulation is left-to-right per component,
    * identical to `aggregate(zip_with(...))`. */
  def matVecOrNull(v: ArrayData, basis: Array[Array[Double]],
                   mean: Array[Double], isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    if (basis.length > 0 && basis(0).length != n) return null
    if (mean.length != n) return null
    val out = new Array[Double](basis.length)
    var r = 0
    while (r < basis.length) {
      val row = basis(r)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += row(i) * (x - mean(i))
        i += 1
      }
      out(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `mat_vec(vec)`: project a (mean-centered) vector onto a constant
  * k×d basis — the PCA-projection hot path. The HOF twin
  * ([[graft.operators.Pca.projectHof]]) evaluates k·d interpreted
  * lambdas per row; this is one primitive loop, bit-equal by the same
  * left-to-right accumulation order (locked in PcaSpec). The basis and
  * mean ship to executors via `addReferenceObj` (the BpeExprs
  * pattern), not serialized per-row codegen literals. */
case class MatVecExpr(child: Expression, basis: Array[Array[Double]],
                      mean: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"mat_vec requires array<float> or array<double>, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    VectorExprUtil.matVecOrNull(v.asInstanceOf[ArrayData], basis, mean, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val basisRef = ctx.addReferenceObj("matVecBasis", basis,
      "double[][]")
    val meanRef = ctx.addReferenceObj("matVecMean", mean, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.expr.VectorExprUtil.matVecOrNull(
         |    $v, $basisRef, $meanRef, $isFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildInternal(c: Expression): MatVecExpr =
    copy(child = c)
}

/** `sign_lsh(vec, m)`: m-bit random-hyperplane signature, codegen. */
case class SignLshExpr(child: Expression, m: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sign_lsh requires array<float> or array<double>, got ${t.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    VectorExprUtil.signLsh(v.asInstanceOf[ArrayData], m, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.VectorExprUtil.signLsh($c, $m, $isFloat)")
  override protected def withNewChildInternal(c: Expression): SignLshExpr =
    copy(child = c)
}

/** `cosine_sim(a, b)` over array<float> or array<double>, codegen. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  // both sides must be the SAME float/double array type: the kernel
  // reads raw 4- or 8-byte elements, so a float/double mix (which the
  // HOF formulation casts element-wise) must be rejected at analysis
  // time, not silently misread
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) |
           (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires two array<float> or two array<double> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprUtil.cosineOrNull(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r =
         |  graft.functions.expr.VectorExprUtil.cosineOrNull($a, $b, $isFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.doubleValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CosineSimExpr = copy(left = l, right = r)
}

/** `sign_pack(vec)`: packed sign-bit code (binary quantization),
  * codegen — the 32× compression stage of the BQ two-stage ANN; the
  * probe-side cost drops to one XOR+popcount per word
  * ([[HammingDistExpr]]). HOF twin: `Similarity.signPackHof`
  * (equivalence locked in VectorExprSpec). */
case class SignPackExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sign_pack requires array<float> or array<double>, got ${t.sql}")
    }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    VectorExprUtil.signPackOrNull(v.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value}_r =
         |  graft.functions.expr.VectorExprUtil.signPackOrNull($v, $isFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r;
         |}
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): SignPackExpr =
    copy(child = c)
}

/** `hamming_dist(a, b)` over two packed codes (array<long>), codegen
  * — the BQ stage-1 scan kernel. */
case class HammingDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming_dist requires two array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprUtil.hammingOrNull(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r =
         |  graft.functions.expr.VectorExprUtil.hammingOrNull($a, $b);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HammingDistExpr = copy(left = l, right = r)
}

/** Codegen Hilbert index of two long columns over a 2^bits grid —
  * [[VectorExprUtil.hilbertIndex]] as a null-intolerant binary
  * expression (the [[HammingDistExpr]] shape). */
case class HilbertKeyExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.LongType,
            org.apache.spark.sql.types.LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hilbert_key requires two bigint inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprUtil.hilbertIndex(a.asInstanceOf[Long], b.asInstanceOf[Long],
      bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expr.VectorExprUtil" +
        s".hilbertIndex($a, $b, $bits);")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertKeyExpr = copy(left = l, right = r)
}

/** Native PQ kernels — the product-quantization hot paths.
  *
  * The Column formulation embedded the codebook as `typedLit` arrays
  * inside `aggregate(zip_with(…))` HOFs: CodegenFallback per row AND
  * an O(m·ksub·subDim)-node expression tree per plan — measured ~1 MB
  * task binaries and a fresh janino compile per Lloyd round on the
  * qX_opq/qX_pq gates, with analysis/planning time to match. These
  * expressions ship the codebook via `addReferenceObj` (the
  * [[MatVecExpr]] pattern): one plan node, stable generated source
  * (codegen cache hits across rounds/gates), one primitive loop per
  * row. Semantics are locked to the HOF twins (kept in
  * [[graft.operators.Pq]], equivalence-tested in PqSpec):
  *  - distances round HALF_UP to 6 decimals exactly like
  *    `round(aggregate(zip_with(...)), 6)` (BigDecimal.valueOf path,
  *    NaN/Infinity passed through like Spark's Round);
  *  - argmin ties break to the LOWEST cid (`array_position` of
  *    `array_min` = first index of the ordering minimum —
  *    Double.compare ordering, NaN greatest);
  *  - a short slice (vector length < (s+1)·subDim) or a null element
  *    poisons that subspace's code / lut entry to NULL, exactly as
  *    zip_with's null padding poisoned the HOF fold.
  */
object PqExprUtil {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** First-min argmin code of v[start, start+subDim) against `cents`,
    * or null (short slice / null element). */
  def pqNearestAt(v: ArrayData, start: Int, cents: Array[Array[Float]],
                  isFloat: Boolean): java.lang.Integer = {
    val subDim = cents(0).length
    if (start + subDim > v.numElements() || start < 0) return null
    var i = 0
    while (i < subDim) {
      if (v.isNullAt(start + i)) return null
      i += 1
    }
    var best = -1
    var bestD = 0.0
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      var acc = 0.0
      var k = 0
      while (k < subDim) {
        val x = if (isFloat) v.getFloat(start + k).toDouble
                else v.getDouble(start + k)
        val d = x - c(k).toDouble
        acc += d * d
        k += 1
      }
      val dist = round6(acc)
      if (best < 0 || java.lang.Double.compare(dist, bestD) < 0) {
        best = j; bestD = dist
      }
      j += 1
    }
    java.lang.Integer.valueOf(best)
  }

  /** dot(v[start, start+|c|), c) in the HOF's left-to-right double
    * fold, or null (short slice / null element). */
  def pqDotAt(v: ArrayData, start: Int, c: Array[Float],
              isFloat: Boolean): java.lang.Double = {
    if (start + c.length > v.numElements() || start < 0) return null
    var acc = 0.0
    var k = 0
    while (k < c.length) {
      if (v.isNullAt(start + k)) return null
      val x = if (isFloat) v.getFloat(start + k).toDouble
              else v.getDouble(start + k)
      acc += x * c(k).toDouble
      k += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** (codes, cnorm2) of one vector — cnorm2 = Σ_s ‖c_{s,code_s}‖²
    * (null when any code is null, mirroring element_at(null)+x). */
  def pqEncode(v: ArrayData, cb: Array[Array[Array[Float]]],
               norms: Array[Array[Double]], isFloat: Boolean): InternalRow = {
    val m = cb.length
    val subDim = cb(0)(0).length
    val codes = new Array[Any](m)
    var anyNull = false
    var s = 0
    while (s < m) {
      val code = pqNearestAt(v, s * subDim, cb(s), isFloat)
      if (code == null) { anyNull = true; codes(s) = null }
      else codes(s) = code.intValue
      s += 1
    }
    val cnorm2: Any = if (anyNull) null else {
      var acc = 0.0
      var t = 0
      while (t < m) { acc += norms(t)(codes(t).asInstanceOf[Int]); t += 1 }
      acc
    }
    InternalRow(new GenericArrayData(codes), cnorm2)
  }

  /** lut[s][j] = dot(q_s, codebook[s][j]) — the per-query ADC table. */
  def pqLut(q: ArrayData, cb: Array[Array[Array[Float]]],
            isFloat: Boolean): ArrayData = {
    val subDim = cb(0)(0).length
    val outer = new Array[Any](cb.length)
    var s = 0
    while (s < cb.length) {
      val cents = cb(s)
      val inner = new Array[Any](cents.length)
      var j = 0
      while (j < cents.length) {
        inner(j) = pqDotAt(q, s * subDim, cents(j), isFloat)
        j += 1
      }
      outer(s) = new GenericArrayData(inner)
      s += 1
    }
    new GenericArrayData(outer)
  }
}

/** `pq_encode(vec)` → struct(codes array<int>, cnorm2 double). */
case class PqEncodeExpr(child: Expression, cb: Array[Array[Array[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val norms: Array[Array[Double]] =
    cb.map(_.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i).toDouble * c(i); i += 1 }
      s
    })
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_encode requires array<float> or array<double>, got ${t.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("codes",
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = true)),
    org.apache.spark.sql.types.StructField("cnorm2", DoubleType)))
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    PqExprUtil.pqEncode(v.asInstanceOf[ArrayData], cb, norms, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "float[][][]")
    val nRef = ctx.addReferenceObj("pqNorms", norms, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.expr.PqExprUtil.pqEncode($v, $cbRef, $nRef, $isFloat);")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** `pq_nearest_by_sub(sub, sv)` — the Lloyd-round assignment code of
  * one posexploded subspace row; out-of-range sub → null (the
  * when-chain-without-otherwise contract). */
case class PqNearestBySubExpr(left: Expression, right: Expression,
                              cb: Array[Array[Array[Float]]])
    extends BinaryExpression {
  private def isFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.IntegerType,
            ArrayType(FloatType, _) | ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_nearest_by_sub requires (int, array<float|double>), got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(sub: Any, sv: Any): Any = {
    val s = sub.asInstanceOf[Int]
    if (s < 0 || s >= cb.length) null
    else PqExprUtil.pqNearestAt(sv.asInstanceOf[ArrayData], 0, cb(s), isFloat)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, (s, v) => {
      s"""
         |java.lang.Integer ${ev.value}_r = ($s < 0 || $s >= $cbRef.length)
         |  ? null
         |  : graft.functions.expr.PqExprUtil.pqNearestAt($v, 0, $cbRef[$s], $isFloat);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.intValue();
         |}
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqNearestBySubExpr = copy(left = l, right = r)
}

/** `pq_lut(qvec)` → array<array<double>> ADC lookup table. */
case class PqLutExpr(child: Expression, cb: Array[Array[Array[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pq_lut requires array<float> or array<double>, got ${t.sql}")
    }
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = true), containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    PqExprUtil.pqLut(v.asInstanceOf[ArrayData], cb, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.expr.PqExprUtil.pqLut($v, $cbRef, $isFloat);")
  }
  override protected def withNewChildInternal(c: Expression): PqLutExpr =
    copy(child = c)
}

object VectorExprs {
  import ColumnBridge.{toColumn, toExpr}
  def pq_encode(v: Column, cb: Array[Array[Array[Float]]]): Column =
    toColumn(PqEncodeExpr(toExpr(v), cb))
  def pq_nearest_by_sub(sub: Column, sv: Column,
                        cb: Array[Array[Array[Float]]]): Column =
    toColumn(PqNearestBySubExpr(toExpr(sub), toExpr(sv), cb))
  def pq_lut(q: Column, cb: Array[Array[Array[Float]]]): Column =
    toColumn(PqLutExpr(toExpr(q), cb))
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(toExpr(a), toExpr(b)))
  def sign_pack(v: Column): Column =
    toColumn(SignPackExpr(toExpr(v)))
  def hamming_dist(a: Column, b: Column): Column =
    toColumn(HammingDistExpr(toExpr(a), toExpr(b)))
  def sign_lsh(v: Column, m: Int): Column =
    toColumn(SignLshExpr(toExpr(v), m))
  def mat_vec(v: Column, basis: Array[Array[Double]],
              mean: Array[Double]): Column =
    toColumn(MatVecExpr(toExpr(v), basis, mean))
  def hilbert_key(a: Column, b: Column, bits: Int): Column =
    toColumn(HilbertKeyExpr(toExpr(a), toExpr(b), bits))
}
