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
}

/** `cosine_sim(a, b)` over array<float> or array<double>, codegen. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
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

object VectorExprs {
  import ColumnBridge.{toColumn, toExpr}
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSimExpr(toExpr(a), toExpr(b)))
}
