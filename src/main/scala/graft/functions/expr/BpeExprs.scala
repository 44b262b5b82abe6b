package graft.functions.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the BPE tokenizer hot paths
  * (see [[graft.operators.Bpe]]).
  *
  * Both are per-row sequential folds — the shape that higher-order
  * functions cannot codegen and that nested `aggregate(...)` trees
  * (one fold PER LEARNED MERGE, so vocab-size-deep expression nesting
  * for encode) would make unanalyzable. [[graft.operators.Bpe
  * .applyMergeHof]] is the retained HOF executable spec for the
  * single-merge fold, equality-locked in BpeSpec.
  *
  * Both expressions carry their (tiny, driver-known) merge constants
  * via `ctx.addReferenceObj`, so they stay inside WholeStageCodegen —
  * no escaping of corpus-derived symbols into generated Java source.
  */
object BpeUtil {

  /** One BPE merge pass: replace adjacent (a, b) symbol pairs with the
    * fused symbol a+b, left-to-right, non-overlapping (after [a,a,b]
    * with pair (a,b) the FIRST a survives: [a, ab]). */
  def applyMerge(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && arr.getUTF8String(i) == a && arr.getUTF8String(i + 1) == b) {
        out.add(UTF8String.concat(a, b)); i += 2
      } else {
        out.add(arr.getUTF8String(i)); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Full BPE encode of a text: lowercase (UTF8String.toLowerCase —
    * the same code path as Spark's `lower`), walk whitespace words
    * (TextExprUtil.isWs = Java regex `\s`, tokenize parity), start
    * each word as its code-point symbols plus the trailing
    * [[graft.operators.Bpe.EOW]] marker, then apply every learned
    * merge IN LEARNED ORDER with the [[applyMerge]] fold. Pieces of
    * all words concatenate into one output array — decode is a pure
    * string concat + EOW→space, so decode(encode(x)) is exactly the
    * canonical token stream of x. */
  def encode(text: UTF8String, merges: Array[Array[String]]): ArrayData = {
    val str = text.toLowerCase.toString
    val pieces = new java.util.ArrayList[UTF8String]()
    val len = str.length
    var i = 0
    while (i < len) {
      while (i < len && TextExprUtil.isWs(str.charAt(i))) i += 1
      val start = i
      while (i < len && !TextExprUtil.isWs(str.charAt(i))) i += 1
      if (i > start) {
        val word = str.substring(start, i)
        var syms = new java.util.ArrayList[String]()
        var j = 0
        while (j < word.length) {
          val cp = word.codePointAt(j)
          syms.add(new String(Character.toChars(cp)))
          j += Character.charCount(cp)
        }
        syms.add(graft.operators.Bpe.EOW)
        var m = 0
        while (m < merges.length) {
          val a = merges(m)(0); val b = merges(m)(1)
          val next = new java.util.ArrayList[String](syms.size)
          var k = 0
          while (k < syms.size) {
            if (k + 1 < syms.size && syms.get(k) == a && syms.get(k + 1) == b) {
              next.add(a + b); k += 2
            } else {
              next.add(syms.get(k)); k += 1
            }
          }
          syms = next
          m += 1
        }
        var p = 0
        while (p < syms.size) { pieces.add(UTF8String.fromString(syms.get(p))); p += 1 }
      }
    }
    new GenericArrayData(pieces.toArray)
  }
}

/** `bpe_apply_merge(syms, a, b)`: one merge round over a symbol array
  * — the per-round workhorse of [[graft.operators.Bpe.train]]. */
case class BpeApplyMergeExpr(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    BpeUtil.applyMerge(v.asInstanceOf[ArrayData],
      UTF8String.fromString(a), UTF8String.fromString(b))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("bpeA", UTF8String.fromString(a),
      "org.apache.spark.unsafe.types.UTF8String")
    val bRef = ctx.addReferenceObj("bpeB", UTF8String.fromString(b),
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.BpeUtil.applyMerge($c, $aRef, $bRef)")
  }
  override protected def withNewChildInternal(c: Expression): BpeApplyMergeExpr =
    copy(child = c)
}

/** `bpe_encode(text, merges)`: whole-document BPE encode with the
  * learned merge table as a codegen reference object. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  private lazy val mergesArr: Array[Array[String]] =
    merges.map(m => Array(m._1, m._2)).toArray
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    BpeUtil.encode(v.asInstanceOf[UTF8String], mergesArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergesArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expr.BpeUtil.encode($c, $mRef)")
  }
  override protected def withNewChildInternal(c: Expression): BpeEncodeExpr =
    copy(child = c)
}

object BpeExprs {
  import ColumnBridge.{toColumn, toExpr}

  def bpe_apply_merge(syms: Column, a: String, b: String): Column =
    toColumn(BpeApplyMergeExpr(toExpr(syms), a, b))

  def bpe_encode(text: Column, merges: Seq[(String, String)]): Column =
    toColumn(BpeEncodeExpr(toExpr(text), merges))
}
