package graft

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.expr._

/** Library packaging as a Spark extension: makes every graft native
  * expression available to PLAIN SQL users on any session started with
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (the standard extension-library deployment — no code changes in the
  * user's job, the functions resolve like built-ins). The same set is
  * injectable programmatically via [[TextExprs.register]]; this class
  * is the config-driven twin the cluster admin can set once.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.expr", null, name, usage,
      "", "", "", "", "4.0.0", "", "java_udf")

  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("token_count", "whitespace token count, single scan",
      es => TokenCountExpr(es.head)),
    ("subword_count", "maximal [a-z0-9]+ run count",
      es => SubwordCountExpr(es.head)),
    ("rolling_hash", "Karp-Rabin document fingerprint",
      es => RollingHashExpr(es.head)),
    ("simhash64", "64-bit SimHash over whitespace tokens",
      es => SimHash64Expr(es.head)),
    ("top_ngram_frac", "share of the most frequent word n-gram: (text, n)",
      es => TopNgramFracExpr(es.head, ngramArg(es)))
  )

  /** `n` must be an integer literal — TopNgramFracExpr fixes its n-gram
    * width at construction. Validate arity, foldability and type here
    * so `top_ngram_frac(text, some_col)` or a BIGINT literal fails as a
    * proper AnalysisException at plan time (Spark's own error
    * conditions), not an opaque ClassCastException/NPE mid-build. */
  private def ngramArg(es: Seq[Expression]): Int = {
    if (es.length != 2)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> "`top_ngram_frac`", "expectedNum" -> "2",
        "actualNum" -> es.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"), None)
    if (!es(1).foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> "`top_ngram_frac`", "paramName" -> "`n`",
        "paramType" -> "\"INT\""), None)
    es(1).eval() match {
      // any integral literal works (TINYINT..BIGINT; an n-gram width
      // never approaches 2^31, so intValue is exact for valid inputs)
      case n: java.lang.Integer if n > 0 => n.intValue
      case n: java.lang.Long if n > 0 && n == n.intValue => n.intValue
      case n: java.lang.Short if n > 0 => n.intValue
      case n: java.lang.Byte if n > 0 => n.intValue
      case _ =>
        throw new AnalysisException("SECOND_FUNCTION_ARGUMENT_NOT_INTEGER",
          Map("functionName" -> "top_ngram_frac"), None)
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), info(name, usage), builder))
    }
}
