package graft

import org.apache.spark.sql.SparkSessionExtensions
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
      es => TopNgramFracExpr(es.head,
        es(1).eval().asInstanceOf[Int]))
  )

  override def apply(ext: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), info(name, usage), builder))
    }
}
