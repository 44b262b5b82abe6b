package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The config-driven extension packaging must give a PLAIN SQL session
  * the graft functions with no programmatic registration — the way a
  * cluster admin deploys the library (spark.sql.extensions). Uses its
  * own SparkSession (extensions bind at session build time).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions resolves the native functions in SQL") {
    // other suites share a default session WITHOUT the extension —
    // getOrCreate would return it and bypass extension injection. Park
    // the default, build an isolated session, restore afterwards.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT token_count('a b  c') AS t,
          |       subword_count('don''t-stop_2024') AS s,
          |       simhash64('hello world') AS h,
          |       top_ngram_frac('a b a b a', 2) AS f""".stripMargin)
        .collect().head
      assert(r.getInt(0) == 3)
      assert(r.getInt(1) == 4)
      assert(r.getDouble(3) == 0.5)
      // same value the Column API computes — one registry, one semantics
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val direct = Seq("hello world").toDF("x")
        .select(graft.functions.expr.TextExprs.simhash64(col("x")))
        .collect().head.getLong(0)
      assert(r.getLong(2) == direct)

      // n is a construction-time parameter: a BIGINT literal is fine,
      // but a column reference / wrong type / wrong arity must fail as
      // a clear AnalysisException at plan time, not a ClassCastException
      assert(spark.sql(
          "SELECT top_ngram_frac('a b a b a', CAST(2 AS BIGINT)) AS f")
        .collect().head.getDouble(0) == 0.5)
      import org.apache.spark.sql.AnalysisException
      val nonFoldable = intercept[AnalysisException] {
        spark.sql("SELECT top_ngram_frac(x, token_count(x)) FROM VALUES ('a') t(x)")
      }
      assert(nonFoldable.getCondition == "NON_FOLDABLE_ARGUMENT")
      val notInt = intercept[AnalysisException] {
        spark.sql("SELECT top_ngram_frac('a b', 'two')")
      }
      assert(notInt.getCondition == "SECOND_FUNCTION_ARGUMENT_NOT_INTEGER")
      val arity = intercept[AnalysisException] {
        spark.sql("SELECT top_ngram_frac('a b')")
      }
      assert(arity.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
    } finally {
      // do NOT spark.stop(): the SparkContext is shared process-wide
      // with the other suites' session — just restore the default
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
