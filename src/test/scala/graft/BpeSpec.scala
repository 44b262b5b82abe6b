package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe
import graft.functions.expr.BpeExprs
import graft.functions.GraftFunctions.tokenize

/** BPE tokenizer: the Sennrich corpus learns the classic merge table;
  * encode/decode roundtrip exactly; the native merge fold equals its
  * HOF executable spec. */
class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // low×5, lower×2, newest×6, widest×3 — the textbook BPE corpus
  private val sennrich = Seq(
    "low low low low low",
    "lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest").toDF("text")

  test("train learns the classic Sennrich merge sequence, ties broken lexicographically") {
    val merges = Bpe.train(sennrich, "text", 5)
    // r1: (e,s)/(s,t)/(t,</w>) all count 9 — lexicographic tie-break
    assert(merges == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
    // early stop: an exhausted corpus stops before numMerges
    val tiny = Seq("ab ab").toDF("text")
    val m2 = Bpe.train(tiny, "text", 50)
    // "ab ab" = one distinct word, freq 2: merges until the word is one
    // symbol, then no pair has count >= 2
    assert(m2 == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("encode applies merges in order; unseen symbols pass through; decode inverts") {
    val merges = Bpe.train(sennrich, "text", 5)
    val enc = Seq((1L, "lowest"), (2L, "low low"), (3L, "xyz"), (4L, ""), (5L, "   "))
      .toDF("id", "text")
      .select(col("id"), Bpe.encode(col("text"), merges).as("pieces"))
    val got = enc.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("low", "est</w>"))      // the textbook encode
    assert(got(2L) == Seq("low", "</w>", "low", "</w>")) // (w,</w>) never learned
    assert(got(3L) == Seq("x", "y", "z", "</w>")) // unseen word: chars + EOW
    assert(got(4L) == Seq() && got(5L) == Seq())
    // decode(encode(x)) == canonical token stream, including case fold
    val round = Seq("Lowest NEWEST", "xyz  low", "", "  ").toDF("text")
      .select(col("text"),
        Bpe.decode(Bpe.encode(col("text"), merges)).as("dec"),
        concat_ws(" ", tokenize(col("text"))).as("canon"))
      .collect()
    round.foreach(r => assert(r.getString(1) == r.getString(2), r.getString(0)))
  }

  test("native merge fold equals the HOF executable spec, incl. overlap runs") {
    val cases = Seq(
      (Seq("a", "b", "c"), "a", "b"),
      (Seq("a", "a", "b"), "a", "b"),   // left-to-right: first a survives
      (Seq("a", "a", "a"), "a", "a"),   // non-overlapping: [aa, a]
      (Seq("x"), "a", "b"),
      (Seq[String](), "a", "b"))
    for ((syms, a, b) <- cases) {
      val df = Seq(Tuple1(syms)).toDF("syms")
      val native = df.select(BpeExprs.bpe_apply_merge(col("syms"), a, b))
        .head().getSeq[String](0)
      val hof = df.select(Bpe.applyMergeHof(col("syms"), a, b))
        .head().getSeq[String](0)
      assert(native == hof, s"($syms, $a, $b)")
    }
    // spot-check the known values too
    val one = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
      .select(BpeExprs.bpe_apply_merge(col("syms"), "a", "a"))
      .head().getSeq[String](0)
    assert(one == Seq("aa", "a"))
  }

  test("roundtrip holds corpus-wide on real documents") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.train(docs, "text", 20)
    assert(merges.length == 20)
    val bad = docs.select(
        Bpe.decode(Bpe.encode(col("text"), merges)).as("dec"),
        concat_ws(" ", tokenize(col("text"))).as("canon"))
      .filter(col("dec") =!= col("canon")).count()
    assert(bad == 0L)
  }
}
