package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dsir

/** DSIR contracts: feature accounting (unigrams + bigrams), weight
  * direction (target-like text up, raw-like down), empty-doc
  * exclusion, and Gumbel top-k determinism. The qX_dsir_* gates pin
  * the hashed-bucket arithmetic against DuckDB end-to-end.
  */
class DsirSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("fitFeatures counts one instance per unigram and bigram") {
    val docs = Seq((1L, "a b c"), (2L, "d")).toDF("doc_id", "text")
    // "a b c" → 3 unigrams + 2 bigrams; "d" → 1 unigram, no bigram arm
    val total = Dsir.fitFeatures(docs, "text", 64)
      .agg(sum(col("cnt"))).head.getLong(0)
    assert(total == 6)
  }

  test("weights separate target-like from raw-like documents") {
    val target = (0 until 20).map(i => (i.toLong, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val raw = (0 until 20).map(i => (i.toLong, "xz qq vv kk ww yy"))
      .toDF("doc_id", "text")
    val t = Dsir.fitFeatures(target, "text", 256)
    val r = Dsir.fitFeatures(raw, "text", 256)
    val probe = Seq((100L, "the cat sat"), (101L, "xz qq vv"), (102L, ""))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(probe, "doc_id", "text", t, r, 256)
      .select(col("doc_id"), col("w_micros")).as[(Long, Long)].collect().toMap
    assert(w(100L) > 0, s"target-like doc must weigh positive, got ${w(100L)}")
    assert(w(101L) < 0, s"raw-like doc must weigh negative, got ${w(101L)}")
    assert(!w.contains(102L), "empty doc has no features")
  }

  test("native word_ngrams features ≡ the HOF spec, per document") {
    // the codegen path behind instances() vs the built-in-only twin:
    // same multiset, same order (unigrams then bigrams, doc order)
    val texts = Seq("the cat sat on the mat", "one", "", "  padded   runs\tand\nlines  ",
      "UPPER Case MiX", "a a a a", "hyphen-ated punct, stays.")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    import graft.functions.expr.TextExprs.word_ngrams
    val native = df.select(col("doc_id"),
      concat(word_ngrams(col("text"), 1), word_ngrams(col("text"), 2)).as("f"))
    val hof = df.select(col("doc_id"), Dsir.featuresHof(col("text")).as("f"))
    assert(native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      == hof.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap)
  }

  test("gumbelTopK: deterministic, k-bounded, keys strictly ranked") {
    val w = (0 until 30).map(i => (i.toLong, (i * 1000L) - 15000L))
      .toDF("doc_id", "w_micros")
    val a = Dsir.gumbelTopK(w, "doc_id", 10)
      .orderBy(desc("key_micros"), col("doc_id"))
      .as[(Long, Long)].collect()
    val b = Dsir.gumbelTopK(w, "doc_id", 10)
      .orderBy(desc("key_micros"), col("doc_id"))
      .as[(Long, Long)].collect()
    assert(a.sameElements(b), "hash-derived Gumbel noise must replay")
    assert(a.length == 10)
    assert(a.map(_._2).toSeq == a.map(_._2).sortBy(-_).toSeq)
    // k >= rows returns everything
    assert(Dsir.gumbelTopK(w, "doc_id", 100).count() == 30)
  }
}
