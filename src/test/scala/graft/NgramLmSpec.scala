package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NgramLm

/** Bigram-LM contracts: hand-computed Laplace probabilities, both
  * unseen fallbacks (bigram and context), short-doc exclusion, and
  * minCount pruning. The gate queries (qX_lm_model, qX_lm_score) pin
  * the full held-out path against DuckDB.
  */
class NgramLmSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // model corpus: "a b a b" + "b c" →
  //   cnt(a,b)=2  cnt(b,a)=1  cnt(b,c)=1
  //   ctxTot: a=2, b=2;  V = |{a,b,c}| = 3
  private def ref = Seq((1L, "a b a b"), (2L, "b c")).toDF("doc_id", "text")

  test("train counts non-distinct bigrams; minCount prunes the tail") {
    val m = NgramLm.train(ref, "text")
      .as[(String, String, Long)].collect().toSet
    assert(m == Set(("a", "b", 2L), ("b", "a", 1L), ("b", "c", 1L)))
    val pruned = NgramLm.train(ref, "text", minCount = 2)
      .as[(String, String, Long)].collect().toSet
    assert(pruned == Set(("a", "b", 2L)))
  }

  test("score: hand-computed Laplace log-probs, unseen-bigram and unseen-context fallbacks") {
    val model = NgramLm.train(ref, "text")
    // "a b c d": (a,b) seen 2/5; (b,c) seen 2/5·(1+1)/(2+3); (c,d)
    // unseen CONTEXT → 1/(0+3). "a a": unseen BIGRAM, seen context →
    // 1/(2+3). "x": one token → absent from output.
    val docs = Seq((10L, "a b c d"), (11L, "a a"), (12L, "x"))
      .toDF("doc_id", "text")
    val got = NgramLm.score(docs, "doc_id", "text", model)
      .select(col("doc_id"), col("n_bigrams"), col("lp_micros"), col("ppl_milli"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(!got.contains(12L), "a 1-token doc has no bigrams")

    def micros(p: Double): Long = math.round(math.log(p) * 1e6)
    val lp10 = micros(3.0 / 5) + micros(2.0 / 5) + micros(1.0 / 3)
    assert(got(10L)._2 == 3 && got(10L)._3 == lp10)
    assert(got(10L)._4 ==
      math.round(math.exp(-(lp10.toDouble / 1e6) / 3) * 1000))
    val lp11 = micros(1.0 / 5)
    assert(got(11L)._2 == 1 && got(11L)._3 == lp11)
  }

  test("scoreKneserNey: hand-computed discount, continuation and unseen-context branches") {
    val model = NgramLm.train(ref, "text")
    // stats from ref: ctxTot a=2 b=2; ctxTypes a=1 b=2;
    // contTypes a=1 b=1 c=1; T=3 bigram types; V=3 → T+V=6
    def pcont(cont: Long): Double = (cont + 1).toDouble / 6
    def micros(p: Double): Long = math.round(math.log(p) * 1e6)
    // "a b c d": (a,b) seen: (2−.75)/2 + .75·1/2·pcont(b);
    // (b,c) seen: (1−.75)/2 + .75·2/2·pcont(c); (c,d) unseen ctx →
    // pcont(d) with cont=0. "a a": unseen bigram, seen ctx a.
    val docs = Seq((10L, "a b c d"), (11L, "a a")).toDF("doc_id", "text")
    val got = NgramLm.scoreKneserNey(docs, "doc_id", "text", model)
      .select(col("doc_id"), col("n_bigrams"), col("lp_micros"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val lp10 = micros((2 - 0.75) / 2 + 0.75 * 1 / 2 * pcont(1)) +
      micros((1 - 0.75) / 2 + 0.75 * 2 / 2 * pcont(1)) +
      micros(pcont(0))
    assert(got(10L)._2 == 3 && got(10L)._3 == lp10)
    val lp11 = micros(0.0 / 2 + 0.75 * 1 / 2 * pcont(1))
    assert(got(11L)._2 == 1 && got(11L)._3 == lp11)
  }

  test("scoreKneserNey: fluent beats shuffled, same as Laplace") {
    val sent = "the quick brown fox jumps over the lazy dog"
    val refDocs = (0 until 5).map(i => (i.toLong, sent)).toDF("doc_id", "text")
    val model = NgramLm.train(refDocs, "text")
    val probe = Seq((100L, sent), (101L, sent.split(" ").reverse.mkString(" ")))
      .toDF("doc_id", "text")
    val ppl = NgramLm.scoreKneserNey(probe, "doc_id", "text", model)
      .select(col("doc_id"), col("ppl_milli")).as[(Long, Long)].collect().toMap
    assert(ppl(100L) < ppl(101L))
  }

  test("fluent text scores lower perplexity than shuffled garbage under its own model") {
    // reference = repetitions of one sentence; a held-out doc in the
    // same word order must out-score the reversed word salad
    val sent = "the quick brown fox jumps over the lazy dog"
    val refDocs = (0 until 5).map(i => (i.toLong, sent)).toDF("doc_id", "text")
    val model = NgramLm.train(refDocs, "text")
    val probe = Seq((100L, sent), (101L, sent.split(" ").reverse.mkString(" ")))
      .toDF("doc_id", "text")
    val ppl = NgramLm.score(probe, "doc_id", "text", model)
      .select(col("doc_id"), col("ppl_milli")).as[(Long, Long)].collect().toMap
    assert(ppl(100L) < ppl(101L),
      s"fluent ${ppl(100L)} must beat shuffled ${ppl(101L)}")
  }
}
