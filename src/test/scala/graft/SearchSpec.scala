package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search

/** TF-IDF search semantics (SURVEY §2.G, §7.3): boost dominance,
  * non-scoring owner filter, is_alive guard, input validation.
  */
class SearchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  val docs = Seq(
    ("d1", "edy", 1, "Edy Kim", "aws", "Solutions Architect", "Seoul"),
    ("d2", "poby", 1, "Poby Kim", "aws", "Manager Kim", "Busan"),
    ("d3", "poby", 1, "Harry Jang", "kim industries", "Engineer", "Seoul"),
    ("d4", "edy", 0, "Kim Deleted", "aws", "Architect", "Seoul")
  ).toDF("doc_id", "owner", "is_alive", "name", "company", "job_title", "addr")

  val Fields = Seq("name" -> 3.0, "company" -> 1.0, "job_title" -> 1.0, "addr" -> 1.0)

  test("name boost dominates: a name hit outranks a company/title hit") {
    val hits = Search.search(docs, "doc_id", Fields, "kim", 10,
      aliveCol = Some("is_alive")).collect()
    val order = hits.map(_.getAs[String]("doc_id")).toSeq
    // d2 matches name(1) + job_title(1); d1 matches name only; d3 company only
    assert(order.head == "d2")
    assert(order.indexOf("d1") < order.indexOf("d3"), "name hit beats company hit")
  }

  test("soft-deleted docs (is_alive=0) are never returned") {
    val hits = Search.search(docs, "doc_id", Fields, "kim", 10,
      aliveCol = Some("is_alive")).collect()
    assert(!hits.map(_.getAs[String]("doc_id")).contains("d4"))
  }

  test("owner term filter is exact and non-scoring") {
    val hits = Search.search(docs, "doc_id", Fields, "kim", 10,
      ownerFilter = Some("owner" -> "poby"), aliveCol = Some("is_alive"))
      .collect().map(_.getAs[String]("doc_id")).toSet
    assert(hits == Set("d2", "d3"))
  }

  test("owner-only query (no text) returns the filter set") {
    val hits = Search.search(docs, "doc_id", Fields, "", 10,
      ownerFilter = Some("owner" -> "edy")).collect()
    assert(hits.map(_.getAs[String]("doc_id")).toSet == Set("d1", "d4"))
  }

  test("empty query AND no filter is rejected (es_search_bizcard.py:75)") {
    intercept[IllegalArgumentException] {
      Search.search(docs, "doc_id", Fields, "  ", 10)
    }
  }

  test("limit produces top-k by score desc with id tiebreak") {
    val hits = Search.search(docs, "doc_id", Fields, "kim", 2,
      aliveCol = Some("is_alive")).collect()
    assert(hits.length == 2)
    assert(hits.head.getAs[String]("doc_id") == "d2")
  }

  test("bm25: tf saturates and length normalizes (vs linear tf-idf)") {
    val corpus = Seq(
      ("a", "kim kim kim kim kim kim kim kim kim kim"), // tf=10, dl=10
      ("b", "kim foo foo foo foo foo foo foo foo foo"), // tf=1,  dl=10
      ("c", "kim foo"),                                 // tf=1,  dl=2
      ("d", "bar baz")
    ).toDF("doc_id", "text")
    val scores = Search.bm25(corpus, "doc_id", "text", Seq("kim"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == Set("a", "b", "c")) // d never matches
    // saturation: 10x the tf buys far less than 10x the score
    assert(scores("a") < 10 * scores("b") && scores("a") > scores("b"))
    // length normalization: same tf, shorter doc wins
    assert(scores("c") > scores("b"))
  }

  test("bm25 ranks by the same idf as the tf-idf path on single-hit docs") {
    // one term, every matching doc has tf=1 and equal length -> bm25
    // order must agree with scoreField order
    val corpus = Seq(
      ("a", "kim lee"), ("b", "kim lee"), ("c", "lee park")
    ).toDF("doc_id", "text")
    val bm = Search.bm25(corpus, "doc_id", "text", Seq("kim"))
      .collect().map(_.getString(0)).toSet
    val tfidf = Search.scoreField(corpus, "doc_id", "text", Seq("kim"))
      .collect().map(_.getString(0)).toSet
    assert(bm == tfidf && bm == Set("a", "b"))
  }

  test("bm25 survives degenerate corpora (empty / all-empty-text)") {
    val empty = Seq.empty[(String, String)].toDF("doc_id", "text")
    assert(Search.bm25(empty, "doc_id", "text", Seq("kim")).count() == 0)
    val blank = Seq(("a", ""), ("b", " ")).toDF("doc_id", "text")
    assert(Search.bm25(blank, "doc_id", "text", Seq("kim")).count() == 0)
  }

  test("multi-field bm25: name boost dominates under the serving scorer") {
    val hits = Search.search(docs, "doc_id", Fields, "kim", 10,
      aliveCol = Some("is_alive"), scorer = "bm25").collect()
    val order = hits.map(_.getAs[String]("doc_id")).toSeq
    assert(order.head == "d2")
    assert(order.indexOf("d1") < order.indexOf("d3"),
      "3x-boosted name hit outranks the company-only hit under bm25 too")
  }

  test("best_fields: a concentrated hit outranks a spread hit that sum would favor") {
    // q = "kim lee": `spread` matches one term in each field, `conc`
    // matches both terms in ONE field. "lee" is common in f1 (low idf
    // where conc matches it) but rare in f2 (high idf where spread
    // matches it): sum-combine adds spread's two mid-size field scores
    // (.875 + 1.204 > conc's 1.414); best_fields takes the max single
    // field (spread's best 1.204 < conc's 1.414) — the ES multi_match
    // default flips the ranking, exactly the semantics gap qG8 gates.
    val corpus = Seq(
      ("spread", "kim", "lee"),
      ("conc", "kim lee", "choi"),
      ("n1", "lee", "x"),
      ("n2", "lee", "x"),
      ("n3", "park", "x")
    ).toDF("doc_id", "f1", "f2")
    val flds = Seq("f1" -> 1.0, "f2" -> 1.0)
    def top(combine: String): String =
      Search.search(corpus, "doc_id", flds, "kim lee", 1, combine = combine)
        .collect().head.getAs[String]("doc_id")
    assert(top("sum") == "spread", "sum semantics would invert the ranking")
    assert(top("max") == "conc", "best_fields picks the concentrated hit")
  }

  test("tie_breaker interpolates between best_fields and most_fields") {
    def scores(combine: String, tb: Double = 0.0): Map[String, Double] =
      Search.search(docs, "doc_id", Fields, "kim", 10,
        aliveCol = Some("is_alive"), combine = combine, tieBreaker = tb)
        .collect().map(r => r.getAs[String]("doc_id") -> r.getAs[Double]("_score"))
        .toMap
    val (mx, sm, tb) = (scores("max"), scores("sum"), scores("max", 0.3))
    // d2 matches kim in name AND job_title -> max < tb < sum strictly
    assert(mx("d2") < tb("d2") && tb("d2") < sm("d2"))
    // exact ES formula: best + 0.3 * (sum of the others)
    for (d <- Seq("d1", "d2", "d3"))
      assert(math.abs(tb(d) - (mx(d) + 0.3 * (sm(d) - mx(d)))) < 1e-9, d)
    // endpoint degenerates to the sum form (approximately: best +
    // (sum − best) re-associates the IEEE sum)
    val full = scores("max", 1.0)
    for (d <- Seq("d1", "d2", "d3"))
      assert(math.abs(full(d) - sm(d)) < 1e-9, d)
  }

  test("serving path shape: bm25+max equals tfidf ranking on single-field hits") {
    // every hit is confined to one field -> max == sum; bm25 with equal
    // dl and tf=1 preserves idf order -> ranking matches the tfidf path
    val hits = Search.search(docs, "doc_id", Fields, "seoul", 10,
      aliveCol = Some("is_alive"), scorer = "bm25", combine = "max")
      .collect().map(_.getAs[String]("doc_id")).toSet
    val base = Search.search(docs, "doc_id", Fields, "seoul", 10,
      aliveCol = Some("is_alive")).collect()
      .map(_.getAs[String]("doc_id")).toSet
    assert(hits == base && hits == Set("d1", "d3"))
  }

  test("fuzzy search: edit-distance expansion with Lucene fade-out boost") {
    import graft.operators.SearchIndex
    import spark.implicits._
    val docs = Seq((1L, "table"), (2L, "tabel"), (3L, "label"),
      (4L, "cable"), (5L, "zzz")).toDF("doc_id", "text")
    def run(maxEdits: Int): Map[Long, Double] =
      SearchIndex.fuzzySearch(docs, "doc_id", "text", "tabel", maxEdits, 10)
        .collect()
        .map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e4) / 1e4).toMap
    // n=5, every term df=1 → idf = ln 4; boosts: exact 1, label 0.8
    // (dist 1), table 0.6 (dist 2 — transposition = 2 substitutions),
    // cable dist 3 — out at every tested fuzziness
    assert(run(0) == Map(2L -> 1.3863))
    assert(run(1) == Map(2L -> 1.3863, 3L -> 1.109))
    assert(run(2) == Map(2L -> 1.3863, 3L -> 1.109, 1L -> 0.8318))
    intercept[IllegalArgumentException] {
      SearchIndex.fuzzySearch(docs, "doc_id", "text", "two words", 1, 10)
    }
  }

  test("phrase search: consecutive-token matches, repeated terms, stored probe") {
    import graft.operators.SearchIndex
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat the dog"),              // one "the cat the" at 0
      (2L, "the cat the cat the"),          // two, at 0 and 2 (overlapping)
      (3L, "cat the"),                      // terms present, order wrong
      (4L, "the dog cat")                   // all terms, never consecutive
    ).toDF("doc_id", "text")
    val got = SearchIndex.phraseSearch(docs, "doc_id", "text", "the cat the", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
    // case-insensitive analyzer, same as the term path
    val ci = SearchIndex.phraseSearch(docs, "doc_id", "text", "The CAT the", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ci == got)
    intercept[IllegalArgumentException] {
      SearchIndex.phraseSearch(docs, "doc_id", "text", "   ", 10)
    }

    // stored bucket-pruned probe == in-memory, on the real corpus
    val corpus = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val mem = SearchIndex.phraseSearch(corpus, "doc_id", "text", "table hash", 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dir = java.nio.file.Files.createTempDirectory("posidx").toString
    SearchIndex.writePositional(
      SearchIndex.buildPositional(corpus, "doc_id", "text"), dir)
    val stored = SearchIndex.phraseSearchStored(spark, dir, "table hash", 50)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == mem && mem.nonEmpty)
  }

  test("dirichletQL: tf wins, absent terms still smoothed, OOV query drops") {
    import graft.operators.SearchIndex
    import spark.implicits._
    val docs = Seq((1L, "table table chair"), (2L, "chair chair chair"))
      .toDF("doc_id", "text")
    val got = SearchIndex.dirichletQL(docs, "doc_id", "text",
        Seq("table"), mu = 1.0, limit = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // d1 (tf=2) outranks d2 (tf=0, pure smoothing); both get a score
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    assert(got.forall(_._2 < 0L)) // log-likelihoods are negative
    // d1: ln((2 + 1·2/6)/4), d2: ln((0 + 2/6)/4) — exact micro values
    assert(got(0)._2 == math.round(1e6 * math.log((2.0 + 2.0 / 6.0) / 4.0)))
    assert(got(1)._2 == math.round(1e6 * math.log((2.0 / 6.0) / 4.0)))
    // a query term absent from the corpus has no likelihood: drops
    assert(SearchIndex.dirichletQL(docs, "doc_id", "text",
      Seq("zzz"), mu = 1.0, limit = 10).isEmpty)
  }
}
