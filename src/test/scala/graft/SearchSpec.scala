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
}
