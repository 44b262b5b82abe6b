package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Parse

/** Parser operators (SURVEY §2.B1-B6) against the A2 fixture shapes:
  * positional projection, regex extraction with last-matching-line-wins
  * fold, address stopword scoring, and the <3-lines error channel.
  */
class ParseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def parse(lines: Seq[String]*) =
    Parse.parseCardLines(
      lines.zipWithIndex.map { case (l, i) => (s"k$i", l) }
        .toDF("s3_key", "text_lines"))

  val FullCard = Seq(
    "aws", "Foo Bar", "Solutions Architect",
    "12Floor GS Tower, 508 Nonhyeon-ro, Gangnam-gu, Seoul 06141, Korea",
    "foobar@amazon.com", "(+82 10) 1025 7049")

  test("happy path: positional fields + regex extracts + addr detector") {
    val r = parse(FullCard).collect().head
    assert(!r.getAs[Boolean]("parse_error"))
    assert(r.getAs[String]("company") == "aws")
    assert(r.getAs[String]("name") == "Foo Bar")
    assert(r.getAs[String]("job_title") == "Solutions Architect")
    assert(r.getAs[String]("email") == "foobar@amazon.com")
    assert(r.getAs[String]("phone_number") == "(+82 10) 1025 7049")
    assert(r.getAs[String]("addr").startsWith("12Floor GS Tower"))
  }

  test("two-line card goes to the error channel, batch keeps flowing") {
    val df = parse(Seq("only", "two lines"), FullCard)
    assert(df.filter(col("parse_error")).count() == 1)
    assert(df.filter(!col("parse_error")).count() == 1)
    val bad = df.filter(col("parse_error")).collect().head
    assert(bad.getAs[String]("company") == null)
  }

  test("no email / no phone / weak address yield empty strings") {
    val r = parse(Seq("acme", "A B", "CEO", "short line")).collect().head
    assert(r.getAs[String]("email") == "")
    assert(r.getAs[String]("phone_number") == "")
    assert(r.getAs[String]("addr") == "")
  }

  test("multi-email: last matching line wins, first match within line") {
    val r = parse(Seq("acme", "A B", "CEO",
      "first@x.com then second@y.com", "final@z.org")).collect().head
    // last matching LINE is 'final@z.org'
    assert(r.getAs[String]("email") == "final@z.org")
    val r2 = parse(Seq("acme", "A B", "CEO",
      "first@x.com then second@y.com")).collect().head
    // within a line, the FIRST match is taken
    assert(r2.getAs[String]("email") == "first@x.com")
  }

  test("address threshold: exactly 3 stopword hits keeps the line") {
    // '-gu', ' seoul', ' korea' = 3 hits
    val r = parse(Seq("c", "n", "j", "Gangnam-gu area, seoul korea")).collect().head
    assert(r.getAs[String]("addr") == "Gangnam-gu area, seoul korea")
    // only 2 hits → below threshold
    val r2 = parse(Seq("c", "n", "j", "Gangnam-gu area, seoul city")).collect().head
    assert(r2.getAs[String]("addr") == "")
  }
}
