package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

/** Range-join contracts: BETWEEN inclusivity, exactly-once matching
  * across bin boundaries, NULL/empty-interval drops, pre-epoch axes,
  * and brute-force equivalence for the overlap join's arithmetic
  * dedup. The gate queries (qX_range_join, qX_interval_overlap) pin
  * the date-axis end-to-end paths against DuckDB.
  */
class RangeJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def pts(rows: (Long, java.lang.Long)*) =
    rows.toDF("pid", "pt")
  private def ivs(rows: (Long, java.lang.Long, java.lang.Long)*) =
    rows.toDF("iid", "lo", "hi")

  test("point-in-interval: BETWEEN is inclusive at both endpoints") {
    val got = RangeJoin.pointInInterval(
        pts((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)),
        ivs((100L, 10L, 20L)), "pt", "lo", "hi", Seq("iid"), binWidth = 4)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (2L, 100L)))
  }

  test("an interval spanning many bins matches a point exactly once") {
    // interval covers bins 0..12 at width 4; the point's bin (2) is one
    // of them — the pair must appear once, not once per shared bin
    val got = RangeJoin.pointInInterval(
        pts((1L, 11L)), ivs((100L, 0L, 50L)),
        "pt", "lo", "hi", Seq("iid"), binWidth = 4)
      .collect()
    assert(got.length == 1)
  }

  test("NULL axes and empty (lo > hi) intervals match nothing") {
    val got = RangeJoin.pointInInterval(
        pts((1L, null), (2L, 10L)),
        ivs((100L, 30L, 20L), (101L, null, 50L), (102L, 5L, 15L)),
        "pt", "lo", "hi", Seq("iid"), binWidth = 8)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 102L)))
  }

  test("pre-epoch (negative) axis values bin correctly") {
    // floor-division must floor toward -inf: pt=-5 at width 4 is bin
    // -2, the same bin the interval [-7,-5] ends in
    val got = RangeJoin.pointInInterval(
        pts((1L, -5L), (2L, -9L)), ivs((100L, -7L, -5L)),
        "pt", "lo", "hi", Seq("iid"), binWidth = 4)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L)))
  }

  test("timestamp axis: micros-exact comparison") {
    val p = Seq((1L, "2024-01-15 10:30:00"), (2L, "2024-01-15 12:00:01"))
      .toDF("pid", "pt").select(col("pid"), col("pt").cast("timestamp").as("pt"))
    val i = Seq((100L, "2024-01-15 10:00:00", "2024-01-15 12:00:00"))
      .toDF("iid", "lo", "hi")
      .select(col("iid"), col("lo").cast("timestamp").as("lo"),
        col("hi").cast("timestamp").as("hi"))
    val got = RangeJoin.pointInInterval(p, i, "pt", "lo", "hi",
        Seq("iid"), binWidth = 3600L * 1000000L) // 1-hour bins in micros
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("interval overlap: brute-force equivalence, pairs exactly once") {
    // deterministic scatter of 30 intervals; widths 0..6 so some are
    // points, some span several 5-wide bins
    val rows = (0 until 30).map { i =>
      val lo = (i * 37L) % 50L; (i.toLong, lo, lo + (i % 7))
    }
    val l = rows.toDF("a_id", "a_lo", "a_hi")
    val r = rows.toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(l, r,
        "a_lo", "a_hi", Seq("a_id"), "b_lo", "b_hi", Seq("b_id"), binWidth = 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toList
    val brute = for {
      (ai, alo, ahi) <- rows; (bi, blo, bhi) <- rows
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)
    // same multiset: every overlapping pair (both orientations + self)
    // exactly once despite multi-bin co-occurrence
    assert(got.sorted == brute.sorted.toList)
  }

  test("interval overlap: touching endpoints count as overlap (closed intervals)") {
    val l = Seq((1L, 0L, 10L)).toDF("a_id", "a_lo", "a_hi")
    val r = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(l, r,
        "a_lo", "a_hi", Seq("a_id"), "b_lo", "b_hi", Seq("b_id"), binWidth = 7)
      .select("b_id").as[Long].collect().toSet
    assert(got == Set(2L))
  }
}
