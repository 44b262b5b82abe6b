package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cdc

/** Golden tests for the SCD2 history build (qX_scd2's operator). */
class CdcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  // (key, seq, ts, status): k1 runs A,A,B,A — three versions; k2 one row
  private def changes = Seq(
    ("k1", 1L, ts(10), "A"), ("k1", 2L, ts(20), "A"),
    ("k1", 3L, ts(30), "B"), ("k1", 4L, ts(40), "A"),
    ("k2", 5L, ts(15), "X")
  ).toDF("k", "seq", "t", "status")

  test("snapshotDiff: added/removed/changed with null-safe compares, same suppressed") {
    val base = Seq((1L, Some(10.0), "A"), (2L, Some(20.0), "B"),
      (3L, None: Option[Double], "C"), (4L, Some(40.0), "D"))
      .toDF("k", "price", "st")
    val curr = Seq((1L, Some(10.0), "A"),          // same → suppressed
      (2L, Some(99.0), "B"),                       // changed (price)
      (3L, Some(30.0), "C"),                       // changed (NULL → value)
      (5L, Some(50.0), "E"))                       // added; 4 removed
      .toDF("k", "price", "st")
    val got = graft.operators.Cdc.snapshotDiff(base, curr, Seq("k"),
        Seq("price", "st"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((2L, "changed"), (3L, "changed"),
      (4L, "removed"), (5L, "added")))
  }

  test("violations: offending ids per rule, NULL predicate counts as violation") {
    val df = Seq((1L, Some(5.0)), (2L, Some(-1.0)),
      (3L, None: Option[Double])).toDF("id", "v")
    val got = graft.operators.Profile.violations(df, "id",
        Seq(("v_positive", col("v") > 0)))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("v_positive", 2L), ("v_positive", 3L)))
  }

  test("scd2: consecutive-equal rows collapse, validity chains, last is current") {
    val got = Cdc.scd2(changes, Seq("k"), "t", Seq("seq"), Seq("status"))
      .select(col("k"), col("version"), col("status"),
        unix_micros(col("valid_from")).as("f"),
        unix_micros(col("valid_to")).as("u"),
        col("is_current"), col("n_rows"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4),
          r.getBoolean(5), r.getLong(6))))
      .toMap
    assert(got == Map(
      ("k1", 1L) -> (("A", 10000000L, 30000000L, false, 2L)),
      ("k1", 2L) -> (("B", 30000000L, 40000000L, false, 1L)),
      ("k1", 3L) -> (("A", 40000000L, -1L, true, 1L)),
      ("k2", 1L) -> (("X", 15000000L, -1L, true, 1L))))
  }

  test("scd2: NULL -> value and value -> NULL both open versions") {
    val df = Seq(
      ("k", 1L, ts(1), Option.empty[String]),
      ("k", 2L, ts(2), Option("A")),
      ("k", 3L, ts(3), Option.empty[String]),
      ("k", 4L, ts(4), Option.empty[String])
    ).toDF("k", "seq", "t", "status")
    val versions = Cdc.scd2(df, Seq("k"), "t", Seq("seq"), Seq("status"))
      .select("version", "n_rows").as[(Long, Long)].collect().toSet
    assert(versions == Set((1L, 1L), (2L, 1L), (3L, 2L)))
  }

  test("scd2: replaying duplicate change rows leaves the timeline unchanged") {
    val base = Cdc.scd2(changes, Seq("k"), "t", Seq("seq"), Seq("status"))
      .select("k", "version", "status", "valid_from", "valid_to", "is_current")
    val replayed = Cdc.scd2(changes.unionAll(changes), Seq("k"), "t",
        Seq("seq"), Seq("status"))
      .select("k", "version", "status", "valid_from", "valid_to", "is_current")
    assert(base.exceptAll(replayed).isEmpty && replayed.exceptAll(base).isEmpty)
  }

  test("scd2 timestamp ties: zero-width versions kept in history, invisible to snapshotAt") {
    // two distinct states at the SAME ts (tie-broken by seq), then a
    // later state: the tie run's first version is zero-width
    val tied = Seq(
      ("k1", 1L, ts(10), "A"), ("k1", 2L, ts(10), "B"),
      ("k1", 3L, ts(20), "C")
    ).toDF("k", "seq", "t", "status")
    val hist = Cdc.scd2(tied, Seq("k"), "t", Seq("seq"), Seq("status"))
    val rows = hist.orderBy("version")
      .select("status", "valid_from", "valid_to").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"),
      "full history keeps the zero-width state in deterministic tie order")
    assert(rows(0).getTimestamp(1) == rows(0).getTimestamp(2),
      "A is a zero-width version (valid_from == valid_to)")
    // no instant ever observes A: at ts(10) the half-open interval
    // already belongs to B
    val at10 = Cdc.snapshotAt(hist, lit(ts(10)))
      .select("status").as[String].collect().toSeq
    assert(at10 == Seq("B"))
    assert(Cdc.snapshotAt(hist, lit(ts(25))).select("status")
      .as[String].collect().toSeq == Seq("C"))
  }

  test("snapshotAt reconstructs the state as of any instant") {
    val hist = Cdc.scd2(changes, Seq("k"), "t", Seq("seq"), Seq("status"))
    val at35 = Cdc.snapshotAt(hist, lit(ts(35)))
      .select("k", "status").as[(String, String)].collect().toMap
    assert(at35 == Map("k" -> "B", "k2" -> "X").map { case (k, v) =>
      (if (k == "k") "k1" else k) -> v })
    val at99 = Cdc.snapshotAt(hist, lit(ts(99)))
      .select("k", "status").as[(String, String)].collect().toMap
    assert(at99 == Map("k1" -> "A", "k2" -> "X"))
  }
}
