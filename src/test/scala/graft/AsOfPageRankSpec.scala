package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{AsOfJoin, GraphAnalytics}

/** Golden + equivalence tests for the round-3 operators: the as-of
  * (point-in-time) join and the DataFrame power-iteration PageRank.
  */
class AsOfPageRankSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("asOf: latest at-or-before per key, inclusive ties, left-outer nulls") {
    val left = Seq(
      (1L, "k1", ts(100)), // before any right row -> null
      (2L, "k1", ts(200)), // equal ts -> inclusive match v@200
      (3L, "k1", ts(350)), // between -> v@300
      (4L, "k2", ts(500)), // other key -> its own v@400
      (5L, "k3", ts(500))  // key with no right rows -> null
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("k1", ts(200), 2.0), ("k1", ts(300), 3.0), ("k1", ts(900), 9.0),
      ("k2", ts(400), 4.0)
    ).toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .select(col("event_id"), col("asof_v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got == Map(1L -> null, 2L -> 2.0, 3L -> 3.0, 4L -> 4.0, 5L -> null))
  }

  test("asOf forward/nearest: direction semantics, inclusive ties, equidistant -> backward") {
    val left = Seq(
      (1L, "k1", ts(100)), // before all -> forward v@200, backward null
      (2L, "k1", ts(200)), // equal ts -> inclusive in BOTH directions
      (3L, "k1", ts(250)), // equidistant 200/300 -> nearest takes backward 2.0
      (4L, "k1", ts(260)), // closer to 300 -> nearest 3.0; forward 3.0
      (5L, "k1", ts(950)), // after all -> forward null, nearest falls back 9.0
      (6L, "k3", ts(500))  // no right rows -> null everywhere
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("k1", ts(200), 2.0), ("k1", ts(300), 3.0), ("k1", ts(900), 9.0)
    ).toDF("k", "t", "v")
    def run(d: String) = AsOfJoin.asOf(left, right, "k", "t", Seq("v"), d)
      .select(col("event_id"), col("asof_v"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(run("forward") == Map(1L -> 2.0, 2L -> 2.0, 3L -> 3.0,
      4L -> 3.0, 5L -> null, 6L -> null))
    assert(run("nearest") == Map(1L -> 2.0, 2L -> 2.0, 3L -> 2.0,
      4L -> 3.0, 5L -> 9.0, 6L -> null))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(left, right, "k", "t", Seq("v"), "sideways")
    }
  }

  test("asOf preserves all left rows and columns") {
    val left = Seq((1L, "k1", ts(10), "payload")).toDF("event_id", "k", "t", "extra")
    val right = Seq(("k1", ts(5), 1.5)).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
    assert(out.columns.toSet == Set("event_id", "k", "t", "extra", "asof_v"))
    assert(out.count() == 1)
    assert(out.head().getAs[String]("extra") == "payload")
  }

  test("asOf NULL contract: matched rows attach atomically, NULL ts skipped") {
    val left = Seq(
      (1L, "k1", ts(400)), // latest right row @300 has v=NULL -> NULL attached
      (2L, "k1", ts(250)), // latest @200: (v=2.0, w=NULL) from ONE row
      (3L, "k2", ts(500))  // only right row for k2 has NULL ts -> no match
    ).toDF("event_id", "k", "t")
    val right = Seq(
      ("k1", Some(ts(100)), Option(1.0), Option(10.0)),
      ("k1", Some(ts(200)), Option(2.0), Option.empty[Double]),
      ("k1", Some(ts(300)), Option.empty[Double], Option(30.0)),
      ("k2", Option.empty[java.sql.Timestamp], Option(9.0), Option(90.0))
    ).toDF("k", "t", "v", "w")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("v", "w"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getAs[Any]("asof_v")), Option(r.getAs[Any]("asof_w")))).toMap
    // row 1: the @300 row matches — its NULL v is attached (not 2.0
    // carried from @200), together with its w=30.0
    assert(got(1L) == (None, Some(30.0)))
    // row 2: both values from the @200 row, not w from @100
    assert(got(2L) == (Some(2.0), None))
    // row 3: a NULL-ts right row matches nothing
    assert(got(3L) == (None, None))
  }

  test("asOf: NULL left ts matches nothing in EVERY direction") {
    // regression: the forward/nearest descending scan is NULLS LAST by
    // default, which parked NULL-ts left rows after every right row and
    // attached the minimum-ts right value instead of NULL
    val left = Seq(
      (1L, "k1", Option(ts(250))),
      (2L, "k1", Option.empty[java.sql.Timestamp])
    ).toDF("event_id", "k", "t")
    val right = Seq(("k1", ts(100), 1.0), ("k1", ts(300), 3.0)).toDF("k", "t", "v")
    for (d <- Seq("backward", "forward", "nearest")) {
      val got = AsOfJoin.asOf(left, right, "k", "t", Seq("v"), d)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(r.fieldIndex("asof_v"))) null
           else r.getAs[Double]("asof_v"))).toMap
      assert(got(2L) == null, s"direction=$d attached ${got(2L)} to a NULL-ts left row")
      // ts 250: backward -> @100; forward -> @300; nearest -> @300 (d=50 < 150)
      assert(got(1L) == (if (d == "backward") 1.0 else 3.0), s"direction=$d")
    }
  }

  test("asOf tolerance: stale matches null out, fresh ones survive") {
    val left = Seq((1L, "k1", ts(100)), (2L, "k1", ts(500)))
      .toDF("event_id", "k", "t")
    val right = Seq(("k1", ts(90), 9.0)).toDF("k", "t", "v")
    def run(tol: Long) = AsOfJoin.asOf(left, right, "k", "t", Seq("v"),
        "backward", tolerance = tol)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) null
         else r.getAs[Double]("asof_v"))).toMap
    // gaps are 10s and 410s (ts() is seconds): tol 60s keeps only row 1
    assert(run(60L * 1000000L) == Map(1L -> 9.0, 2L -> null))
    // unbounded (negative) keeps both; tol 0 keeps only exact-ts hits
    assert(run(-1L) == Map(1L -> 9.0, 2L -> 9.0))
    assert(run(0L) == Map(1L -> null, 2L -> null))
    // nearest honors the bound too (|Δ| axis)
    val near = AsOfJoin.asOf(left, right, "k", "t", Seq("v"),
        "nearest", tolerance = 60L * 1000000L)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) null
         else r.getAs[Double]("asof_v"))).toMap
    assert(near == Map(1L -> 9.0, 2L -> null))
  }

  test("asOf nearest works on a DateType axis") {
    def day(d: Int) = java.sql.Date.valueOf(f"2024-01-$d%02d")
    val left = Seq((1L, "k1", day(10)), (2L, "k1", day(14))).toDF("event_id", "k", "t")
    val right = Seq(("k1", day(9), 9.0), ("k1", day(15), 15.0)).toDF("k", "t", "v")
    val got = AsOfJoin.asOf(left, right, "k", "t", Seq("v"), "nearest")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("asof_v")).toMap
    // Jan 10 is 1 day from Jan 9 vs 5 from Jan 15; Jan 14 is 1 from Jan 15
    assert(got == Map(1L -> 9.0, 2L -> 15.0))
  }

  test("asOf equals the naive range-join formulation on random data") {
    val rnd = new scala.util.Random(11)
    val left = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts(rnd.nextInt(1000).toLong)))
      .toDF("event_id", "k", "t")
    // right unique per (k, t) by construction
    val right = (0 until 5).flatMap(k =>
        rnd.shuffle((0 until 1000).toList).take(40).map(t =>
          (s"k$k", ts(t.toLong), rnd.nextDouble())))
      .toDF("k", "t", "v")
    val fast = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .select(col("event_id"), col("asof_v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    val l = left.as("l"); val r = right.as("r")
    val naive = l.join(r, col("l.k") === col("r.k") && col("l.t") >= col("r.t"), "left")
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id")).orderBy(desc("r.t"))))
      .filter(col("_rn") === 1)
      .select(col("event_id"), col("v")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getDouble(1)))
      .toMap
    assert(fast == naive)
  }

  test("pageRankDF matches GraphX staticPageRank on the derived graph") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val edges = graft.queries.GraphQueries.derivedEdges(events)
    val df = GraphAnalytics.pageRankDF(edges, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sEdges = edges.select(col("src").cast("string"), col("dst").cast("string"))
      .withColumn("weight", lit(1.0))
    val verts = sEdges.select(col("src").as("id"))
      .unionAll(sEdges.select(col("dst").as("id"))).distinct()
    val gx = GraphAnalytics.pageRank(verts, sEdges, iters = 10)
      .collect().map(r => r.getString(0).toLong -> r.getDouble(1)).toMap
    assert(df.keySet == gx.keySet)
    val maxDiff = df.keys.map(k => math.abs(df(k) - gx(k))).max
    assert(maxDiff <= 2e-6, s"max |df-gx| = $maxDiff")
  }

  test("pageRankMicros: hand-computed integer fixed point, order-independent") {
    // a -> b, 2 rounds. r0 = 1e6 each.
    // round 1: b gets 1e6/1; a = 150000; b = 150000 + 850000 = 1000000
    // round 2: b gets 150000... no — messages use the PREVIOUS round's
    // ranks: a sent 1000000 in r1, sends 150000 in r2:
    //   a = 150000; b = 150000 + (150000*17)/20 = 150000 + 127500 = 277500
    val edges = Seq(("a", "b")).toDF("src", "dst")
      .withColumn("weight", lit(1.0))
    val verts = Seq("a", "b").toDF("id")
    val got = GraphAnalytics.pageRankMicros(verts, edges, iters = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("rank_micros")).toMap
    assert(got === Map("a" -> 150000L, "b" -> 277500L))
    // repeated runs are bit-identical (Long folds have no order risk)
    val again = GraphAnalytics.pageRankMicros(verts, edges, iters = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("rank_micros")).toMap
    assert(again === got)
  }

  test("pageRankMicros tracks float pageRankDF within integer-floor error") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val edges = graft.queries.GraphQueries.derivedEdges(events)
    val sEdges = edges.select(col("src").cast("string"), col("dst").cast("string"))
      .withColumn("weight", lit(1.0))
    val verts = sEdges.select(col("src").as("id"))
      .unionAll(sEdges.select(col("dst").as("id"))).distinct()
    val micro = GraphAnalytics.pageRankMicros(verts, sEdges, iters = 10)
      .collect().map(r => r.getString(0).toLong -> r.getAs[Long]("rank_micros"))
      .toMap
    // compare against the UNNORMALIZED float iteration: undo pageRankDF's
    // final Sum=|V| rescale, then micro/1e6 must agree to ~outdeg*iters
    // floors (well under 1e-2 on this graph)
    val df = GraphAnalytics.pageRankDF(edges, iters = 10)
    val agg = df.agg(sum(col("rank")).as("s"), count(lit(1)).as("n")).head()
    // pageRankDF normalized to sum |V|; ranks before normalization are
    // not recoverable from the output alone — instead check RANK ORDER
    // agreement on the clear (non-tied) pairs: top-10 sets must match
    val topF = df.orderBy(desc("rank"), asc("id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val topM = micro.toSeq.sortBy { case (id, r) => (-r, id) }
      .take(10).map(_._1).toSet
    assert((topF & topM).size >= 8, s"rank-order drift: $topF vs $topM")
    assert(agg.getLong(1) === micro.size)
  }

  test("personalized PageRank: mass concentrates around the anchor, 0 off-component") {
    // path 1→2→3→4 plus a disconnected pair 10→11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val ppr = GraphAnalytics.personalizedPageRankDF(edges, lit(1L), iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // anchor holds the most mass; decays along the path
    assert(ppr(1L) > ppr(2L) && ppr(2L) > ppr(3L) && ppr(3L) > ppr(4L),
      ppr.toString)
    // the walk cannot reach the other component
    assert(ppr(10L) == 0.0 && ppr(11L) == 0.0)
    // uniform PageRank would rank 4 (the sink-fed tail) ABOVE the
    // source 1 — personalization flips that; assert the contrast
    val pr = GraphAnalytics.pageRankDF(edges, iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(1L) < pr(4L) && ppr(1L) > ppr(4L))
  }

  test("pageRankDF: normalized ranks sum to |V|, sources smallest") {
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 4L)).toDF("src", "dst")
    val ranks = GraphAnalytics.pageRankDF(edges, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks.keySet == Set(1L, 2L, 3L, 4L))
    // GraphX normalization contract: Σrank = |V|
    assert(math.abs(ranks.values.sum - 4.0) < 1e-5)
    // pure sources tie at the smallest rank; the terminal sink 4
    // inherits hub 2's full (damped) mass and tops it
    assert(ranks(1L) == ranks(3L))
    assert(ranks(1L) < ranks(2L) && ranks(2L) < ranks(4L))
  }

  test("pageRankWeightedDF: uniform weights reduce to pageRankDF exactly") {
    val pairs = Seq((1L, 2L), (3L, 2L), (2L, 4L), (4L, 1L), (2L, 3L))
    val plain = GraphAnalytics.pageRankDF(pairs.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val weighted = GraphAnalytics.pageRankWeightedDF(
      pairs.map { case (s, d) => (s, d, 7L) }.toDF("src", "dst", "w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(weighted == plain) // w/wout = 1/outdeg term-for-term
  }

  test("pageRankWeightedDF: mass follows the heavy edge") {
    // 1 splits 9:1 between 2 and 3 — identical topology, weight decides
    val edges = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val ranks = GraphAnalytics.pageRankWeightedDF(edges, iters = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(ranks(2L) > ranks(3L))
    assert(math.abs(ranks.values.sum - 3.0) < 1e-5)
  }

  test("randomWalks: every step follows an edge, full corpus shape, replayable") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val walks = GraphAnalytics.randomWalks(edges, walksPerVertex = 3, length = 5)
    val rows = walks.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // shape: 4 vertices x 3 walks x 6 positions
    assert(rows.length == 4 * 3 * 6)
    assert(rows.groupBy(_._1).size == 12 && rows.forall(_._2 <= 5))
    // validity: consecutive positions are joined by an (undirected) edge
    val undirected = Set((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .flatMap { case (a, b) => Set((a, b), (b, a)) }
    rows.groupBy(_._1).values.foreach { w =>
      w.sortBy(_._2).map(_._3).sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(undirected((pair(0), pair(1))),
            s"${pair(0)}->${pair(1)} not an edge")
      }
    }
    // replayability: a second build is bit-identical
    val again = GraphAnalytics.randomWalks(edges, walksPerVertex = 3, length = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sorted.sameElements(again.sorted))
  }

  test("node2vecWalks: valid biased corpus, replayable, shares step 1 with randomWalks") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val walks = GraphAnalytics.node2vecWalks(edges, walksPerVertex = 2,
      length = 4, p = 4.0, q = 0.25)
    val rows = walks.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.length == 4 * 2 * 5)
    val undirected = Set((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .flatMap { case (a, b) => Set((a, b), (b, a)) }
    rows.groupBy(_._1).values.foreach { w =>
      w.sortBy(_._2).map(_._3).sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(undirected((pair(0), pair(1))),
            s"${pair(0)}->${pair(1)} not an edge")
      }
    }
    // replayable: bit-identical on a second build
    val again = GraphAnalytics.node2vecWalks(edges, walksPerVertex = 2,
      length = 4, p = 4.0, q = 0.25)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.sorted.sameElements(again.sorted))
    // step 1 has no prev: identical to randomWalks' uniform first step
    val uni = GraphAnalytics.randomWalks(edges, walksPerVertex = 2, length = 1)
      .filter(col("step") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    rows.filter(_._2 == 1).foreach { case (w, _, v) =>
      assert(uni(w) == v, s"walk $w step 1")
    }
  }

  test("node2vecWalks: degree-1 oscillation survives the clamped return weight") {
    // path graph 1-2: from (prev=1, cur=2) the ONLY candidate is the
    // return edge; huge p clamps its weight to 1 milli and the walk
    // must still pick it (tot >= 1, never a mod-0)
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val walks = GraphAnalytics.node2vecWalks(edges, walksPerVertex = 1,
      length = 3, p = 1e9, q = 1e9)
    val byWalk = walks.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // each walk oscillates between its endpoints
    for (start <- Seq(1L, 2L); s <- 0 to 3) {
      val other = if (start == 1L) 2L else 1L
      val expect = if (s % 2 == 0) start else other
      assert(byWalk((start, s)) == expect, s"walk from $start step $s")
    }
    intercept[IllegalArgumentException] {
      GraphAnalytics.node2vecWalks(edges, 1, 2, p = 0.0, q = 1.0)
    }
  }

  test("labelPropagationDF: bridged triangles split into two communities") {
    // triangle {1,2,3} -bridge 3-4- triangle {4,5,6}: after 4 synchronous
    // rounds (count desc, label asc ties) the left settles on 1, the
    // right on 3 (the bridge vertex exports its adopted label)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (4L, 5L), (5L, 6L), (6L, 4L), (3L, 4L)).toDF("src", "dst")
    val got = GraphAnalytics.labelPropagationDF(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("clusteringCoefficientDF: triangle-plus-pendant known values") {
    // triangle 1-2-3, pendant 3-4: coeff 1,1,1/3,0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = GraphAnalytics.clusteringCoefficientDF(edges)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 1.0)), 2L -> ((2L, 1L, 1.0)),
      3L -> ((3L, 1L, 0.333333)), 4L -> ((1L, 0L, 0.0))))
  }
}
