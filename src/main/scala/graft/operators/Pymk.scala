package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** "People You May Know" — the reference's flagship graph query,
  * re-expressed as relational algebra on (vertices, edges) DataFrames.
  *
  * Reference traversal (RecommendBizcard/neptune_recommend_bizcard.py:56-73):
  * {{{
  *   g.V().hasLabel('person').has('_name', user).as_('person')
  *    .both('knows').aggregate('friends')
  *    .both('knows')
  *    .where(P.neq('person')).where(P.without('friends'))
  *    .groupCount().by('id')
  *    .order(Scope.local).by(Column.values, Order.decr)
  * }}}
  *
  * Semantics locked down here (SURVEY §2.C/D, §7.5-1):
  *  - `both('knows')` traverses the *directed* edge list in both
  *    directions — modelled as `edges UNION ALL reversed(edges)`
  *    (bag semantics, duplicates kept: a reciprocal pair a→b, b→a
  *    yields b twice in a's 1-hop frontier).
  *  - the score is a **path count**, not a distinct-friend count: every
  *    (friend-occurrence, second-hop-occurrence) pair contributes 1
  *    (`groupCount().by('id')` counts traversers). So the 2-hop frontier
  *    must NOT be deduplicated before aggregation.
  *  - excluded: the anchor itself (`neq`) and the *set* of 1-hop
  *    neighbours (`without` over the aggregated bag — membership test,
  *    so `distinct` is safe for the anti-join side only).
  *  - ties: Gremlin leaves equal-count order unspecified; we declare the
  *    deterministic tiebreak `asc(id)` (SURVEY §7.3).
  *
  * Scale posture (100 TB): both hops are equi-joins on the vertex id —
  * shuffle-partitioned by key, no driver collection. The undirected
  * adjacency is built once and reused by both hops so the exchange is
  * reusable (ReusedExchange under AQE). For a single-anchor query the
  * anchor side is tiny after the first semi-join, so AQE demotes the
  * second join to broadcast automatically; for the all-pairs variant the
  * joins stay shuffle hash joins keyed on id, which is the right plan.
  * Skewed hub vertices are handled by AQE skew-join splitting.
  */
object Pymk {

  /** Partition count for explosive (quadratic-output) wedge bags. AQE
    * sizes stages by INPUT bytes, so the wedge sites pin an explicit
    * repartition; the right count is whichever is larger of the
    * cluster's core count (scales with executors on a real cluster)
    * and the session's configured `spark.sql.shuffle.partitions` (the
    * data-sized knob — big-SF single-box runs raise it so a partition
    * of the bag still fits in memory). Equal under the driver's
    * local[32] / 32-partition config, so gate plans are unchanged.
    * NOTE: the explicit repartition(n) is NOT AQE-coalesced, so a
    * session left at the stock 200-partition default pays 200-task
    * wedge stages on tiny inputs — perf-only, results unchanged;
    * size the conf to the data (every harness session here does).
    * A non-integer conf value (e.g. a platform's "auto") falls back
    * to defaultParallelism with a warning — crashing every wedge
    * operator over a sizing knob would be worse than a default. */
  private[graft] def wedgePar(df: DataFrame): Int = {
    val spark = df.sparkSession
    val raw = spark.conf.get("spark.sql.shuffle.partitions")
    val conf = scala.util.Try(raw.toInt).toOption match {
      case Some(n) if n > 0 => n
      case _ =>
        System.err.println(s"[graft] spark.sql.shuffle.partitions='$raw' " +
          "is not a positive integer; wedge sizing falls back to " +
          s"defaultParallelism=${spark.sparkContext.defaultParallelism}")
        spark.sparkContext.defaultParallelism
    }
    math.max(spark.sparkContext.defaultParallelism, conf)
  }

  /** Wedge-bag partition budget per task: the sf1000 c4 calibration —
    * ~4M bag rows per task (512 partitions) OOM'd a 64 GiB/32-thread
    * box on a quiet run, ~2M (1024 partitions) ran clean AND beat the
    * loaded 512-partition runs. Wedge rows are two ids + agg-map
    * state, so ~2M rows/task ≈ low hundreds of MB of execution
    * memory. */
  private[graft] val WedgeRowsPerTask = 2000000L

  /** [[wedgePar]] sized to the DATA: an explosive operator that knows
    * its wedge-bag row estimate (Σ min(deg, cap)² over the middle
    * degree table — one cheap agg over a frame the operator already
    * builds) partitions the bag so each task sees ~[[WedgeRowsPerTask]]
    * rows, floored at the static [[wedgePar]] (small inputs keep their
    * exact current plans — PlanSpec-pinned) and capped at 2^16. This
    * removes the manual SPARK_GRAFT_SHUFFLE_PARTITIONS override big-SF
    * sweeps needed: the estimate grows with the data, the conf does
    * not. */
  private[graft] def wedgeParSized(df: DataFrame, estBagRows: Long): Int = {
    val static = wedgePar(df)
    val byData = math.ceil(estBagRows.toDouble / WedgeRowsPerTask).toLong
    math.max(static.toLong, math.min(byData, 1L << 16)).toInt
  }

  /** Σ min(deg, cap)² over an adjacency's `from` column — the wedge-bag
    * row estimate behind [[wedgeParSized]] (exact for an uncapped
    * middle join; an upper bound for a<c-halved ones — a ≤2× sizing
    * overshoot is free, an undershoot is the OOM). One tiny agg + one
    * driver scalar. Callers MUST pass the operator's CHECKPOINTED
    * adjacency (r16): the estimate then costs one pass over already-
    * materialized blocks instead of its own scan + dedup of the raw
    * edge list, and the checkpoint is reused by every wedge leg — at
    * 100 TB that is one full edge pass saved per gate, and the cross-
    * pass memo the uncheckpointed form needed (r15, per-JVM) is gone. */
  private[graft] def estWedgeBagRows(adj: DataFrame,
                                     cap: Int = Int.MaxValue): Long = {
    val d = least(count(lit(1)), lit(cap.toLong))
    adj.groupBy(col("from")).agg((d * d).as("w2"))
      .agg(coalesce(sum(col("w2")), lit(0L)).as("bag")).head().getLong(0)
  }

  /** Undirected bag view of a directed edge list: out-edges ∪ in-edges.
    * Reference: `both('knows')` (neptune_recommend_bizcard.py:60-61);
    * SURVEY §2.F1 — duplicates are load-bearing for path counting.
    */
  def undirected(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col("src").as("from"), col("dst").as("to"))
    val rev = edges.select(col("dst").as("from"), col("src").as("to"))
    fwd.unionAll(rev)
  }

  /** Recommend for a single anchor vertex id. Returns (id, score) ranked
    * by score desc, id asc, limited to `limit`.
    *
    * @param edges directed edge DataFrame with columns (src, dst);
    *              already deduplicated on (src,dst) — the reference's
    *              edge upsert guarantees at most one edge per direction
    *              (upsert_bizcard_to_graph_db.py:104-109).
    */
  def recommend(edges: DataFrame, anchorId: Column, limit: Int): DataFrame = {
    val adj = undirected(edges)

    // hop 1 — the friend bag of the anchor (duplicates kept)
    val friends = adj.filter(col("from") === anchorId).select(col("to").as("friend"))

    // hop 2 — expand every friend occurrence (bag x bag = path count)
    val hop2 = friends
      .join(adj, friends("friend") === adj("from"))
      .select(col("to").as("candidate"))

    // exclusions: self, and anyone already a direct friend (set semantics)
    val friendSet = friends.select(col("friend").as("candidate")).distinct()
    val candidates = hop2
      .filter(col("candidate") =!= anchorId)
      .join(friendSet, Seq("candidate"), "left_anti")

    candidates
      .groupBy(col("candidate").as("id"))
      .agg(count(lit(1)).as("score"))
      .orderBy(desc("score"), asc("id"))
      .limit(limit)
  }

  /** Recommend joined back to vertex properties — replaces the
    * reference's N+1 per-candidate `valueMap()` round trips
    * (neptune_recommend_bizcard.py:69-72) with one equi-join.
    */
  def recommendWithProps(vertices: DataFrame, edges: DataFrame,
                         anchorId: Column, limit: Int): DataFrame = {
    val scored = recommend(edges, anchorId, limit)
    scored.join(vertices, Seq("id"), "left")
      .orderBy(desc("score"), asc("id"))
  }

  /** [[recommend]] with the EXPLANATION a PYMK surface renders next to
    * each suggestion — "you both know …": the first `nReasons` distinct
    * mutual friends (the wedge middle vertices), ascending, as a
    * comma-joined string. Same path-count score and exclusions as the
    * flagship; the reasons side folds the DISTINCT (candidate, mutual)
    * pairs through the bounded-heap grouped top-k ([[TopK]]'s
    * CollectTopK bridge — O(nReasons) state per candidate, never a
    * per-candidate window sort), so a hub candidate with 10⁵ mutuals
    * costs the same as one with 3.
    *
    * @return (id, score, reasons) ranked score desc, id asc.
    */
  def recommendWithReasons(edges: DataFrame, anchorId: Column, limit: Int,
                           nReasons: Int = 3): DataFrame = {
    val adj = undirected(edges)
    val friends = adj.filter(col("from") === anchorId)
      .select(col("to").as("friend"))
    val wedges = friends
      .join(adj, friends("friend") === adj("from"))
      .select(col("friend").as("mutual"), col("to").as("candidate"))
    val friendSet = friends.select(col("friend").as("candidate")).distinct()
    val cand = wedges
      .filter(col("candidate") =!= anchorId)
      .join(friendSet, Seq("candidate"), "left_anti")
      .localCheckpoint(true) // feeds the score fold AND the reasons fold
    val scored = cand.groupBy(col("candidate").as("id"))
      .agg(count(lit(1)).as("score"))
    val reasons = cand.select(col("candidate").as("id"), col("mutual"))
      .distinct()
      .groupBy(col("id"))
      .agg(org.apache.spark.sql.catalyst.expressions.aggregate
        .GraftTopKBridge.topK(struct(col("mutual").as("m")), nReasons,
          smallestFirst = true).as("_top"))
      .select(col("id"), concat_ws(",",
        transform(col("_top"), x => x.getField("m").cast("string")))
        .as("reasons"))
    scored.join(reasons, Seq("id"))
      .orderBy(desc("score"), asc("id"))
      .limit(limit)
  }

  /** Regularized bias baseline for rating-style prediction (Koren
    * 2010's "baseline predictor" — the model every CF paper compares
    * against and the bias term a serving ranker subtracts first):
    * `b̂_ui = μ + b_u + b_i` with `b_u = Σ_u(r−μ)/(λ+n_u)` then
    * `b_i = Σ_i(r−μ−b_u)/(λ+n_i)` (the sequential shrinkage fit —
    * TWO keyed folds, no iteration). Every accumulated quantity is
    * integer micros with floored divisions, so the fitted biases are
    * engine-exact artifacts.
    *
    * @return (item, n_i, bi_micros) per item plus the global
    *         (mu_micros) on every row — the broadcastable model table.
    */
  def biasBaseline(ratings: DataFrame, userCol: String, itemCol: String,
                   ratingCol: String, lambda: Long = 10L): DataFrame = {
    val r = ratings.select(col(userCol).as("u"), col(itemCol).as("i"),
        floor(col(ratingCol) * lit(1e6)).cast("long").as("r"))
      .localCheckpoint(true) // three folds below
    val muRow = r.agg(floor(sum(col("r")).cast("double") / count(lit(1)))
      .cast("long").as("mu")).head()
    val mu = muRow.getLong(0)
    val bu = r.groupBy("u")
      .agg(floor((sum(col("r")) - count(lit(1)) * mu).cast("double")
        / (count(lit(1)) + lambda)).cast("long").as("bu"))
    r.join(bu, "u")
      .groupBy(col("i").as("item"))
      .agg(count(lit(1)).as("n_i"),
        floor((sum(col("r") - lit(mu) - col("bu"))).cast("double")
          / (count(lit(1)) + lambda)).cast("long").as("bi_micros"))
      .withColumn("mu_micros", lit(mu))
      .orderBy(col("item"))
  }

  /** All-pairs PYMK — recommendations for EVERY vertex in one pass: the
    * batch-serving shape at scale (precompute top-k for all users
    * nightly, serve point lookups), replacing per-anchor traversals
    * with set-level joins.
    *
    * Plan: adjacency ⋈ adjacency on the middle vertex (one shuffle
    * keyed by vertex id — the sparse A² matmul), count per (anchor,
    * candidate) FIRST (partial map-side agg collapses the quadratic
    * path bag to the pair cardinality before anything else touches
    * it), THEN anti-join out self/direct-friend pairs, then a
    * per-anchor top-k window. Anti-join placement matters: filtering
    * the aggregated pairs (|V|·avg-deg rows) instead of the raw path
    * bag (Σ deg(m)² rows) is ~2× at sf0.1 and grows with skew —
    * removing whole keys commutes with counting, so the result is
    * identical. Every stage is key-partitioned; nothing is collected
    * to the driver. Hub-vertex skew in the middle-vertex join is
    * AQE-splittable (skew-join), or saltable via
    * [[Skew.saltedInnerJoin]] when AQE is off.
    */
  def recommendAll(edges: DataFrame, limit: Int): DataFrame = {
    // ONE materialization of the undirected bag (r16): the sizing agg,
    // both wedge legs and the anti-join side all read these blocks —
    // the uncheckpointed form re-derived the upstream edge frame once
    // per consumer (4 passes; ruinous when the caller's edge frame is
    // itself an aggregation, e.g. the decayed-weight gates).
    val adj = undirected(edges).localCheckpoint(true)
    // The adjacency is small relative to its join OUTPUT (Σ deg²):
    // AQE's partition coalescing sees only the input bytes and would
    // shrink the stream side to ~1 partition, serializing the
    // explosive join + partial agg. Pin full parallelism with an
    // explicit round-robin repartition (round-robin, not keyed, so a
    // hub vertex can't pin its whole neighborhood to one task).
    // Sized to the estimated bag (Σ deg²) so big-SF runs need no
    // manual partition override; small inputs keep the static count.
    val par = wedgeParSized(edges, estWedgeBagRows(adj))
    // Symmetry: the undirected bag contains (x,y) and (y,x) with equal
    // multiplicity, so score(a,c) == score(c,a). Count only the a < c
    // half of the path bag (HALF the shuffle + agg input) and mirror
    // the counted pairs afterwards — the mirror is over the aggregated
    // pair set, 10-20× smaller than the bag.
    val hop2 = adj.repartition(par).as("h1")
      .join(adj.as("h2"), col("h1.to") === col("h2.from"))
      .select(col("h1.from").as("anchor"), col("h2.to").as("candidate"))
      .filter(col("anchor") < col("candidate"))
    val friendPairs = adj.select(col("from").as("anchor"), col("to").as("candidate"))
      .distinct()
    // Repartition the path bag on the aggregation key BEFORE counting:
    // each reducer's hash map then holds only its own key range
    // (cache-resident) instead of every task building a map over the
    // full pair space — ~2× at sf0.1. Tradeoff vs map-side partial
    // agg: this shuffles the raw bag (dup factor × more bytes); on a
    // network-bound cluster flip to plain groupBy when the measured
    // duplication factor is high — both shapes are one shuffle keyed
    // on (anchor, candidate).
    val half = hop2
      .repartition(par, col("anchor"), col("candidate"))
      .groupBy("anchor", "candidate")
      .agg(count(lit(1)).as("score"))
    // mirror via explode, NOT a self-union: a union would execute the
    // aggregation subtree once per branch (only the exchange below it
    // is reused); the explode emits both orientations in one pass over
    // the counted pairs.
    val scored = half
      .select(explode(array(
        struct(col("anchor"), col("candidate"), col("score")),
        struct(col("candidate").as("anchor"), col("anchor").as("candidate"),
          col("score")))).as("p"))
      .select(col("p.anchor").as("anchor"), col("p.candidate").as("candidate"),
        col("p.score").as("score"))
      // no broadcast hint: friendPairs is the full edge list — tiny at
      // test SF (AQE demotes to broadcast at runtime), far too big to
      // pin as broadcast at 100 TB.
      .join(friendPairs, Seq("anchor", "candidate"), "left_anti")
    // top-k per anchor as a bounded-heap aggregate (TopK.grouped), not
    // a window sort: O(limit) state per anchor, map-side partial heaps,
    // and the final exchange carries ≤ limit·mappers rows per anchor —
    // at 100 TB the window form would sort the full scored pair set.
    // (score desc, candidate asc) via the negation idiom.
    TopK.grouped(scored, Seq("anchor"),
        struct((-col("score")).as("ns"), col("candidate").as("c")), limit)
      .select(col("anchor"), col("best.c").as("id"), (-col("best.ns")).as("score"))
  }

  /** [[recommendAll]]'s documented SCALE TWIN — the hub-capped form.
    *
    * The exact all-pairs plan is inherently Θ(Σ_z deg(z)²) in its wedge
    * bag: on the reference-shaped graph (a FIXED hub set whose degree
    * grows linearly with corpus size — derivedEdges' 50 `value % 50`
    * hubs) that is quadratic in scale factor. Measured: sf0.1 → sf1
    * (10× data) took qD1_pymk_all from 1.3 s to 238 s — correct, but
    * not a plan to run at 100 TB. This twin caps each MIDDLE vertex's
    * neighbor list at `maxDegree` with the hash-spread deterministic
    * sample of [[GraphAnalytics]]' wedge family (md5-portable,
    * rerun-stable, oracle-replayable), so the wedge bag is bounded by
    * |V|·maxDegree² regardless of hub growth; sub-cap vertices — the
    * overwhelming majority on a power-law graph — contribute EXACTLY.
    * Anti-join and output ranks stay exact over the full edge set.
    * Cap ≥ max degree ⇒ identical to [[recommendAll]] (the cap≡exact
    * contract, pinned in PymkPropertySpec).
    *
    * The middle-centric cap keeps score(a,c) == score(c,a) (both legs
    * draw from the same sample(z)), so the a<c halving + mirror of the
    * exact plan stays valid — an anchor-side cap would break symmetry.
    *
    * @return (anchor, id, score) top-`limit` per anchor by
    *         (score desc, id asc).
    */
  def recommendAllCapped(edges: DataFrame, limit: Int,
                         maxDegree: Int): DataFrame = {
    // one materialization feeds the sizing agg, the sampler and the
    // anti-join side (see recommendAll)
    val adjFull = undirected(edges).localCheckpoint(true)
    val par = wedgeParSized(edges, estWedgeBagRows(adjFull, maxDegree))
    // hash-spread per-middle sample: keep the maxDegree rows with the
    // lowest (md5Bucket("z:n"), n) — bounded-heap, never a window sort
    val keyed = adjFull.withColumn("_hk",
      Sampling.md5Bucket(concat_ws(":", col("from"), col("to"))))
    val samp = TopK.grouped(keyed, Seq("from"),
        struct(col("_hk"), col("to").as("_to")), maxDegree)
      .select(col("from"), col("best._to").as("to"))
      .localCheckpoint(true) // both wedge legs
    val hop2 = samp.repartition(par).as("h1")
      .join(samp.as("h2"), col("h1.from") === col("h2.from"))
      .select(col("h1.to").as("anchor"), col("h2.to").as("candidate"))
      .filter(col("anchor") < col("candidate"))
    val friendPairs = adjFull
      .select(col("from").as("anchor"), col("to").as("candidate"))
      .distinct()
    val half = hop2
      .repartition(par, col("anchor"), col("candidate"))
      .groupBy("anchor", "candidate")
      .agg(count(lit(1)).as("score"))
    val scored = half
      .select(explode(array(
        struct(col("anchor"), col("candidate"), col("score")),
        struct(col("candidate").as("anchor"), col("anchor").as("candidate"),
          col("score")))).as("p"))
      .select(col("p.anchor").as("anchor"), col("p.candidate").as("candidate"),
        col("p.score").as("score"))
      .join(friendPairs, Seq("anchor", "candidate"), "left_anti")
    TopK.grouped(scored, Seq("anchor"),
        struct((-col("score")).as("ns"), col("candidate").as("c")), limit)
      .select(col("anchor"), col("best.c").as("id"), (-col("best.ns")).as("score"))
  }

  /** Weighted PYMK over a weighted edge frame (src, dst, w_micros) —
    * the recency-aware flagship: path score is
    * `Σ_paths ⌊w₁·w₂/1e6⌋` over 2-hop wedges, so feeding
    * [[Features.decayedCounts]] weights makes yesterday's mutual
    * friend outrank last month's. Same plan skeleton as
    * [[recommendAll]] (wedge join, anti join on direct edges,
    * bounded-heap top-k); per-path flooring keeps every fold an exact
    * integer (order-independent, oracle-replayable), with bias ≤
    * #paths micro-units, identical in the oracle by construction.
    *
    * @return (anchor, id, score_micros) top-`limit` per anchor by
    *         (score desc, id asc).
    */
  def recommendAllWeighted(wEdges: DataFrame, limit: Int): DataFrame = {
    // one materialization of the weighted bag: the caller's wEdges is
    // typically itself an aggregation (decayed counts), and the
    // uncheckpointed form re-ran it once per consumer — sizing agg,
    // two wedge legs, anti-join side (measured 24 s → ~6 s of task
    // time on the decayed gate at sf0.1)
    val adj = wEdges.select(col("src").as("from"), col("dst").as("to"),
        col("w_micros").as("w"))
      .unionAll(wEdges.select(col("dst").as("from"), col("src").as("to"),
        col("w_micros").as("w")))
      .localCheckpoint(true)
    val par = wedgeParSized(wEdges, estWedgeBagRows(adj))
    // path weights are symmetric (w₁·w₂ commutes), so — like the
    // unweighted flagship — fold only the anchor < candidate half of
    // the wedge bag and mirror the AGGREGATED pairs (half the shuffle)
    val hop2 = adj.repartition(par).as("h1")
      .join(adj.as("h2"), col("h1.to") === col("h2.from"))
      .filter(col("h1.from") < col("h2.to"))
      .select(col("h1.from").as("anchor"), col("h2.to").as("candidate"),
        floor(col("h1.w") * col("h2.w") / lit(1000000L)).cast("long")
          .as("pw"))
    val friendPairs = adj
      .select(col("from").as("anchor"), col("to").as("candidate"))
      .distinct()
    val scored = hop2
      .repartition(par, col("anchor"), col("candidate"))
      .groupBy("anchor", "candidate")
      .agg(sum(col("pw")).as("score_micros"))
      .select(explode(array(
        struct(col("anchor"), col("candidate"), col("score_micros")),
        struct(col("candidate").as("anchor"), col("anchor").as("candidate"),
          col("score_micros")))).as("p"))
      .select(col("p.anchor").as("anchor"),
        col("p.candidate").as("candidate"),
        col("p.score_micros").as("score_micros"))
      .join(friendPairs, Seq("anchor", "candidate"), "left_anti")
    TopK.grouped(scored, Seq("anchor"),
        struct((-col("score_micros")).as("ns"), col("candidate").as("c")),
        limit)
      .select(col("anchor"), col("best.c").as("id"),
        (-col("best.ns")).as("score_micros"))
      .orderBy(col("anchor"), desc("score_micros"), col("id"))
  }

  /** [[recommendAllWeighted]]'s hub-capped scale twin — the
    * [[recommendAllCapped]] medicine on the weighted wedge bag (the
    * exact form timed out entirely at sf1 on the fixed-hub graph, the
    * same Θ(Σ deg(z)²) blowup as the unweighted flagship). Each
    * middle's weighted neighbor list is sampled to `maxDegree` rows by
    * the md5-spread rule; both wedge legs draw from the same sample, so
    * the w₁·w₂ path score stays symmetric and the a<c halving + mirror
    * stays valid; the direct-edge anti-join is exact over the full
    * edge set. Cap ≥ max degree ≡ exact (PymkPropertySpec).
    */
  def recommendAllWeightedCapped(wEdges: DataFrame, limit: Int,
                                 maxDegree: Int): DataFrame = {
    // one materialization — see recommendAllWeighted
    val adjFull = wEdges.select(col("src").as("from"), col("dst").as("to"),
        col("w_micros").as("w"))
      .unionAll(wEdges.select(col("dst").as("from"), col("src").as("to"),
        col("w_micros").as("w")))
      .localCheckpoint(true)
    val par = wedgeParSized(wEdges, estWedgeBagRows(adjFull, maxDegree))
    val keyed = adjFull.withColumn("_hk",
      Sampling.md5Bucket(concat_ws(":", col("from"), col("to"))))
    val samp = TopK.grouped(keyed, Seq("from"),
        struct(col("_hk"), col("to").as("_to"), col("w").as("_w")), maxDegree)
      .select(col("from"), col("best._to").as("to"), col("best._w").as("w"))
      .localCheckpoint(true) // both wedge legs
    val hop2 = samp.repartition(par).as("h1")
      .join(samp.as("h2"), col("h1.from") === col("h2.from"))
      .filter(col("h1.to") < col("h2.to"))
      .select(col("h1.to").as("anchor"), col("h2.to").as("candidate"),
        floor(col("h1.w") * col("h2.w") / lit(1000000L)).cast("long")
          .as("pw"))
    val friendPairs = adjFull
      .select(col("from").as("anchor"), col("to").as("candidate"))
      .distinct()
    val scored = hop2
      .repartition(par, col("anchor"), col("candidate"))
      .groupBy("anchor", "candidate")
      .agg(sum(col("pw")).as("score_micros"))
      .select(explode(array(
        struct(col("anchor"), col("candidate"), col("score_micros")),
        struct(col("candidate").as("anchor"), col("anchor").as("candidate"),
          col("score_micros")))).as("p"))
      .select(col("p.anchor").as("anchor"),
        col("p.candidate").as("candidate"),
        col("p.score_micros").as("score_micros"))
      .join(friendPairs, Seq("anchor", "candidate"), "left_anti")
    TopK.grouped(scored, Seq("anchor"),
        struct((-col("score_micros")).as("ns"), col("candidate").as("c")),
        limit)
      .select(col("anchor"), col("best.c").as("id"),
        (-col("best.ns")).as("score_micros"))
      .orderBy(col("anchor"), desc("score_micros"), col("id"))
  }

  /** Edge embeddedness — the Jaccard of the endpoints' neighborhoods,
    * the TIE-STRENGTH metric complementing [[GraphAnalytics.weakTies]]
    * (embeddedness 0 = local bridge): `|N(u)∩N(v)| / |N(u)∪N(v)|` in
    * integer micros via `∩/(du + dv − ∩ − 2)` (the endpoints
    * themselves are excluded from the union — they are in each
    * other's neighborhoods, never common). One wedge join + two
    * degree hydrations, exact integers until one final division.
    *
    * @return (u, v, common, emb_micros) per canonical edge, ordered.
    */
  def edgeEmbeddedness(edges: DataFrame): DataFrame = {
    val e = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val adj = e.select(col("u").as("f"), col("v").as("t"))
      .unionAll(e.select(col("v").as("f"), col("u").as("t")))
    val deg = adj.groupBy(col("f").as("id")).agg(count(lit(1)).as("d"))
    val common = e
      .join(adj.select(col("f").as("u"), col("t").as("w1")), "u")
      .join(adj.select(col("f").as("v"), col("t").as("w2")), "v")
      .filter(col("w1") === col("w2"))
      .groupBy("u", "v").agg(count(lit(1)).as("common"))
    e.join(common, Seq("u", "v"), "left")
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"),
        coalesce(col("common"), lit(0L)).as("common"),
        {
          val c = coalesce(col("common"), lit(0L))
          val denom = col("du") + col("dv") - c - lit(2)
          // degree-1–degree-1 pairs have an empty union → 0, not 0/0
          when(denom <= 0, lit(0L))
            .otherwise(floor(lit(1000000L) * c / denom).cast("long"))
            .as("emb_micros")
        })
      .orderBy("u", "v")
  }

  /** Anchor lookup by case-insensitive name — the `_name` shadow
    * property (upsert_bizcard_to_graph_db.py:94, queried at
    * neptune_recommend_bizcard.py:59). Returns the id column of the
    * first match; caller feeds it to [[recommend]].
    */
  def anchorByName(vertices: DataFrame, user: String): DataFrame =
    vertices.filter(lower(col("name")) === user.toLowerCase).select("id").limit(1)

  /** Item–item collaborative filtering over a (user, item) interaction
    * frame — the co-occurrence recommender next to the social 2-hop
    * ([[recommendAll]]): two items are similar when the same users
    * touch both, normalized by item popularity (binary cosine:
    * `co / √(dᵢ·dⱼ)`). The "people who viewed X also viewed Y" surface
    * the reference's album feed implies but never computes.
    *
    * Determinism: co-occurrence and degree counts are exact integers;
    * each similarity is ONE fixed IEEE expression floored to micros;
    * top-k ranks the QUANTIZED score with the item id as tiebreak.
    *
    * 100 TB shape: distinct (user, item) projection, a user-keyed
    * self-join for pairs whose cost is Σᵤ deg(u)² — bounded by
    * `userCap` (power users above the cap are dropped ENTIRELY, the
    * standard co-occurrence guard: their pairs are the quadratic
    * blowup and carry the least signal), two item-keyed degree
    * hydrations, one bounded-heap top-k per item. No all-pairs
    * item×item anything.
    *
    * @return (item, rec, co, sim_micros) top-k per item by
    *         (sim desc, rec asc).
    */
  def itemItemTopK(interactions: DataFrame, userCol: String,
                   itemCol: String, k: Int, userCap: Int): DataFrame = {
    val ui = interactions
      .select(col(userCol).as("u"), col(itemCol).as("item")).distinct()
    val kept = ui.withColumn("_udeg",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("u")))
      .filter(col("_udeg") <= userCap).drop("_udeg")
    val pairs = kept.select(col("u"), col("item").as("i"))
      .join(kept.select(col("u"), col("item").as("j")), "u")
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("co"))
    val deg = kept.groupBy(col("item")).agg(count(lit(1)).as("d"))
    val sym = pairs.unionAll(
      pairs.select(col("j").as("i"), col("i").as("j"), col("co")))
    val scored = sym
      .join(deg.select(col("item").as("i"), col("d").as("di")), "i")
      .join(deg.select(col("item").as("j"), col("d").as("dj")), "j")
      .select(col("i").as("item"), col("j").as("rec"), col("co"),
        floor(lit(1e6) * (col("co").cast("double") /
          sqrt((col("di") * col("dj")).cast("double")))).cast("long")
          .as("sim_micros"))
    TopK.grouped(scored, Seq("item"),
        struct((-col("sim_micros")).as("ns"), col("rec").as("r"),
          col("co").as("c")), k)
      .select(col("item"), col("best.r").as("rec"), col("best.c").as("co"),
        (-col("best.ns")).as("sim_micros"))
      .orderBy(col("item"), desc("sim_micros"), col("rec"))
  }

  /** Reciprocal best matches over a ranked rec table — the
    * high-precision cut every matcher ships behind the top-k list:
    * keep pair (a, b) only when b is a's SINGLE best candidate AND a
    * is b's (the mutual-rank-1 rule — BLAST's reciprocal-best-hit,
    * the matching-market "stable pair" heuristic). One self-join of
    * the rank-1 rows on the reversed key + the a < b canonicalization;
    * input is any (item, rec, score, rank-implied-by-order) frame from
    * [[itemItemTopK]], [[recommendAll]], or a linkage scorer ranked by
    * the caller.
    *
    * @param recs (itemCol, recCol, scoreCol) ranked rows where rank 1
    *             per item = its best match (rankCol = 1 filter is the
    *             caller's if the frame carries more).
    * @return (a, b, score_a, score_b) with a < b, ordered.
    */
  def mutualBest(recs: DataFrame, itemCol: String, recCol: String,
                 scoreCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(itemCol)
      .orderBy(desc(scoreCol), col(recCol))
    val best = recs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col(itemCol).as("a"), col(recCol).as("b"),
        col(scoreCol).as("score_a"))
    best.join(best.select(col("a").as("b"), col("b").as("a"),
        col("score_a").as("score_b")), Seq("a", "b"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("score_a"), col("score_b"))
      .orderBy("a", "b")
  }
}
