package graft.operators

import org.apache.spark.graphx.{Edge, Graph, VertexId, VertexRDD}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GraphX twin of the DataFrame graph operators — the iterative
  * analytics vehicle (BASELINE.json: "GraphX for analytics") for
  * workloads where iteration depth > 2 makes join-chains unwieldy
  * (SURVEY §4 custom-work item 4).
  *
  * The 2-hop PYMK itself stays in DataFrame joins ([[Pymk]] — two
  * hash joins beat Pregel setup for fixed depth 2); this module
  * generalizes: k-hop walk counting via iterated `aggregateMessages`,
  * degrees, PageRank, connected components.
  *
  * String md5-8 vertex ids are mapped to GraphX's Long VertexId via
  * xxhash64 (collision-free in practice at 8-hex-char id space, and
  * deterministic so results are reproducible across runs).
  */
object GraphAnalytics {

  /** Build a GraphX graph from (vertices, edges) DataFrames with string
    * ids. Returns the graph plus the id↔hash mapping DataFrame for
    * joining results back to properties.
    */
  def toGraphX(vertices: DataFrame, edges: DataFrame): (Graph[String, Double], DataFrame) = {
    val vmap = vertices.select(col("id"), xxhash64(col("id")).as("vid")).cache()
    val vrdd = vmap.rdd.map(r => (r.getLong(1), r.getString(0)))
    val erdd = edges
      .select(xxhash64(col("src")).as("s"), xxhash64(col("dst")).as("d"),
        coalesce(col("weight"), lit(1.0)).as("w"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    (Graph(vrdd, erdd), vmap)
  }

  /** Number of length-k undirected walks from `anchor` to every vertex:
    * k rounds of `aggregateMessages` propagating walk counts along both
    * edge directions (the `both('knows')` semantics). For k = 2 minus
    * the self/friend exclusions this is exactly PYMK's bag path count
    * — asserted against [[Pymk.recommend]] in tests.
    */
  def kWalkCounts[V](graph: Graph[V, Double], anchor: VertexId, k: Int): VertexRDD[Long] = {
    var counts: Graph[Long, Double] =
      graph.mapVertices((vid, _) => if (vid == anchor) 1L else 0L)
    for (_ <- 1 to k) {
      val msgs = counts.aggregateMessages[Long](
        ctx => {
          if (ctx.srcAttr > 0) ctx.sendToDst(ctx.srcAttr)
          if (ctx.dstAttr > 0) ctx.sendToSrc(ctx.dstAttr) // undirected
        },
        _ + _)
      counts = counts.outerJoinVertices(msgs)((_, _, m) => m.getOrElse(0L))
    }
    counts.vertices
  }

  /** PYMK via GraphX for arbitrary hop count k (default 2): walk counts
    * at depth k, excluding the anchor and every vertex within the 1-hop
    * neighborhood (the `without('friends')` set). Returns a DataFrame
    * (id, score) like [[Pymk.recommend]].
    */
  def pymkK(spark: SparkSession, vertices: DataFrame, edges: DataFrame,
            anchorId: String, k: Int = 2, limit: Int = 10): DataFrame = {
    import spark.implicits._
    val (graph, vmap) = toGraphX(vertices, edges)
    val anchor = vmap.filter(col("id") === anchorId).select("vid")
      .head().getLong(0)
    val walkK = kWalkCounts(graph, anchor, k)
    val hop1 = kWalkCounts(graph, anchor, 1)
    // friend exclusion stays distributed (subtractByKey, the RDD
    // anti-join): a hub anchor can have millions of 1-hop neighbors —
    // collecting them to a driver-side Set would OOM at scale
    val friends = hop1.filter(_._2 > 0)
    val scores = walkK
      .filter { case (vid, c) => c > 0 && vid != anchor }
      .subtractByKey(friends)
      .toDF("vid", "score")
    scores.join(vmap, "vid").select(col("id"), col("score"))
      .orderBy(desc("score"), asc("id"))
      .limit(limit)
  }

  /** Undirected degree per vertex id (GraphX `degrees`). */
  def degrees(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val (graph, vmap) = toGraphX(vertices, edges)
    val spark = vertices.sparkSession
    import spark.implicits._
    graph.degrees.toDF("vid", "degree").join(vmap, "vid")
      .select(col("id"), col("degree"))
  }

  /** PageRank over the directed `knows` graph — the centrality
    * extension the reference gestures at but never ships. Fixed
    * iteration count (`staticPageRank`), not tolerance-convergence:
    * deterministic result and bounded cost regardless of graph
    * connectivity. */
  def pageRank(vertices: DataFrame, edges: DataFrame,
               iters: Int = 10): DataFrame = {
    val (graph, vmap) = toGraphX(vertices, edges)
    val spark = vertices.sparkSession
    import spark.implicits._
    graph.staticPageRank(iters).vertices.toDF("vid", "rank").join(vmap, "vid")
      .select(col("id"), round(col("rank"), 6).as("rank"))
  }

  /** DataFrame power-iteration PageRank — the same fixed-iteration
    * semantics as [[pageRank]] (GraphX staticPageRank: ranks start at
    * 1.0; each round every vertex recomputes
    * `rank = (1-d) + d * Σ_{u→v} rank(u)/outdeg(u)`; dangling mass is
    * not redistributed per-round, and the FINAL ranks are rescaled so
    * they sum to |V| — GraphX's sink correction, verified value-equal
    * against staticPageRank in AsOfPageRankSpec), expressed as one
    * shuffle per iteration so the whole computation is plain Catalyst
    * plans and — unlike the GraphX RDD path — SQL-expressible for the
    * DuckDB oracle (qX_pagerank_df).
    *
    * Scale shape: `contribs` (edges with precomputed 1/outdeg share) is
    * materialized once; each iteration joins it to the current ranks on
    * `src` (narrow if edges are bucketed by src) and reduces on `dst`
    * (map-side partial sums first — the hub-skew absorber at 100 TB).
    *
    * Materialization cadence: iterations are chained LAZILY (the plan
    * grows linearly — one join + one agg per round) and only every
    * `materializeEvery` rounds is the frontier cut with an eager
    * `localCheckpoint`. Per-iteration materialization (persist + count)
    * costs ~3 Spark jobs per round and is pure fixed overhead on a
    * small graph — it was 104.7 s vs 2.4 s for the GraphX twin on the
    * same sf0.1 graph; batching K rounds per job removes ~(K−1)/K of
    * it. `localCheckpoint` (not `persist`) so the blocks belong to the
    * RDD, not the cache manager: they are released by the
    * ContextCleaner when the result DataFrame is dropped — no
    * unpersist() bookkeeping leaks. On a cluster this becomes
    * checkpoint-to-table every `materializeEvery` rounds (local
    * checkpoint blocks don't survive executor loss).
    */
  /** One power-iteration round: join current ranks into the contrib
    * edges on src, reduce per dst (map-side partial sums — the
    * hub-skew absorber), left-join back onto the full vertex set.
    * Exposed for plan-shape regression tests. */
  private[graft] def prStep(contribs: DataFrame, verts: DataFrame,
                            ranks: DataFrame, damping: Double): DataFrame = {
    val msgs = contribs
      .join(ranks.withColumnRenamed("id", "src"), "src")
      .groupBy(col("dst").as("id"))
      .agg(sum(col("rank") / col("outdeg")).as("msum"))
    verts.join(msgs, Seq("id"), "left")
      .select(col("id"),
        (lit(1.0 - damping) + lit(damping) * coalesce(col("msum"), lit(0.0)))
          .as("rank"))
  }

  def pageRankDF(edges: DataFrame, iters: Int = 10,
                 damping: Double = 0.85,
                 materializeEvery: Int = 5): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // carry outdeg (divide per term, rank/d) rather than a precomputed
    // 1/d reciprocal: a*(1/d) and a/d differ in the last float ulp, and
    // the DuckDB oracle computes rank/d — keep the arithmetic identical
    val contribs = e.join(outDeg, "src")
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint(true)
    val verts = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    var ranks = verts.withColumn("rank", lit(1.0))
    for (i <- 1 to iters) {
      val next = prStep(contribs, verts, ranks, damping)
      // cut lineage every K rounds, and always on the last round so the
      // normalization agg and the returned DataFrame both read the
      // materialized blocks instead of re-running the tail iterations
      ranks = if (i % materializeEvery == 0 || i == iters)
        next.localCheckpoint(true) else next
    }
    // GraphX's normalization: rescale so Σrank = |V| (two scalars to
    // the driver — constant-size at any graph scale)
    val agg = ranks.agg(count(lit(1)).as("n"), sum(col("rank")).as("s")).head()
    val (n, s) = (agg.getLong(0), agg.getDouble(1))
    ranks.select(col("id"),
      round(col("rank") * lit(n) / lit(s), 6).as("rank"))
  }

  /** Connected components (undirected) — community seed for the social
    * graph. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val (graph, vmap) = toGraphX(vertices, edges)
    val spark = vertices.sparkSession
    import spark.implicits._
    graph.connectedComponents().vertices.toDF("vid", "component")
      .join(vmap, "vid").select(col("id"), col("component"))
  }
}
