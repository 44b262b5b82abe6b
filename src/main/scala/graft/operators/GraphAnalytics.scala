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
    val friendSet = hop1.filter(_._2 > 0).map(_._1).collect().toSet
    val scores = walkK
      .filter { case (vid, c) => c > 0 && vid != anchor && !friendSet.contains(vid) }
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
