package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY §2, one entry per
  * implemented operator, each paired (where SQL-expressible) with a
  * DuckDB oracle in `oracleSql`. Column names are aliased identically on
  * both sides (the driver compare sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the PYMK 2-hop
    * recommendation (SURVEY §3.3) over the events-derived edge view.
    * Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val edges = graft.queries.GraphQueries.derivedEdges(events)
    operators.Pymk.recommend(edges, lit(1L), 10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.EventQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.GraphQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.EventQueries.oracles
}
