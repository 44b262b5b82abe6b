package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guards (the 100 TB posture, asserted): predicate and
  * projection pushdown reach the parquet scan, small dims broadcast,
  * top-k plans as TakeOrderedAndProject, scalar pipelines stay inside
  * WholeStageCodegen. These are regression tests for plan shape — if a
  * future change silently turns a broadcast join into a shuffle join or
  * loses a pushed filter, this suite fails before the benchmark does.
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString()
  }

  test("qA1: filter and projection are pushed into the parquet scan") {
    val p = plan("qA1_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("PushedFilters: [IsNotNull(l_discount)"), p.take(2000))
    // pruned read schema: only the 6 referenced columns, not all 11
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_tax"), "unreferenced column must be pruned from scan")
  }

  test("qC1/qC8: dimension sides are broadcast, not shuffled") {
    assert(plan("qC1_point_join").contains("BroadcastHashJoin"))
    val p8 = plan("qC8_hydrate_join")
    assert(p8.contains("BroadcastHashJoin"))
    assert(!p8.contains("SortMergeJoin"), "dims must not sort-merge")
  }

  test("qE2: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("qE2_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(!p.contains("\nSort "), "no full sort for a limit query")
  }

  test("scalar pipelines run inside WholeStageCodegen") {
    // '*(n)' node prefix marks a WholeStageCodegen stage in toString.
    // Note: higher-order array functions (tokenize-based queries like
    // qX_quality) are CodegenFallback by design in Spark — those run
    // interpreted; a custom codegen Expression is the future fix.
    for (q <- Seq("qB8_md5_8", "qB9_content_id", "qB10_ts_format"))
      assert(plan(q).contains("*(1)"), s"$q lost codegen")
  }

  test("PYMK: adjacency joins are hash joins keyed on vertex id") {
    val p = plan("qD1_pymk")
    assert(p.contains("HashJoin") || p.contains("BroadcastHashJoin"), p.take(3000))
    // bag semantics: no Distinct/Aggregate between the two hop joins —
    // the only aggregate is the final path-count groupBy
    assert(p.contains("TakeOrderedAndProject"), "final top-k must be TopK")
  }

  test("search scoring: per-term DF table broadcasts into the tf join") {
    val p = plan("qG1_search_tfidf")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }
}
