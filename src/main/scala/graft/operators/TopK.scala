package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftTopKBridge

/** Grouped top-k as a bounded-heap AGGREGATE, not a window sort — the
  * E2/E3 ranking tier (order-by-score + limit per key; SURVEY §2.E)
  * generalized to grouped data at scale.
  *
  * The `row_number().over(Window.partitionBy(g).orderBy(...)) <= k`
  * formulation must materialize and sort every group's full row set
  * (Spark's WindowGroupLimit prunes to k per partition pre-shuffle,
  * but each task still sorts its slice). This operator instead folds
  * rows into a k-bounded priority queue per group (Spark's internal
  * `CollectTopK`, reached via [[GraftTopKBridge]]): O(k) state per
  * group, map-side partial heaps, and the shuffle carries at most
  * k·mappers rows per group instead of the whole group — the
  * difference between "sort 100 TB" and "heap-fold 100 TB" when
  * groups are large. Window-formulation equivalence is locked in
  * ScaleOpsSpec.
  */
object TopK {

  /** Per-group top-k of `sortKey` (a column or struct; struct order is
    * lexicographic). With `smallestFirst` the k smallest ascending —
    * rank 1 = minimum — else the k largest descending.
    *
    * Determinism contract (same as the row_number window form): the
    * sortKey must be a TOTAL order within each group — append the
    * group-unique id as the last struct field. Mixed-direction orders
    * encode descending numeric fields by negation
    * (`struct(-score, id)` + smallestFirst == score desc, id asc);
    * payload fields may trail the ordering fields and ride along
    * without affecting ranks.
    *
    * @return groupCols ++ (rankCol: 1-based rank, bestCol: the sortKey
    *         struct) — one row per (group, rank).
    */
  def grouped(df: DataFrame, groupCols: Seq[String], sortKey: Column, k: Int,
              smallestFirst: Boolean = true, rankCol: String = "rank",
              bestCol: String = "best"): DataFrame = {
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(GraftTopKBridge.topK(sortKey, k, smallestFirst).as("_top"))
    agged.select(groupCols.map(col) :+ posexplode(col("_top")): _*)
      .withColumnRenamed("pos", rankCol)
      .withColumnRenamed("col", bestCol)
      .withColumn(rankCol, col(rankCol) + 1)
  }
}
