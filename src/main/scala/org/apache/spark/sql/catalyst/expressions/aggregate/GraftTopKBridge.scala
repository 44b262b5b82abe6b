package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bridge to Spark's internal bounded-heap top-k aggregate
  * (`CollectTopK`, private[aggregate] — hence this file's package):
  * per-group top-k with O(k) aggregation state and map-side partial
  * heaps, no window sort — used by [[graft.operators.TopK]]. Same
  * one-file-shim pattern as [[ColumnBridge]]; everything else stays in
  * the public API.
  */
object GraftTopKBridge {

  /** Aggregate column over `ord`: with `smallestFirst` the k SMALLEST
    * values, ascending (CollectTopK reverse=true); else the k largest,
    * descending. `ord` may be a struct — ordering is the struct's
    * lexicographic natural order. */
  def topK(ord: Column, k: Int, smallestFirst: Boolean): Column =
    ColumnBridge.toColumn(
      CollectTopK(ColumnBridge.toExpr(ord), k, reverse = smallestFirst)
        .toAggregateExpression())
}
