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

  /** Spark's internal bloom-filter pair (the machinery behind AQE
    * runtime filters, surfaced as explicit operators for
    * [[graft.operators.Skew.bloomPrunedSemiJoin]]): `bloomAgg` folds a
    * LONG column into a serialized BloomFilter (binary, a few hundred
    * KB); `mightContain` is the codegen'd membership predicate. */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.toColumn(
      new BloomFilterAggregate(ColumnBridge.toExpr(c),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(numBits))
        .toAggregateExpression())

  def mightContain(bloom: Column, value: Column): Column =
    ColumnBridge.toColumn(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        ColumnBridge.toExpr(bloom), ColumnBridge.toExpr(value)))
}
