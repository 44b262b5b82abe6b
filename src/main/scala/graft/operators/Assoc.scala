package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules (Agrawal & Srikant 1994) — the
  * co-purchase miner over (basket, item) pairs: which item PREDICTS
  * which, scored by support, confidence and lift. The rule form of
  * the co-occurrence signal [[Pymk.itemItemTopK]] ranks symmetrically:
  * confidence and lift are DIRECTED, so "diapers → beer" and
  * "beer → diapers" score differently.
  *
  * Determinism: all counts are exact integers from distinct
  * (basket, item) pairs; confidence and lift are single guarded
  * integer-ratio divisions in micros; the top-N ranks the QUANTIZED
  * lift with (antecedent, consequent) tiebreaks.
  *
  * 100 TB shape: ONE basket-keyed fold into per-basket item sets
  * (collect_set — basket sizes are naturally small; cap oversized
  * baskets like power users in item-item CF), then pairs generate
  * INSIDE each basket's array (Σ_b |b|² compute, zero join) into one
  * (i, j)-keyed count — two shuffles total where the self-join form
  * paid four — pruned by `minSupport` BEFORE the item-count
  * hydrations, bounded-heap top-N. Item counts and the basket total
  * re-derive from the same checkpointed set table.
  */
object Assoc {

  /** Mine directed rules a → b with pair support ≥ `minSupport`.
    * @return top-N rows (a, b, n_ab, support_micros, conf_micros,
    *         lift_micros) by (lift desc, a, b).
    */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
            minSupport: Long, topN: Int): DataFrame = {
    // per-basket distinct item sets in one keyed fold; ≤ |basket|
    // array entries per row, reused by the pair explode, the item
    // counts, and the basket total
    val sets = baskets
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("items"))
      .localCheckpoint(true)
    val n = sets.agg(count(lit(1)).as("n"))
    val itemCnt = sets.select(explode(col("items")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("ci"))
    // all i < j pairs inside the sorted array — no self-join
    val pairs = sets
      .select(explode(expr(
        "flatten(transform(items, (x, k) -> " +
          "transform(slice(items, k + 2, size(items) - k - 1), " +
          "y -> named_struct('i', x, 'j', y))))")).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(count(lit(1)).as("nab"))
      .filter(col("nab") >= minSupport)
    // both rule directions from the counted half
    val directed = pairs.select(col("i").as("a"), col("j").as("bb"),
        col("nab"))
      .unionAll(pairs.select(col("j").as("a"), col("i").as("bb"),
        col("nab")))
    directed
      .join(itemCnt.select(col("i").as("a"), col("ci").as("ca")), "a")
      .join(itemCnt.select(col("i").as("bb"), col("ci").as("cb")), "bb")
      .crossJoin(broadcast(n))
      .select(col("a"), col("bb").as("b"), col("nab").as("n_ab"),
        floor(lit(1000000L) * col("nab") / col("n")).cast("long")
          .as("support_micros"),
        floor(lit(1000000L) * col("nab") / col("ca")).cast("long")
          .as("conf_micros"),
        floor(lit(1000000L) * (col("nab") * col("n")) /
          (col("ca") * col("cb"))).cast("long").as("lift_micros"))
      .orderBy(desc("lift_micros"), col("a"), col("b"))
      .limit(topN)
  }
}
