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
  * 100 TB shape: one distinct projection, a basket-keyed self-join
  * whose cost is Σ_b |b|² (basket sizes are naturally small; cap
  * oversized baskets like power users in item-item CF), map-side
  * pair counts pruned by `minSupport` BEFORE the item-count
  * hydrations, bounded-heap top-N.
  */
object Assoc {

  /** Mine directed rules a → b with pair support ≥ `minSupport`.
    * @return top-N rows (a, b, n_ab, support_micros, conf_micros,
    *         lift_micros) by (lift desc, a, b).
    */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
            minSupport: Long, topN: Int): DataFrame = {
    val bi = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val n = bi.select(col("b")).distinct().agg(count(lit(1)).as("n"))
    val itemCnt = bi.groupBy(col("i")).agg(count(lit(1)).as("ci"))
    val pairs = bi.join(bi.select(col("b"), col("i").as("j")), "b")
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("nab"))
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
