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
  * re-derive from the same set table through one reused exchange.
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
    // No checkpoint: the three consumers below share this agg's
    // exchange via ReusedExchange inside the one final plan (verified
    // in AssocSpec) — an eager localCheckpoint here would pin blocks
    // until the caller's session cleanup (the r14 ADVICE leak).
    val sets = baskets
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("items"))
    val n = sets.agg(count(lit(1)).as("n"))
    val itemCnt = sets.select(explode(col("items")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("ci"))
    // all i < j pairs inside the sorted array — no self-join; native
    // codegen pair expansion (the HOF twin is the executable spec,
    // equivalence-locked in EventsDriftSpec)
    val pairs = sets
      .select(explode(graft.functions.expr.TextExprs
        .array_combos(col("items"))).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(count(lit(1)).as("nab"))
      .filter(col("nab") >= minSupport)
    // Hydrate BOTH endpoint counts onto the i<j row, then explode the
    // two rule directions from it — a post-agg union would re-run the
    // Σ|b|²-row pair aggregation once per direction (exchange reuse
    // dedups only the shuffle write, not the final agg pass).
    pairs
      .join(itemCnt.select(col("i"), col("ci").as("ca")), "i")
      .join(itemCnt.select(col("i").as("j"), col("ci").as("cb")), "j")
      .crossJoin(broadcast(n))
      .select(explode(array(
        struct(col("i").as("a"), col("j").as("b"), col("nab"),
          col("ca").as("c_a"), col("cb").as("c_b"), col("n")),
        struct(col("j").as("a"), col("i").as("b"), col("nab"),
          col("cb").as("c_a"), col("ca").as("c_b"), col("n"))))
        .as("r"))
      .select(col("r.a").as("a"), col("r.b").as("b"),
        col("r.nab").as("n_ab"),
        floor(lit(1000000L) * col("r.nab") / col("r.n")).cast("long")
          .as("support_micros"),
        floor(lit(1000000L) * col("r.nab") / col("r.c_a")).cast("long")
          .as("conf_micros"),
        floor(lit(1000000L) * (col("r.nab") * col("r.n")) /
          (col("r.c_a") * col("r.c_b"))).cast("long").as("lift_micros"))
      .orderBy(desc("lift_micros"), col("a"), col("b"))
      .limit(topN)
  }
}
