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
  * baskets like power users in item-item CF), then ONE tagged explode
  * generates pairs, single items and a basket marker INSIDE each
  * basket's array (Σ_b |b|² compute, zero join) into one (i, j)-keyed
  * count — two shuffles total, one of them the single tagged exchange
  * that yields pair supports, item supports and the basket total
  * together — pruned by `minSupport` BEFORE the item-count
  * hydrations, bounded-heap top-N.
  */
object Assoc {

  /** Mine directed rules a → b with pair support ≥ `minSupport`.
    * @return top-N rows (a, b, n_ab, support_micros, conf_micros,
    *         lift_micros) by (lift desc, a, b).
    */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
            minSupport: Long, topN: Int): DataFrame = {
    // per-basket distinct item sets in one keyed fold; ≤ |basket|
    // array entries per row, consumed ONCE by the tagged explode below
    val sets = baskets
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("items"))
    // ONE tagged explode (r16): every basket emits its i<j pairs, its
    // single items as (i, null), and one (null, null) marker — ONE
    // exchange feeds ONE aggregation computing pair supports, item
    // supports AND the basket total, where the previous shape wrote a
    // separate pair / item / total exchange (the sorted set's elements
    // are non-null by construction, so the null tag is unambiguous).
    // Deliberately NOT checkpointed: the three consumers re-run only
    // the final agg over the one reused exchange, and AQE materializes
    // those independent re-reads concurrently — a checkpoint barrier
    // here measured SLOWER at sf0.1 (1.24 vs 1.12 s) by serializing
    // them. At scale the win is the shuffle-write count: one tagged
    // exchange instead of three explode exchanges.
    val counts = sets
      .select(explode(graft.functions.expr.TextExprs
        .array_combos_tagged(col("items"))).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(count(lit(1)).as("c"))
    val n = counts.filter(col("i").isNull && col("j").isNull)
      .select(col("c").as("n"))
    val itemCnt = counts.filter(col("i").isNotNull && col("j").isNull)
      .select(col("i"), col("c").as("ci"))
    val pairs = counts.filter(col("j").isNotNull)
      .select(col("i"), col("j"), col("c").as("nab"))
      .filter(col("nab") >= minSupport)
    // Hydrate BOTH endpoint counts onto the i<j row, then explode the
    // two rule directions from it — a post-agg union would re-run the
    // pair aggregation once per direction.
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
