package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-engineering operators — the tabular feature-prep steps a
  * training pipeline runs next to the text/embedding ones: trailing
  * time-window aggregates per entity ("events in the last hour",
  * "spend in the last 7 days") and leakage-safe categorical target
  * encoding. Both are single keyed-window / keyed-agg shapes — no
  * global windows, no self-joins — so they scan-scale like every
  * other keyed operator here.
  */
object Features {

  /** Trailing event-time window aggregates per key: for every row,
    * count and sum of `valueCol` over the same key's rows in
    * `[ts - windowUnits, ts]` (inclusive both ends — the current row
    * participates, the standard "including this event" convention).
    * `tsCol` must be castable to exact integer units via the caller's
    * axis (micros for timestamps); `windowUnits` is in those units.
    *
    * Scale shape: ONE window partitioned by key, ordered by the
    * integer axis, with a `rangeBetween` frame — Spark evaluates it
    * with a per-key sort and a sliding frame, one shuffle on the key.
    * Never a self-join (the naive range-join formulation explodes to
    * O(rows·window) pairs).
    *
    * @return input + (w_cnt, w_sum) columns.
    */
  /** Exponentially time-decayed interaction weights per key — the
    * recency bias every living recommender needs (yesterday's click
    * outweighs last month's): each event contributes
    * `round(1e6 · 2^(−age/halfLife))` micros relative to `refTs`, so
    * the keyed fold is a SUM OF INTEGERS — order-independent and
    * SQL-replayable (the `pow`/`exp` parity precedent of the LR
    * gates). Feed the result to [[GraphAnalytics.pageRankWeightedDF]]
    * or [[Pymk.itemItemTopK]] for recency-aware rankings.
    *
    * One map-side-combined keyed fold; `refTs` is an explicit
    * parameter (never now()) so results are replayable.
    *
    * @return keyCols + (w_micros, n).
    */
  def decayedCounts(df: DataFrame, keyCols: Seq[String], tsCol: String,
                    refTs: String, halfLifeDays: Double): DataFrame = {
    val age = (unix_micros(lit(refTs).cast("timestamp")) -
      unix_micros(col(tsCol))).cast("double") / lit(86400.0 * 1e6)
    df.groupBy(keyCols.map(col): _*)
      .agg(sum(round(lit(1e6) * pow(lit(2.0), -age / lit(halfLifeDays)))
          .cast("long")).as("w_micros"),
        count(lit(1)).as("n"))
      .orderBy(keyCols.map(col): _*)
  }

  def trailingWindow(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, windowUnits: Long): DataFrame = {
    val axis = unix_micros(col(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(axis)
      .rangeBetween(-windowUnits, 0)
    df.withColumn("w_cnt", count(lit(1)).over(w))
      .withColumn("w_sum", sum(col(valueCol)).over(w))
  }

  /** Leakage-safe (leave-one-out) target encoding of a categorical
    * column: each row's feature is the mean of `targetCol` over OTHER
    * rows of the same category — `(Σ_k − v) / (n_k − 1)` — so a row
    * never sees its own label (the classic target-leak bug this
    * operator exists to prevent). Categories with one row yield NULL
    * (no peers); the caller decides the fallback (global mean is the
    * usual choice, exposed as `loo_global`).
    *
    * Integer-micro contract: the per-category sums are exact micros
    * (`trunc(v·1e6)` per row — the [[Pca.moments]] dyadic rule), so
    * the encoding hash-matches any engine; the final division is one
    * double op on exact integers, rounded to 6 decimals.
    *
    * Scale shape: one keyed aggregation to the category table
    * (broadcast back — category cardinality is small by definition of
    * categorical), plus one 1-row global aggregate. No window, no
    * self-join.
    *
    * @return input + (loo_enc, loo_global) columns.
    */
  def targetEncodeLoo(df: DataFrame, catCol: String,
                      targetCol: String): DataFrame = {
    val vm = (col(targetCol).cast("double") * lit(1e6)).cast("long")
    val cats = df
      .select(col(catCol), vm.as("_vm"))
      .groupBy(col(catCol))
      .agg(sum(col("_vm")).as("_sum"), count(lit(1)).as("_n"))
    val global = df.agg(
      round((sum(vm).cast("double") / lit(1e6)) / count(lit(1)), 6)
        .as("loo_global"))
    df.join(broadcast(cats), Seq(catCol))
      .withColumn("loo_enc",
        when(col("_n") > 1,
          round(((col("_sum") - vm).cast("double") / lit(1e6)) /
            (col("_n") - 1), 6)))
      .crossJoin(broadcast(global))
      .drop("_sum", "_n")
  }

  /** Equal-frequency discretization (quantile binning): assign each
    * row `bin = ⌊nBins·(rank−1)/n⌋` of its value's GLOBAL rank — the
    * feature transform that makes a skewed numeric column uniform for
    * downstream bucketed models. Exact, not sketch-approximate: rank
    * comes from [[Packing.globalRank]] (range partition +
    * per-partition window + O(#partitions) driver offsets), so there
    * is never a single global sort window — the plan that survives
    * 100 TB where `ntile()` would funnel every row through one
    * reducer. Ties break by `tieCol`, making the assignment total and
    * engine-replayable; all operands stay exact in double (< 2⁵³).
    *
    * @return (tieCol, valueCol, bin) — bin in [0, nBins).
    */
  def quantileBins(df: DataFrame, valueCol: String, tieCol: String,
                   nBins: Int): DataFrame = {
    val (ranked, n) = Packing.globalRank(
      df.select(col(valueCol).as("v"), col(tieCol).as("tie")),
      Seq("v", "tie"))
    ranked.select(col("tie").as(tieCol), col("v").as(valueCol),
      floor(lit(nBins.toLong) * (col("_grank") - 1) / lit(n))
        .cast("long").as("bin"))
  }

  /** Weight-of-evidence + information-value feature screen (the
    * credit-scoring standard; Siddiqi 2006) — how well a binned
    * numeric feature separates a binary label, beside the χ² screen:
    * per [[quantileBins]] bin, `WOE = ln((pos_b/POS)/(neg_b/NEG))`
    * (one ln of an exact integer cross-ratio) and the IV contribution
    * `(pos_b/POS − neg_b/NEG)·WOE`, each quantized to micros per bin
    * BEFORE any cross-bin use (IV = Σ of the published terms, so the
    * total is reproducible from the output). Bins with a zero cell
    * are emitted with NULL woe (standard practice is to merge or
    * smooth them — the NULL makes the decision visible instead of
    * silently ±∞).
    *
    * @return (bin, n_pos, n_neg, woe_micros, iv_term_micros) ordered.
    */
  def woeIv(df: DataFrame, valueCol: String, tieCol: String,
            labelCol: String, nBins: Int): DataFrame = {
    val binned = quantileBins(
        df.select(col(valueCol), col(tieCol)), valueCol, tieCol, nBins)
      .join(df.select(col(tieCol), col(labelCol).cast("long").as("y")),
        tieCol)
    val b = binned.groupBy(col("bin"))
      .agg(sum(col("y")).as("n_pos"),
        (count(lit(1)) - sum(col("y"))).as("n_neg"))
      .localCheckpoint(true) // totals + per-bin terms
    val tot = b.agg(sum(col("n_pos")).as("pos"), sum(col("n_neg")).as("neg"))
    b.crossJoin(broadcast(tot))
      .withColumn("woe_micros",
        when(col("n_pos") === 0 || col("n_neg") === 0,
          lit(null).cast("long"))
          .otherwise(round(lit(1e6) * log(
            (col("n_pos") * col("neg")).cast("double")
              / (col("n_neg") * col("pos")).cast("double")))
            .cast("long")))
      .withColumn("iv_term_micros",
        when(col("woe_micros").isNull, lit(null).cast("long"))
          .otherwise(floor(
            (col("n_pos").cast("double") / col("pos")
              - col("n_neg").cast("double") / col("neg"))
              * col("woe_micros")).cast("long")))
      .select(col("bin"), col("n_pos"), col("n_neg"), col("woe_micros"),
        col("iv_term_micros"))
      .orderBy(col("bin"))
  }

  /** Information gain of a [[quantileBins]] split against a binary
    * label — the decision-tree split criterion beside [[woeIv]]'s
    * credit-scoring screen: `IG = H(y) − Σ_b (n_b/N)·H(y|b)` in nats.
    * Every entropy is a sum of per-class terms
    * `round(−1e6·p·ln p)` (integer micros, the PMI convention —
    * zero-count classes contribute exactly 0), and the per-bin
    * conditional weight `⌊n_b·H_b/N⌋` quantizes to a long BEFORE the
    * cross-bin fold, so IG is reproducible from the published parts.
    *
    * Shape: the exact-rank binning + one bin fold + one 1-row
    * broadcast — bins rows past the rank.
    *
    * @return one row (n, bins_used, h_y_micros, h_cond_micros,
    *         ig_micros).
    */
  def infoGain(df: DataFrame, valueCol: String, tieCol: String,
               labelCol: String, nBins: Int): DataFrame = {
    val binned = quantileBins(
        df.select(col(valueCol), col(tieCol)), valueCol, tieCol, nBins)
      .join(df.select(col(tieCol), col(labelCol).cast("long").as("y")),
        tieCol)
    val b = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("y")).as("pb"))
      .localCheckpoint(true) // totals + per-bin terms
    val tot = b.agg(sum(col("nb")).as("n"), sum(col("pb")).as("pos"),
      count(lit(1)).as("bins_used"))
    def term(c: Column, n: Column): Column =
      when(c === 0 || c === n, lit(0L))
        .otherwise(round(lit(-1e6) * (c.cast("double") / n) *
          log(c.cast("double") / n)).cast("long"))
    val hy = term(col("pos"), col("n")) +
      term(col("n") - col("pos"), col("n"))
    val hb = term(col("pb"), col("nb")) +
      term(col("nb") - col("pb"), col("nb"))
    b.crossJoin(broadcast(tot))
      .select(col("n"), col("bins_used"), hy.as("hy"),
        floor(col("nb") * hb / col("n")).cast("long").as("wb"))
      .groupBy(col("n"), col("bins_used"), col("hy"))
      .agg(sum(col("wb")).as("h_cond_micros"))
      .select(col("n"), col("bins_used"), col("hy").as("h_y_micros"),
        col("h_cond_micros"),
        (col("hy") - col("h_cond_micros")).as("ig_micros"))
  }
}
