package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.tokenize

/** Bigram language-model quality scoring — the CCNet/KenLM-style
  * perplexity filter (Wenzek et al. 2020: score crawl text with an
  * n-gram LM trained on a clean reference corpus; low-perplexity ≈
  * fluent, high ≈ garbage) that large-scale pretraining pipelines run
  * between dedup and mixing. Two halves:
  *
  *  - [[train]] — count bigram occurrences over the tokenized
  *    reference corpus: ONE keyed shuffle with map-side partial
  *    counts to a (ctx, word, cnt) model table. `minCount` prunes the
  *    long tail (CCNet prunes its KenLM the same way); pruned pairs
  *    score as unseen.
  *  - [[score]] — per-document mean log-probability under the model
  *    with add-one (Laplace) smoothing:
  *    `p(w|c) = (cnt(c,w) + 1) / (cnt(c) + V)`, V = model vocabulary
  *    (distinct tokens over ctx ∪ word). Context totals and V derive
  *    FROM the model table — the model is self-contained, no side
  *    state. Unseen bigram → 1/(cnt(c)+V); unseen context → 1/V: the
  *    standard held-out fallbacks, exercised by the qX_lm_score gate
  *    (model trained on one half, scored on the other).
  *
  * Determinism across engines (the DuckDB-oracle contract): log-probs
  * land as INTEGER micro-units per instance (`round(1e6·ln p)` — the
  * adamicAdar rule) before the per-doc sum, so totals are
  * order-independent; the reported perplexity re-derives from the
  * already-integer sum. Documents with < 2 tokens have no bigrams and
  * are absent from the output (the caller's length filter runs before
  * the LM in every real pipeline).
  *
  * 100 TB shape: the scoring join is keyed (ctx, word) — a shuffle
  * join against a model that may itself be billions of rows (AQE
  * broadcasts it when pruning made it small); the per-doc fold is a
  * keyed aggregation with map-side partials; V and context totals are
  * one aggregation over the MODEL (vocab-bounded), not the corpus.
  * The bigram expansion is a narrow per-doc transform.
  */
object NgramLm {

  /** (id?, ctx, word) bigram instances — non-distinct, one row per
    * adjacent token pair. Docs with < 2 tokens contribute nothing. */
  private def instances(df: DataFrame, cols: Seq[Column], textCol: String): DataFrame =
    df.select((cols :+ tokenize(col(textCol)).as("_toks")): _*)
      .where(size(col("_toks")) >= 2)
      // sequence() would run 1..0 DESCENDING on a 1-token doc — the
      // where-guard above is load-bearing, not an optimization
      .select((cols :+ explode(transform(
        sequence(lit(1), size(col("_toks")) - 1),
        i => struct(element_at(col("_toks"), i).as("ctx"),
          element_at(col("_toks"), i + 1).as("word")))).as("_bg")): _*)
      .select((cols :+ col("_bg.ctx").as("ctx") :+ col("_bg.word").as("word")): _*)

  /** Train the bigram model: (ctx, word, cnt) with `cnt >= minCount`. */
  def train(docs: DataFrame, textCol: String, minCount: Long = 1): DataFrame =
    instances(docs, Seq.empty, textCol)
      .groupBy(col("ctx"), col("word"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Score each document against a [[train]]ed model.
    * @return (idCol, n_bigrams, lp_micros, ppl_milli): bigram count,
    *         total Laplace log-prob in integer micros, and perplexity
    *         `exp(−lp/n)` in integer millis. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame): DataFrame = {
    val m = model.select(col("ctx"), col("word"), col("cnt"))
    val ctxTot = m.groupBy(col("ctx")).agg(sum(col("cnt")).as("ctx_cnt"))
    val vocab = m.select(col("ctx").as("t"))
      .unionAll(m.select(col("word").as("t")))
      .agg(count_distinct(col("t")).as("vs"))
    val lp = instances(docs, Seq(col(idCol)), textCol)
      .join(m, Seq("ctx", "word"), "left")
      .join(ctxTot, Seq("ctx"), "left")
      .crossJoin(broadcast(vocab)) // 1-row corpus scalar
      .withColumn("lpm",
        round(log((coalesce(col("cnt"), lit(0L)) + lit(1)).cast("double")
          / (coalesce(col("ctx_cnt"), lit(0L)) + col("vs"))) * lit(1e6))
          .cast("long"))
    lp.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lpm")).as("lp_micros"))
      .withColumn("ppl_milli",
        round(exp(-(col("lp_micros").cast("double") / lit(1e6))
          / col("n_bigrams")) * lit(1000)).cast("long"))
  }

  /** Score documents under interpolated Kneser–Ney smoothing (Kneser &
    * Ney 1995; the smoothing KenLM — and therefore the CCNet filter —
    * actually ships, where [[score]]'s Laplace is the teaching
    * baseline): absolute discounting plus a CONTINUATION unigram —
    * how many distinct contexts a word follows, not how often it
    * occurs — so boilerplate tokens that are frequent in one context
    * ("Francisco" after "San") stop inflating unseen-bigram mass.
    *
    *  - seen ctx:  `p(w|c) = max(cnt(c,w)−D, 0)/cnt(c)
    *               + D·N1+(c·)/cnt(c) · p_cont(w)`
    *  - unseen ctx: `p(w|c) = p_cont(w)`
    *  - `p_cont(w) = (N1+(·w)+1)/(T+V)` — Laplace-smoothed over
    *    bigram types T so wholly-unseen words keep mass.
    *
    * D = 0.75 (the standard fixed discount) is dyadic, and every other
    * operand is an integer count, so the per-instance probability is a
    * fixed IEEE expression tree both engines evaluate bit-identically;
    * log-probs land as integer micros before the per-doc fold (the
    * [[score]] convention — order-independent sums, ln residual class).
    *
    * Same 100 TB shape as [[score]]: keyed (ctx, word) scoring join,
    * model-bounded side aggregates (ctx stats, continuation types, the
    * 1-row (T, V) scalar broadcast), narrow bigram expansion.
    *
    * @return (idCol, n_bigrams, lp_micros, ppl_milli).
    */
  def scoreKneserNey(docs: DataFrame, idCol: String, textCol: String,
                     model: DataFrame): DataFrame = {
    val m = model.select(col("ctx"), col("word"), col("cnt"))
    val ctxStats = m.groupBy(col("ctx"))
      .agg(sum(col("cnt")).as("ctx_cnt"), count(lit(1)).as("ctx_types"))
    val contTypes = m.groupBy(col("word"))
      .agg(count(lit(1)).as("cont_types"))
    // one pass over ctx ∪ word yields BOTH scalars: the union doubles
    // the model rows, so T = count(*)/2 exactly, and V is the distinct
    val scalars = m.select(col("ctx").as("t"))
      .unionAll(m.select(col("word").as("t")))
      .agg((count(lit(1)) / 2).cast("long").as("tt"),
        count_distinct(col("t")).as("vs"))
    val pcont = (coalesce(col("cont_types"), lit(0L)) + lit(1L))
      .cast("double") / (col("tt") + col("vs")).cast("double")
    val p = when(col("ctx_cnt").isNull, pcont)
      .otherwise(
        greatest(coalesce(col("cnt"), lit(0L)).cast("double") - lit(0.75),
          lit(0.0)) / col("ctx_cnt").cast("double")
          + lit(0.75) * col("ctx_types").cast("double")
            / col("ctx_cnt").cast("double") * pcont)
    val lp = instances(docs, Seq(col(idCol)), textCol)
      .join(m, Seq("ctx", "word"), "left")
      .join(ctxStats, Seq("ctx"), "left")
      .join(contTypes, Seq("word"), "left")
      .crossJoin(broadcast(scalars)) // 1-row corpus scalar
      .withColumn("lpm", round(log(p) * lit(1e6)).cast("long"))
    lp.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lpm")).as("lp_micros"))
      .withColumn("ppl_milli",
        round(exp(-(col("lp_micros").cast("double") / lit(1e6))
          / col("n_bigrams")) * lit(1000)).cast("long"))
  }

  /** Perplexity-band data pruning (Marion et al. 2023, "When Less is
    * More"): keep the documents whose model perplexity falls in the
    * middle of the distribution — the lowest-ppl tail is boilerplate
    * and duplication, the highest-ppl tail is noise; the middle band
    * measurably beats both at equal token budget. Band edges are
    * RANK-based (keep ranks in (⌊keepLo·n⌋, ⌊keepHi·n⌋] under the
    * total order (ppl_milli, id)) rather than quantile-sketch-based,
    * so the kept set is exact and engine-reproducible.
    *
    * Scale shape: the exact global rank rides
    * [[Packing.globalRank]] — range partition + local row_number +
    * O(#partitions) prefix offsets, one shuffle, no global window.
    *
    * @param scored output of [[score]] (or any frame with a
    *               `ppl_milli` column).
    */
  def pruneByPerplexity(scored: DataFrame, idCol: String,
                        keepLo: Double, keepHi: Double): DataFrame = {
    require(0.0 <= keepLo && keepLo < keepHi && keepHi <= 1.0,
      s"need 0 <= keepLo < keepHi <= 1, got [$keepLo, $keepHi]")
    val (ranked, n) = Packing.globalRank(scored,
      Seq("ppl_milli", idCol))
    val lo = math.floor(keepLo * n).toLong
    val hi = math.floor(keepHi * n).toLong
    ranked.filter(col("_grank") > lit(lo) && col("_grank") <= lit(hi))
      .drop("_grank")
  }
}
