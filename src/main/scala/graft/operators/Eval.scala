package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-evaluation operators for the quality/selection models
  * ([[QualityLr]], [[Dsir]], [[NgramLm]]) — the metrics a data-curation
  * pipeline gates its filters on before letting them delete terabytes:
  * ranking quality (AUC) and probability calibration (reliability
  * bins). Reference scope: the recommender ships its score ranking
  * unevaluated (`recommendation-api/lambda_function.py` trusts the
  * groupCount order); at 100 TB a filter model needs measured quality.
  *
  * Determinism contract (the qX_lr_* convention): inputs are INTEGER
  * micro scores (`p_micros` 0..1e6), every accumulated quantity stays
  * integer until one final division, so the result is bit-identical
  * across engines and partition orders.
  */
object Eval {

  /** Long rank key for a weight/score column, exact for both worlds:
    * integral columns (byte/short/int/long) rank by the raw long —
    * exact at ANY magnitude — while fractional columns micro-quantize
    * (`⌊x·1e6⌋`) so sub-integer ordering survives. The quantized
    * branch is exact only for |x| ≲ 9e9 (x·1e6 must stay inside
    * double's 2^53 integer range; beyond it distinct weights collapse
    * to one key and past ~9.2e12 the cast saturates) — callers with
    * larger fractional mass should pre-scale to integer micros
    * themselves, which routes them onto the exact branch.
    */
  private def rankKey(df: DataFrame, c: String): Column = {
    import org.apache.spark.sql.types._
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(c).cast("long")
      case _ => floor(col(c) * lit(1e6)).cast("long")
    }
  }

  /** Rank-based ROC-AUC (Mann–Whitney U) of an integer score column
    * against a 0/1 label column.
    *
    * AUC = U / (n⁺·n⁻) with U from the positive rank-sum under
    * AVERAGE ranks for ties — the standard tie-corrected estimator.
    * Everything is derived from per-distinct-score tallies:
    * with `below_g` = #rows scoring strictly less than group g and
    * `cnt_g` its size, the doubled positive rank-sum is
    * `R2 = Σ_g pos_g·(2·below_g + cnt_g + 1)` (integer — no .5 average
    * ranks), `U2 = R2 − n⁺·(n⁺+1)`, and
    * `auc_micros = floor(1e6·U2 / (2·n⁺·n⁻))`.
    *
    * 100 TB shape: one map-side-combined `groupBy(score)` collapses
    * the corpus to ≤ 1e6+1 rows (the score grid is integer micros by
    * contract), and only THAT bounded table flows through the global
    * cumulative window + final fold — the window never sees corpus
    * rows. All integer sums are order-independent, so the DuckDB
    * oracle replays the exact arithmetic.
    *
    * @return one row (n_pos, n_neg, auc_micros).
    */
  def aucRank(scored: DataFrame, labelCol: String,
              scoreCol: String): DataFrame = {
    val g = scored
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(col(labelCol).cast("long")).as("pos"),
        count(lit(1)).as("cnt"))
    // below = rows scoring strictly less; the window input is the
    // bounded distinct-score table, not the corpus.
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val c = g.withColumn("below", coalesce(sum(col("cnt")).over(w), lit(0L)))
    c.agg(
        sum(col("pos")).as("n_pos"),
        (sum(col("cnt")) - sum(col("pos"))).as("n_neg"),
        sum(col("pos") * (lit(2L) * col("below") + col("cnt") + lit(1L)))
          .as("r2"))
      .select(col("n_pos"), col("n_neg"),
        floor(lit(1e6) * (col("r2") - col("n_pos") * (col("n_pos") + lit(1L)))
            / (lit(2L) * col("n_pos") * col("n_neg")))
          .cast("long").as("auc_micros"))
  }

  /** Reliability (calibration) bins: bucket rows by predicted
    * probability (`p_micros` 0..1e6 → `bins` equal-width bins, the top
    * edge closed), then per bin the count, the observed positive rate
    * (`acc_micros`) and the mean predicted probability
    * (`conf_micros`) — the table a reliability diagram / ECE is read
    * from. `floor` keeps the two rates integer-exact across engines;
    * one map-side-combined groupBy, output is `bins` rows.
    *
    * @return (bin, n, n_pos, acc_micros, conf_micros) ordered by bin.
    */
  def calibrationBins(scored: DataFrame, labelCol: String,
                      scoreMicrosCol: String, bins: Int): DataFrame =
    scored
      .withColumn("bin",
        least(floor(col(scoreMicrosCol) * lit(bins) / lit(1e6)),
          lit(bins - 1L)).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col(labelCol).cast("long")).as("n_pos"),
        floor(lit(1e6) * sum(col(labelCol).cast("long")) / count(lit(1)))
          .cast("long").as("acc_micros"),
        floor(sum(col(scoreMicrosCol)) / count(lit(1)))
          .cast("long").as("conf_micros"))
      .orderBy(col("bin"))

  /** nDCG@k of ranked retrieval runs against graded relevance
    * judgments — the metric that gates a retriever/fusion change
    * (e.g. [[Hybrid.rrf]] output scored against exact-cosine ground
    * truth). `run` is (qid, id, score), re-ranked here by
    * (score desc, id asc); `qrels` is (qid, id, rel) with INTEGER
    * gains.
    *
    * Integer-micro discounting: each position contributes
    * `floor(1e6·rel / log2(rank+1))` — an integer, so the per-query
    * DCG/IDCG folds are order-independent and the final
    * `ndcg = floor(1e6·dcg/idcg)` is engine-exact (log2 of small ints
    * is the accepted ln residual-risk class). IDCG ranks qrels by
    * (rel desc, id asc).
    *
    * Shape: runs are top-k bounded per query, so both windows sort k
    * rows per query; two keyed folds, one join — never corpus-wide.
    *
    * @return (qid, dcg_micros, idcg_micros, ndcg_micros) per query.
    */
  def ndcgAtK(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
    val ranked = run.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val dcg = ranked
      .join(qrels.select(col("qid"), col("id"), col("rel")),
        Seq("qid", "id"), "left")
      .groupBy(col("qid"))
      .agg(sum(floor(lit(1e6) * coalesce(col("rel"), lit(0L))
          / log2(col("rank") + 1)).cast("long")).as("dcg_micros"))
    val iw = Window.partitionBy("qid").orderBy(desc("rel"), asc("id"))
    val ideal = qrels.withColumn("rank", row_number().over(iw))
      .filter(col("rank") <= k)
      .groupBy(col("qid"))
      .agg(sum(floor(lit(1e6) * col("rel") / log2(col("rank") + 1))
        .cast("long")).as("idcg_micros"))
    dcg.join(ideal, Seq("qid"))
      .select(col("qid"), col("dcg_micros"), col("idcg_micros"),
        floor(lit(1e6) * col("dcg_micros") / col("idcg_micros"))
          .cast("long").as("ndcg_micros"))
      .orderBy(col("qid"))
  }

  /** Binary-relevance rank metrics @k — MRR, precision@k, recall@k
    * and hit count per query — the [[ndcgAtK]] sibling for UNGRADED
    * judgments (the metrics most retrieval dashboards actually show).
    * `run` is (qid, id, score), re-ranked by (score desc, id asc);
    * `qrels` is (qid, id) — any extra columns ignored, duplicates
    * collapsed. One query row per qid PRESENT IN QRELS (a query with
    * no judgments has no defined recall).
    *
    * Integer-micro exactness: `floor(1e6/first_rank)`,
    * `floor(1e6·hits/k)`, `floor(1e6·hits/n_rel)` over integer counts
    * — engine-exact, no float folds. Shape: the window sorts only the
    * k-bounded runs; one semi-ish equi-join against the (small)
    * judgment table; two keyed folds.
    *
    * @return (qid, n_rel, n_hit, mrr_micros, prec_micros,
    *         recall_micros) ordered by qid.
    */
  def rankMetricsAtK(run: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
    val ranked = run.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val rel = qrels.select(col("qid"), col("id")).distinct()
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val hits = ranked.join(rel, Seq("qid", "id"))
      .groupBy("qid")
      .agg(count(lit(1)).as("n_hit"), min(col("rank")).as("first_rank"))
    nRel.join(hits, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(floor(lit(1e6) / col("first_rank")).cast("long"), lit(0L))
          .as("mrr_micros"),
        floor(lit(1e6) * coalesce(col("n_hit"), lit(0L)) / lit(k))
          .cast("long").as("prec_micros"),
        floor(lit(1e6) * coalesce(col("n_hit"), lit(0L)) / col("n_rel"))
          .cast("long").as("recall_micros"))
      .orderBy(col("qid"))
  }

  /** Average precision @k per query (MAP's per-query term) — the
    * rank metric that rewards putting relevant items EARLY, not just
    * inside the cutoff (the [[rankMetricsAtK]] precision column is
    * position-blind). Run re-ranked by (score desc, id asc); at each
    * relevant rank r the precision-so-far `hits_r / r` contributes
    * `floor(1e6·hits_r/r)` micros; `ap_micros` is the integer term
    * sum divided by `min(n_rel, k)` (the @k-normalized convention).
    * Integer terms are fold-order-free and the per-term floor bias is
    * bounded by n_hit micros — the modularity-term convention, exact
    * in the DuckDB oracle.
    *
    * Shape: windows only touch the k-bounded run (never a corpus);
    * one equi-join against the judgment table; one keyed fold.
    *
    * @return (qid, n_rel, n_hit, ap_micros) ordered by qid — a query
    *         with no judged-relevant docs is omitted (AP undefined).
    */
  def averagePrecisionAtK(run: DataFrame, qrels: DataFrame,
                          k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
    val ranked = run.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
    val rel = qrels.select(col("qid"), col("id")).distinct()
    val nRel = rel.groupBy("qid").agg(count(lit(1)).as("n_rel"))
    val cumW = Window.partitionBy("qid").orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = ranked
      .join(rel.withColumn("hit", lit(1L)), Seq("qid", "id"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0L)))
      .withColumn("cum", sum(col("hit")).over(cumW))
    val terms = marked.filter(col("hit") === 1L)
      .groupBy("qid")
      .agg(sum(floor(lit(1e6) * col("cum") / col("rank")).cast("long"))
          .as("sum_prec"),
        count(lit(1)).as("n_hit"))
    nRel.join(terms, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(
          floor(col("sum_prec") / least(col("n_rel"), lit(k.toLong)))
            .cast("long"),
          lit(0L)).as("ap_micros"))
      .orderBy(col("qid"))
  }

  /** Corpus-level BLEU (Papineni et al. 2002) of a candidate text
    * column against a reference column — the n-gram overlap metric a
    * pipeline gates generated/translated/augmented text on before
    * admitting it to a training mix. Standard definition: modified
    * n-gram precision with per-gram clipping
    * (`Σ_g min(cnt_cand(g), cnt_ref(g))`), corpus-pooled counts,
    * uniform 1/maxN weights, brevity penalty `exp(1 − r/c)` when the
    * candidate corpus is shorter than the reference.
    *
    * Determinism contract: every pooled quantity (clipped matches,
    * candidate n-gram totals, corpus lengths) is an INTEGER count, so
    * the folds are order-independent; BLEU itself is one final scalar
    * expression over those integers (`round(1e6·BP·exp(Σ ln pₙ/N))` —
    * the accepted ln/exp residual class, same as qX_pmi/qX_lm). Any
    * pₙ = 0 ⇒ bleu_micros = 0 (the standard corpus-BLEU convention).
    *
    * 100 TB shape: n-gram expansion is a narrow per-row transform; the
    * clip needs cand-vs-ref counts PER (pair, gram), one keyed
    * map-side-combined groupBy whose key includes the pair id — no
    * corpus-wide gram table, no join. Everything after is a bounded
    * fold to ONE row.
    *
    * @return one row (c_len, r_len, match_1..N, total_1..N,
    *         bleu_micros).
    */
  def corpusBleu(pairs: DataFrame, idCol: String, candCol: String,
                 refCol: String, maxN: Int = 4): DataFrame = {
    // Shared tokenizer — qX_bleu's oracle SQL mirrors this exact
    // split/lower/filter; reusing it keeps the two from drifting.
    val toks = (c: Column) => graft.functions.GraftFunctions.tokenize(c)
    // (n, gram) structs for all n in 1..maxN, one narrow transform.
    val grams = (tc: Column) => flatten(array((1 to maxN).map { n =>
      transform(sequence(lit(1), greatest(size(tc) - lit(n - 1), lit(0))),
        i => struct(lit(n).as("n"),
          concat_ws(" ", slice(tc, i, lit(n))).as("gram")))
    }: _*))
    val t = pairs.select(col(idCol).as("pid"),
      toks(col(candCol)).as("ct"), toks(col(refCol)).as("rt"))
    val sides = t.select(col("pid"), lit(1L).as("is_c"),
        explode(grams(col("ct"))).as("g"))
      .unionAll(t.select(col("pid"), lit(0L).as("is_c"),
        explode(grams(col("rt"))).as("g")))
    // Per-(pair, n, gram) clip — the ONLY shuffle, keyed by pair id.
    val clipped = sides
      .groupBy(col("pid"), col("g.n").as("n"), col("g.gram"))
      .agg(sum(col("is_c")).as("cc"), sum(lit(1L) - col("is_c")).as("rc"))
      .groupBy(col("n"))
      .agg(sum(least(col("cc"), col("rc"))).as("m"))
    val matchAggs = (1 to maxN).map(n =>
      sum(when(col("n") === n, col("m")).otherwise(0L)).as(s"match_$n"))
    val matches = clipped.agg(matchAggs.head, matchAggs.tail: _*)
    val lenAggs =
      sum(size(col("ct"))).cast("long").as("c_len") +:
        sum(size(col("rt"))).cast("long").as("r_len") +:
        (1 to maxN).map(n =>
          sum(greatest(size(col("ct")) - lit(n - 1), lit(0)))
            .cast("long").as(s"total_$n"))
    val lens = t.agg(lenAggs.head, lenAggs.tail: _*)
    val joined = lens.crossJoin(matches) // 1 row × 1 row
    val logPrecSum = (1 to maxN).map(n =>
      log(col(s"match_$n").cast("double") / col(s"total_$n")))
      .reduce(_ + _)
    val bp = when(col("c_len") >= col("r_len"), lit(1.0))
      .otherwise(exp(lit(1.0) - col("r_len").cast("double") / col("c_len")))
    val anyZero = (1 to maxN).map(n => col(s"match_$n") === 0L)
      .reduce(_ || _)
    val outCols = Seq(col("c_len"), col("r_len")) ++
      (1 to maxN).map(n => col(s"match_$n")) ++
      (1 to maxN).map(n => col(s"total_$n")) ++
      Seq(when(anyZero, lit(0L))
        .otherwise(round(lit(1e6) * bp * exp(logPrecSum / maxN))
          .cast("long")).as("bleu_micros"))
    joined.select(outCols: _*)
  }

  /** Expected calibration error over [[calibrationBins]] output:
    * `ECE = Σ_b (n_b/N)·|acc_b − conf_b|` — one integer-micro number
    * summarizing the reliability table. Exact: each |Δ| is integer
    * micros, the weighted sum stays integer until the final floor.
    *
    * @return one row (n, ece_micros).
    */
  def ece(calBins: DataFrame): DataFrame =
    calBins.agg(sum(col("n")).as("n"),
        sum(col("n") * abs(col("acc_micros") - col("conf_micros"))).as("werr"))
      .select(col("n"),
        floor(col("werr") / col("n")).cast("long").as("ece_micros"))

  /** Split-conformal calibration (Vovk et al.; the
    * distribution-free coverage guarantee a filter model ships with):
    * a deterministic md5 half-split yields a calibration set whose
    * nonconformity scores `|y·1e6 − p|` are ranked exactly; the
    * threshold is the `⌈(n+1)(1−α)⌉`-th smallest (clamped to n), and
    * the held-out half reports empirical coverage
    * `P(nc ≤ q) ≥ 1−α` (marginally guaranteed).
    *
    * Everything is integer: the rank selection runs over the
    * distinct-nonconformity grid (map-side combine first — the
    * aucRank convention), the rank index is an integer ceiling
    * division, and coverage is one guarded integer ratio.
    *
    * @return one row (n_calib, n_eval, q_micros, coverage_micros).
    */
  def conformal(scored: DataFrame, idCol: String, labelCol: String,
                scoreCol: String, alphaMicros: Long = 100000L): DataFrame = {
    val s = scored.select(col(idCol).as("id"),
      abs(col(labelCol).cast("long") * lit(1000000L) - col(scoreCol))
        .as("nc"))
    val isCalib = Sampling.md5Bucket(col("id")) % 2 === 0
    val g = s.filter(isCalib).groupBy("nc").agg(count(lit(1)).as("c"))
    // BOUNDED global window: distinct nonconformity grid (<= 1e6+1
    // micro values), collapsed by the groupBy above — never the corpus
    val w = Window.orderBy("nc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("cum", sum(col("c")).over(w))
    val tot = g.agg(sum(col("c")).as("n_calib"))
    // k = min(n, ceil((n+1)·(1−α))) as an integer ceiling division
    val q = cum.crossJoin(broadcast(tot))
      .filter(col("cum") >=
        least(col("n_calib"),
          floor(((col("n_calib") + 1) * (lit(1000000L) - alphaMicros) +
            lit(999999L)) / lit(1000000L)).cast("long")))
      .agg(min(col("nc")).as("q_micros"))
    val ev = s.filter(!isCalib)
    ev.crossJoin(broadcast(q)).crossJoin(broadcast(tot))
      .groupBy("n_calib", "q_micros")
      .agg(count(lit(1)).as("n_eval"),
        sum(when(col("nc") <= col("q_micros"), 1L).otherwise(0L))
          .as("covered"))
      .select(col("n_calib"), col("n_eval"), col("q_micros"),
        floor(lit(1000000L) * col("covered") / col("n_eval")).cast("long")
          .as("coverage_micros"))
  }

  /** Truncated rank-biased overlap (Webber, Moffat & Zobel 2010) at
    * the DYADIC persistence p = 1/2 — how much two rankers agree,
    * top-weighted: `RBO = Σ_{d≤k} (1−p)·p^{d−1}·X_d/d` with X_d the
    * overlap of the two depth-d prefixes. With p = 1/2 each depth
    * term is `⌊1e6·X_d/(2^d·d)⌋` — exact integer micros, so the
    * per-query sum is order-independent (flooring bias ≤ k
    * micro-units, identical in the oracle by construction).
    *
    * Shape: ranks come from per-query windows over the k-bounded
    * runs; X_d needs only the MATCHED id table (one equi-join) and a
    * k-row depth frame per query — nothing corpus-sized.
    *
    * @return (qid, rbo_micros) per query of `runA`, ordered.
    */
  def rbo(runA: DataFrame, runB: DataFrame, k: Int): DataFrame = {
    def ranked(df: DataFrame, rc: String) = {
      val w = Window.partitionBy("qid").orderBy(desc("score"), col("id"))
      df.withColumn(rc, row_number().over(w)).filter(col(rc) <= k)
        .select(col("qid"), col("id"), col(rc))
    }
    val m = ranked(runA, "ra").join(ranked(runB, "rb"), Seq("qid", "id"))
      .select(col("qid"), greatest(col("ra"), col("rb")).as("m"))
    val depths = runA.sparkSession.range(1, k + 1, 1, 1)
      .select(col("id").as("d"))
    runA.select("qid").distinct()
      .crossJoin(depths)
      .join(m, Seq("qid"), "left")
      .groupBy("qid", "d")
      .agg(sum(when(col("m") <= col("d"), 1L).otherwise(0L)).as("xd"))
      .select(col("qid"), floor(lit(1e6) * col("xd") /
        (pow(lit(2.0), col("d")) * col("d"))).cast("long").as("term"))
      .groupBy("qid").agg(sum(col("term")).as("rbo_micros"))
      .orderBy("qid")
  }

  /** Kendall rank correlation between two runs, per query — the
    * pairwise companion of [[rbo]]: τ = (C − D)/(C + D) over the
    * ITEMS BOTH RANKERS RETURNED (the standard run-comparison
    * restriction), where C/D count concordantly/discordantly ordered
    * item pairs. `row_number` ranks are tie-free, so this is τ-a ≡
    * τ-b and C + D = n(n−1)/2 exactly. All counts are exact
    * integers; the single signed division rounds half away from zero
    * identically in both engines.
    *
    * Shape: ranks come from per-query windows over the k-bounded
    * runs; the pair join is the k-row common table against itself
    * per qid — ≤ k²/2 pairs per query, never corpus-sized.
    *
    * @return (qid, n_common, concordant, discordant, tau_micros) per
    *         query of `runA`, ordered; τ = 0 when fewer than 2
    *         common items.
    */
  def kendallTau(runA: DataFrame, runB: DataFrame, k: Int): DataFrame = {
    def ranked(df: DataFrame, rc: String) = {
      val w = Window.partitionBy("qid").orderBy(desc("score"), col("id"))
      df.withColumn(rc, row_number().over(w)).filter(col(rc) <= k)
        .select(col("qid"), col("id"), col(rc))
    }
    val common = ranked(runA, "ra").join(ranked(runB, "rb"), Seq("qid", "id"))
    val l = common.select(col("qid"), col("id").as("i"),
      col("ra").as("rai"), col("rb").as("rbi"))
    val r = common.select(col("qid"), col("id").as("j"),
      col("ra").as("raj"), col("rb").as("rbj"))
    val agg = l.join(r, Seq("qid")).filter(col("i") < col("j"))
      .groupBy("qid")
      .agg(
        sum(when((col("rai") - col("raj")) * (col("rbi") - col("rbj")) > 0,
          1L).otherwise(0L)).as("concordant"),
        sum(when((col("rai") - col("raj")) * (col("rbi") - col("rbj")) < 0,
          1L).otherwise(0L)).as("discordant"))
    runA.select("qid").distinct()
      .join(common.groupBy("qid").agg(count(lit(1)).as("nc")), Seq("qid"),
        "left")
      .join(agg, Seq("qid"), "left")
      .select(col("qid"), coalesce(col("nc"), lit(0L)).as("n_common"),
        coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("discordant"), lit(0L)).as("discordant"),
        when(coalesce(col("concordant"), lit(0L))
            + coalesce(col("discordant"), lit(0L)) > 0,
          round(lit(1e6) * (col("concordant") - col("discordant"))
            / (col("concordant") + col("discordant"))).cast("long"))
          .otherwise(lit(0L)).as("tau_micros"))
      .orderBy("qid")
  }

  /** PR-AUC (step-wise average precision) — the imbalanced-class
    * companion to [[aucRank]]: with positives rare (the usual shape
    * of a quality filter), ROC-AUC flatters; AP weighs precision
    * where the positives actually are. Step integral over DISTINCT
    * score groups descending: `AP = Σ_k Δtp_k·P_k / n⁺` with
    * `P_k = tp_k/(tp_k+fp_k)`; each term is ONE floored division of
    * exact BIGINTs `⌊1e6·pos_k·tp_k/(n⁺·(tp_k+fp_k))⌋`, so the fold
    * is order-free and the per-term flooring bias is bounded by
    * #groups micro-units (the modularity-term convention — the
    * oracle replays it by construction).
    *
    * Shape: the [[aucRank]] plan — one score-keyed collapse, the
    * cumulative window over the ≤ 1e6+1 distinct micro scores, one
    * scalar fold.
    *
    * @return one row (n_pos, n_neg, pr_auc_micros).
    */
  def prAuc(scored: DataFrame, labelCol: String,
            scoreCol: String): DataFrame = {
    val g = scored
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(col(labelCol).cast("long")).as("pos"),
        count(lit(1)).as("cnt"))
    // BOUNDED global window: distinct-score grid from the groupBy above
    val w = Window.orderBy(desc("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = g.withColumn("tp", sum(col("pos")).over(w))
      .withColumn("fp", sum(col("cnt") - col("pos")).over(w))
    val tot = g.agg(sum(col("pos")).as("n_pos"),
      (sum(col("cnt")) - sum(col("pos"))).as("n_neg"))
    c.crossJoin(broadcast(tot))
      .select(col("n_pos"), col("n_neg"),
        floor(lit(1e6) * col("pos") * col("tp")
          / (col("n_pos") * (col("tp") + col("fp")))).cast("long").as("t"))
      .groupBy(col("n_pos"), col("n_neg"))
      .agg(sum(col("t")).as("pr_auc_micros"))
  }

  /** Cohen's κ inter-rater agreement (Cohen 1960) — how much two
    * labelers (or two classifiers — e.g. the LR gate vs the NB
    * second opinion) agree BEYOND chance:
    * `κ = (n·agree − Σ_c a_c·b_c)/(n² − Σ_c a_c·b_c)` — the
    * cross-multiplied exact-integer form of (p_o−p_e)/(1−p_e). Two
    * keyed marginal folds + one scalar fold + ONE truncated division
    * (signed). κ of a constant rater (p_e = 1) returns 0 by guard.
    *
    * @return one row (n, n_agree, kappa_micros).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true) // three folds below
    val n = base.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
    val pe = base.groupBy(col("a")).agg(count(lit(1)).as("na"))
      .join(base.groupBy(col("b")).agg(count(lit(1)).as("nb")),
        col("a") === col("b"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L)).as("e"))
    n.crossJoin(broadcast(pe))
      .select(col("n"), col("n_agree"),
        when(col("n") * col("n") === col("e"), lit(0L))
          .otherwise((lit(1e6) * (col("n") * col("n_agree") - col("e"))
            / (col("n") * col("n") - col("e"))).cast("long"))
          .as("kappa_micros"))
  }

  /** Brier score (Brier 1950) — the strictly proper scoring rule
    * beside [[calibrationBins]]/[[ece]]: `mean((p − y)²)` with p in
    * micros, so each term `(p_micros − y·1e6)²` is an exact BIGINT
    * and the fold is order-free; ONE floored division by `n·1e6`
    * returns micros. Unlike ECE (binned, gameable by within-bin
    * cancellation), Brier penalizes every miscalibrated probability
    * directly.
    *
    * @return one row (n, brier_micros).
    */
  def brierScore(scored: DataFrame, labelCol: String,
                 pCol: String): DataFrame =
    scored.select(col(pCol).as("p"),
        (col(labelCol).cast("long") * lit(1000000L)).as("y"))
      .agg(count(lit(1)).as("n"),
        sum((col("p") - col("y")) * (col("p") - col("y"))).as("sq"))
      .select(col("n"),
        floor(col("sq") / (col("n") * lit(1000000L))).cast("long")
          .as("brier_micros"))

  /** Catalog coverage + mean novelty of a recommendation table — the
    * two aggregate-diversity dials next to [[exposureGini]]'s
    * concentration: coverage@k is the fraction of the catalog that
    * appears in ANY rec list; novelty is the mean self-information
    * `−log₂(pop(i)/U)` of recommended items (Zhou et al. 2010), in
    * micro-bits — popular-head recs score near 0, long-tail recs
    * high. Per-row terms are `round(1e6·ln(U/pop)/ln 2)` — one ln of
    * an exact integer ratio, so the fold is order-free integer
    * micros; both ratios are single floored divisions.
    *
    * Shape: one distinct (user, item) fold for popularity, one
    * popularity join onto rec rows (rec items come from the
    * interaction catalog by construction), two scalar folds.
    *
    * @return one row (n_rec_rows, n_rec_items, catalog,
    *         coverage_micros, novelty_microbits).
    */
  def coverageNovelty(recs: DataFrame, recItemCol: String,
                      interactions: DataFrame, userCol: String,
                      itemCol: String): DataFrame = {
    val ui = interactions
      .select(col(userCol).as("u"), col(itemCol).as("item"))
      .distinct().localCheckpoint(true)
    val pop = ui.groupBy("item").agg(count(lit(1)).as("pop"))
    val uRow = ui.agg(countDistinct(col("u")).as("n_users"))
    val catRow = pop.agg(count(lit(1)).as("catalog"))
    recs.select(col(recItemCol).as("item"))
      .join(pop, "item")
      .crossJoin(broadcast(uRow))
      .select(col("item"),
        round(lit(1e6) * log(col("n_users") / col("pop").cast("double"))
          / log(lit(2.0))).cast("long").as("t"))
      .agg(count(lit(1)).as("n_rec_rows"),
        countDistinct(col("item")).as("n_rec_items"),
        sum(col("t")).as("sum_t"))
      .crossJoin(broadcast(catRow))
      .select(col("n_rec_rows"), col("n_rec_items"), col("catalog"),
        floor(lit(1000000L) * col("n_rec_items") / col("catalog"))
          .cast("long").as("coverage_micros"),
        floor(col("sum_t").cast("double") / col("n_rec_rows"))
          .cast("long").as("novelty_microbits"))
  }

  /** Gini concentration of recommendation exposure — the
    * popularity-bias metric over a rec table: G near 0 = exposure
    * spread evenly over the catalog, near 1 = a few head items take
    * everything (the failure mode item–item CF drifts into).
    * Lorenz-ordered by (count asc, item asc) — deterministic ranks —
    * and `G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)`: exact integer
    * numerator and denominator, ONE division. The rank window runs
    * over the CATALOG-sized count table, never over rec rows.
    *
    * @return one row (n_items, total_recs, gini_micros).
    */
  def exposureGini(recs: DataFrame, itemCol: String): DataFrame = {
    val cnt = recs.groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("x"))
    // Global window over the per-ITEM exposure table — catalog-bounded
    // (items, not impressions); a 10^8-item catalog should rank via
    // Packing.globalRank instead (same totals, no single-partition sort)
    val w = Window.orderBy(col("x"), col("item"))
    val ranked = cnt.withColumn("i", row_number().over(w))
    ranked.agg(count(lit(1)).as("n_items"), sum(col("x")).as("total_recs"),
        sum(col("i") * col("x")).as("six"))
      .select(col("n_items"), col("total_recs"),
        floor(lit(1000000L) *
          (lit(2L) * col("six") - (col("n_items") + lit(1L)) *
            col("total_recs")) /
          (col("n_items") * col("total_recs"))).cast("long")
          .as("gini_micros"))
  }

  /** Cost-optimal decision threshold for a scored binary classifier:
    * among all distinct-score cut points (predict positive iff
    * `score ≥ t`), the one minimizing
    * `costFp·FP(t) + costFn·FN(t)` — how a curation pipeline turns a
    * quality model plus an economic judgment ("deleting good data
    * costs 3× keeping bad") into an operating point.
    *
    * Everything is integer: the corpus collapses to per-distinct-score
    * tallies (map-side combine), ONE descending cumulative window over
    * that bounded grid yields TP/FP at every candidate, costs are
    * exact integer sums, and the argmin is a
    * (cost asc, threshold asc)-ordered limit 1 — engine-exact.
    *
    * @return one row (threshold, tp, fp, fn, tn, cost_micros).
    */
  def bestThreshold(scored: DataFrame, labelCol: String, scoreCol: String,
                    costFpMicros: Long, costFnMicros: Long): DataFrame = {
    val g = scored.groupBy(col(scoreCol).as("s"))
      .agg(sum(col(labelCol).cast("long")).as("pos"),
        count(lit(1)).as("cnt"))
    // BOUNDED global window: distinct-score grid from the groupBy above
    val w = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = g.withColumn("tp", sum(col("pos")).over(w))
      .withColumn("pp", sum(col("cnt")).over(w))
    val tot = g.agg(sum(col("pos")).as("p"), sum(col("cnt")).as("n"))
    c.crossJoin(broadcast(tot))
      .select(col("s").as("threshold"), col("tp"),
        (col("pp") - col("tp")).as("fp"),
        (col("p") - col("tp")).as("fn"),
        (col("n") - col("p") - (col("pp") - col("tp"))).as("tn"),
        (lit(costFpMicros) * (col("pp") - col("tp")) +
          lit(costFnMicros) * (col("p") - col("tp"))).as("cost_micros"))
      .orderBy(col("cost_micros").asc, col("threshold").asc)
      .limit(1)
  }

  /** Confusion matrix + precision/recall/F1 of a scored frame at a
    * fixed threshold (predict positive iff `score ≥ threshold`).
    * Four conditional integer sums and three guarded integer-micro
    * ratios — one aggregate, engine-exact.
    *
    * @return one row (tp, fp, fn, tn, precision_micros, recall_micros,
    *         f1_micros); empty denominators report 0.
    */
  def confusionAtThreshold(scored: DataFrame, labelCol: String,
                           scoreCol: String, threshold: Long): DataFrame = {
    val y = col(labelCol).cast("long")
    val pos = col(scoreCol) >= threshold
    val m = scored.agg(
      sum(when(pos, y).otherwise(0L)).as("tp"),
      sum(when(pos, lit(1L) - y).otherwise(0L)).as("fp"),
      sum(when(!pos, y).otherwise(0L)).as("fn"),
      sum(when(!pos, lit(1L) - y).otherwise(0L)).as("tn"))
    def ratio(num: Column, den: Column) =
      when(den === 0, lit(0L))
        .otherwise(floor(lit(1000000L) * num / den).cast("long"))
    m.select(col("tp"), col("fp"), col("fn"), col("tn"),
      ratio(col("tp"), col("tp") + col("fp")).as("precision_micros"),
      ratio(col("tp"), col("tp") + col("fn")).as("recall_micros"),
      ratio(lit(2L) * col("tp"),
        lit(2L) * col("tp") + col("fp") + col("fn")).as("f1_micros"))
  }

  /** Lorenz curve over deciles — the DISTRIBUTION behind
    * [[exposureGini]]'s single number ("the top decile of users
    * produces X% of events" is this table's last row): units rank by
    * (weight, tie) on [[Packing.globalRank]], decile by the exact
    * `⌊10·(rank−1)/n⌋` rule, then per-decile weight shares and the
    * cumulative share over the 10-row grid.
    *
    * `weightCol` CONTRACT: integer-valued (counts / micros). The
    * summed `weight` output truncates fractional weights; the rank
    * key is micro-quantized so fractional weights still ORDER
    * correctly, but callers with fractional mass should pre-scale
    * to micros themselves.
    *
    * @return (decile, n_units, weight, share_micros,
    *         cum_share_micros) ordered — decile 0 = lightest units.
    */
  def lorenzCurve(df: DataFrame, weightCol: String, tieCol: String,
                  bins: Int = 10): DataFrame = {
    val (ranked, n) = Packing.globalRank(
      df.select(col(weightCol).cast("long").as("wt"),
        rankKey(df, weightCol).as("_wk"),
        col(tieCol).as("tie")), Seq("_wk", "tie"))
    val byBin = ranked
      .withColumn("decile",
        floor(lit(bins.toLong) * (col("_grank") - 1) / lit(n))
          .cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_units"), sum(col("wt")).as("weight"))
    val tot = byBin.agg(sum(col("weight")).as("tot"))
    // BOUNDED global window: the ≤`bins`-row decile grid
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBin.crossJoin(broadcast(tot))
      .withColumn("cum_w", sum(col("weight")).over(w))
      .select(col("decile"), col("n_units"), col("weight"),
        floor(lit(1000000L) * col("weight") / col("tot")).cast("long")
          .as("share_micros"),
        floor(lit(1000000L) * col("cum_w") / col("tot")).cast("long")
          .as("cum_share_micros"))
      .orderBy(col("decile"))
  }

  /** Herfindahl–Hirschman concentration index over per-key mass —
    * [[exposureGini]]'s market-concentration sibling (the antitrust
    * number, here pointed at traffic/exposure): `HHI = Σ s_i²` over
    * unit shares, plus the effective number of units `1/HHI` (how
    * many equal-mass units would look like this). Each share
    * quantizes to micros BEFORE squaring (`s_i = ⌊1e6·n_i/N⌋`, so the
    * corpus-wide fold is an exact integer sum), and the two readouts
    * are single divisions.
    *
    * Shape: one keyed fold + one scalar fold — no windows, no joins.
    *
    * @return one row (n_units, total, hhi_micros, eff_n_micros).
    */
  def hhi(df: DataFrame, keyCol: String): DataFrame = {
    val per = df.groupBy(col(keyCol)).agg(count(lit(1)).as("ni"))
    val tot = per.agg(sum(col("ni")).as("n"))
    val s = per.crossJoin(broadcast(tot))
      .select(floor(lit(1e6) * col("ni") / col("n")).cast("long")
        .as("si"), col("n"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_units"), sum(col("si") * col("si"))
        .as("s2"))
    s.select(col("n_units"), col("n").as("total"),
        floor(col("s2").cast("double") / lit(1e6)).cast("long")
          .as("hhi_micros"))
      .withColumn("eff_n_micros",
        when(col("hhi_micros") <= 0, lit(0L))
          .otherwise(floor(lit(1e12) / col("hhi_micros")).cast("long")))
  }

  /** Theil T inequality index over per-key mass (Theil 1967) — the
    * DECOMPOSABLE inequality number beside [[hhi]] and the Gini
    * ([[exposureGini]]): `T = (1/N)·Σ r_i·ln r_i` with
    * `r_i = x_i·N/X` the unit's share of the mean (0 = perfect
    * equality, ln N = one unit owns everything). Each unit term
    * `round(1e6·r_i·ln r_i)` quantizes to a long BEFORE the fold
    * (the ln argument is a ratio of exact integer products — the
    * accepted ln residual class), so the corpus sum is order-free.
    *
    * Shape: one keyed fold + one 1-row broadcast + one scalar fold.
    *
    * @return one row (n_units, total, theil_micros).
    */
  def theilIndex(df: DataFrame, keyCol: String): DataFrame = {
    val per = df.groupBy(col(keyCol)).agg(count(lit(1)).as("ni"))
    val tot = per.agg(count(lit(1)).as("n_units"), sum(col("ni")).as("x"))
    val r = (col("ni") * col("n_units")).cast("double") / col("x")
    per.crossJoin(broadcast(tot))
      .select(col("n_units"), col("x"),
        round(lit(1e6) * r * log(r)).cast("long").as("t"))
      .groupBy(col("n_units"), col("x"))
      .agg(sum(col("t")).as("st"))
      .select(col("n_units"), col("x").as("total"),
        floor(col("st").cast("double") / col("n_units")).cast("long")
          .as("theil_micros"))
  }

  /** Fleiss' kappa (Fleiss 1971) over ≥2 BINARY raters — the
    * multi-rater chance-corrected agreement behind label-quality
    * audits (Cohen's κ, the 2-rater case, is qX_kappa): with r
    * raters and per-item positive-vote count n1,
    * `P_i = (n1² + (r−n1)² − r)/(r(r−1))`, `P̄ = mean P_i`,
    * `P_e = p₀² + p₁²`, `κ = (P̄−P_e)/(1−P_e)`. The per-item numerator
    * `n1² + (r−n1)² − r` is an exact small integer folded corpus-wide
    * (order-free), the two category masses are integer counts, and κ
    * is ONE fixed IEEE expression over those three longs —
    * engine-exact. Unanimous-vote degeneracy (P_e = 1) reports κ = 0.
    *
    * Shape: one projection + one scalar fold — no joins, no windows.
    *
    * @return one row (n_items, n_raters, sum_pi_num, n1_total,
    *         kappa_micros).
    */
  def fleissKappa(df: DataFrame, raterCols: Seq[String]): DataFrame = {
    require(raterCols.size >= 2, "at least two raters")
    val r = raterCols.size.toLong
    val n1 = raterCols.map(c => col(c).cast("long")).reduce(_ + _)
    val base = df.select(n1.as("n1"))
      .select(col("n1"),
        (col("n1") * col("n1") +
          (lit(r) - col("n1")) * (lit(r) - col("n1")) - lit(r))
          .as("pi_num"))
    val s = base.agg(count(lit(1)).as("n_items"),
      sum(col("pi_num")).as("sum_pi_num"), sum(col("n1")).as("n1_total"))
    val pbar = col("sum_pi_num").cast("double") /
      (col("n_items") * lit(r) * lit(r - 1))
    val p1 = col("n1_total").cast("double") / (col("n_items") * lit(r))
    val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    s.select(col("n_items"), lit(r).as("n_raters"), col("sum_pi_num"),
      col("n1_total"),
      when(col("n1_total") === 0 ||
          col("n1_total") === col("n_items") * lit(r), lit(0L))
        .otherwise(floor(lit(1e6) * (pbar - pe) / (lit(1.0) - pe))
          .cast("long")).as("kappa_micros"))
  }

  /** Cumulative gains / lift curve by score decile — [[lorenzCurve]]
    * pointed at a CLASSIFIER: units rank by (score desc, tie) on
    * [[Packing.globalRank]], decile 0 = highest-scored, and each grid
    * row reports what share of all positives the top d deciles
    * capture (gain) and how far above random that is (lift = gain /
    * population share). The campaign-targeting readout beside
    * [[aucRank]]'s single number.
    *
    * Shape: one exact global rank + one ≤`bins`-row grid window.
    *
    * @return (decile, n_units, n_pos, cum_pos, gain_micros,
    *         lift_micros) ordered — decile 0 = top-scored units.
    */
  def gainCurve(df: DataFrame, scoreCol: String, labelCol: String,
                tieCol: String, bins: Int = 10): DataFrame = {
    // rank key from [[rankKey]]: integral scores rank by the raw
    // long (exact at any magnitude); double scores micro-quantize so
    // fractional ordering survives instead of collapsing to
    // integer ties
    val (ranked, n) = Packing.globalRank(
      df.select((-rankKey(df, scoreCol)).as("_ns"),
        col(labelCol).cast("long").as("y"), col(tieCol).as("tie")),
      Seq("_ns", "tie"))
    val byBin = ranked
      .withColumn("decile",
        floor(lit(bins.toLong) * (col("_grank") - 1) / lit(n))
          .cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_units"), sum(col("y")).as("n_pos"))
    val tot = byBin.agg(sum(col("n_pos")).as("tot_pos"),
      sum(col("n_units")).as("tot_n"))
    // BOUNDED global window: the ≤`bins`-row decile grid
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBin.crossJoin(broadcast(tot))
      .withColumn("cum_pos", sum(col("n_pos")).over(w))
      .withColumn("cum_n", sum(col("n_units")).over(w))
      .select(col("decile"), col("n_units"), col("n_pos"), col("cum_pos"),
        when(col("tot_pos") === 0, lit(0L))
          .otherwise(floor(lit(1000000L) * col("cum_pos") / col("tot_pos"))
            .cast("long")).as("gain_micros"),
        when(col("tot_pos") === 0, lit(0L))
          .otherwise(floor(lit(1e6) *
            (col("cum_pos").cast("double") / col("tot_pos")) /
            (col("cum_n").cast("double") / col("tot_n"))).cast("long"))
          .as("lift_micros"))
      .orderBy(col("decile"))
  }

  /** Expected reciprocal rank @k (Chapelle et al. 2009) — the
    * cascade-model companion of [[ndcgAtK]]: a simulated user scans
    * the run top-down and stops at rank r with probability
    * `R_r·Π_{i<r}(1−R_i)` where `R = (2^g − 1)/2^gmax`;
    * `ERR = Σ_r (1/r)·R_r·Π_{i<r}(1−R_i)` weights early relevance the
    * way session abandonment actually does. EXACT-INTEGER closed
    * form, no log/exp: the per-query run pivots to k grade columns
    * (the corpus-BLEU `match_n` pattern), stop numerators
    * `num = 2^g − 1` over denominator `2^gmax` make every partial
    * product an integer, and the whole sum is ONE expression over
    * common denominator `lcm(1..k)·2^(gmax·k)` — replayed verbatim by
    * the SQL oracle. Bounds: k ≤ 10 and gmax ≤ 4 keep every term and
    * the scaled sum inside a long.
    *
    * Shape: one k-bounded per-query window + one pivot fold — runs
    * are top-k per query, never corpus-wide.
    *
    * @param run   (qid, id, score) — re-ranked by (score desc, id).
    * @param qrels (qid, id, grade) integer grades 0..maxGrade;
    *              unjudged run members grade 0.
    * @return (qid, err_num, err_micros): `err_num/D` is the exact
    *         rational ERR, `err_micros = ⌊1e6·err_num/D⌋`.
    */
  def errAtK(run: DataFrame, qrels: DataFrame, k: Int = 10,
             maxGrade: Int = 3): DataFrame = {
    require(k >= 1 && k <= 10, "k must be in 1..10 (long-exact bound)")
    require(maxGrade >= 1 && maxGrade <= 4,
      "maxGrade must be in 1..4 (long-exact bound)")
    val denom = 1L << maxGrade
    val lcm = Seq(1L, 1L, 2L, 6L, 12L, 60L, 60L, 420L, 840L, 2520L,
      2520L)(k) // lcm(1..k)
    val w = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
    val ranked = run.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .join(qrels.select(col("qid"), col("id"), col("grade")),
        Seq("qid", "id"), "left")
      .withColumn("g", least(greatest(coalesce(col("grade"), lit(0L)),
        lit(0L)), lit(maxGrade.toLong)))
      // num = 2^g − 1 via an explicit grade map (g ≤ 4)
      .withColumn("num", (0 to maxGrade).map(g =>
          when(col("g") === g.toLong, lit((1L << g) - 1L)))
        .reduceRight(_ otherwise _).cast("long"))
    val pivots = (1 to k).map(r =>
      max(when(col("rank") === r, col("num")).otherwise(lit(0L)))
        .as(s"n_$r"))
    val wide = ranked.groupBy(col("qid")).agg(pivots.head, pivots.tail: _*)
    // S = Σ_r num_r·Π_{i<r}(denom−num_i)·(lcm/r)·denom^(k−r); every
    // factor integer, every term ≤ ~2.6e15, the sum ≤ ~2.6e16.
    val terms = (1 to k).map { r =>
      val prod = (1 until r).map(i => lit(denom) - col(s"n_$i"))
        .foldLeft(lit(1L).cast("long"): Column)(_ * _)
      col(s"n_$r") * prod * lit(lcm / r) *
        lit(math.pow(denom.toDouble, (k - r).toDouble).toLong)
    }
    val s = terms.reduce(_ + _)
    val bigD = lcm.toDouble * math.pow(denom.toDouble, k.toDouble)
    wide.select(col("qid"), s.as("err_num"),
        floor(lit(1e6) * s / lit(bigD)).cast("long").as("err_micros"))
      .orderBy(col("qid"))
  }

  /** Isotonic (monotone) calibration over probability bins via the
    * CLOSED-FORM pool-adjacent-violators solution (Ayer et al. 1955's
    * minimax identity: `f_i = max_{j≤i} min_{k≥i} avg(y over bins
    * j..k)` — no data-dependent merge loop, so the whole fit is three
    * joins over the B-row bin table and replays exactly in SQL): the
    * non-parametric alternative to [[QualityLr]]-style Platt scaling
    * when the reliability curve isn't sigmoid-shaped. Range averages
    * come from bin prefix sums (exact BIGINT) and quantize to micros
    * per (j,k) BEFORE the minimax, so the fit is engine-exact; the
    * output is monotone non-decreasing by construction.
    *
    * @param scored (pCol: micros in [0, 1e6], labelCol: 0/1).
    * @return (bin, n_b, mean_p_micros, iso_micros) per non-empty bin,
    *         ordered — iso is the calibrated probability for the bin.
    */
  def isotonicBins(scored: DataFrame, labelCol: String, pCol: String,
                   bins: Int = 10): DataFrame = {
    val b = scored.select(
        least(lit(bins - 1), floor(col(pCol) * lit(bins) / lit(1000000L)))
          .as("bin"),
        col(pCol).as("p"),
        (col(labelCol).cast("long") * lit(1000000L)).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("p")).as("sp"),
        sum(col("y")).as("sy"))
      .localCheckpoint(true) // B rows; feeds prefix sums + output
    // BOUNDED window: the ≤`bins`-row bin table
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = b.select(col("bin"), col("nb"), col("sy"))
      .withColumn("cn", sum(col("nb")).over(w))
      .withColumn("cy", sum(col("sy")).over(w))
      .localCheckpoint(true)
    // range averages avg(j..k), micro-quantized: one row per j ≤ k
    val lo = cum.select(col("bin").as("j"), (col("cn") - col("nb")).as("cn0"),
      (col("cy") - col("sy")).as("cy0"))
    val ranges = lo.crossJoin(cum.select(col("bin").as("k"),
        col("cn").as("cnk"), col("cy").as("cyk")))
      .filter(col("j") <= col("k"))
      .select(col("j"), col("k"),
        floor((col("cyk") - col("cy0")).cast("double")
          / (col("cnk") - col("cn0"))).cast("long").as("avg_micros"))
    // f_i = max_{j≤i} min_{k≥i} avg(j..k): inner min per (j, i), outer
    // max per i — both folds over the ≤B² range table
    val inner = ranges
      .join(b.select(col("bin").as("i")), col("k") >= col("i"))
      .filter(col("j") <= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(min(col("avg_micros")).as("mn"))
    val fit = inner.groupBy(col("i").as("bin"))
      .agg(max(col("mn")).as("iso_micros"))
    b.join(fit, "bin")
      .select(col("bin"), col("nb").as("n_b"),
        floor(col("sp").cast("double") / col("nb")).cast("long")
          .as("mean_p_micros"),
        col("iso_micros"))
      .orderBy(col("bin"))
  }

  /** Inverse-propensity-score offline policy evaluation (Horvitz &
    * Thompson 1952; Li et al. 2011's unbiased offline evaluator) —
    * "what would the TARGET policy's reward have been" from logs
    * collected under a different policy: each logged (action, reward,
    * propensity) row contributes `reward · π_target(a|x)/p_logged(a|x)`,
    * here for the uniform-random target over `k` actions (the
    * standard exploration-value readout). Weights CLIP at `clipMicros`
    * propensity (the variance-bias knob every production IPS uses);
    * both the clipped-IPS and the self-normalized SNIPS estimates
    * come from exact BIGINT folds of per-row micro-quantized weights.
    *
    * @param logged (rewardCol: 0/1, propCol: logged propensity in
    *               micros ∈ (0, 1e6]).
    * @return one row (n, n_clipped, sum_w, ips_micros, snips_micros).
    */
  def ipsEval(logged: DataFrame, rewardCol: String, propCol: String,
              k: Int, clipMicros: Long): DataFrame = {
    // per-row weight in micros: (1/k) / p  →  1e12 / (k·p_micros),
    // clipped where p < clipMicros
    val w = floor(lit(1000000000000L)
      / (lit(k) * greatest(col(propCol), lit(clipMicros)))).cast("long")
    logged.select(col(rewardCol).cast("long").as("r"),
        (col(propCol) < clipMicros).cast("long").as("clipped"),
        w.as("w"))
      .agg(count(lit(1)).as("n"), sum(col("clipped")).as("n_clipped"),
        sum(col("w")).as("sum_w"), sum(col("r") * col("w")).as("sum_rw"))
      .select(col("n"), col("n_clipped"), col("sum_w"),
        floor(col("sum_rw").cast("double") / col("n")).cast("long")
          .as("ips_micros"),
        when(col("sum_w") === 0, lit(0L))
          .otherwise(floor(lit(1e6) * col("sum_rw").cast("double")
            / col("sum_w").cast("double")).cast("long"))
          .as("snips_micros"))
  }

  /** Murphy decomposition of the Brier score (Murphy 1973):
    * Brier ≈ RELIABILITY − RESOLUTION + UNCERTAINTY over probability
    * bins — WHERE a miscalibrated model loses points ([[brierScore]]
    * only says how many): REL = (1/n)Σ_b n_b(p̄_b−ȳ_b)² (calibration
    * gap per bin), RES = (1/n)Σ_b n_b(ȳ_b−ȳ)² (how much the bins
    * separate outcomes), UNC = ȳ(1−ȳ). Per-bin sufficient statistics
    * (n_b, Σp, Σy) are exact BIGINT folds; each bin's term quantizes
    * to a long in ONE fixed IEEE expression over the cross-multiplied
    * integers BEFORE the 10-row sum (the modularity-term rule: the
    * per-bin flooring bias is bounded by #bins micro-units and the
    * fold is order-free).
    *
    * @param scored (pCol: micros in [0, 1e6], labelCol: 0/1).
    * @return one row (n, rel_micros, res_micros, unc_micros).
    */
  def brierDecomposition(scored: DataFrame, labelCol: String,
                         pCol: String, bins: Int = 10): DataFrame = {
    val b = scored.select(
        least(lit(bins - 1), floor(col(pCol) * lit(bins) / lit(1000000L)))
          .as("bin"),
        col(pCol).as("p"),
        (col(labelCol).cast("long") * lit(1000000L)).as("y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("nb"), sum(col("p")).as("sp"),
        sum(col("y")).as("sy"))
      .localCheckpoint(true) // totals + per-bin terms
    val tot = b.agg(sum(col("nb")).as("n"), sum(col("sy")).as("sy_all"))
    val terms = b.crossJoin(broadcast(tot))
      .select(col("n"), col("sy_all"),
        // REL term: (Σp_b − Σy_b)²/(n_b·1e6) — micros·count
        floor((col("sp") - col("sy")).cast("double")
          * (col("sp") - col("sy")).cast("double")
          / (col("nb").cast("double") * lit(1e6))).cast("long").as("trel"),
        // RES term: (n·Σy_b − Σy·n_b)²/(n_b·n·1e6) — micros·count.
        // Cross-multiply in double: the long products n·Σy_b (labels
        // scaled 1e6, so ~n²·1e6) overflow int64 past ~3M scored rows
        floor((col("n").cast("double") * col("sy")
            - col("sy_all").cast("double") * col("nb"))
          * (col("n").cast("double") * col("sy")
            - col("sy_all").cast("double") * col("nb"))
          / (col("nb").cast("double") * col("n").cast("double")
            * col("n").cast("double") * lit(1e6))).cast("long").as("tres"))
    terms.groupBy(col("n"), col("sy_all"))
      .agg(sum(col("trel")).as("srel"), sum(col("tres")).as("sres"))
      .select(col("n"),
        floor(col("srel").cast("double") / col("n")).cast("long")
          .as("rel_micros"),
        floor(col("sres").cast("double") / col("n")).cast("long")
          .as("res_micros"),
        floor((col("sy_all").cast("double") / col("n"))
          * (lit(1e6) - col("sy_all").cast("double") / col("n"))
          / lit(1e6)).cast("long").as("unc_micros"))
  }

  /** Spearman rank correlation — "do the two metrics ORDER the
    * population the same way" (the monotone companion to Pearson and
    * to [[kendallTau]]'s pairwise form): both columns rank under a
    * (value, tie) TOTAL order via [[Packing.globalRank]] (range
    * partition + per-partition row_number — no single-partition
    * window over the population), then ρ = 1 − 6·Σd²/(n³−n) with the
    * Σd² fold exact BIGINT and one final floored IEEE division.
    *
    * Ties break by `tieCol`, NOT by average ranks (fractional average
    * ranks would reintroduce float folds); with many ties prefer
    * [[kendallTau]], whose pairwise counts are tie-exact.
    *
    * @return one row (n, sum_d2, rho_micros); ρ = 0 when n < 2.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String,
               tieCol: String): DataFrame = {
    val base = df.select(col(xCol).as("x"), col(yCol).as("y"),
      col(tieCol).as("tie")).localCheckpoint(true) // ranked twice
    val (rx, n) = Packing.globalRank(
      base.select(col("x"), col("tie")), Seq("x", "tie"))
    val (ry, _) = Packing.globalRank(
      base.select(col("y"), col("tie")), Seq("y", "tie"))
    val d = rx.select(col("tie"), col("_grank").as("rx"))
      .join(ry.select(col("tie"), col("_grank").as("ry")), "tie")
      .agg(coalesce(sum((col("rx") - col("ry")) * (col("rx") - col("ry"))),
        lit(0L)).as("sum_d2"))
    val denom = n.toDouble * n.toDouble * n.toDouble - n.toDouble
    d.select(lit(n).as("n"), col("sum_d2"),
      (if (n < 2) lit(0L)
       else floor(lit(1e6) * (lit(1.0)
         - lit(6.0) * col("sum_d2").cast("double") / lit(denom)))
         .cast("long")).as("rho_micros"))
  }
}
