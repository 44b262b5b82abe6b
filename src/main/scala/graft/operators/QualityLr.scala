package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hashed-feature logistic-regression quality classifier — the
  * fasttext/CCNet-style discriminative filter (GPT-3 appendix A:
  * "a classifier trained to distinguish curated corpora from raw
  * CommonCrawl" gates every document; DSIR is the generative sibling
  * already in [[Dsir]]). Documents become L1-normalized hashed
  * unigram+bigram bucket vectors; a weight-per-bucket model trains by
  * deterministic FULL-BATCH gradient descent from a zero init — no
  * RNG, no shuffling-order dependence, so the fitted model (not just
  * its predictions) is a DuckDB-reproducible artifact.
  *
  * Determinism across engines (the qX_lr_* oracle contract): every
  * accumulated quantity is INTEGER MICROS — features
  * `x = round(1e6·cnt/n_doc)`, margins `Σ round(x·w/1e6)`, residuals
  * `round(1e6·σ(m)) − 1e6·y`, gradients `Σ round(x·r/1e6)`, update
  * `w − round(lr·g/N)` — so every sum is order-independent and the
  * oracle replays the training loop bit-for-bit as unrolled CTEs.
  * σ's `exp` is the same ln/exp residual-risk class as [[NgramLm]]'s
  * log-probs (noted, accepted). Buckets never seen in training keep
  * weight 0 at scoring time; docs with no features are absent from
  * both training and scoring (the [[NgramLm.score]] convention).
  *
  * 100 TB shape: the corpus is scanned ONCE into the checkpointed
  * feature table (one keyed (id, bucket) fold + one id fold); each of
  * the FIXED `iters` rounds is one broadcast-join margin pass (w is B
  * rows by construction), one id-keyed residual join, and one
  * bucket-keyed gradient fold — no corpus rescan, no corpus-corpus
  * join, driver holds only the B-row weight table's lineage (each
  * round's w is localCheckpointed, so the plan does not deepen).
  */
object QualityLr {

  /** L1-normalized hashed feature vectors: (idCol, bucket, x_micros),
    * one row per DISTINCT bucket a document touches,
    * `x = round(1e6 · cnt/n_doc)`. Shares [[Dsir]]'s feature space
    * (md5 bucket of native non-distinct word 1+2-grams). */
  def features(docs: DataFrame, idCol: String, textCol: String,
               buckets: Int): DataFrame = {
    import graft.functions.expr.TextExprs.word_ngrams
    val cnts = docs.select(col(idCol), explode(concat(
        word_ngrams(col(textCol), 1), word_ngrams(col(textCol), 2))).as("_f"))
      .select(col(idCol),
        pmod(Sampling.md5Bucket(col("_f")), lit(buckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
    val tot = cnts.groupBy(col(idCol)).agg(sum(col("cnt")).as("n_feats"))
    cnts.join(tot, idCol)
      .select(col(idCol), col("bucket"),
        round(col("cnt") * lit(1e6) / col("n_feats")).cast("long").as("x_micros"))
  }

  /** Train `iters` full-batch GD rounds from w = 0; `labelCol` is 0/1.
    * @return the model: (bucket, w_micros), only buckets present in
    *         the training corpus (absent ⇒ 0 at scoring). */
  def train(labeled: DataFrame, idCol: String, textCol: String,
            labelCol: String, buckets: Int, iters: Int,
            lr: Double): DataFrame = {
    val feats = features(labeled, idCol, textCol, buckets)
      .localCheckpoint(true) // one corpus scan, reused every round
    val y = labeled.select(col(idCol),
      (col(labelCol).cast("long") * lit(1000000L)).as("y_micros"))
    // N = docs that actually carry features (empty docs exert no
    // gradient); O(1) driver scalar
    val n = feats.select(idCol).distinct().count().toDouble
    var w = feats.select(col("bucket")).distinct()
      .withColumn("w_micros", lit(0L)).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val margins = feats.join(broadcast(w), Seq("bucket"))
        .groupBy(col(idCol))
        .agg(sum(round(col("x_micros") * col("w_micros") / lit(1e6))
          .cast("long")).as("m_micros"))
      val resid = margins.join(y, Seq(idCol))
        .select(col(idCol),
          (round(lit(1e6) / (lit(1.0) + exp(-col("m_micros") / lit(1e6))))
            .cast("long") - col("y_micros")).as("r_micros"))
      val grads = feats.join(resid, Seq(idCol))
        .groupBy(col("bucket"))
        .agg(sum(round(col("x_micros") * col("r_micros") / lit(1e6))
          .cast("long")).as("g_micros"))
      w = w.join(grads, Seq("bucket"), "left")
        .select(col("bucket"),
          (col("w_micros") - round(lit(lr) * coalesce(col("g_micros"), lit(0L))
            / lit(n)).cast("long")).as("w_micros"))
        .localCheckpoint(true) // B rows; keeps the round-over-round plan flat
    }
    w
  }

  /** Score documents under a [[train]]ed model: (idCol, n_buckets,
    * p_micros) with `p = σ(Σ x·w)` in micros — the keep-probability /
    * quality score. `n_buckets` counts distinct buckets touched (the
    * feature-vector sparsity), not raw n-gram occurrences.
    * Featureless docs are absent. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame, buckets: Int): DataFrame = {
    val feats = features(docs, idCol, textCol, buckets)
    val m = feats
      .join(broadcast(model), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_buckets"),
        sum(round(col("x_micros") * coalesce(col("w_micros"), lit(0L))
          / lit(1e6)).cast("long")).as("m_micros"))
    m.select(col(idCol), col("n_buckets"),
      round(lit(1e6) / (lit(1.0) + exp(-col("m_micros") / lit(1e6))))
        .cast("long").as("p_micros"))
  }

  /** Raw decision margins `m = Σ x·w` per doc under a trained model —
    * the pre-sigmoid input [[plattFit]] calibrates on. */
  def margins(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, buckets: Int): DataFrame =
    features(docs, idCol, textCol, buckets)
      .join(broadcast(model), Seq("bucket"), "left")
      .groupBy(col(idCol))
      .agg(sum(round(col("x_micros") * coalesce(col("w_micros"), lit(0L))
        / lit(1e6)).cast("long")).as("m_micros"))

  /** Platt scaling (Platt 1999) — FIT the calibration the ECE gate
    * only measures: `p = σ(A·m + B)` with (A, B) trained by
    * deterministic full-batch GD on the margin table from
    * (A, B) = (1, 0), every accumulated quantity integer micros (the
    * [[train]] convention), so the fitted (A, B) is itself a
    * DuckDB-replayable artifact. Each round is ONE scan of the
    * checkpointed margin table; the only driver state is the two
    * scalars (a bounded 1-row collect per round — the codebook
    * convention). Updates truncate (`(lr·g/n).toLong` ≡ SQL `trunc`)
    * — round() straddles engines at negative .5.
    *
    * @return one row (n, a_micros, b_micros).
    */
  def plattFit(margins: DataFrame, marginCol: String, labelCol: String,
               iters: Int = 3, lr: Double = 0.3): DataFrame = {
    val base = margins.select(col(marginCol).as("m"),
        (col(labelCol).cast("long") * lit(1000000L)).as("y"))
      .localCheckpoint(true) // one scan per round
    val n = base.count()
    var a = 1000000L
    var b = 0L
    // empty margin table → no gradient (sum() would be NULL and the
    // division by n = 0 undefined): return the initial (A, B) with
    // n = 0 visible, rather than throwing inside the fit loop
    for (_ <- 1 to iters if n > 0) {
      val g = base
        .withColumn("z",
          round(col("m") * lit(a) / lit(1e6)).cast("long") + lit(b))
        .withColumn("p", round(lit(1e6)
          / (lit(1.0) + exp(-col("z") / lit(1e6)))).cast("long"))
        .withColumn("r", col("p") - col("y"))
        .agg(sum(round(col("r") * col("m") / lit(1e6)).cast("long"))
          .as("ga"), sum(col("r")).as("gb"))
        .head()
      a -= (lr * g.getLong(0) / n).toLong
      b -= (lr * g.getLong(1) / n).toLong
    }
    margins.sparkSession.range(1)
      .select(lit(n).as("n"), lit(a).as("a_micros"), lit(b).as("b_micros"))
  }

  /** Calibrated probabilities under a [[plattFit]] (A, B) pair —
    * the z/p quantization chain of the fit, applied once. */
  def plattApply(margins: DataFrame, idCol: String, marginCol: String,
                 aMicros: Long, bMicros: Long): DataFrame =
    margins.select(col(idCol),
      round(lit(1e6) / (lit(1.0) + exp(
        -(round(col(marginCol) * lit(aMicros) / lit(1e6)).cast("long")
          + lit(bMicros)) / lit(1e6)))).cast("long").as("p_micros"))
      .orderBy(col(idCol))

  /** GPT-3's stochastic Pareto selection over [[score]] output (the
    * paper keeps a crawl doc iff `pareto(α) > 1 − p`, α = 9): mostly
    * high-quality docs survive, but low scorers keep a long-tail
    * chance — deliberate diversity, not a bug. The Pareto draw
    * derives from the id's md5 bucket via the inverse CDF
    * `x = (1−u)^(−1/α) − 1` — replayable, partition-stable, no RNG
    * (the Gumbel-top-k precedent), quantized to micros so the keep
    * comparison is integer vs integer. Narrow projection + filter. */
  def paretoSelect(scored: DataFrame, idCol: String,
                   alpha: Double = 9.0): DataFrame = {
    val u = (Sampling.md5Bucket(col(idCol)) + lit(0.5)) / lit(Sampling.BucketSpace)
    scored.withColumn("pareto_micros",
        round((pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)) * lit(1e6))
          .cast("long"))
      .filter(col("pareto_micros") > lit(1000000L) - col("p_micros"))
  }
}
