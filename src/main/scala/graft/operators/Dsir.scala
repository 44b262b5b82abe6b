package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.tokenize

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick pretraining documents from a huge RAW crawl so
  * their distribution matches a small TARGET corpus (e.g. quality
  * text), using importance weights over HASHED n-gram features
  * rather than a neural scorer. The pipeline:
  *
  *  1. features: each document's unigrams + bigrams hash into `B`
  *     buckets ([[Sampling.md5Bucket]] mod B — md5 so the DuckDB
  *     oracle reproduces every bucket; a narrow per-doc transform);
  *  2. [[fitFeatures]] — bucket counts per corpus: ONE keyed shuffle
  *     with map-side partials to a B-row table (broadcastable by
  *     construction — B is a parameter, not data-dependent);
  *  3. [[importanceWeights]] — per doc,
  *     `w = Σ_feat [ln p_target(b) − ln p_raw(b)]` with Laplace
  *     smoothing `(cnt+1)/(total+B)`; both bucket tables broadcast
  *     into the feature scan, integer-micro per-instance terms keep
  *     the sums engine-order-independent (the NgramLm rule);
  *  4. [[gumbelTopK]] — sample k docs ∝ exp(w) WITHOUT replacement
  *     via Gumbel top-k: `key = w + g`, `g = −ln(−ln u)` with the
  *     uniform u derived from the doc id's hash bucket — replayable,
  *     partition-stable, no RNG (the weighted-reservoir precedent),
  *     and faithful to the paper's sampled (not argmax) selection.
  *
  * 100 TB shape: the raw corpus is touched by exactly two narrow
  * feature scans (fit + weigh) and one bounded-heap top-k; the only
  * shuffles are the two B-row count folds and the k-row heap merge.
  * Nothing joins corpus-to-corpus.
  */
object Dsir {

  /** Hashed feature-bucket instances: one row per unigram and bigram
    * occurrence, bucket = md5(feature) mod B.
    *
    * The n-gram expansion is the native codegen
    * [[graft.functions.expr.WordNgramsExpr]], exploded as an
    * EXPRESSION (not a materialized attribute). Both halves are
    * load-bearing for performance, not style: exploding an attribute
    * makes `InferFiltersFromGenerate` add `size(f) > 0` above the
    * projection, and filter-pushdown then inlines the whole feature
    * expression below it — with the HOF formulation that meant every
    * interpreted `element_at` lambda call re-tokenized the document
    * (O(tokens) re-tokenizations per row per scan; measured 13 s vs
    * 0.6 s for qX_dsir_weights at sf0.1). [[instancesHof]] keeps the
    * built-in-only formulation as the equivalence-tested spec. */
  private def instances(df: DataFrame, cols: Seq[Column], textCol: String,
                        buckets: Int): DataFrame = {
    import graft.functions.expr.TextExprs.word_ngrams
    df.select((cols :+ explode(concat(
        word_ngrams(col(textCol), 1), word_ngrams(col(textCol), 2))).as("_f")): _*)
      .select((cols :+ pmod(Sampling.md5Bucket(col("_f")), lit(buckets))
        .as("bucket")): _*)
  }

  /** HOF executable spec of [[instances]]' feature expansion (slow
    * path, test oracle): unigrams ++ adjacent bigrams, non-distinct,
    * document order. */
  private[graft] def featuresHof(text: Column): Column = {
    val toks = tokenize(text)
    concat(toks,
      when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1),
          i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
        .otherwise(array().cast("array<string>")))
  }

  /** Bucket histogram of a corpus: (bucket, cnt), only non-empty
    * buckets present (absent ⇒ 0; smoothing handles it). */
  def fitFeatures(docs: DataFrame, textCol: String, buckets: Int): DataFrame =
    instances(docs, Seq.empty, textCol, buckets)
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Per-document importance weight against two [[fitFeatures]]
    * histograms fitted with the SAME `buckets`.
    * @return (idCol, n_feats, w_micros) — docs with no features (empty
    *         text) are absent, matching [[NgramLm.score]]. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        target: DataFrame, raw: DataFrame,
                        buckets: Int): DataFrame = {
    def total(h: DataFrame, name: String) =
      h.agg(coalesce(sum(col("cnt")), lit(0L)).as(name))
    val t = target.select(col("bucket"), col("cnt").as("tc"))
    val r = raw.select(col("bucket"), col("cnt").as("rc"))
    instances(docs, Seq(col(idCol)), textCol, buckets)
      .join(broadcast(t), Seq("bucket"), "left")
      .join(broadcast(r), Seq("bucket"), "left")
      .crossJoin(broadcast(total(target, "tt"))) // 1-row scalars
      .crossJoin(broadcast(total(raw, "rt")))
      .withColumn("wm",
        round((log((coalesce(col("tc"), lit(0L)) + lit(1)).cast("double")
            / (col("tt") + lit(buckets)))
          - log((coalesce(col("rc"), lit(0L)) + lit(1)).cast("double")
            / (col("rt") + lit(buckets)))) * lit(1e6)).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("wm")).as("w_micros"))
  }

  /** Gumbel top-k resampling over [[importanceWeights]] output: keep
    * the k docs with the largest `w + gumbel(id)` — a without-
    * replacement sample ∝ exp(w), deterministic via the id-hash
    * uniform `u = (md5Bucket(id) + 0.5) / 2^32`. The noisy key is
    * re-quantized to micros so the ranking (and its DuckDB oracle)
    * compares integers, ties → lowest id. */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int): DataFrame = {
    val u = (Sampling.md5Bucket(col(idCol)) + lit(0.5)) / lit(Sampling.BucketSpace)
    val keyed = weights.withColumn("key_micros",
      col("w_micros") + round(-log(-log(u)) * lit(1e6)).cast("long"))
    TopK.grouped(keyed.withColumn("_g", lit(1)), Seq("_g"),
        struct((-col("key_micros")).as("nk"), col(idCol).as("i")), k)
      .select(col("best.i").as(idCol), (-col("best.nk")).as("key_micros"))
  }
}
