package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial naive-Bayes text classifier — the counts-only
  * generative sibling of the [[QualityLr]] discriminative filter
  * (the classic fasttext-baseline pairing: when the quality gate
  * needs a second opinion cheap enough to retrain per slice, NB is
  * the model whose FIT is one aggregation pass). Training is purely
  * counting: per-class token totals, add-1-smoothed per-term
  * likelihoods `ln((ct+1)/(tok_c+V))`, class priors `ln(N_c/N)` —
  * every model cell is one `round(ln(...)·1e6)` of exact integer
  * operands, so the fitted model (not just its predictions) is a
  * DuckDB-reproducible artifact, the [[QualityLr]] convention.
  *
  * Scoring folds integer micros: `score_c = prior_c + Σ_t n_t·ll_c(t)`
  * over the document's IN-VOCABULARY tokens (terms unseen in training
  * are dropped — the [[NgramLm.score]] convention; docs with no
  * in-vocabulary tokens are absent from the output). Ties predict 0.
  *
  * 100 TB shape: training is ONE (term, class) fold + one 2-row class
  * fold + one driver vocab count; scoring is one term-keyed join
  * (vocab-sized build side — AQE broadcasts when it fits) + one
  * id-keyed fold. No iterations, no windows, no corpus-corpus join.
  */
object NaiveBayes {

  /** Per-class document/token counts + priors: ONE row
    * (n0_docs, n1_docs, tok0, tok1, vocab, prior0_micros,
    * prior1_micros). */
  def priors(labeled: DataFrame, idCol: String, textCol: String,
             labelCol: String): DataFrame = {
    val toks = labeled.select(col(idCol).as("_id"),
      col(labelCol).cast("long").as("y"),
      explode(graft.functions.GraftFunctions.tokenize(col(textCol)))
        .as("term"))
    val docs = labeled.agg(
      sum(when(col(labelCol).cast("long") === 0L, 1L).otherwise(0L))
        .as("n0_docs"),
      sum(when(col(labelCol).cast("long") === 1L, 1L).otherwise(0L))
        .as("n1_docs"))
    val tok = toks.agg(
      sum(when(col("y") === 0L, 1L).otherwise(0L)).as("tok0"),
      sum(when(col("y") === 1L, 1L).otherwise(0L)).as("tok1"),
      countDistinct(col("term")).as("vocab"))
    docs.crossJoin(broadcast(tok))
      .select(col("n0_docs"), col("n1_docs"), col("tok0"), col("tok1"),
        col("vocab"),
        round(log(col("n0_docs")
          / (col("n0_docs") + col("n1_docs"))) * lit(1e6))
          .cast("long").as("prior0_micros"),
        round(log(col("n1_docs")
          / (col("n0_docs") + col("n1_docs"))) * lit(1e6))
          .cast("long").as("prior1_micros"))
  }

  /** Fit the per-term model: (term, ll0_micros, ll1_micros) for every
    * term of the training vocabulary, add-1 smoothed — terms a class
    * never saw still get that class's smoothed floor, so the model is
    * a dense vocab×2 grid and scoring needs no per-class fallback. */
  def train(labeled: DataFrame, idCol: String, textCol: String,
            labelCol: String): DataFrame = {
    val toks = labeled.select(col(idCol).as("_id"),
      col(labelCol).cast("long").as("y"),
      explode(graft.functions.GraftFunctions.tokenize(col(textCol)))
        .as("term"))
    val ct = toks.groupBy(col("term"))
      .agg(sum(when(col("y") === 0L, 1L).otherwise(0L)).as("ct0"),
        sum(when(col("y") === 1L, 1L).otherwise(0L)).as("ct1"))
    ct.crossJoin(broadcast(priors(labeled, idCol, textCol, labelCol)
        .select(col("tok0"), col("tok1"), col("vocab"))))
      .select(col("term"),
        round(log((col("ct0") + lit(1L))
          / (col("tok0") + col("vocab"))) * lit(1e6))
          .cast("long").as("ll0_micros"),
        round(log((col("ct1") + lit(1L))
          / (col("tok1") + col("vocab"))) * lit(1e6))
          .cast("long").as("ll1_micros"))
  }

  /** Score documents under a fitted model + priors row:
    * (idCol, score0_micros, score1_micros, pred) per doc with at
    * least one in-vocabulary token, ordered by id. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame, priorsRow: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(graft.functions.GraftFunctions.tokenize(col(textCol)))
        .as("term"))
    toks.join(model, Seq("term"))
      .groupBy(col(idCol))
      .agg(sum(col("ll0_micros")).as("s0"), sum(col("ll1_micros")).as("s1"))
      .crossJoin(broadcast(priorsRow
        .select(col("prior0_micros"), col("prior1_micros"))))
      .select(col(idCol),
        (col("prior0_micros") + col("s0")).as("score0_micros"),
        (col("prior1_micros") + col("s1")).as("score1_micros"),
        when(col("prior1_micros") + col("s1")
          > col("prior0_micros") + col("s0"), 1L).otherwise(0L).as("pred"))
      .orderBy(col(idCol))
  }
}
