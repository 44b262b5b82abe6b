package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokenize

/** Full-text relevance search — the Spark-native re-expression of the
  * reference's Elasticsearch query surface (SURVEY §2.G).
  *
  * Reference query (SearchBizcard/es_search_bizcard.py:59-84): a `bool`
  * query with an optional `multi_match` must-clause over fields
  * `name^3, company, job_title, addr`, an optional non-scoring `term`
  * filter on `owner`, top-`limit` by `_score` desc.
  *
  * ES's BM25 internals are not observable from the reference (no pinned
  * scores anywhere — README.md:103-147 shows shapes only), so we declare
  * a deterministic TF-IDF (SURVEY §7.3):
  *
  *   score(doc) = Σ_field boost_f · Σ_{t ∈ query} tf(t, f, doc) · idf(t, f)
  *   idf(t, f)  = ln(1 + (N − df + 0.5) / (df + 0.5))      (BM25-style idf)
  *
  * with case-insensitive whitespace tokenization. This keeps the
  * reference's boost intent (name 3×) with fully reproducible scores
  * that a SQL oracle can recompute.
  *
  * Scale posture: the scoring pipeline is explode → two hash
  * aggregations (df per term, tf per doc) → one join on the term — all
  * key-partitioned shuffles. The per-term document-frequency table is
  * tiny (≤ |query terms|) and is broadcast into the tf join. The final
  * top-k is `TakeOrderedAndProject` (no global sort materialization).
  */
object Search {

  /** Per-(doc, term) term frequencies for one text field.
    * `posexplode`-free: tf is a plain count after explode.
    */
  private def termFreq(docs: DataFrame, idCol: String, field: String,
                       queryTerms: Seq[String]): DataFrame =
    docs
      .select(col(idCol).as("_doc"), explode(tokenize(col(field))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy("_doc", "term")
      .agg(count(lit(1)).as("tf"))

  /** idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) over one field. */
  private def idf(tf: DataFrame, n: Long): DataFrame =
    tf.groupBy("term")
      .agg(countDistinct(col("_doc")).as("df"))
      .select(col("term"),
        log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          .as("idf"))

  /** Score one text field for the given query terms: returns
    * (_doc, fscore) with fscore = Σ_t tf·idf, rows only for docs with at
    * least one hit (ES semantics: non-matching docs score 0 and are kept
    * only if another field matches).
    */
  def scoreField(docs: DataFrame, idCol: String, field: String,
                 queryTerms: Seq[String]): DataFrame = {
    val n = docs.count() // one cheap metadata-only count per scored field
    val tf = termFreq(docs, idCol, field, queryTerms)
    val idfs = broadcast(idf(tf, n))
    tf.join(idfs, "term")
      .groupBy("_doc")
      .agg(sum(col("tf") * col("idf")).as("fscore"))
  }

  /** BM25 relevance over one text field — the scorer Elasticsearch
    * actually runs under the reference's `multi_match`
    * (es_search_bizcard.py:65-68; ES default similarity since 5.0):
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * with the same BM25 idf the TF-IDF path already uses. Unlike
    * [[scoreField]], term frequency saturates (a 50-hit doc is not 50×
    * a 1-hit doc) and long documents are penalized toward the corpus
    * mean length — the two effects that make BM25 the default.
    *
    * Determinism across engines: dl is an exact integer token count;
    * Σdl over the corpus is an exact integer-valued double sum (order
    * independent below 2^53), so `avgdl` is one IEEE division — the
    * oracle recomputes it bit-for-bit. Per-(doc, term) scores are a
    * fixed parenthesized IEEE expression; only the ≤|query|-term final
    * sum is order-sensitive, absorbed by 4-decimal rounding (the
    * qG1/qG3 precedent).
    *
    * Scale shape: same as [[scoreField]] — explode → two hash aggs →
    * broadcast idf join — plus one narrow (doc, length) projection
    * joined back on the doc key; avgdl is a two-scalar aggregate to
    * the driver (constant-size at any corpus scale).
    */
  def bm25(docs: DataFrame, idCol: String, field: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           numDocs: Option[Long] = None): DataFrame = {
    val lens = docs.select(col(idCol).as("_doc"),
      size(tokenize(col(field))).cast("double").as("dl"))
    val agg = lens.agg(sum(col("dl")).as("s"), count(lit(1)).as("c")).head()
    // degenerate corpora: empty docs → sum is NULL; all-empty-text →
    // Σdl = 0 and dl/avgdl would be 0/0 = NaN. avgdl = 1.0 is a safe
    // identity there (every dl is 0, so the length term is just b·0).
    val (totLen, n) =
      (if (agg.isNullAt(0)) 0.0 else agg.getDouble(0), agg.getLong(1))
    val avgdl = if (n == 0L || totLen == 0.0) 1.0 else totLen / n
    val tf = termFreq(docs, idCol, field, queryTerms)
    val idfs = broadcast(idf(tf, numDocs.getOrElse(n)))
    tf.join(idfs, "term").join(lens, "_doc")
      .select(col("_doc"),
        (col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))).as("tscore"))
      .groupBy("_doc")
      .agg(sum(col("tscore")).as("_score"))
  }

  /** Multi-field boosted search over a document table.
    *
    * @param fields   (fieldName, boost) pairs — the reference uses
    *                 name^3, company^1, job_title^1, addr^1
    *                 (es_search_bizcard.py:65-68).
    * @param ownerFilter optional exact, non-scoring filter
    *                 (es_search_bizcard.py:72-73 `term` in filter context)
    * @param aliveCol optional soft-delete guard: is_alive = 1
    *                 (upsert_bizcard_to_es.py:71, README.md:97)
    * @param numDocs  corpus size N for the idf — pass a precomputed
    *                 value (index stats / memoized table count) to skip
    *                 the per-query counting job; this is also ES's
    *                 semantics (idf over the whole index, unaffected by
    *                 filter context). Default: count the filtered set.
    * @param scorer   "tfidf" (the declared reproducible scorer, qG1/qG3)
    *                 or "bm25" — the scorer ES actually runs under the
    *                 reference's multi_match (es_search_bizcard.py:62-70;
    *                 default similarity since ES 5.0), with per-FIELD
    *                 dl/avgdl as Lucene computes it (each field is its
    *                 own inverted index with its own length norms).
    * @param combine  cross-field combination: "sum" (ES most_fields —
    *                 Σ_field boost·fieldScore) or "max" (ES best_fields,
    *                 the multi_match DEFAULT the reference relies on:
    *                 score = max_field boost·fieldScore, so a doc
    *                 matching fully in one field outranks one spreading
    *                 the same terms thinly across many).
    * @param tieBreaker best_fields softening (ES `tie_breaker`, only
    *                 meaningful with combine = "max"): score =
    *                 best + tieBreaker · Σ(other fields) — 0.0 (the ES
    *                 default) is pure best_fields, 1.0 degenerates to
    *                 the sum form; in between, secondary-field matches
    *                 break ties between docs with equal best fields.
    */
  def search(docs: DataFrame, idCol: String, fields: Seq[(String, Double)],
             query: String, limit: Int,
             ownerFilter: Option[(String, String)] = None,
             aliveCol: Option[String] = None,
             numDocs: Option[Long] = None,
             scorer: String = "tfidf",
             combine: String = "sum",
             k1: Double = 1.2, b: Double = 0.75,
             tieBreaker: Double = 0.0): DataFrame = {
    require(Set("tfidf", "bm25")(scorer), s"unknown scorer $scorer")
    require(Set("sum", "max")(combine), s"unknown combine $combine")
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0,
      s"tie_breaker must be in [0, 1], got $tieBreaker")
    val queryTerms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    require(queryTerms.nonEmpty || ownerFilter.nonEmpty,
      "at least one of query / owner filter required (es_search_bizcard.py:75)")

    val filtered0 = ownerFilter.fold(docs) { case (c, v) => docs.filter(col(c) === v) }
    val filtered = aliveCol.fold(filtered0)(c => filtered0.filter(col(c) === 1))

    // owner-filter-only query: same schema as the scored path (_score
    // present, 0.0 — ES filter-context semantics) and a deterministic
    // order so limit() is stable across runs/engines
    if (queryTerms.isEmpty)
      return filtered.withColumn("_score", lit(0.0))
        .orderBy(asc(idCol)).limit(limit)

    // ONE scan for every scored field: stack (field, boost, tokens)
    // structs per row and explode, instead of re-scanning the table per
    // field (the per-field formulation costs 2·|fields|+1 scans — the
    // difference between one pass and five over a 100 TB corpus).
    // Scoring is identical: Σ_field boost · Σ_term tf·idf with idf
    // computed per (field, term).
    // N for idf: precomputed when the caller has stats (one fewer job
    // per query); the fallback counting pass is metadata-only when
    // unfiltered.
    val n = numDocs.getOrElse(filtered.count())
    val stacked = array(fields.map { case (f, bst) =>
      struct(lit(f).as("field"), lit(bst).as("boost"),
        tokenize(col(f)).as("toks"))
    }: _*)
    // per-(doc, field) token lists — the one wide explode; dl rides
    // along so BM25's length norm costs no extra scan of the corpus
    val fieldRows = filtered
      .select(col(idCol).as("_doc"), explode(stacked).as("ft"))
      .select(col("_doc"), col("ft.field").as("field"),
        col("ft.boost").as("boost"), col("ft.toks").as("toks"))
    val posts = fieldRows
      .select(col("_doc"), col("field"), col("boost"),
        size(col("toks")).cast("double").as("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    // dl is functionally dependent on (_doc, field); max() just carries it
    val tf = posts.groupBy("field", "boost", "term", "_doc")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val idfs = broadcast(
      tf.groupBy("field", "term").agg(count(lit(1)).as("df"))
        .select(col("field"), col("term"),
          log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
            .as("idf")))
    // per-(field, term, doc) partial score
    val termScored = scorer match {
      case "tfidf" =>
        tf.join(idfs, Seq("field", "term"))
          .withColumn("tscore", col("tf") * col("idf"))
      case "bm25" =>
        // per-field avgdl over ALL docs of the filtered corpus (not just
        // term-matching ones) — |fields| rows, broadcast. Needs its own
        // narrow (field, dl) aggregation pass; the all-empty-field guard
        // (Σdl = 0 → avgdl 1.0) mirrors [[bm25]]'s.
        val avgdls = broadcast(
          fieldRows.groupBy("field")
            .agg(sum(size(col("toks"))).as("s"), count(lit(1)).as("c"))
            .select(col("field"),
              when(col("s") === 0 || col("c") === 0, lit(1.0))
                .otherwise(col("s").cast("double") / col("c")).as("avgdl")))
        tf.join(idfs, Seq("field", "term")).join(avgdls, Seq("field"))
          .withColumn("tscore",
            col("idf") * (col("tf") * lit(k1 + 1.0)) /
              (col("tf") + lit(k1) *
                (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    }
    val perField = termScored
      .groupBy("_doc", "field", "boost")
      .agg(sum(col("tscore")).as("fsum"))
      .withColumn("wscore", col("boost") * col("fsum"))
    val combined = combine match {
      case "sum" => perField.groupBy("_doc").agg(sum(col("wscore")).as("_score"))
      case "max" if tieBreaker == 0.0 =>
        perField.groupBy("_doc").agg(max(col("wscore")).as("_score"))
      case "max" =>
        // best + tb·(sum − best): same single aggregation, two partials
        perField.groupBy("_doc")
          .agg(max(col("wscore")).as("_best"), sum(col("wscore")).as("_sum"))
          .select(col("_doc"),
            (col("_best") + lit(tieBreaker) * (col("_sum") - col("_best")))
              .as("_score"))
    }

    // rank on the score ROUNDED to the engine's 4-decimal precision
    // (raw `_score` stays in the output — callers own its precision):
    // the raw float sum's partition order varies with the thread
    // count, so a rounded-score tie at the limit boundary would
    // otherwise flip which doc survives run-to-run (the
    // qG5/SearchIndex.query lesson — same fixed total order the
    // oracles replay)
    filtered.join(combined, filtered(idCol) === combined("_doc"))
      .drop("_doc")
      .orderBy(round(col("_score"), 4).desc, col(idCol).asc)
      .limit(limit)
  }
}
