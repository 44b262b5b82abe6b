package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._
import graft.operators.{Dedup, Dsir, NgramLm, QualityLr, Search, SearchIndex, TextAnalysis}

/** Text-analysis + search + dedup oracle queries over `documents`
  * (SURVEY §2.B/G + the training-data-pipeline extensions).
  *
  * Tokenization parity contract with the DuckDB oracle:
  * Spark `split(lower(text), "\\s+")` minus empties ==
  * DuckDB `list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')`.
  */
object TextQueries {

  private val SearchTerms = Seq("spark", "join", "fast")
  private val ScoreWords =
    Seq("spark", "join", "fast", "merge", "window", "batch", "stream", "query")

  /** DuckDB fragment: tokenized documents. */
  private val ToksSql =
    """SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |  x -> x <> '') AS toks FROM documents""".stripMargin

  /** DuckDB fragment: the naive-Bayes fit replayed as CTEs on the
    * same DSIR split as LrTrainSql — per-(term, class) counts, class
    * token totals + vocab, add-1 log-likelihood grid in micros. Ends
    * at CTEs `model` (term, ll0_micros, ll1_micros) and `nbm`
    * (tok0, tok1, vocab, class doc counts). */
  /** The NB CTE chain WITHOUT the `WITH d` header — composable after
    * any fragment that already defines `d` (the kappa oracle chains
    * it onto LrTrainSql). */
  private val NbCtes: String =
    s"""t AS (SELECT doc_id, unnest(toks) AS term FROM d WHERE doc_id >= 200),
       |ty AS (SELECT doc_id,
       |    CASE WHEN doc_id < 350 THEN 1 ELSE 0 END AS y, term FROM t),
       |ct AS (SELECT term,
       |    CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ct0,
       |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ct1
       |  FROM ty GROUP BY 1),
       |nbm AS (SELECT
       |    CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tok0,
       |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tok1,
       |    CAST(count(DISTINCT term) AS BIGINT) AS vocab,
       |    (SELECT count(*) FROM documents WHERE doc_id >= 350) AS nd0,
       |    (SELECT count(*) FROM documents
       |     WHERE doc_id >= 200 AND doc_id < 350) AS nd1
       |  FROM ty),
       |model AS (SELECT term,
       |    CAST(round(ln((ct0 + 1) * 1.0 / (tok0 + vocab)) * 1e6) AS BIGINT)
       |      AS ll0_micros,
       |    CAST(round(ln((ct1 + 1) * 1.0 / (tok1 + vocab)) * 1e6) AS BIGINT)
       |      AS ll1_micros
       |  FROM ct, nbm)""".stripMargin

  private val NbModelSql: String =
    s"""WITH d AS ($ToksSql),
       |$NbCtes""".stripMargin

  /** Shared near-dup-cluster CTE chain (shingles → Jaccard pairs →
    * recursive closure), ending at `comp` (doc_id, cluster) with `d`
    * (doc_id, toks) live — the clusters and survivor oracles build
    * their tails on it. */
  private val DedupClustersCte: String =
    """WITH RECURSIVE d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
      |  FROM documents WHERE doc_id < 300),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(len(toks), 2)),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS sh
      |  FROM d WHERE len(toks) >= 2),
      |posts AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh),
      |pairs AS (
      |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n_sh AS n1, b.n_sh AS n2,
      |    count(*) AS inter
      |  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2, 3, 4),
      |p AS (
      |  SELECT id1, id2 FROM pairs
      |  WHERE round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 4) >= 0.1),
      |adj AS (SELECT id1 AS f, id2 AS t FROM p
      |        UNION ALL SELECT id2, id1 FROM p),
      |reach(v, r) AS (
      |  SELECT f, f FROM (SELECT DISTINCT f FROM adj)
      |  UNION
      |  SELECT reach.v, adj.t FROM reach JOIN adj ON reach.r = adj.f),
      |comp AS (SELECT v AS doc_id, min(r) AS cluster FROM reach GROUP BY v)""".stripMargin

  /** Unrolled Platt-scaling oracle: `iters` GD rounds on the train
    * margin table from (A, B) = (1e6, 0) micros — the exact
    * quantization chain of [[graft.operators.QualityLr.plattFit]]. */
  private def plattSql(iters: Int): String = {
    val head =
      s"""$LrTrainSql,
         |pm AS (SELECT x.doc_id,
         |  CAST(sum(CAST(round(x.x * coalesce(w.w, 0) / 1e6) AS BIGINT))
         |    AS BIGINT) AS m
         |  FROM x LEFT JOIN w3 w USING (bucket) GROUP BY 1),
         |py AS (SELECT doc_id, m,
         |  CASE WHEN doc_id < 350 THEN 1000000 ELSE 0 END AS y FROM pm),
         |pn AS (SELECT count(*) AS n FROM py),
         |ab0 AS (SELECT CAST(1000000 AS BIGINT) AS a,
         |  CAST(0 AS BIGINT) AS b)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""ps$k AS (SELECT p.m, p.y,
         |    CAST(round(1e6 / (1 + exp(-((CAST(round(p.m * ab.a / 1e6)
         |      AS BIGINT) + ab.b) / 1e6)))) AS BIGINT) AS p
         |  FROM py p CROSS JOIN ab${k - 1} ab),
         |pg$k AS (SELECT
         |    CAST(sum(CAST(round((p - y) * m / 1e6) AS BIGINT)) AS BIGINT)
         |      AS ga,
         |    CAST(sum(p - y) AS BIGINT) AS gb FROM ps$k),
         |ab$k AS (SELECT CAST(ab.a - trunc(0.3 * g.ga / n.n) AS BIGINT) AS a,
         |    CAST(ab.b - trunc(0.3 * g.gb / n.n) AS BIGINT) AS b
         |  FROM ab${k - 1} ab, pg$k g, pn n)""".stripMargin
    }
    ((head +: rounds).mkString(",\n")) +
      s"\nSELECT n.n AS n, ab.a AS a_micros, ab.b AS b_micros" +
      s"\nFROM ab$iters ab, pn n"
  }

  /** DuckDB fragment: the qX_lr_model training loop replayed as
    * unrolled CTEs (see operators.QualityLr) — hashed 1+2-gram
    * buckets mod 64, train docs >= 200 (y = doc_id < 350), 3
    * full-batch GD rounds from w = 0, every accumulated quantity in
    * integer micros so sums are order-independent. Ends at CTE `w3`
    * (bucket, w); the model and score gates both build on it. */
  private val LrTrainSql: String = {
    val head =
      s"""WITH d AS ($ToksSql),
         |f AS (
         |  SELECT doc_id, unnest(list_concat(toks,
         |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
         |      i -> toks[i] || ' ' || toks[i+1])
         |    ELSE [] END)) AS feat
         |  FROM d),
         |bk AS (SELECT doc_id,
         |  CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT) % 64 AS bucket
         |  FROM f),
         |cnts AS (SELECT doc_id, bucket, count(*) AS cnt FROM bk
         |  WHERE doc_id >= 200 GROUP BY 1, 2),
         |tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats
         |  FROM cnts GROUP BY 1),
         |x AS (SELECT c.doc_id, c.bucket,
         |  CAST(round(c.cnt * 1e6 / t.n_feats) AS BIGINT) AS x
         |  FROM cnts c JOIN tot t USING (doc_id)),
         |y AS (SELECT DISTINCT doc_id,
         |  CASE WHEN doc_id < 350 THEN 1000000 ELSE 0 END AS y FROM x),
         |nn AS (SELECT count(DISTINCT doc_id) AS n FROM x),
         |w0 AS (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w FROM x)""".stripMargin
    val rounds = (1 to 3).map { k =>
      s"""m$k AS (SELECT x.doc_id,
         |  CAST(sum(CAST(round(x.x * w.w / 1e6) AS BIGINT)) AS BIGINT) AS m
         |  FROM x JOIN w${k - 1} w USING (bucket) GROUP BY 1),
         |r$k AS (SELECT m.doc_id,
         |  CAST(round(1e6 / (1 + exp(-(m.m / 1e6)))) AS BIGINT) - y.y AS r
         |  FROM m$k m JOIN y USING (doc_id)),
         |g$k AS (SELECT x.bucket,
         |  CAST(sum(CAST(round(x.x * r.r / 1e6) AS BIGINT)) AS BIGINT) AS g
         |  FROM x JOIN r$k r USING (doc_id) GROUP BY 1),
         |w$k AS (SELECT w.bucket,
         |  w.w - CAST(round(1.0 * coalesce(g.g, 0) / nn.n) AS BIGINT) AS w
         |  FROM w${k - 1} w LEFT JOIN g$k g USING (bucket) CROSS JOIN nn)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** DuckDB fragment: the trained LR's scores on the training docs
    * collapsed to the per-distinct-score tally table `g` (s, pos,
    * cnt) — shared by qX_auc, qX_threshold and qX_confusion so the
    * scored pipeline can never drift between the three gates. */
  private val LrScoredGSql: String =
    s"""$LrTrainSql,
       |sm AS (SELECT x.doc_id,
       |  CAST(sum(CAST(round(x.x * coalesce(w.w, 0) / 1e6) AS BIGINT))
       |    AS BIGINT) AS m
       |  FROM x LEFT JOIN w3 w USING (bucket) GROUP BY 1),
       |sp AS (SELECT doc_id,
       |  CAST(round(1e6 / (1 + exp(-(m / 1e6)))) AS BIGINT) AS p FROM sm),
       |j AS (SELECT p AS s,
       |  CASE WHEN doc_id < 350 THEN 1 ELSE 0 END AS yy FROM sp),
       |g AS (SELECT s, CAST(sum(yy) AS BIGINT) AS pos,
       |  CAST(count(*) AS BIGINT) AS cnt FROM j GROUP BY 1)""".stripMargin

  /** DuckDB fragment: reliability (calibration) bins of the trained
    * LR's probabilities on its training labels — shared by the
    * qX_calibration table gate and the qX_ece summary gate so the two
    * can never drift. Ends at CTE `cal` (bin, n, n_pos, acc_micros,
    * conf_micros). */
  private val CalBinsSql: String =
    s"""$LrTrainSql,
       |sm AS (SELECT x.doc_id,
       |  CAST(sum(CAST(round(x.x * coalesce(w.w, 0) / 1e6) AS BIGINT))
       |    AS BIGINT) AS m
       |  FROM x LEFT JOIN w3 w USING (bucket) GROUP BY 1),
       |sp AS (SELECT doc_id,
       |  CAST(round(1e6 / (1 + exp(-(m / 1e6)))) AS BIGINT) AS p FROM sm),
       |b AS (SELECT least(CAST(floor(p * 10 / 1e6) AS BIGINT), 9) AS bin,
       |  CASE WHEN doc_id < 350 THEN 1 ELSE 0 END AS yy, p FROM sp),
       |cal AS (SELECT bin, count(*) AS n, CAST(sum(yy) AS BIGINT) AS n_pos,
       |  CAST(floor(1e6 * sum(yy) / count(*)) AS BIGINT) AS acc_micros,
       |  CAST(floor(sum(p) / count(*)) AS BIGINT) AS conf_micros
       |FROM b GROUP BY 1)""".stripMargin

  /** DuckDB fragment: DSIR per-doc importance weights (see
    * operators.Dsir and the qX_dsir_* queries) — shared by the weights
    * gate and the Gumbel-sample gate. Yields (doc_id, n_feats,
    * w_micros) for doc_id < 200. */
  private val DsirWeightsSql =
    s"""WITH d AS ($ToksSql),
       |f AS (
       |  SELECT doc_id, unnest(list_concat(toks,
       |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i+1])
       |    ELSE [] END)) AS feat
       |  FROM d),
       |b AS (SELECT doc_id,
       |  CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT) % 1024 AS bucket
       |  FROM f),
       |t AS (SELECT bucket, count(*) AS tc FROM b
       |  WHERE doc_id >= 200 AND doc_id < 350 GROUP BY 1),
       |r AS (SELECT bucket, count(*) AS rc FROM b
       |  WHERE doc_id >= 350 GROUP BY 1),
       |tt AS (SELECT coalesce(sum(tc), 0) AS tt FROM t),
       |rt AS (SELECT coalesce(sum(rc), 0) AS rt FROM r),
       |wm AS (
       |  SELECT b.doc_id, CAST(round((
       |      ln((coalesce(t.tc, 0) + 1.0) / (tt.tt + 1024))
       |      - ln((coalesce(r.rc, 0) + 1.0) / (rt.rt + 1024))) * 1e6)
       |    AS BIGINT) AS wm
       |  FROM b LEFT JOIN t USING (bucket) LEFT JOIN r USING (bucket)
       |  CROSS JOIN tt CROSS JOIN rt
       |  WHERE b.doc_id < 200)
       |SELECT doc_id, count(*) AS n_feats, CAST(sum(wm) AS BIGINT) AS w_micros
       |FROM wm GROUP BY 1""".stripMargin

  /** Shared oracle for the multi-field BM25 queries (qG7/qG8):
    * per-field tokenization, per-field dl/avgdl, BM25 per (field, term,
    * doc) with the exact parenthesization of Search.search's bm25
    * branch, boost applied to the per-field sum; `finalAgg` picks the
    * cross-field combination — sum (most_fields) or max (best_fields). */
  private def Bm25MultiSql(finalAgg: String): String =
    s"""WITH n AS (SELECT count(*) AS n FROM documents),
       |ttoks AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |stoks AS (
       |  SELECT doc_id, list_filter(
       |    string_split_regex(lower(source), '\\s+'), x -> x <> '') AS toks
       |  FROM documents),
       |tlens AS (SELECT doc_id, len(toks) AS dl FROM ttoks),
       |slens AS (SELECT doc_id, len(toks) AS dl FROM stoks),
       |tstats AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM tlens),
       |sstats AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM slens),
       |ttf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(toks) AS term FROM ttoks) x
       |  WHERE term IN ('src3', 'merge') GROUP BY 1, 2),
       |stf AS (SELECT doc_id, term, count(*) AS tf FROM (
       |    SELECT doc_id, unnest(toks) AS term FROM stoks) x
       |  WHERE term IN ('src3', 'merge') GROUP BY 1, 2),
       |tidf AS (SELECT term, ln(1 + ((SELECT n FROM n) - count(*) + 0.5)
       |    / (count(*) + 0.5)) AS idf FROM ttf GROUP BY term),
       |sidf AS (SELECT term, ln(1 + ((SELECT n FROM n) - count(*) + 0.5)
       |    / (count(*) + 0.5)) AS idf FROM stf GROUP BY term),
       |tscore AS (SELECT ttf.doc_id, sum(
       |    tidf.idf * (ttf.tf * (1.2 + 1.0)) /
       |    (ttf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * tlens.dl / (SELECT avgdl FROM tstats)))
       |  ) * 1.0 AS fscore
       |  FROM ttf JOIN tidf USING (term) JOIN tlens USING (doc_id)
       |  GROUP BY ttf.doc_id),
       |sscore AS (SELECT stf.doc_id, sum(
       |    sidf.idf * (stf.tf * (1.2 + 1.0)) /
       |    (stf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * slens.dl / (SELECT avgdl FROM sstats)))
       |  ) * 3.0 AS fscore
       |  FROM stf JOIN sidf USING (term) JOIN slens USING (doc_id)
       |  GROUP BY stf.doc_id),
       |allscore AS (
       |  SELECT doc_id, fscore FROM sscore
       |  UNION ALL
       |  SELECT doc_id, fscore FROM tscore)
       |SELECT doc_id, $finalAgg AS score
       |FROM allscore GROUP BY doc_id
       |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin

  /** DuckDB restatement of [[graft.operators.Layout.zorderKey]]: the
    * same 5 magic-mask spread steps, generated once per operand. */
  private def spreadSql(e: String): String =
    Seq((16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
      (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
      (1, 0x5555555555555555L))
      .foldLeft(s"($e & 4294967295)") { case (acc, (s, m)) =>
        s"(($acc | ($acc << $s)) & $m)"
      }

  private val ZorderSql: String = {
    val a = spreadSql("(doc_id % 1024)")
    val b = spreadSql("((doc_id * 37) % 1024)")
    s"""SELECT doc_id, ($a | ($b << 1)) AS zkey
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1/B3: regex field extraction — first leftmost match, '' if none.
    "qB1_regex_extract" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), regexp_extract(col("text"), "j[a-z]+", 0).as("m"))
        .orderBy(col("doc_id"))
        .limit(500)
    }),

    // B2: the stopword-score line detector (addr heuristic generalized).
    "qB2_stopword_score" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          addrScore(col("text"), ScoreWords).as("score"))
        .filter(col("score") >= 3)
        .orderBy(col("doc_id"))
    }),

    // G1/G4: deterministic TF-IDF relevance, single field, top-20.
    "qG1_search_tfidf" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Search.scoreField(docs, "doc_id", "text", SearchTerms)
        .select(col("_doc").as("doc_id"), round(col("fscore"), 4).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(20)
    }),

    // G1-G3: multi-field boosted search (source^3, text^1) — the
    // name^3/company/job_title/addr boost shape of the reference.
    "qG3_search_boosted" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Search.search(docs, "doc_id",
          Seq("source" -> 3.0, "text" -> 1.0), "src3 merge", 20)
        .select(col("doc_id"), round(col("_score"), 4).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    // G2/G4 upgrade: BM25 — the scorer ES actually runs under the
    // reference's multi_match — saturating tf, length-normalized.
    "qG6_search_bm25" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Search.bm25(docs, "doc_id", "text", SearchTerms)
        .select(col("_doc").as("doc_id"), round(col("_score"), 4).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
        .limit(20)
    }),

    // G1-G4 serving form: BM25 under multi_match — the scorer ES
    // actually runs for the reference's query (es_search_bizcard.py:
    // 62-70; default similarity since 5.0). Per-FIELD dl/avgdl (each
    // field is its own Lucene index), boost applied to the per-field
    // sum, fields combined by Σ (most_fields).
    "qG7_search_bm25_multi" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Search.search(docs, "doc_id",
          Seq("source" -> 3.0, "text" -> 1.0), "src3 merge", 20,
          scorer = "bm25")
        .select(col("doc_id"), round(col("_score"), 4).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    // best_fields combination — the multi_match DEFAULT the reference's
    // query uses (no `type` given): score = max over per-field boosted
    // scores, not the sum. With BM25 this is exactly what the engine's
    // serving path (GraftEngine.search) runs, so this gate pins the
    // serving configuration end-to-end.
    "qG8_best_fields" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Search.search(docs, "doc_id",
          Seq("source" -> 3.0, "text" -> 1.0), "src3 merge", 20,
          scorer = "bm25", combine = "max")
        .select(col("doc_id"), round(col("_score"), 4).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    // ES tie_breaker semantics: best_fields softened by 0.3 of the
    // non-best field scores — score = best + 0.3·(sum − best). The
    // third point on the best_fields(0.0) … most_fields(1.0) line,
    // completing the multi_match combination family.
    "qG9_tie_breaker" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Search.search(docs, "doc_id",
          Seq("source" -> 3.0, "text" -> 1.0), "src3 merge", 20,
          scorer = "bm25", combine = "max", tieBreaker = 0.3)
        .select(col("doc_id"), round(col("_score"), 4).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    // G1 via the materialized inverted index: build postings + stats in
    // one pass, probe for the query terms — must equal qG1 exactly.
    "qG5_indexed_search" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val (postings, stats, n) = SearchIndex.build(docs, "doc_id", Seq("text"))
      SearchIndex.query(postings, stats, n, Seq("text" -> 1.0),
          SearchTerms.mkString(" "), 20)
        .select(col("doc").as("doc_id"), round(col("_score"), 4).as("score"))
        .orderBy(desc("score"), asc("doc_id"))
    }),

    // token counting: whitespace + BPE-ish subword split.
    "qX_token_count" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).as("n_subwords"))
        .orderBy(col("doc_id"))
    }),

    // Chao1 vocabulary-richness lower bound + Good–Turing unseen
    // mass — how much vocabulary the corpus hasn't shown yet.
    "qX_chao1" -> ((s, dir) => {
      TextAnalysis.chao1Richness(Tables.load(s, dir, "documents"),
        "text")
    }),

    // Held-out word-bigram coverage over the doc_id%10 split — the
    // n-gram-LM health check before perplexity means anything.
    "qX_bigram_coverage" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("is_train", col("doc_id") % 10 < 8)
      TextAnalysis.bigramCoverage(docs, "text", "is_train")
    }),

    // Corpus conditional bigram entropy H(c2|c1) — the second-order
    // gibberish screen (keyboard mash has near-uniform transitions).
    "qX_bigram_entropy" -> ((s, dir) => {
      TextAnalysis.bigramCondEntropy(Tables.load(s, dir, "documents"),
        "text")
    }),

    // Per-doc character entropy — the gibberish screen: natural text
    // ~2.8 nats, base64 blobs push toward the alphabet ceiling.
    "qX_char_entropy" -> ((s, dir) => {
      TextAnalysis.charEntropy(Tables.load(s, dir, "documents"),
        "doc_id", "text")
    }),

    // Fleiss' kappa across three deterministic rule raters (length /
    // space count / 'e' count thresholds) — the multi-rater
    // label-quality agreement beside qX_kappa's two-model Cohen.
    "qX_fleiss" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents").select(
        (length(col("text")) >= 350).cast("long").as("r1"),
        (length(col("text")) -
          length(regexp_replace(col("text"), " ", "")) >= 50)
          .cast("long").as("r2"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "e", "")) >= 12)
          .cast("long").as("r3"))
      graft.operators.Eval.fleissKappa(d, Seq("r1", "r2", "r3"))
    }),

    // Flesch reading-ease per doc: words/sentences/vowel-group
    // syllables as exact HOF counts, one IEEE scoring expression.
    "qX_readability" -> ((s, dir) => {
      TextAnalysis.readability(Tables.load(s, dir, "documents"),
        "doc_id", "text")
    }),

    // Corpus lexical richness: type-token ratio + hapax fraction —
    // the vocabulary-health companions to the Zipf slope.
    "qX_lexical" -> ((s, dir) => {
      TextAnalysis.lexicalRichness(Tables.load(s, dir, "documents"), "text")
    }),

    // quality scoring features.
    "qX_quality" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.qualityFeatures(col("text")).as("f"))
        .select(col("doc_id"), col("f.n_chars").as("n_chars"),
          col("f.n_tokens").as("n_tokens"),
          col("f.mean_tok_len").as("mean_tok_len"),
          col("f.punct_ratio").as("punct_ratio"),
          col("f.stopword_ratio").as("stopword_ratio"))
        .orderBy(col("doc_id"))
    }),

    // language-ID heuristic: per-language stopword-profile scores + argmax.
    // Gopher-style repetition signals + the keep-predicate, one scan.
    "qX_repetition" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.repetitionSignals(col("text")).as("sig"))
        .select(col("doc_id"),
          col("sig.dup_word_frac").as("dup_word_frac"),
          col("sig.top_bigram_frac").as("top_bigram_frac"),
          col("sig.top_trigram_frac").as("top_trigram_frac"),
          TextAnalysis.repetitionOk(col("sig")).as("keep"))
        .orderBy(col("doc_id"))
    }),

    "qX_lang_id" -> ((s, dir) => {
      val scores = TextAnalysis.langScores(col("text"))
      val cols = scores.map { case (lang, c) => c.as(s"s_$lang") }
      Tables.load(s, dir, "documents")
        .select((col("doc_id") +: cols :+
          TextAnalysis.langId(col("text")).as("pred")): _*)
        .orderBy(col("doc_id"))
    }),

    // document fingerprints: Karp-Rabin rolling hash + normalized md5.
    "qX_fingerprint" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .filter(col("doc_id") < 1000)
        .select(col("doc_id"),
          TextAnalysis.rollingFingerprint(col("text")).as("fp"),
          TextAnalysis.normalizedFingerprint(col("text")).as("nfp"))
        .orderBy(col("doc_id"))
    }),

    // deterministic train/val/test split: md5-bucket assignment,
    // engine-portable (the oracle recomputes the same buckets) — split
    // sizes AND membership are reproducible by construction.
    "qX_split" -> ((s, dir) => {
      graft.operators.Sampling.hashSplit(
          Tables.load(s, dir, "documents"), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy(col("split"))
    }),

    // Zipf-law slope of the token frequency curve — corpus health.
    "qX_zipf" -> ((s, dir) => {
      TextAnalysis.zipfFit(Tables.load(s, dir, "documents"), "text",
        topN = 200)
    }),

    // Heaps'-law vocabulary-growth fit across language slices — the
    // zipf companion: template spam grows vocab too slowly, noise
    // too fast.
    "qX_heaps" -> ((s, dir) => {
      TextAnalysis.heapsFit(Tables.load(s, dir, "documents"), "text",
        "lang")
    }),

    // TF-IDF keyword extraction: top-5 terms per doc, integer-milli
    // scores quantized before the limit.
    "qX_keywords" -> ((s, dir) => {
      graft.operators.SearchIndex.keywords(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 200),
        "doc_id", "text", topK = 5)
    }),

    // k-anonymity screen over (lang, source) quasi-identifiers — the
    // re-identification risk report before data leaves the pipeline.
    "qX_kanon" -> ((s, dir) => {
      graft.operators.Profile.kAnonymity(
        Tables.load(s, dir, "documents"), Seq("lang", "source"), 10L)
    }),

    // l-diversity companion: lang groups must see >= 3 distinct
    // sources or their rows count as at-risk.
    "qX_ldiv" -> ((s, dir) => {
      graft.operators.Profile.lDiversity(
        Tables.load(s, dir, "documents"), Seq("lang"), "source", 3L)
    }),

    // t-closeness at t=0.2: per-lang source distribution vs the global
    // one, exact cross-multiplied TVD terms, one floored division per
    // group — closes the skew attack l-diversity misses.
    "qX_tcloseness" -> ((s, dir) => {
      graft.operators.Profile.tCloseness(
        Tables.load(s, dir, "documents"), Seq("lang"), "source", 0.2)
    }),

    // stratified 5-fold CV assignment — per-(stratum, fold) counts +
    // an id-sum so the oracle checks MEMBERSHIP, not just sizes.
    "qX_kfold" -> ((s, dir) => {
      graft.operators.Sampling.kFold(
          Tables.load(s, dir, "documents"), "doc_id", 5)
        .groupBy(col("lang"), col("fold"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"), col("fold"))
    }),

    // deterministic 25% sample — row-level membership check (stronger
    // than a count: the oracle must agree on every sampled id).
    "qX_sample" -> ((s, dir) => {
      graft.operators.Sampling.hashSample(
          Tables.load(s, dir, "documents"), "doc_id", 0.25)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // per-key cap (the per-source document cap of data curation):
    // at most 3 events per user by (ts, event_id) — emit per-user
    // kept-counts plus a checksum of kept event ids.
    "qX_key_cap" -> ((s, dir) => {
      graft.operators.Sampling.perKeyCap(
          Tables.load(s, dir, "events"), "user_id",
          Seq("ts", "event_id"), 3)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_kept"), sum(col("event_id")).as("id_sum"))
        .orderBy(col("user_id"))
    }),

    // Z-order (Morton) layout key — the data-skipping write layout;
    // pure bit math, recomputed bit-for-bit by the DuckDB oracle.
    // Hilbert curve key — the no-jump locality upgrade over qX_zorder
    // (native codegen bit loop, unrolled level-by-level oracle).
    "qX_hilbert" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.Layout.hilbertKey(
            pmod(col("doc_id"), lit(1024L)),
            pmod(col("doc_id") * 37, lit(1024L)), 10).as("hkey"))
        .orderBy(col("doc_id"))
    }),

    // TextRank keywords: damped integer-micro PageRank over the word
    // co-occurrence graph — the centrality alternative to TF-IDF.
    "qX_textrank" -> ((s, dir) => {
      TextAnalysis.textRankKeywords(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 200),
        "text", window = 3, minCount = 5L, topN = 20, iters = 3)
    }),

    "qX_zorder" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.Layout.zorderKey(
            pmod(col("doc_id"), lit(1024L)),
            pmod(col("doc_id") * 37, lit(1024L))).as("zkey"))
        .orderBy(col("doc_id"))
    }),

    // uniform deterministic per-key sample: 5 docs per lang by
    // (md5 bucket, doc_id) — reservoir shape, hash as randomness.
    "qX_key_sample" -> ((s, dir) => {
      graft.operators.Sampling.perKeyUniformSample(
          Tables.load(s, dir, "documents"), "lang", "doc_id", 5)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // weighted deterministic per-key sample (A-Res): 5 docs per lang,
    // weight = n_chars — longer docs proportionally more likely.
    "qX_key_wsample" -> ((s, dir) => {
      graft.operators.Sampling.perKeyWeightedSample(
          Tables.load(s, dir, "documents").select("doc_id", "lang", "n_chars"),
          "lang", "doc_id", "n_chars", 5)
        .select(col("lang"), col("doc_id"))
        .orderBy(col("lang"), col("doc_id"))
    }),

    // exact dedup: content digest → survivor + duplicate count.
    "qX_dedup_exact" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .groupBy(md5(col("text")).as("digest"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .orderBy(col("digest"))
    }),

    // The composed corpus-clean pass: lang-ID + quality + repetition +
    // exact-dedup canonicalization in one operator, per-stage flags
    // kept for ablation audits.
    "qX_corpus_clean" -> ((s, dir) => {
      TextAnalysis.corpusClean(Tables.load(s, dir, "documents"),
          "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("q_ok"), col("rep_ok"),
          col("is_canonical"), col("keep"))
        .orderBy(col("doc_id"))
    }),

    // Text normalization: inject case/control/whitespace noise, then
    // normalize — the canonical form must be stable (and equal to the
    // DuckDB restatement byte-for-byte, via md5).
    "qX_normalize" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          md5(TextAnalysis.normalizeText(
            concat(lit("  "), upper(col("text")), lit("\tx "))))
            .as("norm_md5"))
        .orderBy(col("doc_id"))
    }),

    // Sliding token-window chunking: 32-token windows every 24 tokens
    // (8-token overlap) — the RAG/pretraining passage prep. Bounded to
    // doc_id < 200 so the gate frame stays comparison-sized.
    "qX_chunk" -> ((s, dir) => {
      TextAnalysis.chunkDocuments(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 200),
          "doc_id", "text", window = 32, stride = 24)
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // C4 line-wise cleaning (Raffel 2020 §2.2): synthesize line
    // structure by turning every " merge " separator into a sentence
    // break — each line ends with "." except the doc's final line,
    // which the terminal-punctuation rule then drops. Line rules:
    // >= 5 words, terminal punctuation, no "dup" substring; page
    // rules: drop docs whose raw text contains "window dup", keep
    // docs with >= 1 surviving line.
    "qX_c4_clean" -> ((s, dir) => {
      val withLines = Tables.load(s, dir, "documents")
        .withColumn("tx", regexp_replace(col("text"), " merge ", ".\n"))
      TextAnalysis.c4Clean(withLines, "doc_id", "tx",
          minWords = 5, requireTerminal = true, bannedLine = Seq("dup"),
          bannedDoc = Seq("window dup"), minKeptLines = 1)
        .orderBy(col("doc_id"))
    }),

    // URL/domain curation: synthesize a URL per doc (scheme + optional
    // userinfo + w{0,1,2} subdomain + source-derived registrable domain
    // over single- AND multi-label public suffixes + optional port +
    // path + optional query), then parse, blocklist three domains, and
    // cap every domain at 5 docs. The oracle re-CONSTRUCTS the ground
    // truth from the generator arithmetic instead of re-implementing
    // the parser — the Spark side must recover exactly what the
    // generator built (userinfo/port/query stripped, longest-suffix
    // domain), so a parse defect cannot cancel out.
    "qX_url_curate" -> ((s, dir) => {
      val sfx = element_at(
        array(lit("com"), lit("co.uk"), lit("io"), lit("org")),
        (pmod(col("doc_id"), lit(4)) + 1).cast("int"))
      val url = concat(lit("https://"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("user:pw@"))
          .otherwise(lit("")),
        lit("w"), pmod(col("doc_id"), lit(3)), lit("."),
        col("source"), lit("."), sfx,
        when(pmod(col("doc_id"), lit(7)) === 0, lit(":8443"))
          .otherwise(lit("")),
        lit("/p/"), col("doc_id"),
        when(pmod(col("doc_id"), lit(6)) === 0, lit("?q=1"))
          .otherwise(lit("")))
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), url.as("url"))
      // sources pin their suffix (source src<k> ⇒ doc_id≡k mod 20 ⇒
      // suffix by k mod 4), so the blocklist names domains that EXIST:
      // src3→org, src6→io, src13→co.uk — each drops its whole source
      graft.operators.UrlOps.curateByDomain(docs, "doc_id", "url",
          blockedDomains = Seq("src3.org", "src6.io", "src13.co.uk"),
          maxPerDomain = 5)
        .select(col("doc_id"), col("scheme"), col("host"),
          col("domain"), col("path"))
        .orderBy(col("doc_id"))
    }),

    // BPE tokenizer end-to-end: train 16 merges on the corpus, then
    // assert decode(encode(text)) reproduces the canonical token
    // stream for EVERY document — the oracle pins the roundtrip
    // contract (1 per doc); any encoder/decoder defect flips a row to
    // 0 and hash-mismatches. 16 merges keeps the sequential training
    // rounds a bounded share of the bench window; roundtrip exactness
    // is merge-table-agnostic, and the merge table itself is pinned
    // exactly by BpeSpec (Sennrich corpus, known 5-merge sequence).
    "qX_bpe_roundtrip" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val merges = graft.operators.Bpe.train(docs, "text", 16)
      docs.select(col("doc_id"),
          (graft.operators.Bpe.decode(
            graft.operators.Bpe.encode(col("text"), merges)) ===
            concat_ws(" ", tokenize(col("text")))).cast("int").as("ok"))
        .orderBy(col("doc_id"))
    }),

    // Fuzzy term search: the typo'd query "tabel" expands to vocabulary
    // terms within 2 edits (table, label, …), scored tf·idf·boost with
    // the Lucene fade-out boost 1 − dist/min(|q|,|t|). No LIMIT: the
    // expansion+scoring contract is the gate (top-k machinery is gated
    // elsewhere), so no float-boundary row can flip the compared set.
    "qX_fuzzy" -> ((s, dir) => {
      SearchIndex.fuzzySearch(Tables.load(s, dir, "documents"),
          "doc_id", "text", "tabel", 2, Int.MaxValue)
        .select(col("doc"), round(col("_score"), 4).as("score"))
        .orderBy(desc("score"), asc("doc"))
    }),

    // match_phrase "table hash" over the corpus: positional postings,
    // anchor-alignment merge, ranked by phrase frequency — the exact
    // consecutive-token semantics ES match_phrase (slop=0) serves.
    "qX_phrase" -> ((s, dir) => {
      SearchIndex.phraseSearch(Tables.load(s, dir, "documents"),
          "doc_id", "text", "table hash", 100)
    }),

    // Dirichlet-smoothed query likelihood for ("table", "hash"):
    // the language-modeling ranker beside TF-IDF/BM25 — every query
    // term scores every doc through the smoothing term; per-term
    // log-scores quantized before the per-doc sum and the limit.
    "qX_dirichlet_ql" -> ((s, dir) => {
      SearchIndex.dirichletQL(Tables.load(s, dir, "documents"),
        "doc_id", "text", Seq("table", "hash"), mu = 500.0, limit = 100)
    }),

    // Cross-document duplicated 5-grams (Lee et al. exact-substring
    // dedup, detection half): every 5-gram in >= 2 distinct docs with
    // doc/occurrence counts.
    "qX_dup_ngrams" -> ((s, dir) => {
      Dedup.duplicatedNgrams(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", n = 5, minDf = 2)
        .orderBy(col("gram"))
    }),

    // Per-document duplicated spans: maximal token ranges covered by
    // cross-doc duplicated 5-grams — the cut-these-before-training
    // report (islands merged per doc, never a global window).
    "qX_dup_spans" -> ((s, dir) => {
      Dedup.duplicatedSpans(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text", n = 5, minDf = 2)
        .orderBy(col("doc_id"), col("span_start"))
    }),

    // Winnowing fingerprints (MOSS): per 4-window of 3-gram hashes
    // keep the rightmost minimum — positions of overlap, local
    // guarantee, ~2/(w+1) selection density.
    "qX_winnow" -> ((s, dir) => {
      TextAnalysis.winnow(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 200),
        "doc_id", "text", k = 3, w = 4)
    }),

    // Jensen–Shannon divergence between two sources' token
    // distributions — the symmetric vocabulary-drift monitor (finite
    // with zero smoothing; per-key integer-micro terms).
    "qX_jsd" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      def toks(src: String) = docs.filter(col("source") === src)
        .select(explode(tokenize(col("text"))).as("tok"))
      graft.operators.Drift.jsDivergence(toks("src0"), toks("src1"), "tok")
    }),

    // Corpus vocabulary: global top-50 tokens by frequency (the
    // tokenizer-training precursor; bounded-heap top-V, no full sort).
    "qX_vocab" -> ((s, dir) => {
      TextAnalysis.buildVocab(Tables.load(s, dir, "documents"), "text", 50)
        .orderBy(col("rank"))
    }),

    // Bigram LM reference model (the CCNet/KenLM seam): counts over
    // the "clean half" of the corpus, tail pruned at minCount=3 — one
    // keyed shuffle with map-side partials.
    "qX_lm_model" -> ((s, dir) => {
      NgramLm.train(
          Tables.load(s, dir, "documents").filter(col("doc_id") >= 200),
          "text", minCount = 3)
        .orderBy(col("ctx"), col("word"))
    }),

    // Held-out perplexity scoring: model on docs >= 200, scored docs
    // < 200, so unseen bigrams AND unseen contexts exercise both
    // Laplace fallbacks. Integer-micro log-probs keep the per-doc sums
    // engine-order-independent.
    "qX_lm_score" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      NgramLm.score(docs.filter(col("doc_id") < 200), "doc_id", "text",
          NgramLm.train(docs.filter(col("doc_id") >= 200), "text"))
        .orderBy(col("doc_id"))
    }),

    // DSIR importance weights (Xie 2023): hashed unigram+bigram
    // buckets (md5 — engine-portable), target = docs 200..349, raw =
    // docs >= 350, weighed docs < 200 held out of both fits. The
    // histograms broadcast; the corpus is never shuffled except the
    // per-doc fold.
    "qX_dsir_weights" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val t = Dsir.fitFeatures(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 350), "text", 1024)
      val r = Dsir.fitFeatures(docs.filter(col("doc_id") >= 350), "text", 1024)
      Dsir.importanceWeights(docs.filter(col("doc_id") < 200),
          "doc_id", "text", t, r, 1024)
        .orderBy(col("doc_id"))
    }),

    // DSIR Gumbel top-k: sample 50 docs ∝ exp(w) without replacement,
    // noise from the id-hash uniform — replayable, SQL-reproducible.
    "qX_dsir_sample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val t = Dsir.fitFeatures(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 350), "text", 1024)
      val r = Dsir.fitFeatures(docs.filter(col("doc_id") >= 350), "text", 1024)
      val w = Dsir.importanceWeights(docs.filter(col("doc_id") < 200),
        "doc_id", "text", t, r, 1024)
      Dsir.gumbelTopK(w, "doc_id", 50)
        .orderBy(desc("key_micros"), col("doc_id"))
    }),

    // Quality-classifier model (GPT-3/fasttext seam): logistic
    // regression over hashed 1+2-gram buckets, target = docs 200..349
    // (y=1) vs raw = docs >= 350 (y=0) — the DSIR split — trained 3
    // full-batch GD rounds from w=0 in integer micros. The MODEL is
    // the gated artifact; the oracle replays training as unrolled CTEs.
    "qX_lr_model" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") >= 200)
        .withColumn("y", (col("doc_id") < 350).cast("int"))
      QualityLr.train(docs, "doc_id", "text", "y",
          buckets = 64, iters = 3, lr = 1.0)
        .orderBy(col("bucket"))
    }),

    // Quality scores on held-out docs < 200 under the qX_lr_model
    // classifier: p = sigmoid(x·w) in micros, unseen buckets weigh 0.
    "qX_lr_score" -> ((s, dir) => {
      LrFixture.scoredHeld(s, dir).orderBy(col("doc_id"))
    }),

    // GPT-3's Pareto keep-rule over the classifier scores: keep iff
    // pareto(9) > 1 - p, the draw derived from the doc id's md5 hash
    // — quality-weighted but long-tailed, fully SQL-replayable.
    "qX_lr_select" -> ((s, dir) => {
      QualityLr.paretoSelect(LrFixture.scoredHeld(s, dir),
          "doc_id", alpha = 9.0)
        .orderBy(col("doc_id"))
    }),

    // Multinomial naive Bayes on the same DSIR split: the fit IS one
    // counting pass — per-term add-1 log-likelihood grid in micros,
    // the generative second opinion next to the LR gate.
    "qX_nb_model" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") >= 200)
        .withColumn("y", (col("doc_id") < 350).cast("int"))
      graft.operators.NaiveBayes.train(docs, "doc_id", "text", "y")
        .orderBy(col("term"))
    }),

    // NB posteriors on the held-out docs < 200: prior + token-count
    // weighted log-likelihood folds, OOV terms dropped, ties → 0.
    "qX_nb_score" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val train = docs.filter(col("doc_id") >= 200)
        .withColumn("y", (col("doc_id") < 350).cast("int"))
      val model = graft.operators.NaiveBayes.train(train, "doc_id", "text", "y")
      val pri = graft.operators.NaiveBayes.priors(train, "doc_id", "text", "y")
      graft.operators.NaiveBayes.score(docs.filter(col("doc_id") < 200),
        "doc_id", "text", model, pri)
    }),

    // Rank-based ROC-AUC (tie-corrected Mann–Whitney) of the qX_lr
    // classifier on its training labels — the metric a curation
    // pipeline gates a filter model on. Integer-micro end to end.
    "qX_auc" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.aucRank(scored, "y", "p_micros")
    }),

    // Cost-optimal operating point over the same scores: the distinct-
    // score cut minimizing 1·FP + 3·FN micros (deleting good data
    // costs 3× keeping bad).
    "qX_threshold" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.bestThreshold(scored, "y", "p_micros",
        costFpMicros = 1000000L, costFnMicros = 3000000L)
    }),

    // Confusion matrix + P/R/F1 of the same scores at the 0.5 cut.
    "qX_confusion" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.confusionAtThreshold(scored, "y", "p_micros",
        threshold = 500000L)
    }),

    // Split-conformal coverage of the same scores: md5 half-split,
    // exact rank-selected threshold, held-out coverage >= 1 - alpha.
    "qX_conformal" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.conformal(scored, "doc_id", "y", "p_micros",
        alphaMicros = 100000L)
    }),

    // Platt scaling: FIT the calibration the ECE gate measures — 3
    // deterministic GD rounds on the LR margin table from (A,B)=(1,0),
    // integer-micro quantities throughout; the params are the gate.
    "qX_platt" -> ((s, dir) => {
      QualityLr.plattFit(LrFixture.marginsTrain(s, dir),
        "m_micros", "y", iters = 3, lr = 0.3)
    }),

    // Class-based TF-IDF (BERTopic labeling): top-5 distinctive terms
    // per source slice, quantized before the bounded-heap rank.
    "qX_ctfidf" -> ((s, dir) => {
      TextAnalysis.classTfidf(Tables.load(s, dir, "documents"),
        "source", "text", topN = 5)
    }),

    // Step-wise PR-AUC over the same scores — the imbalanced-class
    // companion to qX_auc, one floored term per distinct score group.
    "qX_pr_auc" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.prAuc(scored, "y", "p_micros")
    }),

    // Cohen's kappa between the LR gate (threshold 0.5) and the NB
    // second opinion on the held-out docs — chance-corrected
    // agreement of the two quality classifiers.
    "qX_kappa" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val train = docs.filter(col("doc_id") >= 200)
        .withColumn("y", (col("doc_id") < 350).cast("int"))
      val held = docs.filter(col("doc_id") < 200)
      val lr = LrFixture.scoredHeld(s, dir)
        .select(col("doc_id"),
          (col("p_micros") >= 500000L).cast("long").as("a"))
      val nbModel = graft.operators.NaiveBayes.train(
        train, "doc_id", "text", "y")
      val pri = graft.operators.NaiveBayes.priors(
        train, "doc_id", "text", "y")
      val nb = graft.operators.NaiveBayes.score(held, "doc_id", "text",
          nbModel, pri)
        .select(col("doc_id"), col("pred").as("b"))
      graft.operators.Eval.cohenKappa(lr.join(nb, "doc_id"), "a", "b")
    }),

    // Brier score over the same scores — the strictly proper scoring
    // rule beside ECE: exact integer squared-error fold.
    "qX_brier" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.brierScore(scored, "y", "p_micros")
    }),

    // Isotonic calibration over the same probability deciles via the
    // closed-form minimax PAV — the non-parametric alternative to
    // qX_platt when the reliability curve isn't sigmoid-shaped.
    "qX_isotonic" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.isotonicBins(scored, "y", "p_micros")
    }),

    // Murphy decomposition of the same Brier score: reliability −
    // resolution + uncertainty over probability deciles — WHERE the
    // classifier loses points, not just how many.
    "qX_brier_decomp" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.brierDecomposition(scored, "y", "p_micros")
    }),

    // Reliability bins over the same scores: observed positive rate vs
    // mean predicted probability per probability decile.
    "qX_calibration" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.calibrationBins(scored, "y", "p_micros", 10)
    }),

    // Expected calibration error over those reliability bins — the
    // one-number summary a pipeline alerts on when a filter model's
    // confidence drifts from its accuracy.
    "qX_ece" -> ((s, dir) => {
      val scored = LrFixture.scoredTrain(s, dir)
      graft.operators.Eval.ece(
        graft.operators.Eval.calibrationBins(scored, "y", "p_micros", 10))
    }),

    // Batch more-like-this search: docs 0..4 as query workloads (their
    // own token sets), served by ONE postings join — no per-query jobs.
    // Integer-milli tf·idf contributions (order-independent fold).
    "qX_batch_search" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val (postings, stats, n) = SearchIndex.build(docs, "doc_id", Seq("text"))
      val batch = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          explode(tokenize(col("text"))).as("term"))
      SearchIndex.batchQuery(postings, stats, n, "text", batch, 10,
        excludeSelf = true)
    }),

    // Windowed word-pair PMI (the co-occurrence statistic embeddings
    // factorize; Levy & Goldberg 2014): narrow HOF pair extraction,
    // marginals re-keyed from pair counts, integer-micro ln ratio.
    "qX_pmi" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
      TextAnalysis.pmiPairs(docs, "text", window = 3, minCount = 5)
        .orderBy(desc("pmi_micros"), col("a"), col("b"))
        .limit(100)
    }),

    // χ² token–label feature selection (label = lang 'en'): top-50
    // tokens by the 2×2 chi-square over doc-presence counts.
    "qX_chi2" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .withColumn("y", (col("lang") === "en").cast("int"))
      TextAnalysis.chiSquareTokens(docs, "text", "y", minDocs = 5,
        topN = 50)
    }),

    // OOV rate per doc against the top-20 vocab — the coverage metric.
    "qX_oov" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextAnalysis.oovRate(docs.filter(col("doc_id") < 200),
          "doc_id", "text",
          TextAnalysis.buildVocab(docs, "text", 20))
        .orderBy(col("doc_id"))
    }),

    // Near-dup clusters: connected components over the n-gram pair
    // graph, singletons kept — one canonical doc per chained group.
    "qX_dedup_clusters" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.1)
      Dedup.clusters(pairs, docs, "doc_id")
        .orderBy(col("doc_id"))
    }),

    // Survivorship over the near-dup clusters: per cluster keep the
    // highest-token-count member (score desc, id asc) — the step
    // that decides WHICH copy the corpus keeps.
    "qX_dedup_survivor" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.1)
      val cl = Dedup.clusters(pairs, docs, "doc_id")
      val scored = docs.select(col("doc_id"),
        size(tokenize(col("text"))).cast("long").as("n_toks"))
      Dedup.keepBest(cl, scored, "doc_id", "n_toks")
    }),

    // One-pass column profile (exact form for the gate; HLL estimates
    // are the scale default — see Sketches).
    "qX_profile" -> ((s, dir) => {
      graft.operators.Profile.summarize(
        Tables.load(s, dir, "documents"),
        Seq("doc_id", "lang", "source", "n_chars"), exact = true)
    }),

    // n-gram Jaccard near-dup pairs (exact all-pairs oracle form).
    "qX_dedup_ngram" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.03)
        .orderBy(desc("jaccard"), asc("id1"), asc("id2"))
        .limit(100)
    }),

    // Asymmetric containment pairs — the quote-inclusion signal
    // (small doc inside big doc) that Jaccard's union denominator
    // structurally suppresses.
    "qX_dedup_containment" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
      Dedup.containmentPairs(docs, "text", "doc_id", 2, 0.1)
        .orderBy(desc("containment"), asc("id1"), asc("id2"))
        .limit(100)
    }),

    // Df-capped containment recall: plant a quote corpus (first 11
    // tokens of every ≥12-token doc, +100000 ids) — each quote's
    // bigrams sit wholly inside its source doc (containment 1.0) and
    // the banded path must recover every planted pair (the
    // qX_fuzzy_join_recall construction for the asymmetric signal).
    "qX_dedup_containment_recall" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val toks = tokenize(col("text"))
      val planted = docs.filter(size(toks) >= 12)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat_ws(" ", slice(toks, 1, 11)).as("text"))
      val pairs = Dedup.containmentPairsBanded(
        docs.unionByName(planted), "text", "doc_id",
        n = 2, minContainment = 0.99, maxDf = 64)
      docs.filter(size(toks) >= 12).agg(count(lit(1)).as("n_planted"))
        .crossJoin(pairs.filter(col("id2") === col("id1") + 100000)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // Sequence packing: (bin, offset) slots in 512-token context
    // windows via the distributed prefix-scan (the scale form; its
    // equality with the global-window spec is pinned in ScaleOpsSpec).
    "qX_pack" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing.packScalable(docs, "doc_id", "n_tokens", 512)
        .orderBy(col("doc_id"))
    }),

    // Length-bucketed batch assembly (the non-packed batching
    // strategy): equal-frequency ntile buckets over (tokens, id) —
    // similar-length docs batch together so padding goes to the
    // bucket max, not the corpus max.
    "qX_length_buckets" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing.lengthBuckets(docs, "doc_id", "n_tokens", 8)
        .orderBy(col("doc_id"))
    }),

    // The distributed twin of qX_length_buckets: exact global-rank
    // ntile via range-partition + per-partition row_number + prefix
    // offsets — no global window, bit-identical buckets. Same full-row
    // DuckDB oracle as the spec form: equality IS the gate.
    "qX_length_buckets_scalable" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.operators.Packing.lengthBucketsScalable(docs, "doc_id", "n_tokens", 8)
        .orderBy(col("doc_id"))
    }),

    // PII redaction: deterministic planted e-mail+phone per doc, redact,
    // audit counts — the release gate of a curation pipeline.
    "qX_redact" -> ((s, dir) => {
      val noisy = concat(col("text"),
        lit(" reach me: u"), col("doc_id").cast("string"),
        lit("@mail-"), col("doc_id").cast("string"),
        lit(".example.org or +821010"), col("doc_id").cast("string"),
        lit("25"))
      val (nEmails, nPhones) = TextAnalysis.piiCounts(noisy)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          md5(TextAnalysis.redactPii(noisy)).as("red_md5"),
          nEmails.as("n_emails"), nPhones.as("n_phones"))
        .orderBy(col("doc_id"))
    }),

    // Canonical-URL dedup: userinfo/port/query variants of the same
    // page collapse to scheme://host/path, min-id survivor — the
    // crawl-pipeline step before any content dedup. The oracle
    // reconstructs the canonical from the generator arithmetic, so a
    // parse defect cannot cancel out.
    "qX_url_dedup" -> ((s, dir) => {
      val url = concat(lit("https://"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit("user:pw@"))
          .otherwise(lit("")),
        col("source"), lit(".com"),
        when(pmod(col("doc_id"), lit(7)) === 0, lit(":8443"))
          .otherwise(lit("")),
        lit("/p/"), pmod(col("doc_id"), lit(50)),
        when(pmod(col("doc_id"), lit(6)) === 0, lit("?q=1"))
          .otherwise(lit("")))
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), url.as("url"))
      graft.operators.UrlOps.canonicalUrlDedup(docs, "doc_id", "url")
    }),

    // Per-doc trigram novelty vs the reference slice — the graded
    // decontamination: what fraction of a doc's n-grams the training
    // corpus has never seen (memorization-risk / generation-quality).
    "qX_novelty" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      Dedup.ngramNovelty(docs.filter(col("doc_id") < 200), "doc_id",
        "text", docs.filter(col("doc_id") >= 200), "text", 3)
    }),

    // Benchmark decontamination: every 97th doc is the "benchmark";
    // flag corpus docs sharing any trigram with it (bench docs flag
    // themselves — a doc containing benchmark text IS contaminated).
    "qX_decontam" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      Dedup.decontaminate(docs, "doc_id", "text", bench, "text", 3)
        .orderBy(col("doc_id"))
    }),

    // Cross-corpus fuzzy join, exact form (record linkage): bigram
    // Jaccard between two disjoint document slices via the shared-
    // shingle equi-join — full-row oracle; the LSH-blocked scale form
    // is gated by qX_fuzzy_join_recall.
    "qX_fuzzy_join" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val l = docs.filter(col("doc_id") < 120)
      val r = docs.filter(col("doc_id") >= 120 && col("doc_id") < 240)
      Dedup.fuzzyJoinExact(l, "doc_id", "text", r, "doc_id", "text",
          n = 2, minJaccard = 0.03)
        .orderBy(desc("jaccard"), col("lid"), col("rid")).limit(100)
    }),

    // LSH-blocked fuzzy join recall: plant a near-copy corpus (last
    // token dropped, +100000 ids) as the right side — every planted
    // pair has Jaccard ≈ 1 and the deterministic banding must recover
    // all of them (the qX_dedup_minhash_recall construction, across
    // two tables).
    "qX_fuzzy_join_recall" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val near = docs.select((col("doc_id") + 100000).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
      val pairs = Dedup.fuzzyJoin(docs, "doc_id", "text",
        near, "doc_id", "text", n = 2, k = 64, bands = 32,
        minJaccard = 0.5)
      docs.agg(count(lit(1)).as("n_planted"))
        .crossJoin(pairs.filter(col("rid") === col("lid") + 100000)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // Domain-mixture sampling: target weights over lang groups (es has
    // no weight → dropped; de's quota exceeds its size → rate caps at
    // 1, whole group kept), per-group kept-count + id checksum.
    "qX_mixture" -> ((s, dir) => {
      graft.operators.Sampling.mixtureSample(
          Tables.load(s, dir, "documents").select("doc_id", "lang"),
          "lang", "doc_id",
          Seq("en" -> 0.4, "de" -> 0.4, "fr" -> 0.1, "zh" -> 0.1), 300L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    }),

    // Temperature mixture sampling: shares derived from the data
    // (p_k = n_k^0.5 / Σ n^0.5 — flattens head languages, lifts the
    // tail), then the same deterministic md5-bucket keep as
    // qX_mixture. Rates round to 9 decimals on both sides (pow's
    // last-ulp contract).
    "qX_mixture_temp" -> ((s, dir) => {
      graft.operators.Sampling.temperatureSample(
          Tables.load(s, dir, "documents").select("doc_id", "lang"),
          "lang", "doc_id", alpha = 0.5, targetN = 200L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
        .orderBy(col("lang"))
    }),

    // Perplexity-band pruning (Marion 2023): score docs < 200 under
    // the held-out bigram LM, keep the middle (0.1, 0.8] rank band of
    // the ppl distribution — exact distributed global rank, no
    // quantile sketch, so the kept set is a full-row oracle.
    "qX_ppl_prune" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scored = NgramLm.score(docs.filter(col("doc_id") < 200),
        "doc_id", "text",
        NgramLm.train(docs.filter(col("doc_id") >= 200), "text"))
      NgramLm.pruneByPerplexity(scored, "doc_id", 0.1, 0.8)
        .orderBy(col("doc_id"))
    }),

    // Corpus BLEU of a synthetically degraded candidate (first 42
    // tokens, every 7th dropped) vs the original text — clipping,
    // pooled counts and the brevity penalty all exercised; one row.
    "qX_bleu" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
      val base = slice(tokenize(col("text")), 1, 42)
      val cand = concat_ws(" ", transform(
        filter(sequence(lit(1), size(base)), i => i % 7 =!= 0),
        i => element_at(base, i)))
      graft.operators.Eval.corpusBleu(
        docs.select(col("doc_id"), cand.as("cand"), col("text").as("ref")),
        "doc_id", "cand", "ref", 4)
    }),

    // Interpolated Kneser-Ney scoring (the KenLM/CCNet smoothing) of
    // docs < 200 under the model trained on docs >= 200 — seen,
    // unseen-bigram and unseen-context branches all hit.
    "qX_lm_kn" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      NgramLm.scoreKneserNey(docs.filter(col("doc_id") < 200),
          "doc_id", "text",
          NgramLm.train(docs.filter(col("doc_id") >= 200), "text"))
        .orderBy(col("doc_id"))
    }),

    // Declarative data-quality constraint suite in ONE agg pass —
    // the ingest admission gate. n_chars_bounds FAILS by design
    // (463/500 < 0.95): the passed column carries real signal.
    "qX_constraints" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      import graft.operators.Profile._
      checkConstraints(docs, Seq(
        Completeness("text", 1.0),
        Uniqueness("doc_id", 1.0),
        Distinctness("lang", 0.005),
        Compliance("lang_in_set", "lang",
          col("lang").isin("en", "de", "fr", "es", "zh"), 1.0),
        Compliance("n_chars_bounds", "n_chars",
          col("n_chars").between(1, 500), 0.95)))
    }),

    // Leakage-safe split: near-dup clusters (the qX_dedup_clusters
    // pipeline) assign train/test by CLUSTER hash — no near-dup pair
    // ever straddles the eval boundary.
    "qX_leakage_split" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 300)
      val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.1)
      val clusters = Dedup.clusters(pairs, docs, "doc_id")
      graft.operators.Sampling.leakageSafeSplit(
          docs.select(col("doc_id"), col("lang")), "doc_id", clusters,
          Seq("train" -> 0.8, "test" -> 0.2))
        .orderBy(col("doc_id"))
    }))

  /** Unrolled Hilbert xy2d oracle for [[qX_hilbert]]: per level the
    * quadrant digit + masked rotate/flip — the exact replay of
    * `VectorExprUtil.hilbertIndex`. */
  private def hilbertSql(bits: Int): String = {
    val head =
      """WITH h0 AS (SELECT doc_id, doc_id % 1024 AS x,
        |  (doc_id * 37) % 1024 AS y, CAST(0 AS BIGINT) AS d
        |  FROM documents)""".stripMargin
    val steps = (1 to bits).map { k =>
      val s = 1L << (bits - k)
      val m = s - 1
      s"""h$k AS (SELECT doc_id,
         |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) <> 0
         |    THEN $m - (y & $m) ELSE (y & $m) END)
         |    ELSE (x & $m) END AS x,
         |  CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) <> 0
         |    THEN $m - (x & $m) ELSE (x & $m) END)
         |    ELSE (y & $m) END AS y,
         |  d + ${s * s} * (CASE
         |    WHEN (x & $s) <> 0 AND (y & $s) <> 0 THEN 2
         |    WHEN (x & $s) <> 0 THEN 3
         |    WHEN (y & $s) <> 0 THEN 1 ELSE 0 END) AS d
         |FROM h${k - 1})""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT doc_id, CAST(d AS BIGINT) AS hkey FROM h$bits ORDER BY doc_id"
  }

  /** Unrolled TextRank oracle for [[qX_textrank]]: the qX_pmi pair
    * extraction builds the weighted word graph, then `iters` damped
    * integer-micro PageRank rounds — the exact replay of
    * `TextAnalysis.textRankKeywords`. */
  private def textRankSql(iters: Int): String = {
    val head =
      s"""WITH d AS ($ToksSql),
         |p AS (SELECT doc_id, unnest(flatten(list_transform(
         |    range(1, len(toks)),
         |    i -> list_transform(range(i + 1, least(i + 3, len(toks)) + 1),
         |      j -> [least(toks[i], toks[j]),
         |            greatest(toks[i], toks[j])])))) AS pr
         |  FROM d WHERE doc_id < 200 AND len(toks) >= 2),
         |pc AS (SELECT pr[1] AS a, pr[2] AS b,
         |  CAST(count(*) AS BIGINT) AS w FROM p GROUP BY 1, 2),
         |e AS (SELECT a, b, w FROM pc WHERE w >= 5 AND a <> b),
         |adj AS (SELECT a AS f, b AS t, w FROM e
         |  UNION ALL SELECT b, a, w FROM e),
         |wdeg AS (SELECT f, CAST(sum(w) AS BIGINT) AS wd FROM adj
         |  GROUP BY 1),
         |verts AS (SELECT f AS word FROM wdeg),
         |r0 AS (SELECT word, CAST(1000000 AS BIGINT) AS r FROM verts)""".stripMargin
    val rounds = (1 to iters).map { k =>
      s"""i$k AS (SELECT adj.t AS word,
         |  CAST(sum(CAST(floor(r.r * adj.w / wdeg.wd) AS BIGINT))
         |    AS BIGINT) AS inflow
         |  FROM adj JOIN r${k - 1} r ON r.word = adj.f
         |  JOIN wdeg ON wdeg.f = adj.f GROUP BY 1),
         |r$k AS (SELECT v.word, CAST(round(150000.0 +
         |    0.85 * coalesce(i.inflow, 0)) AS BIGINT) AS r
         |  FROM verts v LEFT JOIN i$k i USING (word))""".stripMargin
    }
    ((head +: rounds).mkString(",\n")) +
      s"""
         |SELECT word, r AS tr_micros,
         |  row_number() OVER (ORDER BY r DESC, word) AS rank
         |FROM r$iters ORDER BY r DESC, word LIMIT 20""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "qX_hilbert" -> hilbertSql(10),
    "qX_textrank" -> textRankSql(3),
    "qB1_regex_extract" ->
      """SELECT doc_id, regexp_extract(text, 'j[a-z]+') AS m
        |FROM documents ORDER BY doc_id LIMIT 500""".stripMargin,
    "qB2_stopword_score" ->
      s"""SELECT doc_id, len(list_filter(
         |  ['${ScoreWords.mkString("','")}'],
         |  s -> contains(lower(text), s))) AS score
         |FROM documents
         |WHERE len(list_filter(['${ScoreWords.mkString("','")}'],
         |  s -> contains(lower(text), s))) >= 3
         |ORDER BY doc_id""".stripMargin,
    "qG1_search_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ('${SearchTerms.mkString("','")}') GROUP BY 1, 2),
         |idf AS (SELECT term,
         |    ln(1 + ((SELECT count(*) FROM documents) - count(*) + 0.5)
         |       / (count(*) + 0.5)) AS idf
         |  FROM tf GROUP BY term)
         |SELECT tf.doc_id, round(sum(tf.tf * idf.idf), 4) AS score
         |FROM tf JOIN idf USING (term)
         |GROUP BY tf.doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "qG3_search_boosted" ->
      """WITH n AS (SELECT count(*) AS n FROM documents),
        |ttoks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |stoks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(source), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |ttf AS (SELECT doc_id, term, count(*) AS tf FROM ttoks
        |  WHERE term IN ('src3', 'merge') GROUP BY 1, 2),
        |stf AS (SELECT doc_id, term, count(*) AS tf FROM stoks
        |  WHERE term IN ('src3', 'merge') GROUP BY 1, 2),
        |tidf AS (SELECT term, ln(1 + ((SELECT n FROM n) - count(*) + 0.5)
        |    / (count(*) + 0.5)) AS idf FROM ttf GROUP BY term),
        |sidf AS (SELECT term, ln(1 + ((SELECT n FROM n) - count(*) + 0.5)
        |    / (count(*) + 0.5)) AS idf FROM stf GROUP BY term),
        |tscore AS (SELECT ttf.doc_id, sum(ttf.tf * tidf.idf) * 1.0 AS fscore
        |  FROM ttf JOIN tidf USING (term) GROUP BY ttf.doc_id),
        |sscore AS (SELECT stf.doc_id, sum(stf.tf * sidf.idf) * 3.0 AS fscore
        |  FROM stf JOIN sidf USING (term) GROUP BY stf.doc_id),
        |allscore AS (
        |  SELECT doc_id, fscore FROM sscore
        |  UNION ALL
        |  SELECT doc_id, fscore FROM tscore)
        |SELECT doc_id, round(sum(fscore), 4) AS score
        |FROM allscore GROUP BY doc_id
        |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "qG6_search_bm25" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
         |  FROM documents),
         |lens AS (
         |  SELECT doc_id, len(list_filter(
         |    string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS dl
         |  FROM documents),
         |stats AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         |                 count(*) AS n FROM lens),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ('${SearchTerms.mkString("','")}') GROUP BY 1, 2),
         |idf AS (SELECT term,
         |    ln(1 + ((SELECT n FROM stats) - count(*) + 0.5)
         |       / (count(*) + 0.5)) AS idf
         |  FROM tf GROUP BY term)
         |SELECT tf.doc_id, round(sum(
         |    idf.idf * (tf.tf * (1.2 + 1.0)) /
         |    (tf.tf + 1.2 * ((1.0 - 0.75) + 0.75 * lens.dl / (SELECT avgdl FROM stats)))
         |  ), 4) AS score
         |FROM tf JOIN idf USING (term) JOIN lens USING (doc_id)
         |GROUP BY tf.doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "qG7_search_bm25_multi" -> Bm25MultiSql("round(sum(fscore), 4)"),
    "qG8_best_fields" -> Bm25MultiSql("round(max(fscore), 4)"),
    "qG9_tie_breaker" -> Bm25MultiSql(
      "round(max(fscore) + 0.3 * (sum(fscore) - max(fscore)), 4)"),
    "qG5_indexed_search" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
         |  WHERE term IN ('${SearchTerms.mkString("','")}') GROUP BY 1, 2),
         |idf AS (SELECT term,
         |    ln(1 + ((SELECT count(*) FROM documents) - count(*) + 0.5)
         |       / (count(*) + 0.5)) AS idf
         |  FROM tf GROUP BY term)
         |SELECT tf.doc_id, round(sum(tf.tf * idf.idf), 4) AS score
         |FROM tf JOIN idf USING (term)
         |GROUP BY tf.doc_id
         |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,
    "qX_token_count" ->
      """SELECT doc_id,
        | len(list_filter(string_split_regex(lower(text), '\s+'),
        |   x -> x <> '')) AS n_tokens,
        | len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
        |   x -> x <> '')) AS n_subwords
        |FROM documents ORDER BY doc_id""".stripMargin,
    "qX_lexical" ->
      """WITH f AS (SELECT tok, count(*) AS f FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x <> '')) AS tok FROM documents) GROUP BY 1),
        |s AS (SELECT CAST(sum(f) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types,
        |    CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_hapax
        |  FROM f)
        |SELECT n_tokens, n_types, n_hapax,
        |  CAST(floor(1000000 * n_types * 1.0 / n_tokens) AS BIGINT)
        |    AS ttr_micros,
        |  CAST(floor(1000000 * n_hapax * 1.0 / n_types) AS BIGINT)
        |    AS hapax_frac_micros
        |FROM s""".stripMargin,
    "qX_readability" ->
      """WITH d AS (SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents),
        |c AS (SELECT doc_id, len(toks) AS n_words,
        |    greatest(1, len(list_filter(string_split_regex(text, '[.!?]+'),
        |      s -> trim(s) <> ''))) AS n_sentences,
        |    list_sum(list_transform(toks, w -> greatest(1,
        |      len(list_filter(string_split_regex(w, '[^aeiouy]+'),
        |        g -> g <> ''))))) AS n_syllables
        |  FROM d WHERE len(toks) > 0)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_sentences AS BIGINT) AS n_sentences,
        |  CAST(n_syllables AS BIGINT) AS n_syllables,
        |  CAST(round(1e6 * (206.835 - 1.015 * n_words / n_sentences
        |    - 84.6 * n_syllables / n_words)) AS BIGINT) AS flesch_micros
        |FROM c ORDER BY doc_id""".stripMargin,
    "qX_chao1" ->
      s"""WITH d AS ($ToksSql),
        |tk AS (SELECT unnest(toks) AS tok FROM d),
        |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS f FROM tk
        |  GROUP BY 1),
        |s AS (SELECT CAST(sum(f) AS BIGINT) AS n_tokens,
        |    count(*) AS n_types,
        |    CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f1,
        |    CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS f2
        |  FROM f)
        |SELECT n_tokens, n_types, f1, f2,
        |  1000 * n_types + CAST(floor(1000 * f1 * (f1 - 1)
        |    / (2 * (f2 + 1))) AS BIGINT) AS chao1_milli,
        |  CAST(floor(1000000 * f1 / n_tokens) AS BIGINT) AS p0_micros
        |FROM s""".stripMargin,

    "qX_bigram_coverage" ->
      s"""WITH d AS ($ToksSql),
        |bg AS (SELECT doc_id % 10 < 8 AS is_train,
        |    unnest(list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1])) AS bg
        |  FROM d WHERE len(toks) >= 2),
        |train AS (SELECT DISTINCT bg FROM bg WHERE is_train),
        |test AS (SELECT DISTINCT bg FROM bg WHERE NOT is_train),
        |nt AS (SELECT count(*) AS n_train_bg FROM train),
        |ns AS (SELECT count(*) AS n_test_bg FROM test),
        |cov AS (SELECT count(*) AS n_covered FROM test
        |  WHERE bg IN (SELECT bg FROM train))
        |SELECT nt.n_train_bg, ns.n_test_bg, cov.n_covered,
        |  CASE WHEN ns.n_test_bg = 0 THEN 0
        |    ELSE CAST(floor(1000000 * cov.n_covered / ns.n_test_bg)
        |      AS BIGINT)
        |  END AS coverage_micros
        |FROM nt CROSS JOIN ns CROSS JOIN cov""".stripMargin,

    "qX_bigram_entropy" ->
      """WITH bg AS (SELECT unnest(list_transform(
        |      generate_series(1, length(text) - 1),
        |      i -> substr(text, i, 2))) AS bg
        |  FROM documents WHERE length(text) >= 2),
        |cnt AS (SELECT bg, CAST(count(*) AS BIGINT) AS n12 FROM bg
        |  GROUP BY 1),
        |pre AS (SELECT substr(bg, 1, 1) AS c1,
        |    CAST(sum(n12) AS BIGINT) AS n1 FROM cnt GROUP BY 1),
        |tot AS (SELECT CAST(sum(n12) AS BIGINT) AS n FROM cnt),
        |t AS (SELECT tot.n,
        |    CAST(round(-1e6 * (CAST(cnt.n12 AS DOUBLE) / tot.n)
        |      * ln(CAST(cnt.n12 AS DOUBLE) / pre.n1)) AS BIGINT) AS t
        |  FROM cnt JOIN pre ON pre.c1 = substr(cnt.bg, 1, 1)
        |  CROSS JOIN tot)
        |SELECT n AS n_bigrams, count(*) AS n_pairs,
        |  CAST(sum(t) AS BIGINT) AS cond_entropy_micros
        |FROM t GROUP BY 1""".stripMargin,

    "qX_char_entropy" ->
      """WITH ch AS (SELECT doc_id, c AS ch FROM documents,
        |  unnest(string_split_regex(text, '')) AS t(c)
        |  WHERE c <> ''),
        |cnt AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS nc
        |  FROM ch GROUP BY 1, 2),
        |len AS (SELECT doc_id, CAST(sum(nc) AS BIGINT) AS l FROM cnt
        |  GROUP BY 1),
        |t AS (SELECT cnt.doc_id, len.l,
        |    CAST(round(-1e6 * (CAST(cnt.nc AS DOUBLE) / len.l)
        |      * ln(CAST(cnt.nc AS DOUBLE) / len.l)) AS BIGINT) AS t
        |  FROM cnt JOIN len USING (doc_id))
        |SELECT doc_id, l AS n_chars, CAST(sum(t) AS BIGINT)
        |  AS entropy_micros
        |FROM t GROUP BY 1, 2 ORDER BY doc_id""".stripMargin,

    "qX_fleiss" ->
      """WITH rat AS (SELECT
        |    CASE WHEN length(text) >= 350 THEN 1 ELSE 0 END AS r1,
        |    CASE WHEN length(text) - length(replace(text, ' ', ''))
        |      >= 50 THEN 1 ELSE 0 END AS r2,
        |    CASE WHEN length(text) - length(replace(text, 'e', ''))
        |      >= 12 THEN 1 ELSE 0 END AS r3
        |  FROM documents),
        |b AS (SELECT CAST(r1 + r2 + r3 AS BIGINT) AS n1 FROM rat),
        |s AS (SELECT count(*) AS n_items,
        |    CAST(sum(n1 * n1 + (3 - n1) * (3 - n1) - 3) AS BIGINT)
        |      AS sum_pi_num,
        |    CAST(sum(n1) AS BIGINT) AS n1_total FROM b)
        |SELECT n_items, CAST(3 AS BIGINT) AS n_raters, sum_pi_num,
        |  n1_total,
        |  CASE WHEN n1_total = 0 OR n1_total = n_items * 3 THEN 0
        |    ELSE CAST(floor(1e6 *
        |      (CAST(sum_pi_num AS DOUBLE) / (n_items * 3 * 2)
        |        - (CAST(n1_total AS DOUBLE) / (n_items * 3)
        |            * (CAST(n1_total AS DOUBLE) / (n_items * 3))
        |          + (1.0 - CAST(n1_total AS DOUBLE) / (n_items * 3))
        |            * (1.0 - CAST(n1_total AS DOUBLE) / (n_items * 3))))
        |      / (1.0 -
        |        (CAST(n1_total AS DOUBLE) / (n_items * 3)
        |            * (CAST(n1_total AS DOUBLE) / (n_items * 3))
        |          + (1.0 - CAST(n1_total AS DOUBLE) / (n_items * 3))
        |            * (1.0 - CAST(n1_total AS DOUBLE) / (n_items * 3)))))
        |      AS BIGINT)
        |  END AS kappa_micros
        |FROM s""".stripMargin,
    "qX_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        | length(text) AS n_chars,
        | len(toks) AS n_tokens,
        | round(CAST(length(text) AS DOUBLE) / len(toks), 4) AS mean_tok_len,
        | round(CAST(length(text) -
        |   length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS DOUBLE)
        |   / length(text), 4) AS punct_ratio,
        | round(CAST(len(list_filter(toks, t ->
        |   list_contains(['the','a','an','and','or','of','to','in','is','on'], t)))
        |   AS DOUBLE) / len(toks), 4) AS stopword_ratio
        |FROM t ORDER BY doc_id""".stripMargin,
    // Mode-of-ngrams recomputed relationally (unnest → group → max/sum)
    // — the executable spec of the one-scan TopNgramFracExpr.
    "qX_repetition" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
        |       FROM t, UNNEST(range(1, len(toks))) AS u(i)),
        |tg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
        |       FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
        |bgf AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS f
        |        FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
        |        GROUP BY doc_id),
        |tgf AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS f
        |        FROM (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2)
        |        GROUP BY doc_id),
        |sig AS (
        |  SELECT t.doc_id,
        |    CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |      round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
        |    END AS dup_word_frac,
        |    coalesce(bgf.f, 0.0) AS top_bigram_frac,
        |    coalesce(tgf.f, 0.0) AS top_trigram_frac
        |  FROM t LEFT JOIN bgf ON t.doc_id = bgf.doc_id
        |         LEFT JOIN tgf ON t.doc_id = tgf.doc_id)
        |SELECT doc_id, dup_word_frac, top_bigram_frac, top_trigram_frac,
        |  (dup_word_frac < 0.5 AND top_bigram_frac < 0.18
        |     AND top_trigram_frac < 0.16) AS keep
        |FROM sig ORDER BY doc_id""".stripMargin,

    "qX_lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
         |  FROM documents),
         |sc AS (
         |  SELECT doc_id,
         |    round(CAST(len(list_filter(toks, x -> list_contains(
         |      ['the','a','and','of','to','is','in','that','it','for'], x)))
         |      AS DOUBLE) / greatest(len(toks), 1), 4) AS s_en,
         |    round(CAST(len(list_filter(toks, x -> list_contains(
         |      ['der','die','das','und','ist','nicht','ein','zu','mit','den'], x)))
         |      AS DOUBLE) / greatest(len(toks), 1), 4) AS s_de,
         |    round(CAST(len(list_filter(toks, x -> list_contains(
         |      ['le','la','et','les','des','un','une','est','que','pour'], x)))
         |      AS DOUBLE) / greatest(len(toks), 1), 4) AS s_fr,
         |    round(CAST(len(list_filter(toks, x -> list_contains(
         |      ['el','la','y','los','de','un','una','es','que','por'], x)))
         |      AS DOUBLE) / greatest(len(toks), 1), 4) AS s_es
         |  FROM t)
         |SELECT doc_id, s_en, s_de, s_fr, s_es,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es) >= 0.05 THEN
         |    CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         |         WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         |         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
         |         ELSE 'es' END
         |  ELSE 'und' END AS pred
         |FROM sc ORDER BY doc_id""".stripMargin,
    "qX_fingerprint" ->
      """SELECT doc_id,
        | list_reduce(list_prepend(CAST(0 AS BIGINT),
        |   list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |     c -> CAST(ascii(c) AS BIGINT))),
        |   (a, b) -> (a * 31 + b) % 1000000007) AS fp,
        | md5(array_to_string(list_filter(
        |   string_split_regex(lower(text), '\s+'), x -> x <> ''), ' ')) AS nfp
        |FROM documents WHERE doc_id < 1000 ORDER BY doc_id""".stripMargin,
    "qX_dedup_exact" ->
      """SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin,
    // The corpus-clean oracle composes the already-proven per-stage
    // SQL: lang-ID voting, rounded quality features, rounded
    // repetition mode-fractions, digest min-window canonicalization.
    "qX_corpus_clean" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |lang AS (
        |  SELECT doc_id,
        |    round(CAST(len(list_filter(toks, x -> list_contains(
        |      ['the','a','and','of','to','is','in','that','it','for'], x)))
        |      AS DOUBLE) / greatest(len(toks), 1), 4) AS s_en,
        |    round(CAST(len(list_filter(toks, x -> list_contains(
        |      ['der','die','das','und','ist','nicht','ein','zu','mit','den'], x)))
        |      AS DOUBLE) / greatest(len(toks), 1), 4) AS s_de,
        |    round(CAST(len(list_filter(toks, x -> list_contains(
        |      ['le','la','et','les','des','un','une','est','que','pour'], x)))
        |      AS DOUBLE) / greatest(len(toks), 1), 4) AS s_fr,
        |    round(CAST(len(list_filter(toks, x -> list_contains(
        |      ['el','la','y','los','de','un','una','es','que','por'], x)))
        |      AS DOUBLE) / greatest(len(toks), 1), 4) AS s_es
        |  FROM t),
        |pred AS (
        |  SELECT doc_id,
        |    CASE WHEN greatest(s_en, s_de, s_fr, s_es) >= 0.05 THEN
        |      CASE WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |           WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |           WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |           ELSE 'es' END
        |    ELSE 'und' END AS lang
        |  FROM lang),
        |q AS (
        |  SELECT doc_id,
        |    len(toks) >= 10
        |    AND round(CAST(length(text) AS DOUBLE) / len(toks), 4)
        |      BETWEEN 2.0 AND 12.0
        |    AND round(CAST(length(text) -
        |      length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS DOUBLE)
        |      / length(text), 4) < 0.2 AS q_ok
        |  FROM t),
        |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS g
        |       FROM t, UNNEST(range(1, len(toks))) AS u(i)),
        |tg AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS g
        |       FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
        |bgf AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS f
        |        FROM (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2)
        |        GROUP BY doc_id),
        |tgf AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / sum(c), 4) AS f
        |        FROM (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2)
        |        GROUP BY doc_id),
        |rep AS (
        |  SELECT t.doc_id,
        |    (CASE WHEN len(toks) = 0 THEN 0.0 ELSE
        |       round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
        |         / len(toks), 4) END) < 0.5
        |    AND coalesce(bgf.f, 0.0) < 0.18
        |    AND coalesce(tgf.f, 0.0) < 0.16 AS rep_ok
        |  FROM t LEFT JOIN bgf ON t.doc_id = bgf.doc_id
        |         LEFT JOIN tgf ON t.doc_id = tgf.doc_id),
        |canon AS (
        |  SELECT doc_id,
        |    doc_id = min(doc_id) OVER (PARTITION BY md5(text)) AS is_canonical
        |  FROM documents)
        |SELECT t.doc_id, pred.lang, q.q_ok, rep.rep_ok, canon.is_canonical,
        |  (pred.lang IN ('en','de','fr','es') AND q.q_ok AND rep.rep_ok
        |     AND canon.is_canonical) AS keep
        |FROM t JOIN pred USING (doc_id) JOIN q USING (doc_id)
        |       JOIN rep ON t.doc_id = rep.doc_id
        |       JOIN canon ON t.doc_id = canon.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "qX_split" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |      AS bkt
        |  FROM documents)
        |SELECT CASE WHEN bkt < 0.8 * 4294967296 THEN 'train'
        |            WHEN bkt < 0.9 * 4294967296 THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n, min(doc_id) AS min_id
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "qX_zipf" ->
      s"""WITH d AS ($ToksSql),
         |fr AS (SELECT unnest(toks) AS tok FROM d),
         |f AS (SELECT tok, count(*) AS f FROM fr GROUP BY 1),
         |rk AS (SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
         |  FROM f),
         |xy AS (SELECT
         |    CAST(round(1e6 * ln(CAST(r AS DOUBLE))) AS BIGINT) AS x,
         |    CAST(round(1e6 * ln(CAST(f AS DOUBLE))) AS BIGINT) AS y
         |  FROM rk WHERE r <= 200),
         |sm AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |  CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(x * y) AS BIGINT) AS sxy,
         |  CAST(sum(x * x) AS BIGINT) AS sxx FROM xy)
         |SELECT n AS n_tokens,
         |  CAST(floor(1e6 *
         |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
         |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
         |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
         |    AS slope_micros
         |FROM sm""".stripMargin,
    "qX_heaps" ->
      s"""WITH d AS ($ToksSql),
         |toks AS (SELECT g, unnest(toks) AS tok FROM (
         |  SELECT documents.lang AS g, d.toks
         |  FROM d JOIN documents USING (doc_id)) x),
         |pts AS (SELECT g, count(*) AS nn, count(DISTINCT tok) AS v
         |  FROM toks GROUP BY 1),
         |xy AS (SELECT
         |    CAST(round(1e6 * ln(CAST(nn AS DOUBLE))) AS BIGINT) AS x,
         |    CAST(round(1e6 * ln(CAST(v AS DOUBLE))) AS BIGINT) AS y
         |  FROM pts WHERE nn > 0 AND v > 0),
         |sm AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |  CAST(sum(y) AS BIGINT) AS sy,
         |  CAST(sum(x * y) AS BIGINT) AS sxy,
         |  CAST(sum(x * x) AS BIGINT) AS sxx FROM xy)
         |SELECT n AS n_groups,
         |  CAST(floor(1e6 *
         |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
         |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
         |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) AS BIGINT)
         |    AS beta_micros,
         |  CAST(floor(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
         |    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
         |      CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |     (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
         |      CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) *
         |    (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT)
         |    AS lnk_micros
         |FROM sm""".stripMargin,
    "qX_keywords" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
        |toks AS (SELECT doc_id, unnest(list_filter(
        |  string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM d),
        |tf AS (SELECT doc_id AS doc, term, count(*) AS tf FROM toks
        |  GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM d),
        |sc AS (SELECT tf.doc, tf.term,
        |  CAST(round(tf.tf * ln(1 + (nn.n - dfreq.df + 0.5)
        |    / (dfreq.df + 0.5)) * 1000.0) AS BIGINT) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN nn),
        |r AS (SELECT doc, term, score, row_number() OVER (
        |  PARTITION BY doc ORDER BY score DESC, term) AS rn FROM sc)
        |SELECT doc, term, score FROM r WHERE rn <= 5
        |ORDER BY doc, score DESC, term""".stripMargin,
    "qX_kanon" ->
      """WITH g AS (SELECT lang, source, count(*) AS n FROM documents
        |  GROUP BY 1, 2)
        |SELECT CAST(sum(n) AS BIGINT) AS n_rows, count(*) AS n_groups,
        |  CAST(sum(CASE WHEN n < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_groups,
        |  CAST(sum(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_risk_rows,
        |  min(n) AS min_group
        |FROM g""".stripMargin,
    "qX_ldiv" ->
      """WITH g AS (SELECT lang, count(*) AS n,
        |  count(DISTINCT source) AS d FROM documents GROUP BY 1)
        |SELECT count(*) AS n_groups,
        |  CAST(sum(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_violating_groups,
        |  CAST(sum(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_risk_rows,
        |  min(d) AS min_diversity
        |FROM g""".stripMargin,
    "qX_tcloseness" ->
      """WITH gv AS (SELECT lang, source AS _v, count(*) AS ngv
        |  FROM documents GROUP BY 1, 2),
        |grp AS (SELECT lang, CAST(sum(ngv) AS BIGINT) AS ng
        |  FROM gv GROUP BY 1),
        |gm AS (SELECT source AS _v, count(*) AS nv
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM documents),
        |per AS (SELECT g.lang, max(grp.ng) AS ng, max(t.n) AS n,
        |    CAST(sum(abs(g.ngv * t.n - gm.nv * grp.ng)) AS BIGINT)
        |      AS present_num,
        |    CAST(sum(gm.nv) AS BIGINT) AS nv_present
        |  FROM gv g JOIN gm ON gm._v = g._v
        |  JOIN grp ON grp.lang = g.lang CROSS JOIN tot t GROUP BY 1),
        |tv AS (SELECT ng,
        |    CAST(floor(1e6 * (present_num + (n - nv_present) * ng)
        |      / (2 * ng * n)) AS BIGINT) AS tvd_micros
        |  FROM per)
        |SELECT count(*) AS n_groups,
        |  CAST(sum(CASE WHEN tvd_micros > 200000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_violating_groups,
        |  CAST(sum(CASE WHEN tvd_micros > 200000 THEN ng ELSE 0 END)
        |    AS BIGINT) AS n_risk_rows,
        |  max(tvd_micros) AS max_tvd_micros
        |FROM tv""".stripMargin,
    "qX_kfold" ->
      """SELECT lang,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    % 5 AS fold,
        |  count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents GROUP BY 1, 2 ORDER BY lang, fold""".stripMargin,
    "qX_sample" ->
      """SELECT doc_id FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |  < 0.25 * 4294967296
        |ORDER BY doc_id""".stripMargin,
    "qX_key_cap" ->
      """WITH r AS (
        |  SELECT user_id, event_id, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, count(*) AS n_kept,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM r WHERE rn <= 3
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "qX_normalize" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(
        |    lower('  ' || upper(text) || chr(9) || 'x '),
        |    '[[:cntrl:]]', ' ', 'g'), '\s+', ' ', 'g'))) AS norm_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "qX_chunk" ->
      s"""WITH d AS (
         |  SELECT * FROM ($ToksSql) WHERE doc_id < 200),
         |st0 AS (
         |  SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS g
         |  FROM d WHERE len(toks) > 0),
         |st AS (
         |  SELECT doc_id, toks, CAST(g AS INTEGER) AS chunk_start,
         |    CAST(g // 24 AS INTEGER) AS chunk_idx
         |  FROM st0)
         |SELECT doc_id, chunk_idx, chunk_start,
         |  len(toks[chunk_start + 1 : chunk_start + 32]) AS n_tokens,
         |  array_to_string(toks[chunk_start + 1 : chunk_start + 32], ' ')
         |    AS chunk
         |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "qX_c4_clean" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    regexp_replace(text, ' merge ', '.' || chr(10), 'g') AS tx
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, tx, string_split(tx, chr(10)) AS lines,
        |    list_filter(string_split(tx, chr(10)), l ->
        |      len(list_filter(string_split_regex(trim(l), '\s+'),
        |        w -> w <> '')) >= 5
        |      AND regexp_matches(rtrim(l), '[.!?"]$')
        |      AND NOT contains(lower(l), 'dup')) AS kept
        |  FROM t)
        |SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept,
        |  array_to_string(kept, chr(10)) AS clean_text
        |FROM l
        |WHERE NOT contains(lower(tx), 'window dup') AND len(kept) >= 1
        |ORDER BY doc_id""".stripMargin,
    "qX_url_curate" ->
      """WITH g AS (
        |  SELECT doc_id,
        |    'https' AS scheme,
        |    'w' || CAST(doc_id % 3 AS VARCHAR) || '.' || source || '.' ||
        |      (CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
        |        WHEN 2 THEN 'io' ELSE 'org' END) AS host,
        |    source || '.' ||
        |      (CASE doc_id % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'co.uk'
        |        WHEN 2 THEN 'io' ELSE 'org' END) AS domain,
        |    '/p/' || CAST(doc_id AS VARCHAR) AS path
        |  FROM documents)
        |SELECT doc_id, scheme, host, domain, path
        |FROM g
        |WHERE domain NOT IN ('src3.org', 'src6.io', 'src13.co.uk')
        |QUALIFY row_number() OVER (PARTITION BY domain ORDER BY doc_id) <= 5
        |ORDER BY doc_id""".stripMargin,
    "qX_bpe_roundtrip" ->
      """SELECT doc_id, 1 AS ok FROM documents ORDER BY doc_id""",
    "qX_fuzzy" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(list_filter(
         |    string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |ex AS (
         |  SELECT term,
         |    ln(1 + ((SELECT count(*) FROM documents) - df + 0.5)
         |       / (df + 0.5)) AS idf,
         |    greatest(0.0, 1.0 - CAST(levenshtein(term, 'tabel') AS DOUBLE)
         |      / least(length(term), 5)) AS boost
         |  FROM df
         |  WHERE abs(length(term) - 5) <= 2
         |    AND levenshtein(term, 'tabel') <= 2)
         |SELECT tf.doc_id AS doc, round(sum(tf.tf * ex.idf * ex.boost), 4)
         |  AS score
         |FROM tf JOIN ex USING (term)
         |GROUP BY tf.doc_id
         |ORDER BY score DESC, doc""".stripMargin,
    "qX_phrase" ->
      s"""WITH d AS ($ToksSql),
         |p AS (
         |  SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks
         |  FROM d WHERE len(toks) > 0),
         |pt AS (SELECT doc_id, pos, toks[pos + 1] AS term FROM p),
         |qt(term, i) AS (VALUES ('table', 0), ('hash', 1)),
         |m AS (
         |  SELECT pt.doc_id, pt.pos - qt.i AS anchor
         |  FROM pt JOIN qt ON pt.term = qt.term
         |  WHERE pt.pos - qt.i >= 0),
         |a AS (
         |  SELECT doc_id, anchor FROM m
         |  GROUP BY doc_id, anchor HAVING count(*) = 2)
         |SELECT doc_id AS doc, count(*) AS phrase_freq
         |FROM a GROUP BY doc_id
         |ORDER BY phrase_freq DESC, doc LIMIT 100""".stripMargin,
    "qX_dup_ngrams" ->
      s"""WITH d AS (
         |  SELECT * FROM ($ToksSql) WHERE doc_id < 300 AND len(toks) >= 5),
         |p AS (
         |  SELECT doc_id, unnest(range(0, len(toks) - 4)) AS g, toks
         |  FROM d),
         |grams AS (
         |  SELECT doc_id, array_to_string(toks[g + 1 : g + 5], ' ') AS gram
         |  FROM p)
         |SELECT gram, count(DISTINCT doc_id) AS df, count(*) AS tf
         |FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
         |ORDER BY gram""".stripMargin,
    "qX_dup_spans" ->
      s"""WITH d AS (
         |  SELECT * FROM ($ToksSql) WHERE doc_id < 300 AND len(toks) >= 5),
         |p AS (
         |  SELECT doc_id, unnest(range(0, len(toks) - 4)) AS g, toks
         |  FROM d),
         |grams AS (
         |  SELECT doc_id, CAST(g AS INTEGER) AS start,
         |    array_to_string(toks[g + 1 : g + 5], ' ') AS gram
         |  FROM p),
         |dup AS (
         |  SELECT gram FROM grams
         |  GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
         |hits AS (
         |  SELECT grams.doc_id, grams.start FROM grams
         |  WHERE EXISTS (SELECT 1 FROM dup WHERE dup.gram = grams.gram)),
         |b AS (
         |  SELECT doc_id, start,
         |    CASE WHEN start > coalesce(max(start + 5) OVER (
         |      PARTITION BY doc_id ORDER BY start
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      -1) THEN 1 ELSE 0 END AS brk
         |  FROM hits),
         |i AS (
         |  SELECT doc_id, start, sum(brk) OVER (
         |    PARTITION BY doc_id ORDER BY start) AS island
         |  FROM b)
         |SELECT doc_id, min(start) AS span_start,
         |  max(start) + 5 AS span_end, count(*) AS n_grams
         |FROM i GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin,
    "qX_vocab" ->
      s"""WITH toks AS (
         |  SELECT unnest(toks) AS token FROM ($ToksSql)),
         |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
         |r AS (SELECT token, cnt,
         |  row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM c)
         |SELECT token, cnt, rank FROM r WHERE rank <= 50
         |ORDER BY rank""".stripMargin,
    "qX_winnow" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x <> '') AS toks
        |  FROM documents WHERE doc_id < 200),
        |g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |    array_to_string(toks[i:i+2], ' ') AS gram
        |  FROM t, unnest(range(1, len(toks) - 1)) AS r(i)
        |  WHERE len(toks) >= 3),
        |h AS (SELECT doc_id, pos,
        |    CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT) AS hv
        |  FROM g),
        |k AS (SELECT doc_id, pos, hv,
        |    hv * 1048576 + (1048575 - pos) AS ck FROM h),
        |m AS (SELECT doc_id,
        |    min(ck) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS mk,
        |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS n_in
        |  FROM k)
        |SELECT DISTINCT doc_id,
        |  CAST(1048575 - (mk % 1048576) AS BIGINT) AS pos,
        |  CAST(floor(mk / 1048576) AS BIGINT) AS hv
        |FROM m WHERE n_in = 4
        |ORDER BY doc_id, pos""".stripMargin,

    "qX_jsd" ->
      """WITH ta AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '')) AS k
        |  FROM documents WHERE source = 'src0'),
        |tb AS (SELECT unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '')) AS k
        |  FROM documents WHERE source = 'src1'),
        |ca AS (SELECT k, count(*) AS na FROM ta GROUP BY 1),
        |cb AS (SELECT k, count(*) AS nb FROM tb GROUP BY 1),
        |g AS (SELECT coalesce(ca.k, cb.k) AS k, coalesce(na, 0) AS na,
        |    coalesce(nb, 0) AS nb
        |  FROM ca FULL OUTER JOIN cb ON ca.k = cb.k),
        |tt AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
        |  CAST(sum(nb) AS BIGINT) AS tb FROM g),
        |terms AS (SELECT CAST(round(5e5 * (
        |    (CASE WHEN na > 0 THEN (na / tt.ta) * ln((na / tt.ta) /
        |      ((na / tt.ta + nb / tt.tb) / 2)) ELSE 0 END) +
        |    (CASE WHEN nb > 0 THEN (nb / tt.tb) * ln((nb / tt.tb) /
        |      ((na / tt.ta + nb / tt.tb) / 2)) ELSE 0 END)))
        |  AS BIGINT) AS term
        |  FROM g CROSS JOIN tt)
        |SELECT (SELECT count(*) FROM g) AS n_keys, tt.ta AS n_a,
        |  tt.tb AS n_b,
        |  (SELECT CAST(sum(term) AS BIGINT) FROM terms) AS jsd_micros
        |FROM tt""".stripMargin,

    "qX_dsir_weights" ->
      s"""SELECT doc_id, n_feats, w_micros FROM ($DsirWeightsSql)
         |ORDER BY doc_id""".stripMargin,
    "qX_dsir_sample" ->
      s"""WITH w AS ($DsirWeightsSql),
         |s AS (
         |  SELECT doc_id, w_micros + CAST(round(-ln(-ln(
         |      (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |        AS BIGINT) + 0.5) / 4294967296.0)) * 1e6) AS BIGINT)
         |    AS key_micros
         |  FROM w)
         |SELECT doc_id, key_micros FROM s
         |ORDER BY key_micros DESC, doc_id LIMIT 50""".stripMargin,
    "qX_nb_model" ->
      s"""$NbModelSql
         |SELECT term, ll0_micros, ll1_micros FROM model
         |ORDER BY term""".stripMargin,
    "qX_nb_score" ->
      s"""$NbModelSql,
         |s AS (SELECT doc_id, unnest(toks) AS term FROM d
         |  WHERE doc_id < 200),
         |sc AS (SELECT s.doc_id, CAST(sum(m.ll0_micros) AS BIGINT) AS s0,
         |    CAST(sum(m.ll1_micros) AS BIGINT) AS s1
         |  FROM s JOIN model m USING (term) GROUP BY 1),
         |pr AS (SELECT
         |    CAST(round(ln(nd0 * 1.0 / (nd0 + nd1)) * 1e6) AS BIGINT) AS p0,
         |    CAST(round(ln(nd1 * 1.0 / (nd0 + nd1)) * 1e6) AS BIGINT) AS p1
         |  FROM nbm)
         |SELECT sc.doc_id, p0 + s0 AS score0_micros,
         |  p1 + s1 AS score1_micros,
         |  CAST(CASE WHEN p1 + s1 > p0 + s0 THEN 1 ELSE 0 END AS BIGINT)
         |    AS pred
         |FROM sc, pr ORDER BY sc.doc_id""".stripMargin,
    "qX_lr_model" ->
      s"""$LrTrainSql
         |SELECT bucket, w AS w_micros FROM w3 ORDER BY bucket""".stripMargin,
    "qX_lr_score" ->
      s"""$LrTrainSql,
         |scnts AS (SELECT doc_id, bucket, count(*) AS cnt FROM bk
         |  WHERE doc_id < 200 GROUP BY 1, 2),
         |stot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats
         |  FROM scnts GROUP BY 1),
         |sx AS (SELECT c.doc_id, c.bucket,
         |  CAST(round(c.cnt * 1e6 / t.n_feats) AS BIGINT) AS x
         |  FROM scnts c JOIN stot t USING (doc_id)),
         |sm AS (SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(sum(CAST(round(x.x * coalesce(w.w, 0) / 1e6) AS BIGINT))
         |    AS BIGINT) AS m
         |  FROM sx x LEFT JOIN w3 w USING (bucket) GROUP BY 1)
         |SELECT doc_id, n_buckets,
         |  CAST(round(1e6 / (1 + exp(-(m / 1e6)))) AS BIGINT) AS p_micros
         |FROM sm ORDER BY doc_id""".stripMargin,
    "qX_lr_select" ->
      s"""$LrTrainSql,
         |scnts AS (SELECT doc_id, bucket, count(*) AS cnt FROM bk
         |  WHERE doc_id < 200 GROUP BY 1, 2),
         |stot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats
         |  FROM scnts GROUP BY 1),
         |sx AS (SELECT c.doc_id, c.bucket,
         |  CAST(round(c.cnt * 1e6 / t.n_feats) AS BIGINT) AS x
         |  FROM scnts c JOIN stot t USING (doc_id)),
         |sm AS (SELECT x.doc_id, CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST(sum(CAST(round(x.x * coalesce(w.w, 0) / 1e6) AS BIGINT))
         |    AS BIGINT) AS m
         |  FROM sx x LEFT JOIN w3 w USING (bucket) GROUP BY 1),
         |sp AS (SELECT doc_id, n_buckets,
         |  CAST(round(1e6 / (1 + exp(-(m / 1e6)))) AS BIGINT) AS p_micros,
         |  CAST(round((pow(1 - (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
         |      1, 8)) AS BIGINT) + 0.5) / 4294967296.0, -1.0 / 9.0) - 1) * 1e6)
         |    AS BIGINT) AS pareto_micros
         |  FROM sm)
         |SELECT doc_id, n_buckets, p_micros, pareto_micros FROM sp
         |WHERE pareto_micros > 1000000 - p_micros
         |ORDER BY doc_id""".stripMargin,
    "qX_platt" -> plattSql(iters = 3),
    "qX_ctfidf" ->
      """WITH tk AS (SELECT source AS cls,
        |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
        |      x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT cls, term, count(*) AS tf FROM tk GROUP BY 1, 2),
        |ft AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ft FROM tf
        |  GROUP BY 1),
        |tt AS (SELECT CAST(sum(tf) AS BIGINT) AS tot,
        |  CAST(count(DISTINCT cls) AS BIGINT) AS ncls FROM tf),
        |sc AS (SELECT tf.cls, tf.term,
        |    CAST(round(1e6 * tf.tf * ln((tt.ncls * ft.ft + tt.tot) * 1.0
        |      / (tt.ncls * ft.ft))) AS BIGINT) AS score_micros
        |  FROM tf JOIN ft USING (term) CROSS JOIN tt),
        |r AS (SELECT cls, term, score_micros, row_number() OVER (
        |  PARTITION BY cls ORDER BY score_micros DESC, term) AS rn FROM sc)
        |SELECT cls, term, score_micros FROM r WHERE rn <= 5
        |ORDER BY cls, score_micros DESC, term""".stripMargin,
    "qX_pr_auc" ->
      s"""$LrScoredGSql,
         |c AS (SELECT s, pos, cnt,
         |  CAST(sum(pos) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
         |    AS BIGINT) AS tp,
         |  CAST(sum(cnt - pos) OVER (ORDER BY s DESC
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
         |  FROM g),
         |t AS (SELECT CAST(sum(pos) AS BIGINT) AS np,
         |  CAST(sum(cnt) - sum(pos) AS BIGINT) AS nn FROM g)
         |SELECT t.np AS n_pos, t.nn AS n_neg,
         |  CAST(sum(CAST(floor(1e6 * c.pos * c.tp
         |    / (t.np * (c.tp + c.fp))) AS BIGINT)) AS BIGINT)
         |    AS pr_auc_micros
         |FROM c CROSS JOIN t GROUP BY 1, 2""".stripMargin,
    "qX_kappa" ->
      s"""$LrTrainSql,
         |$NbCtes,
         |scnts AS (SELECT doc_id, bucket, count(*) AS cnt FROM bk
         |  WHERE doc_id < 200 GROUP BY 1, 2),
         |stot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_feats
         |  FROM scnts GROUP BY 1),
         |sx AS (SELECT c.doc_id, c.bucket,
         |  CAST(round(c.cnt * 1e6 / t.n_feats) AS BIGINT) AS x
         |  FROM scnts c JOIN stot t USING (doc_id)),
         |sm AS (SELECT x.doc_id,
         |  CAST(sum(CAST(round(x.x * coalesce(w.w, 0) / 1e6) AS BIGINT))
         |    AS BIGINT) AS m
         |  FROM sx x LEFT JOIN w3 w USING (bucket) GROUP BY 1),
         |lrp AS (SELECT doc_id, CASE WHEN
         |    CAST(round(1e6 / (1 + exp(-(m / 1e6)))) AS BIGINT) >= 500000
         |  THEN 1 ELSE 0 END AS a FROM sm),
         |nbtok AS (SELECT doc_id, unnest(toks) AS term FROM d
         |  WHERE doc_id < 200),
         |nbsc AS (SELECT n.doc_id, CAST(sum(m.ll0_micros) AS BIGINT) AS s0,
         |    CAST(sum(m.ll1_micros) AS BIGINT) AS s1
         |  FROM nbtok n JOIN model m USING (term) GROUP BY 1),
         |nbpr AS (SELECT
         |    CAST(round(ln(nd0 * 1.0 / (nd0 + nd1)) * 1e6) AS BIGINT) AS p0,
         |    CAST(round(ln(nd1 * 1.0 / (nd0 + nd1)) * 1e6) AS BIGINT) AS p1
         |  FROM nbm),
         |nbp AS (SELECT doc_id, CASE WHEN p1 + s1 > p0 + s0 THEN 1 ELSE 0
         |  END AS b FROM nbsc, nbpr),
         |paired AS (SELECT lrp.doc_id, lrp.a, nbp.b
         |  FROM lrp JOIN nbp USING (doc_id)),
         |kpa AS (SELECT a, count(*) AS na FROM paired GROUP BY 1),
         |kpb AS (SELECT b, count(*) AS nb_ FROM paired GROUP BY 1),
         |ke AS (SELECT CAST(coalesce(sum(kpa.na * kpb.nb_), 0) AS BIGINT)
         |  AS e FROM kpa JOIN kpb ON kpa.a = kpb.b),
         |kn AS (SELECT count(*) AS n,
         |  CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_agree FROM paired)
         |SELECT kn.n, kn.n_agree,
         |  CAST(CASE WHEN kn.n * kn.n = ke.e THEN 0
         |    ELSE trunc(1e6 * (kn.n * kn.n_agree - ke.e) * 1.0
         |      / (kn.n * kn.n - ke.e)) END AS BIGINT) AS kappa_micros
         |FROM kn, ke""".stripMargin,
    "qX_brier" ->
      s"""$LrScoredGSql
         |SELECT CAST(sum(cnt) AS BIGINT) AS n,
         |  CAST(floor(sum(pos * (s - 1000000) * (s - 1000000)
         |      + (cnt - pos) * s * s) * 1.0
         |    / (sum(cnt) * 1000000)) AS BIGINT) AS brier_micros
         |FROM g""".stripMargin,
    "qX_isotonic" ->
      s"""$LrScoredGSql,
         |bb AS (SELECT least(9, CAST(floor(s * 10 / 1000000) AS BIGINT))
         |    AS bin,
         |    CAST(sum(cnt) AS BIGINT) AS nb,
         |    CAST(sum(s * cnt) AS BIGINT) AS sp,
         |    CAST(sum(pos) * 1000000 AS BIGINT) AS sy
         |  FROM g GROUP BY 1),
         |cum AS (SELECT bin, nb, sp, sy,
         |    CAST(sum(nb) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cn,
         |    CAST(sum(sy) OVER (ORDER BY bin
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS BIGINT) AS cy
         |  FROM bb),
         |ranges AS (SELECT lo.j, hi.k,
         |    CAST(floor(CAST(hi.cy - lo.cy0 AS DOUBLE)
         |      / (hi.cn - lo.cn0)) AS BIGINT) AS avg_micros
         |  FROM (SELECT bin AS j, cn - nb AS cn0, cy - sy AS cy0
         |    FROM cum) lo
         |  CROSS JOIN (SELECT bin AS k, cn, cy FROM cum) hi
         |  WHERE lo.j <= hi.k),
         |inn AS (SELECT i.bin AS i, r.j, min(r.avg_micros) AS mn
         |  FROM ranges r JOIN bb i ON r.k >= i.bin AND r.j <= i.bin
         |  GROUP BY 1, 2),
         |fit AS (SELECT i AS bin, CAST(max(mn) AS BIGINT) AS iso_micros
         |  FROM inn GROUP BY 1)
         |SELECT bb.bin, bb.nb AS n_b,
         |  CAST(floor(CAST(bb.sp AS DOUBLE) / bb.nb) AS BIGINT)
         |    AS mean_p_micros,
         |  fit.iso_micros
         |FROM bb JOIN fit USING (bin) ORDER BY bb.bin""".stripMargin,

    "qX_brier_decomp" ->
      s"""$LrScoredGSql,
         |bb AS (SELECT least(9, CAST(floor(s * 10 / 1000000) AS BIGINT))
         |    AS bin,
         |    CAST(sum(cnt) AS BIGINT) AS nb,
         |    CAST(sum(s * cnt) AS BIGINT) AS sp,
         |    CAST(sum(pos) * 1000000 AS BIGINT) AS sy
         |  FROM g GROUP BY 1),
         |tt AS (SELECT CAST(sum(nb) AS BIGINT) AS n,
         |    CAST(sum(sy) AS BIGINT) AS sy_all FROM bb),
         |terms AS (SELECT tt.n, tt.sy_all,
         |  CAST(floor(CAST(bb.sp - bb.sy AS DOUBLE)
         |      * CAST(bb.sp - bb.sy AS DOUBLE)
         |      / (CAST(bb.nb AS DOUBLE) * 1e6)) AS BIGINT) AS trel,
         |  CAST(floor((CAST(tt.n AS DOUBLE) * bb.sy
         |        - CAST(tt.sy_all AS DOUBLE) * bb.nb)
         |      * (CAST(tt.n AS DOUBLE) * bb.sy
         |        - CAST(tt.sy_all AS DOUBLE) * bb.nb)
         |      / (CAST(bb.nb AS DOUBLE) * CAST(tt.n AS DOUBLE)
         |         * CAST(tt.n AS DOUBLE) * 1e6)) AS BIGINT) AS tres
         |  FROM bb CROSS JOIN tt)
         |SELECT n,
         |  CAST(floor(CAST(sum(trel) AS DOUBLE) / n) AS BIGINT)
         |    AS rel_micros,
         |  CAST(floor(CAST(sum(tres) AS DOUBLE) / n) AS BIGINT)
         |    AS res_micros,
         |  CAST(floor((CAST(sy_all AS DOUBLE) / n)
         |    * (1e6 - CAST(sy_all AS DOUBLE) / n) / 1e6) AS BIGINT)
         |    AS unc_micros
         |FROM terms GROUP BY n, sy_all""".stripMargin,
    "qX_dirichlet_ql" ->
      """WITH toks AS (
        |  SELECT doc_id AS doc, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |dlen AS (SELECT doc, count(*) AS len FROM toks GROUP BY 1),
        |cfx AS (SELECT term, count(*) AS cf FROM toks GROUP BY 1),
        |ctot AS (SELECT count(*) AS ct FROM toks),
        |q(term) AS (VALUES ('table'), ('hash')),
        |qcf AS (SELECT q.term, cfx.cf FROM q JOIN cfx USING (term)),
        |tf AS (SELECT t.doc, t.term, count(*) AS tf
        |  FROM toks t JOIN q ON t.term = q.term GROUP BY 1, 2),
        |t AS (SELECT d.doc,
        |  CAST(round(1e6 * ln((coalesce(tf.tf, 0)
        |      + 500.0 * qcf.cf / ctot.ct) / (d.len + 500.0))) AS BIGINT)
        |    AS tm
        |  FROM dlen d CROSS JOIN qcf CROSS JOIN ctot
        |  LEFT JOIN tf ON tf.doc = d.doc AND tf.term = qcf.term)
        |SELECT doc, CAST(sum(tm) AS BIGINT) AS ql_micros
        |FROM t GROUP BY 1 ORDER BY ql_micros DESC, doc LIMIT 100""".stripMargin,
    "qX_auc" ->
      s"""$LrScoredGSql,
         |c AS (SELECT s, pos, cnt,
         |  CAST(coalesce(sum(cnt) OVER (ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS below FROM g),
         |t AS (SELECT CAST(sum(pos) AS BIGINT) AS np,
         |  CAST(sum(cnt) - sum(pos) AS BIGINT) AS nn,
         |  CAST(sum(pos * (2 * below + cnt + 1)) AS BIGINT) AS r2 FROM c)
         |SELECT np AS n_pos, nn AS n_neg,
         |  CAST(floor(1e6 * (r2 - np * (np + 1)) / (2 * np * nn)) AS BIGINT)
         |    AS auc_micros
         |FROM t""".stripMargin,
    "qX_threshold" ->
      s"""$LrScoredGSql,
         |c AS (SELECT s, pos, cnt,
         |  CAST(sum(pos) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
         |    AS BIGINT) AS tp,
         |  CAST(sum(cnt) OVER (ORDER BY s DESC ROWS UNBOUNDED PRECEDING)
         |    AS BIGINT) AS pp
         |  FROM g),
         |t AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
         |  CAST(sum(cnt) AS BIGINT) AS n FROM g)
         |SELECT c.s AS threshold, c.tp, c.pp - c.tp AS fp,
         |  t.p - c.tp AS fn, t.n - t.p - (c.pp - c.tp) AS tn,
         |  CAST(1000000 * (c.pp - c.tp) + 3000000 * (t.p - c.tp) AS BIGINT)
         |    AS cost_micros
         |FROM c CROSS JOIN t
         |ORDER BY cost_micros, threshold LIMIT 1""".stripMargin,
    "qX_confusion" ->
      s"""$LrScoredGSql,
         |m AS (SELECT
         |  CAST(sum(CASE WHEN s >= 500000 THEN pos ELSE 0 END) AS BIGINT)
         |    AS tp,
         |  CAST(sum(CASE WHEN s >= 500000 THEN cnt - pos ELSE 0 END)
         |    AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN s < 500000 THEN pos ELSE 0 END) AS BIGINT)
         |    AS fn,
         |  CAST(sum(CASE WHEN s < 500000 THEN cnt - pos ELSE 0 END)
         |    AS BIGINT) AS tn
         |  FROM g)
         |SELECT tp, fp, fn, tn,
         |  CASE WHEN tp + fp = 0 THEN 0
         |    ELSE CAST(floor(1000000 * tp / (tp + fp)) AS BIGINT) END
         |    AS precision_micros,
         |  CASE WHEN tp + fn = 0 THEN 0
         |    ELSE CAST(floor(1000000 * tp / (tp + fn)) AS BIGINT) END
         |    AS recall_micros,
         |  CASE WHEN 2 * tp + fp + fn = 0 THEN 0
         |    ELSE CAST(floor(1000000 * (2 * tp) / (2 * tp + fp + fn))
         |      AS BIGINT) END AS f1_micros
         |FROM m""".stripMargin,
    "qX_conformal" ->
      s"""$LrScoredGSql,
         |nc0 AS (SELECT doc_id,
         |  abs(CASE WHEN doc_id < 350 THEN 1000000 ELSE 0 END - p) AS nc
         |  FROM sp),
         |cal AS (SELECT nc FROM nc0
         |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |    AS BIGINT) % 2 = 0),
         |ev AS (SELECT nc FROM nc0
         |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
         |    AS BIGINT) % 2 <> 0),
         |gnc AS (SELECT nc, CAST(count(*) AS BIGINT) AS c FROM cal
         |  GROUP BY 1),
         |cum AS (SELECT nc, CAST(sum(c) OVER (ORDER BY nc
         |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM gnc),
         |ctot AS (SELECT CAST(sum(c) AS BIGINT) AS n_calib FROM gnc),
         |q AS (SELECT min(nc) AS q_micros FROM cum CROSS JOIN ctot
         |  WHERE cum >= least(n_calib,
         |    CAST(floor(((n_calib + 1) * (1000000 - 100000) + 999999)
         |      / 1000000) AS BIGINT)))
         |SELECT ctot.n_calib, CAST(count(*) AS BIGINT) AS n_eval,
         |  q.q_micros,
         |  CAST(floor(1000000 * sum(CASE WHEN ev.nc <= q.q_micros
         |    THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS coverage_micros
         |FROM ev CROSS JOIN q CROSS JOIN ctot
         |GROUP BY 1, 3""".stripMargin,
    "qX_calibration" ->
      s"""$CalBinsSql
         |SELECT bin, n, n_pos, acc_micros, conf_micros
         |FROM cal ORDER BY bin""".stripMargin,
    "qX_ece" ->
      s"""$CalBinsSql
         |SELECT CAST(sum(n) AS BIGINT) AS n,
         |  CAST(floor(sum(n * abs(acc_micros - conf_micros)) / sum(n))
         |    AS BIGINT) AS ece_micros
         |FROM cal""".stripMargin,
    "qX_batch_search" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id AS doc, term, count(*) AS tf FROM toks
        |  GROUP BY 1, 2),
        |idf AS (SELECT term,
        |    ln(1 + ((SELECT count(*) FROM documents) - count(*) + 0.5)
        |       / (count(*) + 0.5)) AS idf
        |  FROM tf GROUP BY term),
        |q AS (SELECT DISTINCT doc_id AS qid, term FROM toks WHERE doc_id < 5),
        |scored AS (
        |  SELECT q.qid, tf.doc AS id,
        |    CAST(sum(CAST(round(tf.tf * idf.idf * 1000) AS BIGINT))
        |      AS BIGINT) AS score
        |  FROM q JOIN tf USING (term) JOIN idf USING (term)
        |  WHERE tf.doc <> q.qid
        |  GROUP BY 1, 2),
        |ranked AS (SELECT qid, id, score, row_number() OVER (
        |  PARTITION BY qid ORDER BY score DESC, id) AS rn FROM scored)
        |SELECT qid, id, score FROM ranked WHERE rn <= 10
        |ORDER BY qid, score DESC, id""".stripMargin,
    "qX_pmi" ->
      s"""WITH d AS ($ToksSql),
         |p AS (SELECT doc_id, unnest(flatten(list_transform(
         |    range(1, len(toks)),
         |    i -> list_transform(range(i + 1, least(i + 3, len(toks)) + 1),
         |      j -> [least(toks[i], toks[j]),
         |            greatest(toks[i], toks[j])])))) AS pr
         |  FROM d WHERE doc_id < 200 AND len(toks) >= 2),
         |pc AS (SELECT pr[1] AS a, pr[2] AS b,
         |  CAST(count(*) AS BIGINT) AS n_ab FROM p GROUP BY 1, 2),
         |mg AS (SELECT w, CAST(sum(n_ab) AS BIGINT) AS n_w FROM (
         |  SELECT a AS w, n_ab FROM pc
         |  UNION ALL SELECT b AS w, n_ab FROM pc) x GROUP BY 1),
         |tt AS (SELECT CAST(sum(n_ab) AS BIGINT) AS t_pairs FROM pc),
         |sc AS (SELECT pc.a, pc.b, pc.n_ab,
         |  CAST(round(1e6 * ln(CAST(pc.n_ab * tt.t_pairs AS DOUBLE)
         |    / CAST(ma.n_w * mb.n_w AS DOUBLE))) AS BIGINT) AS pmi_micros
         |  FROM pc JOIN mg ma ON ma.w = pc.a JOIN mg mb ON mb.w = pc.b
         |  CROSS JOIN tt
         |  WHERE pc.n_ab >= 5)
         |SELECT a, b, n_ab, pmi_micros FROM sc
         |ORDER BY pmi_micros DESC, a, b LIMIT 100""".stripMargin,
    "qX_chi2" ->
      s"""WITH d AS (
         |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         |    list_filter(string_split_regex(lower(text), '\\s+'),
         |      x -> x <> '') AS toks
         |  FROM documents),
         |pres AS (SELECT DISTINCT doc_id, y, unnest(toks) AS tok FROM d),
         |tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS rt,
         |  CAST(sum(y) AS BIGINT) AS a FROM pres GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(y) AS BIGINT) AS ct FROM d),
         |s AS (SELECT tok, rt, a, n, ct, n * a - rt * ct AS dd
         |  FROM tc CROSS JOIN tot
         |  WHERE rt >= 5 AND rt < n AND ct > 0 AND ct < n)
         |SELECT tok, rt AS n_docs, a AS n_pos,
         |  CAST(floor(1e6 * (CAST(n * dd * dd AS DOUBLE) /
         |    (CAST(rt * (n - rt) AS DOUBLE) * CAST(ct * (n - ct) AS DOUBLE))))
         |    AS BIGINT) AS chi2_micros
         |FROM s ORDER BY chi2_micros DESC, tok LIMIT 50""".stripMargin,
    "qX_lm_model" ->
      s"""WITH d AS ($ToksSql),
         |big AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM d WHERE len(toks) >= 2 AND doc_id >= 200)
         |SELECT split_part(bg, ' ', 1) AS ctx,
         |  split_part(bg, ' ', 2) AS word, count(*) AS cnt
         |FROM big GROUP BY 1, 2 HAVING count(*) >= 3
         |ORDER BY ctx, word""".stripMargin,
    "qX_lm_score" ->
      s"""WITH d AS ($ToksSql),
         |big AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM d WHERE len(toks) >= 2),
         |inst AS (
         |  SELECT doc_id, split_part(bg, ' ', 1) AS ctx,
         |    split_part(bg, ' ', 2) AS word FROM big),
         |m AS (
         |  SELECT ctx, word, count(*) AS cnt FROM inst
         |  WHERE doc_id >= 200 GROUP BY 1, 2),
         |ct AS (SELECT ctx, sum(cnt) AS ctx_cnt FROM m GROUP BY 1),
         |v AS (SELECT count(DISTINCT t) AS vs FROM (
         |  SELECT ctx AS t FROM m UNION SELECT word FROM m)),
         |lp AS (
         |  SELECT i.doc_id, CAST(round(ln(
         |      (coalesce(m.cnt, 0) + 1.0)
         |      / (coalesce(ct.ctx_cnt, 0) + v.vs)) * 1e6) AS BIGINT) AS lpm
         |  FROM inst i
         |  LEFT JOIN m ON m.ctx = i.ctx AND m.word = i.word
         |  LEFT JOIN ct ON ct.ctx = i.ctx
         |  CROSS JOIN v
         |  WHERE i.doc_id < 200)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(sum(lpm) AS BIGINT) AS lp_micros,
         |  CAST(round(exp(-(CAST(sum(lpm) AS DOUBLE) / 1e6) / count(*))
         |    * 1000) AS BIGINT) AS ppl_milli
         |FROM lp GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "qX_ppl_prune" ->
      s"""WITH d AS ($ToksSql),
         |big AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM d WHERE len(toks) >= 2),
         |inst AS (
         |  SELECT doc_id, split_part(bg, ' ', 1) AS ctx,
         |    split_part(bg, ' ', 2) AS word FROM big),
         |m AS (
         |  SELECT ctx, word, count(*) AS cnt FROM inst
         |  WHERE doc_id >= 200 GROUP BY 1, 2),
         |ct AS (SELECT ctx, sum(cnt) AS ctx_cnt FROM m GROUP BY 1),
         |v AS (SELECT count(DISTINCT t) AS vs FROM (
         |  SELECT ctx AS t FROM m UNION SELECT word FROM m)),
         |lp AS (
         |  SELECT i.doc_id, CAST(round(ln(
         |      (coalesce(m.cnt, 0) + 1.0)
         |      / (coalesce(ct.ctx_cnt, 0) + v.vs)) * 1e6) AS BIGINT) AS lpm
         |  FROM inst i
         |  LEFT JOIN m ON m.ctx = i.ctx AND m.word = i.word
         |  LEFT JOIN ct ON ct.ctx = i.ctx
         |  CROSS JOIN v
         |  WHERE i.doc_id < 200),
         |sc AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |    CAST(sum(lpm) AS BIGINT) AS lp_micros,
         |    CAST(round(exp(-(CAST(sum(lpm) AS DOUBLE) / 1e6) / count(*))
         |      * 1000) AS BIGINT) AS ppl_milli
         |  FROM lp GROUP BY 1),
         |rk AS (SELECT *, row_number() OVER (ORDER BY ppl_milli, doc_id)
         |    AS rn, count(*) OVER () AS n FROM sc)
         |SELECT doc_id, n_bigrams, lp_micros, ppl_milli FROM rk
         |WHERE rn > floor(0.1 * n) AND rn <= floor(0.8 * n)
         |ORDER BY doc_id""".stripMargin,
    "qX_oov" ->
      s"""WITH toks AS (
         |  SELECT unnest(toks) AS token FROM ($ToksSql)),
         |c AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
         |r AS (SELECT token,
         |  row_number() OVER (ORDER BY cnt DESC, token) AS rank FROM c),
         |v AS (SELECT token FROM r WHERE rank <= 20),
         |dt AS (SELECT doc_id, unnest(toks) AS token FROM ($ToksSql)
         |       WHERE doc_id < 200)
         |SELECT dt.doc_id, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  round(CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
         |    AS DOUBLE) / count(*), 4) AS oov_rate
         |FROM dt LEFT JOIN v ON dt.token = v.token
         |GROUP BY dt.doc_id ORDER BY dt.doc_id""".stripMargin,
    "qX_key_wsample" ->
      """WITH s AS (
        |  SELECT lang, doc_id,
        |    round(ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) + 0.5) / 4294967296.0) / n_chars, 6) AS score
        |  FROM documents WHERE n_chars > 0),
        |r AS (
        |  SELECT lang, doc_id, row_number() OVER (
        |    PARTITION BY lang ORDER BY score DESC, doc_id) AS rn
        |  FROM s)
        |SELECT lang, doc_id FROM r WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin,
    "qX_dedup_clusters" ->
      (DedupClustersCte + """
        |SELECT dd.doc_id, coalesce(comp.cluster, dd.doc_id) AS cluster,
        |  dd.doc_id = coalesce(comp.cluster, dd.doc_id) AS is_canonical
        |FROM (SELECT doc_id FROM documents WHERE doc_id < 300) dd
        |LEFT JOIN comp ON dd.doc_id = comp.doc_id
        |ORDER BY dd.doc_id""".stripMargin),
    "qX_dedup_survivor" ->
      (DedupClustersCte + """,
        |asg AS (SELECT dd.doc_id, coalesce(comp.cluster, dd.doc_id)
        |    AS cluster
        |  FROM (SELECT doc_id FROM documents WHERE doc_id < 300) dd
        |  LEFT JOIN comp ON dd.doc_id = comp.doc_id),
        |q AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS score FROM d),
        |r AS (SELECT a.cluster, a.doc_id, q.score, row_number() OVER (
        |    PARTITION BY a.cluster ORDER BY q.score DESC, a.doc_id) AS rn
        |  FROM asg a JOIN q USING (doc_id)),
        |m AS (SELECT cluster, count(*) AS n_members FROM asg GROUP BY 1)
        |SELECT r.cluster, r.doc_id AS keep_id, r.score AS best_score,
        |  m.n_members
        |FROM r JOIN m USING (cluster) WHERE r.rn = 1
        |ORDER BY r.cluster""".stripMargin),
    "qX_profile" ->
      """SELECT 'doc_id' AS "column", count(*) AS n_rows,
        |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nulls,
        |  count(DISTINCT doc_id) AS n_distinct,
        |  CAST(min(doc_id) AS VARCHAR) AS min_value,
        |  CAST(max(doc_id) AS VARCHAR) AS max_value FROM documents
        |UNION ALL
        |SELECT 'lang', count(*),
        |  CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT lang),
        |  CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'source', count(*),
        |  CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT source),
        |  CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
        |UNION ALL
        |SELECT 'n_chars', count(*),
        |  CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  count(DISTINCT n_chars),
        |  CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |FROM documents""".stripMargin,
    "qX_zorder" -> ZorderSql,
    "qX_key_sample" ->
      """WITH r AS (
        |  SELECT lang, doc_id, row_number() OVER (
        |    PARTITION BY lang ORDER BY
        |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
        |      doc_id) AS rn
        |  FROM documents)
        |SELECT lang, doc_id FROM r WHERE rn <= 5
        |ORDER BY lang, doc_id""".stripMargin,
    "qX_dedup_ngram" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id < 300),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(toks), 2)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS sh
        |  FROM d WHERE len(toks) >= 2),
        |posts AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n_sh AS n1, b.n_sh AS n2,
        |    count(*) AS inter
        |  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id1, id2,
        |  round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 4) AS jaccard
        |FROM pairs
        |WHERE round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 4) >= 0.03
        |ORDER BY jaccard DESC, id1 ASC, id2 ASC LIMIT 100""".stripMargin,
    "qX_dedup_containment" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id < 300),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(toks), 2)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS sh
        |  FROM d WHERE len(toks) >= 2),
        |posts AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n_sh AS n1, b.n_sh AS n2,
        |    count(*) AS inter
        |  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4)
        |SELECT id1, id2,
        |  round(CAST(inter AS DOUBLE) / least(n1, n2), 4) AS containment
        |FROM pairs
        |WHERE round(CAST(inter AS DOUBLE) / least(n1, n2), 4) >= 0.1
        |ORDER BY containment DESC, id1 ASC, id2 ASC LIMIT 100""".stripMargin,
    "qX_fuzzy_join" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id < 240),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(toks), 2)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS sh
        |  FROM d WHERE len(toks) >= 2),
        |l AS (SELECT doc_id AS lid, len(sh) AS n1, unnest(sh) AS s FROM sh
        |      WHERE doc_id < 120),
        |r AS (SELECT doc_id AS rid, len(sh) AS n2, unnest(sh) AS s FROM sh
        |      WHERE doc_id >= 120),
        |pairs AS (
        |  SELECT lid, rid, n1, n2, count(*) AS inter
        |  FROM l JOIN r USING (s) GROUP BY 1, 2, 3, 4)
        |SELECT lid, rid,
        |  round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 4) AS jaccard
        |FROM pairs
        |WHERE round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 4) >= 0.03
        |ORDER BY jaccard DESC, lid ASC, rid ASC LIMIT 100""".stripMargin,
    "qX_fuzzy_join_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM documents WHERE doc_id < 1000""".stripMargin,
    "qX_dedup_containment_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM documents WHERE doc_id < 1000
        |  AND len(list_filter(string_split_regex(lower(text), '\s+'),
        |    x -> x <> '')) >= 12""".stripMargin,
    "qX_pack" ->
      """WITH t AS (
        |  SELECT doc_id, len(list_filter(string_split_regex(lower(text),
        |    '\s+'), x -> x <> '')) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS s
        |  FROM t)
        |SELECT doc_id, n_tokens,
        |  CAST(floor(s / 512.0) AS BIGINT) AS bin,
        |  CAST(s % 512 AS BIGINT) AS "offset"
        |FROM c ORDER BY doc_id""".stripMargin,
    "qX_length_buckets" ->
      """WITH t AS (
        |  SELECT doc_id, len(list_filter(string_split_regex(lower(text),
        |    '\s+'), x -> x <> '')) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  ntile(8) OVER (ORDER BY n_tokens ASC, doc_id ASC) AS bucket
        |FROM t ORDER BY doc_id""".stripMargin,
    "qX_length_buckets_scalable" ->
      """WITH t AS (
        |  SELECT doc_id, len(list_filter(string_split_regex(lower(text),
        |    '\s+'), x -> x <> '')) AS n_tokens
        |  FROM documents)
        |SELECT doc_id, n_tokens,
        |  ntile(8) OVER (ORDER BY n_tokens ASC, doc_id ASC) AS bucket
        |FROM t ORDER BY doc_id""".stripMargin,
    "qX_redact" -> {
      val email = graft.functions.GraftFunctions.EmailPattern
      val phone = graft.operators.TextAnalysis.RedactPhonePattern
      s"""WITH noisy AS (
         |  SELECT doc_id, text || ' reach me: u' || CAST(doc_id AS VARCHAR)
         |    || '@mail-' || CAST(doc_id AS VARCHAR)
         |    || '.example.org or +821010' || CAST(doc_id AS VARCHAR)
         |    || '25' AS t
         |  FROM documents),
         |e AS (
         |  SELECT doc_id, t,
         |    regexp_replace(t, '$email', '[EMAIL]', 'g') AS t2
         |  FROM noisy)
         |SELECT doc_id,
         |  md5(regexp_replace(t2, '$phone', '[PHONE]', 'g')) AS red_md5,
         |  len(regexp_extract_all(t, '$email')) AS n_emails,
         |  len(regexp_extract_all(t2, '$phone')) AS n_phones
         |FROM e ORDER BY doc_id""".stripMargin
    },
    "qX_url_dedup" ->
      """WITH c AS (SELECT doc_id,
        |    'https://' || source || '.com/p/'
        |      || CAST(doc_id % 50 AS VARCHAR) AS canonical
        |  FROM documents)
        |SELECT canonical, count(*) AS n_dups,
        |  CAST(min(doc_id) AS BIGINT) AS keep_id
        |FROM c GROUP BY 1 ORDER BY canonical""".stripMargin,

    "qX_novelty" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM d WHERE len(toks) >= 3),
        |ref AS (SELECT DISTINCT unnest(sh) AS s FROM sh
        |  WHERE doc_id >= 200),
        |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh
        |  WHERE doc_id < 200),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM posts
        |  GROUP BY 1),
        |seen AS (SELECT posts.doc_id, count(*) AS n_seen
        |  FROM posts JOIN ref USING (s) GROUP BY 1)
        |SELECT tot.doc_id, tot.n_shingles,
        |  coalesce(seen.n_seen, 0) AS n_seen,
        |  CAST(floor(1000000 * (tot.n_shingles - coalesce(seen.n_seen, 0))
        |    / tot.n_shingles) AS BIGINT) AS novelty_micros
        |FROM tot LEFT JOIN seen USING (doc_id)
        |ORDER BY tot.doc_id""".stripMargin,

    "qX_decontam" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        |  FROM d WHERE len(toks) >= 3),
        |bsh AS (SELECT DISTINCT unnest(sh) AS s FROM sh WHERE doc_id % 97 = 0),
        |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
        |hits AS (SELECT posts.doc_id, count(*) AS n_hits
        |         FROM posts JOIN bsh USING (s) GROUP BY posts.doc_id)
        |SELECT d.doc_id, coalesce(hits.n_hits, 0) AS n_hits,
        |  coalesce(hits.n_hits, 0) > 0 AS contaminated
        |FROM d LEFT JOIN hits ON d.doc_id = hits.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "qX_mixture" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT * FROM (VALUES ('en', 0.4), ('de', 0.4), ('fr', 0.1),
        |  ('zh', 0.1)) t(lang, w)),
        |r AS (SELECT c.lang,
        |  least(CAST(1.0 AS DOUBLE), CAST(w.w AS DOUBLE) * 300 / c.n) AS rate
        |  FROM c JOIN w ON c.lang = w.lang),
        |s AS (
        |  SELECT d.lang, d.doc_id FROM documents d JOIN r ON d.lang = r.lang
        |  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) < r.rate * 4294967296.0)
        |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "qX_mixture_temp" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |z AS (SELECT sum(pow(CAST(n AS DOUBLE), 0.5)) AS z FROM c),
        |r AS (SELECT c.lang, round(least(CAST(1.0 AS DOUBLE),
        |    pow(CAST(c.n AS DOUBLE), 0.5) / z.z * 200 / c.n), 9) AS rate
        |  FROM c CROSS JOIN z),
        |s AS (
        |  SELECT d.lang, d.doc_id FROM documents d JOIN r ON d.lang = r.lang
        |  WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) < r.rate * 4294967296.0)
        |SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,
    "qX_bleu" ->
      s"""WITH d AS ($ToksSql),
         |p0 AS (SELECT doc_id AS pid, list_slice(toks, 1, 42) AS base,
         |  toks AS rt FROM d WHERE doc_id < 200),
         |p AS (SELECT pid, list_transform(
         |    list_filter(range(1, len(base) + 1), i -> i % 7 <> 0),
         |    i -> base[i]) AS ct, rt FROM p0),
         |nn AS (SELECT unnest([1, 2, 3, 4]) AS n),
         |cg AS (SELECT pid, n, unnest(list_transform(
         |    range(1, greatest(len(ct) - n + 1, 0) + 1),
         |    i -> array_to_string(list_slice(ct, i, i + n - 1), ' '))) AS gram
         |  FROM p CROSS JOIN nn),
         |rg AS (SELECT pid, n, unnest(list_transform(
         |    range(1, greatest(len(rt) - n + 1, 0) + 1),
         |    i -> array_to_string(list_slice(rt, i, i + n - 1), ' '))) AS gram
         |  FROM p CROSS JOIN nn),
         |cc AS (SELECT pid, n, gram, count(*) AS cc FROM cg GROUP BY 1, 2, 3),
         |rc AS (SELECT pid, n, gram, count(*) AS rc FROM rg GROUP BY 1, 2, 3),
         |cl AS (SELECT cc.n, CAST(sum(least(cc.cc, coalesce(rc.rc, 0)))
         |    AS BIGINT) AS m
         |  FROM cc LEFT JOIN rc ON cc.pid = rc.pid AND cc.n = rc.n
         |    AND cc.gram = rc.gram
         |  GROUP BY 1),
         |ms AS (SELECT
         |  CAST(sum(CASE WHEN n = 1 THEN m ELSE 0 END) AS BIGINT) AS m1,
         |  CAST(sum(CASE WHEN n = 2 THEN m ELSE 0 END) AS BIGINT) AS m2,
         |  CAST(sum(CASE WHEN n = 3 THEN m ELSE 0 END) AS BIGINT) AS m3,
         |  CAST(sum(CASE WHEN n = 4 THEN m ELSE 0 END) AS BIGINT) AS m4
         |  FROM cl),
         |ls AS (SELECT CAST(sum(len(ct)) AS BIGINT) AS c_len,
         |  CAST(sum(len(rt)) AS BIGINT) AS r_len,
         |  CAST(sum(greatest(len(ct), 0)) AS BIGINT) AS t1,
         |  CAST(sum(greatest(len(ct) - 1, 0)) AS BIGINT) AS t2,
         |  CAST(sum(greatest(len(ct) - 2, 0)) AS BIGINT) AS t3,
         |  CAST(sum(greatest(len(ct) - 3, 0)) AS BIGINT) AS t4
         |  FROM p)
         |SELECT c_len, r_len, m1 AS match_1, m2 AS match_2, m3 AS match_3,
         |  m4 AS match_4, t1 AS total_1, t2 AS total_2, t3 AS total_3,
         |  t4 AS total_4,
         |  CASE WHEN m1 = 0 OR m2 = 0 OR m3 = 0 OR m4 = 0 THEN 0
         |  ELSE CAST(round(1e6 *
         |    (CASE WHEN c_len >= r_len THEN 1.0
         |     ELSE exp(1.0 - CAST(r_len AS DOUBLE) / c_len) END) *
         |    exp((ln(CAST(m1 AS DOUBLE) / t1) + ln(CAST(m2 AS DOUBLE) / t2)
         |      + ln(CAST(m3 AS DOUBLE) / t3) + ln(CAST(m4 AS DOUBLE) / t4))
         |      / 4)) AS BIGINT) END AS bleu_micros
         |FROM ls CROSS JOIN ms""".stripMargin,
    "qX_lm_kn" ->
      s"""WITH d AS ($ToksSql),
         |big AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(toks)),
         |    i -> toks[i] || ' ' || toks[i+1])) AS bg
         |  FROM d WHERE len(toks) >= 2),
         |inst AS (
         |  SELECT doc_id, split_part(bg, ' ', 1) AS ctx,
         |    split_part(bg, ' ', 2) AS word FROM big),
         |m AS (SELECT ctx, word, count(*) AS cnt FROM inst
         |  WHERE doc_id >= 200 GROUP BY 1, 2),
         |cs AS (SELECT ctx, CAST(sum(cnt) AS BIGINT) AS ctx_cnt,
         |  CAST(count(*) AS BIGINT) AS ctx_types FROM m GROUP BY 1),
         |ctp AS (SELECT word, CAST(count(*) AS BIGINT) AS cont_types
         |  FROM m GROUP BY 1),
         |sc AS (SELECT (SELECT count(*) FROM m) AS tt,
         |  (SELECT count(DISTINCT t) FROM (
         |    SELECT ctx AS t FROM m UNION ALL SELECT word FROM m)) AS vs),
         |li AS (SELECT i.doc_id,
         |  CAST(round(1e6 * ln(CASE WHEN cs.ctx_cnt IS NULL
         |    THEN (coalesce(ctp.cont_types, 0) + 1)
         |      / CAST(sc.tt + sc.vs AS DOUBLE)
         |    ELSE greatest(coalesce(m.cnt, 0) - 0.75, 0.0)
         |        / CAST(cs.ctx_cnt AS DOUBLE)
         |      + 0.75 * cs.ctx_types / CAST(cs.ctx_cnt AS DOUBLE)
         |        * ((coalesce(ctp.cont_types, 0) + 1)
         |          / CAST(sc.tt + sc.vs AS DOUBLE))
         |    END)) AS BIGINT) AS lpm
         |  FROM inst i LEFT JOIN m ON i.ctx = m.ctx AND i.word = m.word
         |  LEFT JOIN cs ON i.ctx = cs.ctx
         |  LEFT JOIN ctp ON i.word = ctp.word
         |  CROSS JOIN sc
         |  WHERE i.doc_id < 200)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  CAST(sum(lpm) AS BIGINT) AS lp_micros,
         |  CAST(round(exp(-(sum(lpm) / 1e6) / count(*)) * 1000) AS BIGINT)
         |    AS ppl_milli
         |FROM li GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "qX_constraints" ->
      """WITH u AS (SELECT count(*) AS ones FROM (
        |    SELECT doc_id FROM documents GROUP BY doc_id
        |    HAVING count(*) = 1)),
        |s AS (SELECT
        |  CAST(floor(1e6 * count(text) / count(*)) AS BIGINT) AS m0,
        |  CAST(floor(1e6 * (SELECT ones FROM u) / count(*)) AS BIGINT) AS m1,
        |  CAST(floor(1e6 * count(DISTINCT lang) / count(*)) AS BIGINT) AS m2,
        |  CAST(floor(1e6 * sum(CASE WHEN lang IN ('en','de','fr','es','zh')
        |    THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS m3,
        |  CAST(floor(1e6 * sum(CASE WHEN n_chars BETWEEN 1 AND 500
        |    THEN 1 ELSE 0 END) / count(*)) AS BIGINT) AS m4
        |  FROM documents)
        |SELECT 'completeness(text)' AS "constraint", 'text' AS "column",
        |  m0 AS metric_micros, CAST(1000000 AS BIGINT) AS threshold_micros,
        |  m0 >= 1000000 AS passed FROM s
        |UNION ALL SELECT 'distinctness(lang)', 'lang', m2, 5000,
        |  m2 >= 5000 FROM s
        |UNION ALL SELECT 'lang_in_set', 'lang', m3, 1000000,
        |  m3 >= 1000000 FROM s
        |UNION ALL SELECT 'n_chars_bounds', 'n_chars', m4, 950000,
        |  m4 >= 950000 FROM s
        |UNION ALL SELECT 'uniqueness(doc_id)', 'doc_id', m1, 1000000,
        |  m1 >= 1000000 FROM s
        |ORDER BY "constraint"""".stripMargin,
    "qX_leakage_split" ->
      """WITH RECURSIVE d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id < 300),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(toks), 2)),
        |    i -> toks[i] || ' ' || toks[i + 1])) AS sh
        |  FROM d WHERE len(toks) >= 2),
        |posts AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS s FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2, a.n_sh AS n1, b.n_sh AS n2,
        |    count(*) AS inter
        |  FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2, 3, 4),
        |p AS (
        |  SELECT id1, id2 FROM pairs
        |  WHERE round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 4) >= 0.1),
        |adj AS (SELECT id1 AS f, id2 AS t FROM p
        |        UNION ALL SELECT id2, id1 FROM p),
        |reach(v, r) AS (
        |  SELECT f, f FROM (SELECT DISTINCT f FROM adj)
        |  UNION
        |  SELECT reach.v, adj.t FROM reach JOIN adj ON reach.r = adj.f),
        |comp AS (SELECT v AS doc_id, min(r) AS cluster FROM reach GROUP BY v),
        |asg AS (
        |  SELECT dd.doc_id, dd.lang, coalesce(comp.cluster, dd.doc_id) AS cluster
        |  FROM (SELECT doc_id, lang FROM documents WHERE doc_id < 300) dd
        |  LEFT JOIN comp ON dd.doc_id = comp.doc_id)
        |SELECT doc_id, lang, cluster,
        |  CASE WHEN CAST(('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 8))
        |      AS BIGINT) < 0.8 * 4294967296.0
        |    THEN 'train' ELSE 'test' END AS split
        |FROM asg ORDER BY doc_id""".stripMargin)
}
