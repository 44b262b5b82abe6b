package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions.tokenize
import graft.operators.{Dedup, Hybrid, SearchIndex, Similarity}

/** Similarity-search + sketch-dedup queries over `embeddings` and
  * `documents`. The brute-force cosine top-k is oracle-checked
  * (DuckDB `list_cosine_similarity` over DOUBLE[] matches our
  * deterministic sequential fold at round-4). The LSH / MinHash /
  * SimHash variants hash through the md5-portable convention
  * ([[graft.functions.expr.PortableHash]]), so their DuckDB oracles
  * replay the full signature → banding → verify pipelines bit-for-bit;
  * the planted-recall contracts are kept alongside as the structural
  * guarantees (identical input ⇒ identical signature ⇒ recovered).
  */
object SimilarityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact cosine top-5 for query vectors 0..4 (ANN ground truth).
    "qX_ann_cosine" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", 5)
    }),

    // Embedding-centroid drift between the even/odd vec_id slices —
    // the vector-space PSI: micro-quantized per-dim folds, centroid
    // cosine + squared gap as fixed IEEE readouts.
    "qX_embed_drift" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.operators.Drift.centroidDrift(
        emb.filter(col("vec_id") % 2 === 0),
        emb.filter(col("vec_id") % 2 === 1), "embedding")
    }),

    // Matryoshka truncation ablation: overlap of the 8-dim exact
    // top-10 with the full-dim top-10 per query — the storage/latency
    // knob readout.
    "qX_matryoshka" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.truncationRecall(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", dims = 8, k = 10)
    }),

    // Intra-list diversity of the exact top-5 lists — the metric MMR
    // optimizes, measured: mean pairwise cosine distance per list,
    // k-bounded pairs, micro-quantized before the fold.
    "qX_ild" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val recs = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
        emb, "vec_id", "embedding", "vec_id", "embedding", 5)
      Similarity.intraListDiversity(recs.select(col("qid"), col("id")),
        emb, "qid", "id", "vec_id", "embedding")
    }),

    // Simplified silhouette of the IVF assignment — per-cluster
    // quality: (nearest-other − own)-centroid distance ratio per
    // point, micro-quantized before the cluster fold.
    "qX_silhouette" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val assigned = Similarity.ivfAssign(emb, centroids, "vec_id",
        "embedding")
      Similarity.silhouetteSimplified(assigned, centroids, "vec_id",
        "embedding", "cid")
    }),

    // Embedding-norm health: exact-integer per-row L2 norms, mean +
    // rank-selected p50/p90/p99 — the first check when an index
    // misbehaves (encoder change = norm shift before recall moves).
    "qX_norm_stats" -> ((s, dir) => {
      Similarity.normStats(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding")
    }),

    // IVF index health: cell-size min/max, imbalance factor and
    // entropy of the qX_ann_ivf centroid assignment — the skew
    // readout a production ANN deployment watches.
    "qX_ivf_balance" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val assigned = Similarity.ivfAssign(emb, centroids, "vec_id",
        "embedding")
      Similarity.ivfBalance(assigned, "cid")
    }),

    // MMR diversified re-rank: greedy λ-balanced relevance-vs-novelty
    // selection of 5 from each query's cosine top-20 — the
    // diverse-subset-selection primitive; unrolled 5-round oracle.
    "qX_mmr" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.mmr(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding",
        nCand = 20, k = 5, lambda = 0.5)
    }),

    // MMR with IVF-sourced candidates at full probe: the indexed path
    // (cell-pruned candidate generation, no corpus NLJ) reproduces the
    // brute-force candidate set exactly, so the SAME unrolled oracle
    // gates it — the scale path is full-oracle, not just spec-pinned.
    "qX_mmr_indexed" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val (_, cents) =
        Similarity.kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 2)
      Similarity.mmrIndexed(emb.filter(col("vec_id") < 5), emb, cents,
        "vec_id", "embedding", "vec_id", "embedding",
        nCand = 20, k = 5, lambda = 0.5, nprobe = 4)
    }),

    // Hybrid retrieval: RRF-fuse a lexical more-like-this run (batch
    // tf·idf over the inverted index) with a dense cosine run for the
    // same 5 query ids (doc_id ≡ vec_id in the testdata) — the
    // two-retriever fusion stage, integer-micro contributions.
    "qX_rrf_hybrid" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val (postings, stats, n) = SearchIndex.build(docs, "doc_id", Seq("text"))
      val batch = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          explode(tokenize(col("text"))).as("term"))
      val lexical = SearchIndex.batchQuery(postings, stats, n, "text",
        batch, 10, excludeSelf = true)
      val dense = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
          emb, "vec_id", "embedding", "vec_id", "embedding", 10)
        .withColumnRenamed("sim", "score")
      Hybrid.rrf(Seq(lexical, dense), k = 10)
    }),

    // nDCG@10 of the hybrid fusion against graded dense ground truth
    // (rel = 11 − exact-cosine rank): the retrieval-eval closure over
    // qX_rrf_hybrid — integer-micro log2 discounting.
    "qX_ndcg" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val (postings, stats, n) = SearchIndex.build(docs, "doc_id", Seq("text"))
      val batch = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          explode(tokenize(col("text"))).as("term"))
      val lexical = SearchIndex.batchQuery(postings, stats, n, "text",
        batch, 10, excludeSelf = true)
      val dense = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
          emb, "vec_id", "embedding", "vec_id", "embedding", 10)
        .withColumnRenamed("sim", "score")
      val fused = Hybrid.rrf(Seq(lexical, dense), k = 10)
        .withColumnRenamed("rrf_micros", "score")
      val iw = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("score"), asc("id"))
      val qrels = dense.withColumn("rank", row_number().over(iw))
        .select(col("qid"), col("id"),
          (lit(11) - col("rank")).cast("long").as("rel"))
      graft.operators.Eval.ndcgAtK(fused, qrels, 10)
    }),

    // Binary-relevance rank metrics @10 of the same fused run against
    // the dense top-3 as relevant set: MRR / precision / recall / hit
    // count per query — the ungraded-judgment eval dashboard row.
    "qX_rank_metrics" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val (postings, stats, n) = SearchIndex.build(docs, "doc_id", Seq("text"))
      val batch = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          explode(tokenize(col("text"))).as("term"))
      val lexical = SearchIndex.batchQuery(postings, stats, n, "text",
        batch, 10, excludeSelf = true)
      val dense = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
          emb, "vec_id", "embedding", "vec_id", "embedding", 10)
        .withColumnRenamed("sim", "score")
      val fused = Hybrid.rrf(Seq(lexical, dense), k = 10)
        .withColumnRenamed("rrf_micros", "score")
      val iw = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("score"), asc("id"))
      val qrels = dense.withColumn("rank", row_number().over(iw))
        .filter(col("rank") <= 3).select(col("qid"), col("id"))
      graft.operators.Eval.rankMetricsAtK(fused, qrels, 10)
    }),

    // Team-draft interleaving of the lexical and dense runs (k=6):
    // the online-eval list a click comparison credits teams on —
    // md5-coin ties, fewer-picks-first, skip-already-taken.
    "qX_interleave" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val (postings, stats, n) = SearchIndex.build(docs, "doc_id", Seq("text"))
      val batch = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          explode(tokenize(col("text"))).as("term"))
      val lexical = SearchIndex.batchQuery(postings, stats, n, "text",
        batch, 10, excludeSelf = true)
      val dense = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
          emb, "vec_id", "embedding", "vec_id", "embedding", 10)
        .withColumnRenamed("sim", "score")
      graft.operators.Hybrid.teamDraft(lexical, dense, 6)
    }),

    // AP@10 (MAP's per-query term) of the fused run vs dense top-3:
    // precision-at-each-relevant-rank, integer-micro terms — the
    // position-sensitive companion to qX_rank_metrics.
    "qX_avg_precision" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val (postings, stats, n) = SearchIndex.build(docs, "doc_id", Seq("text"))
      val batch = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          explode(tokenize(col("text"))).as("term"))
      val lexical = SearchIndex.batchQuery(postings, stats, n, "text",
        batch, 10, excludeSelf = true)
      val dense = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
          emb, "vec_id", "embedding", "vec_id", "embedding", 10)
        .withColumnRenamed("sim", "score")
      val fused = Hybrid.rrf(Seq(lexical, dense), k = 10)
        .withColumnRenamed("rrf_micros", "score")
      val iw = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(desc("score"), asc("id"))
      val qrels = dense.withColumn("rank", row_number().over(iw))
        .filter(col("rank") <= 3).select(col("qid"), col("id"))
      graft.operators.Eval.averagePrecisionAtK(fused, qrels, 10)
    }),

    // Hard-negative mining (DPR/Contriever prep): per query the top-5
    // most-similar DIFFERENT-label corpus vectors — the label guard
    // fused into the broadcast join, pruning before the cosine; same
    // exact plan and full oracle as qX_ann_cosine otherwise.
    "qX_hard_neg" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      Similarity.hardNegatives(q, emb, "vec_id", "embedding", "label",
        "vec_id", "embedding", "label", 5)
    }),

    // sign-LSH ANN (multi-probe) — scale path; md5-portable planes, so
    // the oracle recomputes signatures, probes, and the re-rank in SQL.
    "qX_ann_lsh" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      Similarity.lshTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", 5, m = 10)
    }),

    // MinHash+LSH near-dup candidate pairs, exact-verified; md5-portable
    // hashing, so the oracle replays shingle→signature→bands→verify.
    // The synthetic corpus has no real near-dups, so the query plants
    // truncated copies (id+100000, last ~30 chars dropped): LSH must
    // recover each (original, copy) pair at jaccard >= 0.5 while 4-row
    // bands prune the quadratic word-salad candidate space.
    "qX_dedup_minhash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val planted = docs.select((col("doc_id") + 100000).as("doc_id"),
        substring(col("text"), 1, 200).as("text"))
      Dedup.minhashLshPairs(docs.unionAll(planted), "text", "doc_id",
          n = 2, k = 64, bands = 16, minJaccard = 0.5)
        .orderBy(desc("jaccard"), asc("id1"), asc("id2"))
        .limit(500)
    }),

    // STREAMING near-dup suppression, oracle-gated (X69 promoted from
    // spec-only): fold the qX_dedup_minhash corpus through the
    // BucketStore in 3 deterministic ascending-id micro-batches
    // (originals first, planted truncations later — the arrival order
    // a stream would see), then gate the ACCUMULATED survivor set.
    // The DuckDB oracle replays the batch-equivalent form: a doc is
    // suppressed iff it is the id2 of ANY verified LSH pair over the
    // whole corpus — equal to the stream's first-arrival-wins fold
    // under ascending-id arrival (StreamingSpec pins the convention;
    // this gate makes it driver-visible).
    "qX_stream_neardup" -> ((s, dir) => {
      import graft.streaming.CardStream
      // The gate's cost is the fold's FIXED job count (3 batches ×
      // probe/verify/commit ≈ a Structured Streaming trigger each),
      // not data volume — so the fold runs on a CHILD session with
      // 2 shuffle partitions: each of the ~12 per-trigger jobs
      // schedules 2 tasks instead of 32 on a few hundred rows.
      // Isolated SQLConf, shared SparkContext — the caller's session
      // is untouched.
      val fold = s.newSession()
      fold.conf.set("spark.sql.shuffle.partitions", "2")
      // per-trigger folds are fixed-job-chain bound: AQE would turn
      // every exchange into its own job + replan (the small-session
      // measurement in Bench) for data that is micro-batch tiny
      fold.conf.set("spark.sql.adaptive.enabled", "false")
      // planner-chosen broadcasts on micro-batch-tiny frames each
      // build as their own job; a 2-partition shuffled-hash join runs
      // inside the fold's ONE job (explicit broadcast() hints — the
      // scale-correct centroid/model tables — are unaffected)
      fold.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      fold.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      val docs = Tables.load(fold, dir, "documents")
        .filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"))
      val planted = docs.select((col("doc_id") + 100000).as("doc_id"),
        substring(col("text"), 1, 200).as("text"))
      val all = docs.unionAll(planted).localCheckpoint(true)
      // 500 originals and 3 batches exercise the full semantics incl.
      // the suppressed-history chain case (doc 100045 ↔ dropped 267).
      GateTmp.withStore("graft-ndgate") { root =>
        val store = root + "/nd"
        val batches = Seq(
          col("doc_id") < 250,
          col("doc_id") >= 250 && col("doc_id") < 100000,
          col("doc_id") >= 100000)
        batches.zipWithIndex.foreach { case (pred, i) =>
          // 8 store buckets: a ~1000-doc corpus needs few bucket
          // files, and read/write planning is linear in them (a
          // 100 TB store would size UP from the 64 default instead)
          CardStream.nearDupSuppress(fold, all.filter(pred), store,
            "text", "doc_id", n = 2, k = 64, bands = 16,
            minJaccard = 0.5, batchId = i.toLong, storeBuckets = 8)
        }
        // materialize BEFORE the helper deletes the store (tmpfs is
        // RAM — Bench's repeated passes must not accumulate stores)
        CardStream.nearDupSurvivors(s, store)
          .select(col("doc_id")).orderBy(col("doc_id"))
          .localCheckpoint(true)
      }
    }),

    // SimHash near-dup pairs (Hamming <= 6 via 8-bit pigeonhole bands);
    // md5-portable token hashing — full signature replay in the oracle.
    "qX_dedup_simhash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 1000)
      Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 6)
        .orderBy(asc("dist"), asc("id1"), asc("id2"))
        .limit(200)
    }),

    // MinHash+LSH recall CONTRACT, gate-verifiable: the pair hashes are
    // not SQL-reproducible, but the planted-pair recall is — plant an
    // exact copy (+100000: jaccard 1.0 → identical signature, recovery
    // structurally guaranteed) and a drop-last-token near-dup (+200000:
    // shingle subset, jaccard ≥ (s−1)/s ≥ 0.9 at ≥10 tokens/doc; 32
    // bands of 2 rows → per-pair miss ~1e-22), and emit how many of
    // each family the full banding+verify pipeline recovered. The
    // DuckDB oracle computes the planted counts independently and
    // asserts both recoveries equal them — a hash-mismatch here means
    // the LSH pipeline dropped a guaranteed pair.
    "qX_dedup_minhash_recall" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val copyExact = docs.select((col("doc_id") + 100000).as("doc_id"),
        col("text"))
      val copyNear = docs.select((col("doc_id") + 200000).as("doc_id"),
        regexp_replace(col("text"), "\\s+\\S+\\s*$", "").as("text"))
      val pairs = Dedup.minhashLshPairs(
        docs.unionAll(copyExact).unionAll(copyNear), "text", "doc_id",
        n = 2, k = 64, bands = 32, minJaccard = 0.5)
      val recExact = pairs
        .filter(col("id1") < 1000 && col("id2") === col("id1") + 100000)
        .agg(count(lit(1)).as("n_exact_recovered"))
      val recNear = pairs
        .filter(col("id1") < 1000 && col("id2") === col("id1") + 200000)
        .agg(count(lit(1)).as("n_near_recovered"))
      docs.agg(count(lit(1)).as("n_planted"))
        .crossJoin(recExact).crossJoin(recNear)
    }),

    // SimHash recall contract: pigeonhole banding is STRUCTURALLY
    // complete (hamming ≤ maxDist ⇒ some chunk equal ⇒ candidate), so
    // an exact copy (distance 0) must always be recovered; the oracle
    // pins recovered == planted.
    "qX_dedup_simhash_recall" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 1000)
        .select(col("doc_id"), col("text"))
      val copies = docs.select((col("doc_id") + 100000).as("doc_id"), col("text"))
      val pairs = Dedup.simhashPairs(docs.unionAll(copies), "text", "doc_id",
        maxDist = 6)
      docs.agg(count(lit(1)).as("n_planted"))
        .crossJoin(pairs
          .filter(col("id1") < 1000 && col("id2") === col("id1") + 100000 &&
            col("dist") === 0)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // sign-LSH ANN recall contract: queries are identical copies of
    // corpus vectors (+100000) — identical vector ⇒ identical signature
    // ⇒ same bucket ⇒ candidate, and cosine 1.0 tops the ranking; every
    // query must recover its twin in the top-k.
    // Class prototypes: per-label mean vectors in exact integer
    // micros (quantize before the fold).
    "qX_prototypes" -> ((s, dir) => {
      Similarity.classPrototypes(Tables.load(s, dir, "embeddings"),
        "embedding", "label")
    }),

    // Nearest-prototype accuracy — do the label centroids separate
    // the space? Integer-micro cosine, argmax by (sim, label).
    "qX_proto_acc" -> ((s, dir) => {
      Similarity.prototypeAccuracy(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", "label")
    }),

    // Rank-biased overlap of the lexical vs dense top-10 — how much
    // the two retrieval modes agree, top-weighted; dyadic p=1/2 makes
    // every depth term exact integer micros.
    "qX_rbo" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val (postings, stats, n) = SearchIndex.build(docs, "doc_id",
        Seq("text"))
      val batch = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          explode(tokenize(col("text"))).as("term"))
      val lexical = SearchIndex.batchQuery(postings, stats, n, "text",
        batch, 10, excludeSelf = true)
      val dense = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
          emb, "vec_id", "embedding", "vec_id", "embedding", 10)
        .withColumnRenamed("sim", "score")
      graft.operators.Eval.rbo(lexical, dense, k = 10)
    }),

    // Kendall τ between the same two rankers, per query: concordant/
    // discordant pairs over the common items — the pairwise companion
    // readout to qX_rbo's top-weighted overlap.
    "qX_kendall" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val (postings, stats, n) = SearchIndex.build(docs, "doc_id",
        Seq("text"))
      val batch = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          explode(tokenize(col("text"))).as("term"))
      val lexical = SearchIndex.batchQuery(postings, stats, n, "text",
        batch, 10, excludeSelf = true)
      val dense = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5),
          emb, "vec_id", "embedding", "vec_id", "embedding", 10)
        .withColumnRenamed("sim", "score")
      graft.operators.Eval.kendallTau(lexical, dense, k = 10)
    }),

    // NN-descent k-NN graph: LSH-bucket init, 2 neighbor-of-neighbor
    // refinement rounds, quantized-cosine top-5 — init + every round
    // replayed in SQL.
    "qX_nndescent" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.nnDescent(emb, "vec_id", "embedding", k = 5,
        rounds = 2, mBits = 4)
    }),

    // NN-descent recall contract: planted identical copies share the
    // LSH bucket, so the init round already links them and refinement
    // keeps them at sim 1.0 top-1.
    "qX_nndescent_recall" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val planted = emb.filter(col("vec_id") < 100)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val res = Similarity.nnDescent(emb.unionAll(planted), "vec_id",
        "embedding", k = 5, rounds = 1, mBits = 4)
      planted.agg(count(lit(1)).as("n_planted"))
        .crossJoin(res.filter(col("id") >= 100000 &&
            col("nb") === col("id") - 100000)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // DBSCAN in cosine space over originals + two planted variants
    // each: 50 clusters of 3 cores; the random corpus (max natural
    // sim ~0.44) stays noise. Composition of oracled primitives —
    // cosine pairs, integer core counts, min-label CC fixpoint.
    "qX_dbscan" -> ((s, dir) => {
      val base = Tables.load(s, dir, "embeddings")
        .filter(col("vec_id") < 50).select(col("vec_id"), col("embedding"))
      def planted(off: Int) = base.select(
        (col("vec_id") + off).as("vec_id"),
        concat(array(lit(0.0f)), slice(col("embedding"), 2, 10000))
          .as("embedding"))
      Similarity.dbscan(base.unionAll(planted(100000))
          .unionAll(planted(200000)),
        "vec_id", "embedding", minSim = 0.9, minPts = 3)
    }),

    // Binary-quantization two-stage ANN: sign-code Hamming shortlist
    // (integer ranking) → exact-cosine rerank of the shortlist only.
    // Full oracle: signs → Hamming → shortlist-50 → rerank-5 replayed.
    "qX_bq_rerank" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bqTopK(emb.filter(col("vec_id") < 5), emb,
        "vec_id", "embedding", "vec_id", "embedding",
        shortlist = 50, k = 5)
    }),

    // BQ recall contract: planted identical copies have Hamming 0 →
    // always shortlisted, exact rerank puts the original at sim 1.0.
    "qX_bq_recall" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 100)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val res = Similarity.bqTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", shortlist = 50, k = 5)
      q.agg(count(lit(1)).as("n_planted"))
        .crossJoin(res.filter(col("id") === col("qid") - 100000)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    "qX_ann_lsh_recall" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 100)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val res = Similarity.lshTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", 5, m = 10)
      q.agg(count(lit(1)).as("n_planted"))
        .crossJoin(res.filter(col("id") === col("qid") - 100000)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // embedding-cosine near-dup pairs (exact all-pairs, oracle-checked).
    // Planted near-dups: copies with dimension 1 zeroed (cosine ~0.99
    // vs a ~0.44 max among the random pairs) — the threshold must
    // recover exactly the planted pairs.
    "qX_dedup_embed" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      val planted = emb.select((col("vec_id") + 100000).as("vec_id"),
        concat(array(lit(0.0f)), slice(col("embedding"), 2, 10000)).as("embedding"))
      Dedup.embedCosinePairs(emb.unionAll(planted), "vec_id", "embedding", 0.9)
        .orderBy(desc("sim"), asc("id1"), asc("id2"))
    }),

    // embed-dedup SCALE path recall contract: LSH-bucketed pair mining
    // (the non-broadcast form of qX_dedup_embed) must recover every
    // planted identical copy — same vector ⇒ same signature ⇒ same
    // bucket, structurally guaranteed, verified at sim 1.0.
    "qX_dedup_embed_lsh_recall" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      val planted = emb.select((col("vec_id") + 100000).as("vec_id"),
        col("embedding"))
      val pairs = Dedup.embedLshPairs(emb.unionAll(planted),
        "vec_id", "embedding", minSim = 0.95, m = 12)
      emb.agg(count(lit(1)).as("n_planted"))
        .crossJoin(pairs
          .filter(col("id1") < 500 && col("id2") === col("id1") + 100000)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // multimodal pipeline end-to-end: documents as opaque binary media
    // (text bytes stand in for image payloads) → per-partition decode →
    // resize → feature extraction → ANN over the extracted embeddings.
    // The codec is the deterministic stub (no media libs in this
    // container — SURVEY/brief: stub the decode, make the Spark
    // plumbing real); rows-only at the gate, exact values pinned in
    // MultimodalGraphXSpec.
    "qX_multimodal_ann" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val media = Tables.load(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, text) =>
          MediaRecord(id, "image", text.getBytes("UTF-8"),
            MediaMeta("png", 8, 8, 3, 0L)) }
      val decoded = Multimodal.resize(Multimodal.decode(media), 4, 4)
      val features = Multimodal.extractFeatures(media, dim = 16).toDF()
        .join(decoded.toDF().select(col("id"), size(col("pixels")).as("px")), "id")
      val q = features.filter(col("id") < 3)
      Similarity.bruteForceTopK(q, features, "id", "embedding",
        "id", "embedding", 3)
    }),

    // multimodal recall contract: duplicate media payloads (+100000,
    // identical bytes) must extract identical features — the
    // deterministic codec seam guarantees it — so every planted query's
    // ANN top-1 is its source record at cosine 1.0. The oracle pins
    // n_recovered == n_planted without having to reproduce the codec
    // in SQL (the actual feature values stay pinned in
    // MultimodalGraphXSpec).
    "qX_multimodal_recall" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val media = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val rec = (i: Long) => MediaRecord(i, "image",
            text.getBytes("UTF-8"), MediaMeta("png", 8, 8, 3, 0L))
          Seq(rec(id), rec(id + 100000)) }
      val features = Multimodal.extractFeatures(media, dim = 16).toDF()
      val q = features.filter(col("id") >= 100000)
      val res = Similarity.bruteForceTopK(q, features.filter(col("id") < 100000),
        "id", "embedding", "id", "embedding", 1)
      q.agg(count(lit(1)).as("n_planted"))
        .crossJoin(res
          .filter(col("id") === col("qid") - 100000 && col("sim") === 1.0)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // Perceptual image near-dup (dHash) over the REAL codec seam:
    // deterministic bit-pattern PNGs (pattern = md5_32 of the source
    // doc id, so the oracle knows every expected hash without decoding
    // a pixel) + planted 2×-scaled re-rendered duplicates (+100000) →
    // ImageIo decode → area-resize 9×8 → dHash64 → banded Hamming
    // join. The area resample maps the scaled duplicate to the exact
    // same thumbnail, so every planted pair surfaces at dist 0 — and
    // the oracle replays hashes, banding, and distances from doc_id
    // arithmetic alone.
    "qX_image_dedup" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{Dedup, Multimodal}
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val ids = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
      val media = ids.flatMap { id =>
        val pat = graft.functions.expr.PortableHash.md5_32(id.toString)
        Seq(
          MediaRecord(id, "image",
            Multimodal.renderBitPatternPng(pat, 1), MediaMeta("png", 9, 8, 1, 0L)),
          MediaRecord(id + 100000, "image",
            Multimodal.renderBitPatternPng(pat, 2), MediaMeta("png", 18, 16, 1, 0L)))
      }
      Dedup.hammingBandPairs(Multimodal.imageDHash(media), maxDist = 3)
        .orderBy(col("id1"), col("id2"))
    }),

    // Audio near-dup over the REAL codec seam (the third face of the
    // perceptual family — text SimHash, image dHash/pHash, audio
    // energy-envelope hash, all on one banding core): deterministic
    // pattern WAVs (fingerprint = exact md5 function of doc_id) +
    // planted half-gain duplicates (+100000; power-of-two PCM scaling
    // keeps the envelope order exactly) → WavCodec decode →
    // audioHash64 → banded Hamming join — and the oracle replays
    // hashes, banding, and distances from doc_id arithmetic alone,
    // no audio decoding.
    "qX_audio_dedup" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{Dedup, Multimodal}
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val ids = Tables.load(s, dir, "documents").filter(col("doc_id") < 150)
        .select(col("doc_id")).as[Long]
      val media = ids.flatMap { id =>
        val pat = graft.functions.expr.PortableHash.md5_32(id.toString)
        Seq(
          MediaRecord(id, "audio",
            Multimodal.renderPatternWav(pat, 0), MediaMeta("wav", 0, 0, 1, 0L)),
          MediaRecord(id + 100000, "audio",
            Multimodal.renderPatternWav(pat, 1), MediaMeta("wav", 0, 0, 1, 0L)))
      }
      Dedup.hammingBandPairs(Multimodal.audioDHash(media), maxDist = 3)
        .orderBy(col("id1"), col("id2"))
    }),

    // Video near-dup over the REAL multi-frame path (animated GIF,
    // the JDK's one true video-ish decoder — the fourth face of the
    // perceptual family): 4-frame pattern GIFs whose per-frame dHash
    // is an exact md5 function of (doc_id, frame) + re-encoded
    // duplicates (+100000, identical frames → frac 1.0) + half-
    // overlap clips (+200000, frames 0-1 shared, 2-3 fresh → frac 0.5,
    // excluded at the 0.8 bar) → GifCodec decode → per-frame dHash →
    // frame-aligned banded join. Oracle replays everything from
    // doc_id arithmetic.
    // Shot-cut detection: clips render [A,A,B,B] pattern frames — the
    // only hash discontinuity is frame 2, and the oracle replays the
    // dHash (in)equality from md5 pattern arithmetic.
    "qX_scene_cuts" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val ids = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val media = ids.map { id =>
        def pat(k: Int) =
          graft.functions.expr.PortableHash.md5_32(id + ":" + k)
        MediaRecord(id, "video",
          Multimodal.renderPatternGif(Seq(pat(0), pat(0), pat(1), pat(1))),
          MediaMeta("gif", 9, 8, 1, 0L))
      }
      Multimodal.sceneCuts(Multimodal.videoDHash(media), maxDist = 0)
    }),

    "qX_video_dedup" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{Dedup, Multimodal}
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val ids = Tables.load(s, dir, "documents").filter(col("doc_id") < 100)
        .select(col("doc_id")).as[Long]
      val media = ids.flatMap { id =>
        def pat(src: Long, k: Int) =
          graft.functions.expr.PortableHash.md5_32(src + ":" + k)
        val full = (0 until 4).map(k => pat(id, k))
        val half = full.take(2) ++ (0 until 2).map(k => pat(id + 500000, k))
        val meta = MediaMeta("gif", 9, 8, 1, 0L)
        Seq(
          MediaRecord(id, "video",
            Multimodal.renderPatternGif(full), meta),
          MediaRecord(id + 100000, "video",
            Multimodal.renderPatternGif(full), meta),
          MediaRecord(id + 200000, "video",
            Multimodal.renderPatternGif(half), meta))
      }
      Dedup.frameHammingPairs(Multimodal.videoDHash(media),
          maxDist = 0, minMatchFrac = 0.8)
        .orderBy(col("id1"), col("id2"))
    }),

    // pHash (DCT) recall contract: pHash thresholds the 8×8 low-
    // frequency DCT block against its median, so a LINEAR brightness
    // change scales every coefficient and the median together — the
    // hash is exactly invariant. Plant half-brightness duplicates
    // (levels 254 → 127: power-of-two luma scaling is exact in IEEE,
    // so invariance is structural, not approximate) and assert the
    // banded join recovers every planted pair at dist 0. The robust
    // companion of qX_image_dedup's dHash (which keys on neighbor
    // ORDER and is what a re-encode preserves; pHash additionally
    // survives global brightness/contrast moves).
    "qX_image_phash" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.{Dedup, Multimodal}
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val ids = Tables.load(s, dir, "documents").filter(col("doc_id") < 150)
        .select(col("doc_id")).as[Long]
      val media = ids.flatMap { id =>
        val pat = graft.functions.expr.PortableHash.md5_32(id.toString)
        Seq(
          MediaRecord(id, "image",
            Multimodal.renderBitPatternPng(pat, 1, 254), MediaMeta("png", 9, 8, 1, 0L)),
          MediaRecord(id + 100000, "image",
            Multimodal.renderBitPatternPng(pat, 1, 127), MediaMeta("png", 9, 8, 1, 0L)))
      }
      val pairs = Dedup.hammingBandPairs(Multimodal.imagePHash(media), maxDist = 0)
      ids.toDF().agg(count(lit(1)).as("n_planted"))
        .crossJoin(pairs
          .filter(col("id1") < 100000 && col("id2") === col("id1") + 100000)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // k-means planted-cluster recovery contract (the LSH-recall
    // pattern applied to clustering): 8 groups of 25 IDENTICAL copies
    // of well-separated seed vectors (cross-group cosine ~0.4, within
    // 1.0). Farthest-first init picks one seed per group by
    // construction (any within-group candidate has max-cosine 1.0 to
    // the chosen set, any cross-group ~0.4), Lloyd keeps identical
    // vectors together (deterministic first-max argmax), so the fit
    // must recover: every group pure (1 cluster) and all 8 groups in
    // distinct clusters. The oracle pins all three counts to the
    // seed count without reproducing the fit in SQL.
    "qX_kmeans" -> ((s, dir) => {
      val seeds = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 8)
      val members = seeds
        .select(col("vec_id"), col("embedding"),
          explode(sequence(lit(0), lit(24))).as("j"))
        .select((col("vec_id") * 100 + col("j")).as("id"), col("embedding"))
      val (assigned, _) = Similarity.kmeansFit(members, "id", "embedding",
        k = 8, iters = 2, seedPool = 64)
      val pure = assigned.withColumn("grp", floor(col("id") / 100))
        .groupBy("grp").agg(countDistinct(col("cluster")).as("nc"))
        .filter(col("nc") === 1)
        .agg(count(lit(1)).as("n_pure"))
      seeds.agg(count(lit(1)).as("n_groups"))
        .crossJoin(pure)
        .crossJoin(assigned.agg(countDistinct(col("cluster")).as("n_clusters")))
    }),

    // SemDeDup end-to-end (kmeansFit -> per-cluster near-dup pruning):
    // exact copies (+100000) land in their source's cluster (identical
    // vector => identical deterministic assignment) and are dropped at
    // sim 1.0 >= 0.95, while the random originals never cross the
    // threshold (max random pair ~0.44, the qX_dedup_embed evidence) —
    // so the survivor set is EXACTLY the originals, a full-row oracle.
    "qX_semdedup" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      val planted = emb.select((col("vec_id") + 100000).as("vec_id"),
        col("embedding"))
      val (survivors, _) = Similarity.semDeDup(emb.unionAll(planted),
        "vec_id", "embedding", k = 8, threshold = 0.95, iters = 2,
        seedPool = 64)
      survivors.select(col("id")).orderBy(col("id"))
    }),

    // REAL-codec multimodal recall contract: the payloads are genuine
    // PNGs (rendered in the executors from doc-derived pixel levels),
    // decoded by the JDK's javax.imageio — no stub anywhere in this
    // path. PNG is lossless and the decoder deterministic, so identical
    // payloads embed identically and every planted twin (+100000) is
    // recovered at cosine 1.0. Same count-contract shape as
    // qX_multimodal_recall, now with actual image decoding.
    "qX_multimodal_real" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val media = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          // fold the FULL text hash into every pixel: cycling raw bytes
          // alone collides when two docs share a 64-byte prefix
          // (measured: 3/200 at sf0.01), which would break the
          // distinct-payload premise of the twin contract
          val h = java.util.Arrays.hashCode(bytes)
          val img = new java.awt.image.BufferedImage(8, 8,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          for (y <- 0 until 8; x <- 0 until 8) {
            val i = y * 8 + x
            val base = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xFF
            val v = (base + (h >>> (i % 24)) + i * 7) & 0xFF
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val payload = bos.toByteArray
          val rec = (i: Long) => MediaRecord(i, "image", payload,
            MediaMeta("png", 8, 8, 1, 0L))
          Seq(rec(id), rec(id + 100000))
        }
      val features = Multimodal.extractFeatures(media, dim = 16,
        codec = Multimodal.ImageIoCodec).toDF()
      val q = features.filter(col("id") >= 100000)
      val res = Similarity.bruteForceTopK(q, features.filter(col("id") < 100000),
        "id", "embedding", "id", "embedding", 1)
      q.agg(count(lit(1)).as("n_planted"))
        .crossJoin(res
          .filter(col("id") === col("qid") - 100000 && col("sim") === 1.0)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // REAL-codec AUDIO recall contract: genuine 16-bit PCM WAVs
    // (rendered in executors from doc-derived sample levels, full-text
    // hash folded in like qX_multimodal_real), decoded by the JDK's
    // javax.sound.sampled, RMS-window embedded, twin-recovered at
    // cosine 1.0 — no stub in the audio path either.
    "qX_multimodal_audio" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val media = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val h = java.util.Arrays.hashCode(bytes)
          val pcm = new Array[Byte](64 * 2) // 64 16-bit LE samples
          for (j <- 0 until 64) {
            val base = if (bytes.isEmpty) 0 else bytes(j % bytes.length) & 0xFF
            val v = (((base + (h >>> (j % 24)) + j * 7) & 0xFF) - 128) * 256
            pcm(2 * j) = (v & 0xFF).toByte
            pcm(2 * j + 1) = ((v >> 8) & 0xFF).toByte
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, 64)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          val payload = bos.toByteArray
          val rec = (i: Long) => MediaRecord(i, "audio", payload,
            MediaMeta("wav", 0, 0, 1, 8L))
          Seq(rec(id), rec(id + 100000))
        }
      val features = Multimodal.extractFeatures(media, dim = 8,
        codec = Multimodal.WavCodec).toDF()
      val q = features.filter(col("id") >= 100000)
      val res = Similarity.bruteForceTopK(q, features.filter(col("id") < 100000),
        "id", "embedding", "id", "embedding", 1)
      q.agg(count(lit(1)).as("n_planted"))
        .crossJoin(res
          .filter(col("id") === col("qid") - 100000 && col("sim") === 1.0)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // REAL-codec FRAME contract: genuine 3-frame animated GIFs
    // (rendered in executors, 256-gray indexed palette so the
    // write->decode round-trip is bit-exact; progressive off — the JDK
    // reader mis-decodes interlaced frames shorter than the 4 passes),
    // decoded by Multimodal.extractFrames/GifCodec. Pins: every doc
    // decodes to exactly 3 DISTINCT full-canvas frames, and every
    // planted twin's (+100000, same payload) frames match the
    // original's plane-for-plane — real multi-frame decoding, no
    // byte-slicing stub anywhere in the path.
    "qX_multimodal_frames" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.{MediaMeta, MediaRecord}
      val media = Tables.load(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .flatMap { case (id, text) =>
          val bytes = text.getBytes("UTF-8")
          val h = java.util.Arrays.hashCode(bytes)
          val cmap = (0 until 256)
            .map(i => (0xFF << 24) | (i << 16) | (i << 8) | i).toArray
          val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0,
            false, -1, java.awt.image.DataBuffer.TYPE_BYTE)
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          for (k <- 0 until 3) {
            val img = new java.awt.image.BufferedImage(8, 8,
              java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            for (y <- 0 until 8; x <- 0 until 8) {
              val i = y * 8 + x
              val base = if (bytes.isEmpty) 0 else bytes(i % bytes.length) & 0xFF
              img.getRaster.setSample(x, y, 0,
                (base + (h >>> (i % 24)) + i * 7 + k * 29) & 0xFF)
            }
            val param = writer.getDefaultWriteParam
            param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), param)
          }
          writer.endWriteSequence(); ios.close(); writer.dispose()
          val payload = bos.toByteArray
          val rec = (i: Long) => MediaRecord(i, "video", payload,
            MediaMeta("gif", 8, 8, 1, 3L))
          Seq(rec(id), rec(id + 100000))
        }
      val frames = Multimodal.extractFrames(media).toDF()
        .select(col("id"), col("frameNo"), hash(col("pixels")).as("fp"))
      val orig = frames.filter(col("id") < 100000)
      val framesets = orig.groupBy("id")
        .agg(count(lit(1)).as("nf"), countDistinct(col("fp")).as("nd"))
        .filter(col("nf") === 3 && col("nd") === 3)
        .agg(count(lit(1)).as("n_framesets"))
      val twin = frames.filter(col("id") >= 100000)
        .select((col("id") - 100000).as("id"), col("frameNo"),
          col("fp").as("fp2"))
      val recovered = orig.join(twin, Seq("id", "frameNo"))
        .filter(col("fp") === col("fp2"))
        .groupBy("id").agg(count(lit(1)).as("nm")).filter(col("nm") === 3)
        .agg(count(lit(1)).as("n_recovered"))
      orig.select(countDistinct(col("id")).as("n_docs"))
        .crossJoin(framesets).crossJoin(recovered)
    }),

    // Combined fit->index pipeline recall contract: kmeansFit centroids
    // feed ivfTopK, and every planted identical query must recover its
    // twin at nprobe=1 — same vector => same nearest centroid (identical
    // deterministic tie-break on both the corpus-assignment and
    // query-probe sides) => the probed cell contains the twin, which
    // tops the ranking at cosine 1.0. Gates the semDeDup/IVF wiring the
    // spec pins, driver-checked.
    "qX_kmeans_ivf" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 200)
        .select(col("vec_id"), col("embedding"))
      val (_, cents) = Similarity.kmeansFit(emb, "vec_id", "embedding",
        k = 4, iters = 2, seedPool = 64)
      val q = emb.select((col("vec_id") + 100000).as("vec_id"),
        col("embedding"))
      val res = Similarity.ivfTopK(q, emb, cents, "vec_id", "embedding",
        "vec_id", "embedding", k = 1, nprobe = 1)
      emb.agg(count(lit(1)).as("n_planted"))
        .crossJoin(res
          .filter(col("id") === col("qid") - 100000 && col("sim") === 1.0)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // Product-quantization ADC top-k with a FIXED codebook (subspace
    // slices of embedding rows 0..15) — encode + lookup-table scoring
    // are deterministic given the codebook, so the whole path is
    // SQL-expressible and fully oracle-checked, like qX_ann_ivf.
    "qX_pq" -> ((s, dir) => {
      import graft.operators.Pq
      val emb = Tables.load(s, dir, "embeddings")
      val cb = (0 until 4).map(sub =>
          emb.filter(col("vec_id") < 16)
            .select(lit(sub).as("sub"), col("vec_id").cast("int").as("cid"),
              slice(col("embedding"), sub * 16 + 1, 16).as("cvec")))
        .reduce(_.unionAll(_))
      val enc = Pq.pqEncode(emb, cb, "vec_id", "embedding")
      val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      Pq.pqTopK(q, enc, cb, "vec_id", "embedding", 5)
    }),

    // SQ8 scalar-quantized cosine top-k: per-dim byte codes from
    // corpus min/max ranges, reconstruction rebuilt in-flight from
    // the byte index — ranges, codes, and sims are all deterministic,
    // so the whole path is SQL-expressible and fully oracle-checked.
    "qX_sq8" -> ((s, dir) => {
      import graft.operators.Sq
      val emb = Tables.load(s, dir, "embeddings")
      val ranges = Sq.sq8Train(emb, "embedding")
      val enc = Sq.sq8Encode(emb, ranges, "vec_id", "embedding")
      val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      Sq.sq8TopK(q, enc, ranges, "vec_id", "embedding", 5)
    }),

    // PCA sufficient statistics: per-cell integer-micro moment table
    // (j = -1 rows carry first moments, i <= j rows the upper-triangle
    // raw second moments) — the ONE corpus scan behind pcaFit, exact
    // and engine-reproducible, so the distributed fold is fully
    // oracle-checked; the driver-side Jacobi eigensolve it feeds is
    // pinned by PcaSpec (planted-covariance recovery).
    "qX_pca_moments" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 200)
      graft.operators.Pca.moments(emb.select(col("embedding")), "embedding")
        .orderBy(col("i"), col("j"))
    }),

    // PCA projection plumbing with a FIXED arithmetic basis (Knuth
    // multiplicative-hash components — exact integer arithmetic in
    // both engines): per-term integer micros through the native
    // mat-vec codegen kernel's gate twin, so the projection scan is
    // fully oracle-checked; the trained-basis path is PcaSpec's
    // planted-axes recovery + project==projectHof bit-equality.
    // Sparse random projection 64→16 (Achlioptas {+1,−1,0} entries
    // from md5): data-free JL reduction, integer-micro exact terms —
    // the training-free sibling of qX_pca_project.
    "qX_random_projection" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 200)
      graft.operators.Pca.randomProject(emb, "vec_id", "embedding", 16, 64)
        .orderBy(col("vec_id"), col("component"))
    }),

    "qX_pca_project" -> ((s, dir) => {
      val basis = Array.tabulate(8, 64)((r, i) =>
        (((r * 64 + i).toLong * 2654435761L) % 1000L).toDouble / 1000.0 - 0.5)
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 200)
      graft.operators.Pca.projectMicro(emb, "vec_id", "embedding", basis)
        .orderBy(col("vec_id"), col("component"))
    }),

    // PQ TRAINED-codebook recall contract: planted twins (+100000,
    // identical vectors) must be recovered in the ADC top-5 — an
    // identical query shares its twin's codes, so the twin scores the
    // reconstruction's own cosine, and with 16 centroids per subspace
    // over 500 vectors the quantization error leaves the twin on top.
    // Deterministic end-to-end (hash-pool init, first-min argmin), so
    // the oracle pins recovered == planted.
    "qX_pq_recall" -> ((s, dir) => {
      import graft.operators.Pq
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      val cb = Pq.pqTrain(emb, "vec_id", "embedding",
        m = 4, ksub = 16, iters = 2, seedPool = 64)
      val enc = Pq.pqEncode(emb, cb, "vec_id", "embedding")
      val q = emb.filter(col("vec_id") < 100)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val res = Pq.pqTopK(q, enc, cb, "vec_id", "embedding", 5)
      q.agg(count(lit(1)).as("n_planted"))
        .crossJoin(res.filter(col("id") === col("qid") - 100000)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // OPQ (Ge 2013 parametric): PCA-rotate + balanced dim permutation
    // in front of the SAME trained-PQ path as qX_pq_recall — planted
    // identical twins must come back through rotate -> train ->
    // encode -> ADC (rotation is deterministic Jacobi, no RNG, so the
    // whole pipeline replays; recovered == planted is the contract).
    "qX_opq" -> ((s, dir) => {
      import graft.operators.Pq
      val emb = Tables.load(s, dir, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      val rot = Pq.opqFit(emb, "embedding", 4)
      val remb = Pq.opqRotate(emb, "embedding", rot)
      val cb = Pq.pqTrain(remb, "vec_id", "embedding",
        m = 4, ksub = 16, iters = 2, seedPool = 64)
      val enc = Pq.pqEncode(remb, cb, "vec_id", "embedding")
      val q = remb.filter(col("vec_id") < 100)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
      val res = Pq.pqTopK(q, enc, cb, "vec_id", "embedding", 5)
      q.agg(count(lit(1)).as("n_planted"))
        .crossJoin(res.filter(col("id") === col("qid") - 100000)
          .agg(count(lit(1)).as("n_recovered")))
    }),

    // IVF-PQ: coarse cells (vec_id < 8 centroids, the qX_ann_ivf
    // table) stacked under PQ codes (vec_id < 16 codebook, the qX_pq
    // table) — nprobe=2 cell pruning bounds candidates, ADC bounds
    // per-candidate cost. Both quantizers fixed → fully SQL-expressible.
    "qX_ivfpq" -> ((s, dir) => {
      import graft.operators.Pq
      val emb = Tables.load(s, dir, "embeddings")
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val cb = (0 until 4).map(sub =>
          emb.filter(col("vec_id") < 16)
            .select(lit(sub).as("sub"), col("vec_id").cast("int").as("cid"),
              slice(col("embedding"), sub * 16 + 1, 16).as("cvec")))
        .reduce(_.unionAll(_))
      val enc = Pq.ivfPqEncode(emb, cents, cb, "vec_id", "embedding")
      val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      Pq.ivfPqTopK(q, enc, cb, cents, "vec_id", "embedding", 5, 2)
    }),

    // IVF-probed ANN (centroid cells + nprobe pruning) — deterministic
    // given the centroid table, so fully oracle-checked unlike the
    // hash-based ANN paths.
    "qX_ann_ivf" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      Similarity.ivfTopK(q, emb, centroids, "vec_id", "embedding",
        "vec_id", "embedding", 5, 2)
    }),

    // STREAMING IVF index maintenance, oracle-gated (X70 promoted —
    // the last streaming row with a SQL-replayable final table): fold
    // the embeddings through a cell-bucketed BucketStore in 2
    // vec_id-shard micro-batches, then an UPDATE batch that
    // re-ingests every 17th id with its NEIGHBOR's embedding — the
    // updated vector can land in a different cell, exercising the
    // pk-sidecar LWW path (the stale row in the prior cell must
    // vanish). The 4th batch then REPLAYS (assignment is
    // deterministic, so the id-keyed LWW collapses the redelivery —
    // a duplicate or resurrected stale row hash-mismatches). The
    // gated table is the store's (id, cell) assignment; the oracle
    // recomputes LWW winners + nearest-centroid cells directly. The
    // ANN read path over the same store (ivfQueryStored) stays
    // spec-pinned in StreamingSpec.
    "qX_stream_ivf" -> ((s, dir) => {
      import graft.streaming.CardStream
      val fold = s.newSession()
      fold.conf.set("spark.sql.shuffle.partitions", "2")
      // per-trigger folds are fixed-job-chain bound: AQE would turn
      // every exchange into its own job + replan (the small-session
      // measurement in Bench) for data that is micro-batch tiny
      fold.conf.set("spark.sql.adaptive.enabled", "false")
      // planner-chosen broadcasts on micro-batch-tiny frames each
      // build as their own job; a 2-partition shuffled-hash join runs
      // inside the fold's ONE job (explicit broadcast() hints — the
      // scale-correct centroid/model tables — are unaffected)
      fold.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      fold.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      val emb = Tables.load(fold, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint(true)
      val centroids = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      // the update shard: ids ≡ 0 (mod 17) re-ingest with the
      // NEIGHBOR (vec_id+1) embedding; ids whose neighbor does not
      // exist are not re-ingested (inner join), matching the oracle's
      // LEFT JOIN fallback to the original vector
      val nextVec = emb.select((col("vec_id") - 1).as("vec_id"),
        col("embedding").as("nv"))
      val updated = emb.join(nextVec, "vec_id")
        .filter(pmod(col("vec_id"), lit(17L)) === 0)
        .select(col("vec_id"), col("nv").as("embedding"))
      GateTmp.withStore("graft-ivfgate") { root =>
        val store = root + "/ivf"
        (0 to 1).foreach { i =>
          CardStream.ivfMerge(fold,
            emb.filter(pmod(col("vec_id"), lit(2L)) === i),
            centroids, store, "vec_id", "embedding",
            batchId = i.toLong, storeBuckets = 8)
        }
        CardStream.ivfMerge(fold, updated, centroids, store,
          "vec_id", "embedding", batchId = 2L, storeBuckets = 8)
        // at-least-once redelivery of the update batch: LWW no-op
        CardStream.ivfMerge(fold, updated, centroids, store,
          "vec_id", "embedding", batchId = 2L, storeBuckets = 8)
        // materialize BEFORE the helper deletes the tmpfs store
        CardStream.ivfStored(s, store)
          .select(col("id"), col("cell"))
          .orderBy(col("id"))
          .localCheckpoint(true)
      }
    }))

  /** Unrolled MMR oracle: candidate top-`nCand` per query + complete
    * candidate-pair sims, then `k` greedy rounds — the exact replay of
    * [[graft.operators.Similarity.mmr]] at λ = 0.5 (every objective is
    * one multiply-subtract of 4-decimal-rounded doubles; no folds). */
  private def mmrSql(nCand: Int, k: Int): String = {
    val head =
      s"""WITH q AS (
         |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
         |  FROM embeddings WHERE vec_id < 5),
         |sims AS (
         |  SELECT q.qid, e.vec_id AS id,
         |    round(list_cosine_similarity(q.qvec,
         |      CAST(e.embedding AS DOUBLE[])), 4) AS simq,
         |    CAST(e.embedding AS DOUBLE[]) AS vec
         |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
         |cand AS MATERIALIZED (SELECT qid, id, simq, vec FROM (
         |  SELECT qid, id, simq, vec, row_number() OVER (
         |    PARTITION BY qid ORDER BY simq DESC, id) AS rn FROM sims) x
         |  WHERE rn <= $nCand),
         |pairs AS MATERIALIZED (
         |  SELECT a.qid, a.id AS a, b.id AS b,
         |    round(list_cosine_similarity(a.vec, b.vec), 4) AS simp
         |  FROM cand a JOIN cand b ON a.qid = b.qid AND a.id <> b.id),
         |p1 AS (SELECT qid, id, mmr FROM (
         |  SELECT qid, id, round(0.5 * simq - 0.5 * 0.0, 4) AS mmr,
         |    row_number() OVER (PARTITION BY qid
         |      ORDER BY round(0.5 * simq - 0.5 * 0.0, 4) DESC, id) AS rn
         |  FROM cand) x WHERE rn = 1),
         |sel1 AS (SELECT qid, 1 AS step, id, mmr FROM p1)""".stripMargin
    val rounds = (2 to k).map { j =>
      s"""rem$j AS (SELECT c.* FROM cand c WHERE NOT EXISTS (
         |  SELECT 1 FROM sel${j - 1} s WHERE s.qid = c.qid AND s.id = c.id)),
         |mx$j AS (SELECT r.qid, r.id, max(p.simp) AS ms
         |  FROM rem$j r JOIN sel${j - 1} s ON s.qid = r.qid
         |  JOIN pairs p ON p.qid = r.qid AND p.a = r.id AND p.b = s.id
         |  GROUP BY 1, 2),
         |p$j AS (SELECT qid, id, mmr FROM (
         |  SELECT m.qid, m.id, round(0.5 * r.simq - 0.5 * m.ms, 4) AS mmr,
         |    row_number() OVER (PARTITION BY m.qid
         |      ORDER BY round(0.5 * r.simq - 0.5 * m.ms, 4) DESC, m.id) AS rn
         |  FROM mx$j m JOIN rem$j r ON r.qid = m.qid AND r.id = m.id) x
         |  WHERE rn = 1),
         |sel$j AS (SELECT * FROM sel${j - 1}
         |  UNION ALL SELECT qid, $j AS step, id, mmr FROM p$j)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT qid, step, id, mmr FROM sel$k ORDER BY qid, step"
  }

  /** RRF hybrid oracle fragment: the qX_batch_search lexical pipeline
    * + the qX_ann_cosine dense pipeline, each rank-limited to 10,
    * fused with integer-micro `floor(1e6/(60+rank))` contributions —
    * ends at CTE `franked` (the fused ranking; `dranked` = the dense
    * ground-truth ranking is also live). Shared by the qX_rrf_hybrid
    * and qX_ndcg gates. */
  /** Unrolled replay of [[graft.operators.Similarity.nnDescent]]
    * (m = 4 md5 planes, k = 5): LSH-bucket init, then per round the
    * symmetrized hop-2 candidate join + quantized-cosine top-5. */
  private def NnDescentSql(rounds: Int): String = {
    val head =
      """WITH planes AS (
        |  SELECT p.p AS p, list_transform(range(64), d ->
        |    CAST(CAST(('0x' || substr(md5('hp:' || CAST(p.p AS VARCHAR) || ':' ||
        |      CAST(d AS VARCHAR)), 1, 8)) AS BIGINT) % 1048576 AS DOUBLE)
        |      / 1048576.0 - 0.5) AS plane
        |  FROM (SELECT unnest(range(4)) AS p) p),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec
        |  FROM embeddings),
        |sigs AS (
        |  SELECT e.vec_id, sum(CASE WHEN list_dot_product(e.vec, pl.plane) > 0
        |      THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS sig
        |  FROM e CROSS JOIN planes pl GROUP BY 1),
        |c0 AS (SELECT a.vec_id AS id, c.vec_id AS nb
        |  FROM sigs a JOIN sigs c ON a.sig = c.sig AND a.vec_id <> c.vec_id),
        |s0 AS (SELECT c.id, c.nb,
        |    round(list_cosine_similarity(e1.vec, e2.vec), 4) AS sim
        |  FROM c0 c JOIN e e1 ON e1.vec_id = c.id
        |  JOIN e e2 ON e2.vec_id = c.nb),
        |k0 AS (SELECT id, nb, sim FROM (SELECT id, nb, sim, row_number()
        |    OVER (PARTITION BY id ORDER BY sim DESC, nb) AS rn FROM s0) x
        |  WHERE rn <= 5)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""a$r AS (SELECT id, nb FROM k${r - 1}
         |  UNION SELECT nb AS id, id AS nb FROM k${r - 1}),
         |h$r AS (SELECT DISTINCT x.id, y.nb FROM a$r x JOIN a$r y
         |  ON y.id = x.nb WHERE x.id <> y.nb),
         |c$r AS (SELECT id, nb FROM k${r - 1}
         |  UNION SELECT id, nb FROM h$r),
         |s$r AS (SELECT c.id, c.nb,
         |    round(list_cosine_similarity(e1.vec, e2.vec), 4) AS sim
         |  FROM c$r c JOIN e e1 ON e1.vec_id = c.id
         |  JOIN e e2 ON e2.vec_id = c.nb),
         |k$r AS (SELECT id, nb, sim FROM (SELECT id, nb, sim, row_number()
         |    OVER (PARTITION BY id ORDER BY sim DESC, nb) AS rn FROM s$r) x
         |  WHERE rn <= 5)""".stripMargin
    }
    (Seq(head) ++ rs).mkString(",\n") +
      s"\nSELECT id, nb, sim FROM k$rounds ORDER BY id, sim DESC, nb"
  }

  private val RrfHybridCte =
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
      |lscored AS (
      |  SELECT q.qid, tf.doc AS id,
      |    CAST(sum(CAST(round(tf.tf * idf.idf * 1000) AS BIGINT))
      |      AS BIGINT) AS score
      |  FROM q JOIN tf USING (term) JOIN idf USING (term)
      |  WHERE tf.doc <> q.qid GROUP BY 1, 2),
      |lranked AS (SELECT qid, id, row_number() OVER (
      |  PARTITION BY qid ORDER BY score DESC, id) AS rn FROM lscored),
      |qv AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
      |  FROM embeddings WHERE vec_id < 5),
      |dsims AS (SELECT qv.qid, e.vec_id AS id,
      |    round(list_cosine_similarity(qv.qvec,
      |      CAST(e.embedding AS DOUBLE[])), 4) AS sim
      |  FROM qv, embeddings e WHERE e.vec_id <> qv.qid),
      |dranked AS (SELECT qid, id, row_number() OVER (
      |  PARTITION BY qid ORDER BY sim DESC, id) AS rn FROM dsims),
      |contrib AS (
      |  SELECT qid, id, CAST(floor(1e6 / (60 + rn)) AS BIGINT) AS c
      |  FROM lranked WHERE rn <= 10
      |  UNION ALL
      |  SELECT qid, id, CAST(floor(1e6 / (60 + rn)) AS BIGINT) AS c
      |  FROM dranked WHERE rn <= 10),
      |fused AS (SELECT qid, id, CAST(sum(c) AS BIGINT) AS rrf_micros
      |  FROM contrib GROUP BY 1, 2),
      |franked AS (SELECT qid, id, rrf_micros, row_number() OVER (
      |  PARTITION BY qid ORDER BY rrf_micros DESC, id) AS rn FROM fused)""".stripMargin

  /** Unrolled team-draft oracle for [[qX_interleave]]: per step the
    * team counts, the md5 coin on ties, and the (rnk, id) argmin over
    * the not-yet-selected run — the exact replay of
    * [[graft.operators.Hybrid.teamDraft]]. */
  private def teamDraftSql(k: Int): String = {
    val head = RrfHybridCte + """,
      |runs AS (SELECT qid, id, rn AS rnk, 'A' AS team FROM lranked
      |    WHERE rn <= 10
      |  UNION ALL
      |  SELECT qid, id, rn, 'B' FROM dranked WHERE rn <= 10),
      |qids AS (SELECT DISTINCT qid FROM runs),
      |s0 AS (SELECT qid, 0 AS pos, id, team FROM runs WHERE 1 = 0)""".stripMargin
    val steps = (1 to k).map { t =>
      s"""t$t AS (SELECT q.qid,
         |  CASE WHEN coalesce(c.na, 0) < coalesce(c.nb, 0) THEN 'A'
         |       WHEN coalesce(c.na, 0) > coalesce(c.nb, 0) THEN 'B'
         |       WHEN CAST(('0x' || substr(md5('td:' ||
         |         CAST(q.qid AS VARCHAR) || ':$t'), 1, 8)) AS BIGINT)
         |         % 2 = 0 THEN 'A'
         |       ELSE 'B' END AS team
         |  FROM qids q LEFT JOIN (SELECT qid,
         |      sum(CASE WHEN team = 'A' THEN 1 ELSE 0 END) AS na,
         |      sum(CASE WHEN team = 'B' THEN 1 ELSE 0 END) AS nb
         |    FROM s${t - 1} GROUP BY 1) c USING (qid)),
         |p$t AS (SELECT r.qid, $t AS pos, r.id, r.team FROM runs r
         |  JOIN t$t tt ON tt.qid = r.qid
         |  WHERE NOT EXISTS (SELECT 1 FROM s${t - 1} s
         |    WHERE s.qid = r.qid AND s.id = r.id)
         |  QUALIFY row_number() OVER (PARTITION BY r.qid
         |    ORDER BY CASE WHEN r.team = tt.team THEN 0 ELSE 1 END,
         |      r.rnk, r.id) = 1),
         |s$t AS (SELECT * FROM s${t - 1} UNION ALL SELECT * FROM p$t)""".stripMargin
    }
    ((head +: steps).mkString(",\n")) +
      s"\nSELECT qid, pos, id, team FROM s$k ORDER BY qid, pos"
  }

  /** nDCG@10 oracle: the fused run scored against graded dense ground
    * truth (rel = 11 − dense rank) with integer-micro log2 discounts —
    * the exact arithmetic of [[graft.operators.Eval.ndcgAtK]]. */
  private val NdcgSql =
    RrfHybridCte + """,
      |run AS (SELECT qid, id, rrf_micros AS score FROM franked
      |  WHERE rn <= 10),
      |rrank AS (SELECT qid, id, row_number() OVER (
      |  PARTITION BY qid ORDER BY score DESC, id) AS rank FROM run),
      |qrels AS (SELECT qid, id, CAST(11 - rn AS BIGINT) AS rel
      |  FROM dranked WHERE rn <= 10),
      |dcg AS (SELECT r.qid,
      |  CAST(sum(CAST(floor(1e6 * coalesce(q.rel, 0) / log2(r.rank + 1))
      |    AS BIGINT)) AS BIGINT) AS dcg_micros
      |  FROM rrank r LEFT JOIN qrels q ON q.qid = r.qid AND q.id = r.id
      |  GROUP BY 1),
      |ideal AS (SELECT qid, rel, row_number() OVER (
      |  PARTITION BY qid ORDER BY rel DESC, id) AS rank FROM qrels),
      |idcg AS (SELECT qid,
      |  CAST(sum(CAST(floor(1e6 * rel / log2(rank + 1)) AS BIGINT))
      |    AS BIGINT) AS idcg_micros
      |  FROM ideal WHERE rank <= 10 GROUP BY 1)
      |SELECT dcg.qid, dcg_micros, idcg_micros,
      |  CAST(floor(1e6 * dcg_micros / idcg_micros) AS BIGINT) AS ndcg_micros
      |FROM dcg JOIN idcg USING (qid) ORDER BY dcg.qid""".stripMargin

  /** Shared CTE prefix of the MinHash-LSH pair derivation over the
    * planted-truncation corpus — `base` → shingles → md5 minhash
    * signatures → band keys → candidates → verified intersections.
    * Consumed by qX_dedup_minhash (the pair gate) and
    * qX_stream_neardup (the streaming survivor gate). */
  private def minhashPairCtes(limit: Int): String =
    raw"""WITH base AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id < $limit
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, substr(text, 1, 200) AS text
      |  FROM documents WHERE doc_id < $limit),
      |d AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
      |  FROM base),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(len(toks), 2)),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS sh
      |  FROM d WHERE len(toks) >= 2),
      |posts AS (SELECT doc_id, unnest(sh) AS s FROM sh),
      |hv AS (
      |  SELECT doc_id,
      |    CAST(('0x' || substr(md5(s), 1, 8)) AS BIGINT) % 2147483647 AS hv
      |  FROM posts),
      |perms AS (
      |  SELECT i.i AS i,
      |    CAST(('0x' || substr(md5('mh_a:' || CAST(i.i AS VARCHAR)), 1, 8)) AS BIGINT)
      |      % 2147483646 + 1 AS a,
      |    CAST(('0x' || substr(md5('mh_b:' || CAST(i.i AS VARCHAR)), 1, 8)) AS BIGINT)
      |      % 2147483647 AS b
      |  FROM (SELECT unnest(range(64)) AS i) i),
      |sigs AS (
      |  SELECT hv.doc_id, p.i, min((hv.hv * p.a + p.b) % 2147483647) AS sig
      |  FROM hv CROSS JOIN perms p GROUP BY 1, 2),
      |bandstr AS (
      |  SELECT doc_id, i // 4 AS band,
      |    string_agg(CAST(sig AS VARCHAR), '_' ORDER BY i) AS bs
      |  FROM sigs GROUP BY 1, 2),
      |keys AS (
      |  SELECT doc_id, band,
      |    CAST(('0x' || substr(md5(bs), 1, 8)) AS BIGINT) AS key
      |  FROM bandstr),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |  FROM keys a JOIN keys b
      |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      |ver AS (
      |  SELECT c.id1, c.id2, len(list_intersect(s1.sh, s2.sh)) AS inter,
      |    len(s1.sh) AS n1, len(s2.sh) AS n2
      |  FROM cand c
      |  JOIN sh s1 ON s1.doc_id = c.id1
      |  JOIN sh s2 ON s2.doc_id = c.id2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "qX_mmr" -> mmrSql(nCand = 20, k = 5),
    // full probe ≡ brute force: identical unrolled greedy oracle
    "qX_mmr_indexed" -> mmrSql(nCand = 20, k = 5),
    "qX_rrf_hybrid" ->
      (RrfHybridCte + """
        |SELECT qid, id, rrf_micros FROM franked WHERE rn <= 10
        |ORDER BY qid, rrf_micros DESC, id""".stripMargin),
    "qX_ndcg" -> NdcgSql,
    "qX_interleave" -> teamDraftSql(6),
    // MRR/P/R@10 of the fused run vs dense top-3 relevant set — the
    // rank comes from franked's rn (identical (score desc, id) order)
    "qX_rank_metrics" -> (RrfHybridCte + """,
      |qrels AS (SELECT qid, id FROM dranked WHERE rn <= 3),
      |nrel AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY 1),
      |hits AS (SELECT f.qid, count(*) AS n_hit, min(f.rn) AS first_rank
      |  FROM franked f JOIN qrels q ON f.qid = q.qid AND f.id = q.id
      |  WHERE f.rn <= 10 GROUP BY 1)
      |SELECT n.qid, n.n_rel, COALESCE(h.n_hit, 0) AS n_hit,
      |  COALESCE(CAST(floor(1e6 / h.first_rank) AS BIGINT),
      |    CAST(0 AS BIGINT)) AS mrr_micros,
      |  CAST(floor(1e6 * COALESCE(h.n_hit, 0) / 10) AS BIGINT)
      |    AS prec_micros,
      |  CAST(floor(1e6 * COALESCE(h.n_hit, 0) / n.n_rel) AS BIGINT)
      |    AS recall_micros
      |FROM nrel n LEFT JOIN hits h USING (qid)
      |ORDER BY n.qid""".stripMargin),
    // AP@10 of the same fused run vs the dense top-3 relevant set —
    // the rank in franked's rn IS the (score desc, id) re-rank.
    "qX_avg_precision" -> (RrfHybridCte + """,
      |qrels AS (SELECT qid, id FROM dranked WHERE rn <= 3),
      |nrel AS (SELECT qid, count(*) AS n_rel FROM qrels GROUP BY 1),
      |marked AS (SELECT f.qid, f.rn AS rank,
      |    CASE WHEN q.id IS NULL THEN 0 ELSE 1 END AS hit
      |  FROM franked f LEFT JOIN qrels q ON q.qid = f.qid AND q.id = f.id
      |  WHERE f.rn <= 10),
      |cum AS (SELECT qid, rank, hit, sum(hit) OVER (PARTITION BY qid
      |    ORDER BY rank ROWS UNBOUNDED PRECEDING) AS c FROM marked),
      |terms AS (SELECT qid,
      |    CAST(sum(CAST(floor(1e6 * c / rank) AS BIGINT)) AS BIGINT)
      |      AS sum_prec,
      |    count(*) AS n_hit
      |  FROM cum WHERE hit = 1 GROUP BY 1)
      |SELECT n.qid, CAST(n.n_rel AS BIGINT) AS n_rel,
      |  CAST(COALESCE(t.n_hit, 0) AS BIGINT) AS n_hit,
      |  CAST(COALESCE(floor(t.sum_prec / least(n.n_rel, 10)), 0)
      |    AS BIGINT) AS ap_micros
      |FROM nrel n LEFT JOIN terms t USING (qid)
      |ORDER BY n.qid""".stripMargin),
    "qX_kmeans" ->
      """SELECT count(*) AS n_groups, count(*) AS n_pure,
        |  count(*) AS n_clusters
        |FROM embeddings WHERE vec_id < 8""".stripMargin,
    "qX_semdedup" ->
      """SELECT vec_id AS id FROM embeddings WHERE vec_id < 500
        |ORDER BY vec_id""".stripMargin,
    "qX_kmeans_ivf" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM embeddings WHERE vec_id < 200""".stripMargin,
    "qX_multimodal_real" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "qX_multimodal_audio" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "qX_multimodal_frames" ->
      """SELECT count(*) AS n_docs, count(*) AS n_framesets,
        |  count(*) AS n_recovered
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "qX_dedup_minhash_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_exact_recovered,
        |  count(*) AS n_near_recovered
        |FROM documents WHERE doc_id < 1000""".stripMargin,
    "qX_dedup_simhash_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM documents WHERE doc_id < 1000""".stripMargin,
    "qX_prototypes" ->
      """WITH c AS (
        |  SELECT label, d.d + 1 AS dim,
        |    CAST(round(1e6 * CAST(embedding[d.d + 1] AS DOUBLE))
        |      AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS d) d)
        |SELECT label, dim,
        |  CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)
        |    AS mean_micros
        |FROM c GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,
    "qX_proto_acc" ->
      """WITH c AS (
        |  SELECT vec_id AS id, label, d.d + 1 AS dim,
        |    CAST(round(1e6 * CAST(embedding[d.d + 1] AS DOUBLE))
        |      AS BIGINT) AS v
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS d) d),
        |p AS (SELECT label AS plabel, dim,
        |    CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)
        |      AS m
        |  FROM c GROUP BY 1, 2),
        |s AS (SELECT c.id, c.label, p.plabel,
        |    CAST(sum(c.v * p.m) AS BIGINT) AS dot,
        |    CAST(sum(c.v * c.v) AS BIGINT) AS n2,
        |    CAST(sum(p.m * p.m) AS BIGINT) AS p2
        |  FROM c JOIN p USING (dim) GROUP BY 1, 2, 3),
        |sim AS (SELECT id, label, plabel,
        |    CAST(floor(1e6 * (CAST(dot AS DOUBLE) /
        |      sqrt(CAST(n2 AS DOUBLE) * CAST(p2 AS DOUBLE)))) AS BIGINT)
        |      AS sim
        |  FROM s),
        |b AS (SELECT id, label, plabel AS pred, row_number() OVER (
        |  PARTITION BY id ORDER BY sim DESC, plabel) AS rn FROM sim),
        |agg AS (SELECT count(*) AS n,
        |  CAST(sum(CASE WHEN label = pred THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_correct
        |  FROM b WHERE rn = 1)
        |SELECT n, n_correct,
        |  CAST(floor(1000000 * n_correct / n) AS BIGINT) AS acc_micros
        |FROM agg""".stripMargin,
    "qX_kendall" ->
      (RrfHybridCte + """,
        |common AS (SELECT l.qid, l.id, l.rn AS ra, d.rn AS rb
        |  FROM (SELECT qid, id, rn FROM lranked WHERE rn <= 10) l
        |  JOIN (SELECT qid, id, rn FROM dranked WHERE rn <= 10) d
        |  USING (qid, id)),
        |nc AS (SELECT q.qid, CAST(coalesce(c.n, 0) AS BIGINT) AS n_common
        |  FROM (SELECT DISTINCT qid FROM lranked) q
        |  LEFT JOIN (SELECT qid, count(*) AS n FROM common GROUP BY 1) c
        |  USING (qid)),
        |agg AS (SELECT a.qid,
        |    CAST(sum(CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) > 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |    CAST(sum(CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) < 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS discordant
        |  FROM common a JOIN common b ON a.qid = b.qid AND a.id < b.id
        |  GROUP BY 1)
        |SELECT nc.qid, CAST(nc.n_common AS BIGINT) AS n_common,
        |  coalesce(agg.concordant, 0) AS concordant,
        |  coalesce(agg.discordant, 0) AS discordant,
        |  CAST(CASE WHEN coalesce(agg.concordant, 0)
        |      + coalesce(agg.discordant, 0) > 0
        |    THEN round(1e6 * (agg.concordant - agg.discordant)
        |               / (agg.concordant + agg.discordant))
        |    ELSE 0 END AS BIGINT) AS tau_micros
        |FROM nc LEFT JOIN agg USING (qid) ORDER BY nc.qid""".stripMargin),
    "qX_rbo" ->
      (RrfHybridCte + """,
        |ra AS (SELECT qid, id, rn AS r FROM lranked WHERE rn <= 10),
        |rb AS (SELECT qid, id, rn AS r FROM dranked WHERE rn <= 10),
        |mm AS (SELECT a.qid, greatest(a.r, b.r) AS m
        |  FROM ra a JOIN rb b ON a.qid = b.qid AND a.id = b.id),
        |qq AS (SELECT DISTINCT qid FROM ra),
        |dd AS (SELECT unnest(range(1, 11)) AS d),
        |xd AS (SELECT q.qid, dd.d,
        |  CAST(sum(CASE WHEN mm.m <= dd.d THEN 1 ELSE 0 END) AS BIGINT)
        |    AS xd
        |  FROM qq q CROSS JOIN dd LEFT JOIN mm ON mm.qid = q.qid
        |  GROUP BY 1, 2),
        |tm AS (SELECT qid,
        |  CAST(floor(1e6 * xd / (pow(2.0, d) * d)) AS BIGINT) AS term
        |  FROM xd)
        |SELECT qid, CAST(sum(term) AS BIGINT) AS rbo_micros FROM tm
        |GROUP BY 1 ORDER BY qid""".stripMargin),
    "qX_nndescent" -> NnDescentSql(2),
    "qX_nndescent_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM embeddings WHERE vec_id < 100""".stripMargin,
    "qX_dbscan" ->
      """WITH RECURSIVE base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 50),
        |p1 AS (SELECT vec_id + 100000 AS vec_id,
        |  list_prepend(0.0, v[2:]) AS v FROM base),
        |p2 AS (SELECT vec_id + 200000 AS vec_id,
        |  list_prepend(0.0, v[2:]) AS v FROM base),
        |allv AS (SELECT * FROM base UNION ALL SELECT * FROM p1
        |  UNION ALL SELECT * FROM p2),
        |e AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2
        |  FROM allv a JOIN allv b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.9),
        |sym AS (SELECT id1 AS id, id2 AS nb FROM e
        |  UNION ALL SELECT id2, id1 FROM e),
        |core AS (SELECT id FROM (SELECT id, count(*) AS nnb FROM sym
        |  GROUP BY 1) x WHERE nnb + 1 >= 3),
        |cs AS (SELECT e.id1 AS f, e.id2 AS t FROM e
        |    JOIN core c1 ON c1.id = e.id1 JOIN core c2 ON c2.id = e.id2
        |  UNION
        |  SELECT e.id2, e.id1 FROM e
        |    JOIN core c1 ON c1.id = e.id1 JOIN core c2 ON c2.id = e.id2),
        |reach AS (SELECT f AS id, t AS r FROM cs
        |  UNION SELECT cs.f, reach.r FROM cs JOIN reach ON reach.id = cs.t),
        |comp AS (SELECT id, least(id, min(r)) AS comp FROM reach
        |  GROUP BY id),
        |cclust AS (SELECT c.id, coalesce(comp.comp, c.id) AS cluster
        |  FROM core c LEFT JOIN comp ON comp.id = c.id),
        |borders AS (SELECT s.id, min(cc.cluster) AS cluster
        |  FROM sym s JOIN cclust cc ON cc.id = s.nb
        |  WHERE s.id NOT IN (SELECT id FROM core) GROUP BY s.id),
        |lab AS (SELECT id, cluster, 'core' AS role FROM cclust
        |  UNION ALL SELECT id, cluster, 'border' FROM borders)
        |SELECT a.vec_id AS id, coalesce(l.cluster, -1) AS cluster,
        |  coalesce(l.role, 'noise') AS role
        |FROM allv a LEFT JOIN lab l ON l.id = a.vec_id
        |ORDER BY id""".stripMargin,
    "qX_bq_rerank" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        |ham AS (
        |  SELECT q.qid, c.vec_id AS id, c.v,
        |    len(list_filter(range(len(q.qv)),
        |      i -> (q.qv[i + 1] >= 0) <> (c.v[i + 1] >= 0))) AS h
        |  FROM q, e c WHERE c.vec_id <> q.qid),
        |short AS (
        |  SELECT qid, id, v, row_number() OVER (
        |    PARTITION BY qid ORDER BY h, id) AS rn
        |  FROM ham),
        |rer AS (
        |  SELECT s.qid, s.id,
        |    round(list_cosine_similarity(q.qv, s.v), 4) AS sim
        |  FROM short s JOIN q USING (qid) WHERE s.rn <= 50),
        |ranked AS (
        |  SELECT qid, id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, id) AS rn
        |  FROM rer)
        |SELECT qid, id, sim FROM ranked WHERE rn <= 5
        |ORDER BY qid, sim DESC, id""".stripMargin,
    "qX_bq_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM embeddings WHERE vec_id < 100""".stripMargin,
    "qX_ann_lsh_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM embeddings WHERE vec_id < 100""".stripMargin,
    "qX_multimodal_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "qX_dedup_embed_lsh_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM embeddings WHERE vec_id < 500""".stripMargin,
    // Full replay of the MinHash+LSH pipeline: md5-hashed shingles into
    // the Mersenne field, 64 md5-derived affine permutations, 16 bands
    // of 4 rows keyed by md5_32 of the '_'-joined slice, candidate
    // self-join, exact Jaccard verification — bit-for-bit the Spark
    // plan's arithmetic (see Dedup.minhashSignature / lshBands).
    "qX_dedup_minhash" ->
      s"""${minhashPairCtes(1000)}
        |SELECT id1, id2,
        |  round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 4) AS jaccard
        |FROM ver
        |WHERE round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 4) >= 0.5
        |ORDER BY jaccard DESC, id1 ASC, id2 ASC LIMIT 500""".stripMargin,

    // Survivor set of the streaming fold, replayed with the TRUE
    // sequential semantics unrolled over the 3 ascending-id batches:
    // per batch, (1) drop the id2 of every verified pair WITHIN the
    // batch (minhashLshPairs' drop-if-any-smaller, blind to the
    // partner's own fate), then (2) drop what verifies against any
    // previously ACCEPTED doc — NOT against previously dropped docs
    // (first-arrival-wins does not chain through suppressed history:
    // doc 100045 pairs only with the suppressed 267 and survives,
    // which the naive global drop-any-id2 form gets wrong).
    "qX_stream_neardup" ->
      s"""${minhashPairCtes(500)},
        |vp AS (
        |  SELECT id1, id2 FROM ver
        |  WHERE round(CAST(inter AS DOUBLE) / (n1 + n2 - inter), 4) >= 0.5),
        |a1 AS (
        |  SELECT doc_id FROM base WHERE doc_id < 250
        |  AND doc_id NOT IN (SELECT id2 FROM vp WHERE id1 < 250 AND id2 < 250)),
        |s2 AS (
        |  SELECT doc_id FROM base WHERE doc_id >= 250 AND doc_id < 100000
        |  AND doc_id NOT IN (SELECT id2 FROM vp
        |    WHERE id1 >= 250 AND id1 < 100000
        |      AND id2 >= 250 AND id2 < 100000)),
        |a2 AS (
        |  SELECT doc_id FROM s2 WHERE doc_id NOT IN
        |  (SELECT id2 FROM vp WHERE id1 IN (SELECT doc_id FROM a1))),
        |acc2 AS (SELECT doc_id FROM a1 UNION ALL SELECT doc_id FROM a2),
        |s3 AS (
        |  SELECT doc_id FROM base WHERE doc_id >= 100000
        |  AND doc_id NOT IN (SELECT id2 FROM vp
        |    WHERE id1 >= 100000 AND id2 >= 100000)),
        |a3 AS (
        |  SELECT doc_id FROM s3 WHERE doc_id NOT IN
        |  (SELECT id2 FROM vp WHERE id1 IN (SELECT doc_id FROM acc2)))
        |SELECT doc_id FROM acc2
        |UNION ALL SELECT doc_id FROM a3
        |ORDER BY doc_id""".stripMargin,

    // Full replay of the 64-bit SimHash pipeline as two md5 32-bit
    // words (hex chars 1-8 / 9-16 — no 64-bit unsigned arithmetic
    // needed): per-token ±1 bit votes, sign fold per half, 8-bit
    // pigeonhole chunk join, Hamming = popcount(xor) summed per half.
    "qX_dedup_simhash" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id < 1000),
        |tok AS (SELECT doc_id, unnest(toks) AS t FROM d),
        |th AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) AS thi,
        |    CAST(('0x' || substr(md5(t), 9, 8)) AS BIGINT) AS tlo
        |  FROM tok),
        |votes AS (
        |  SELECT doc_id, b.b AS b,
        |    sum(CASE WHEN ((CASE WHEN b.b < 32 THEN (tlo >> b.b)
        |                        ELSE (thi >> (b.b - 32)) END) & 1) = 1
        |        THEN 1 ELSE -1 END) AS v
        |  FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) b
        |  GROUP BY 1, 2),
        |halves0 AS (
        |  SELECT doc_id,
        |    sum(CASE WHEN v > 0 AND b >= 32
        |        THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS hi,
        |    sum(CASE WHEN v > 0 AND b < 32
        |        THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS lo
        |  FROM votes GROUP BY 1),
        |halves AS (
        |  SELECT d.doc_id, coalesce(h.hi, 0) AS hi, coalesce(h.lo, 0) AS lo
        |  FROM d LEFT JOIN halves0 h USING (doc_id)),
        |chunks AS (
        |  SELECT doc_id, hi, lo, c.c AS c,
        |    CASE WHEN c.c < 4 THEN (lo >> (8 * c.c)) & 255
        |         ELSE (hi >> (8 * c.c - 32)) & 255 END AS key
        |  FROM halves CROSS JOIN (SELECT unnest(range(8)) AS c) c),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2,
        |    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS dist
        |  FROM chunks a JOIN chunks b
        |    ON a.c = b.c AND a.key = b.key AND a.doc_id < b.doc_id)
        |SELECT id1, id2, dist FROM pairs WHERE dist <= 6
        |ORDER BY dist ASC, id1 ASC, id2 ASC LIMIT 200""".stripMargin,

    // Full replay of sign-LSH ANN: md5-derived dyadic hyperplanes
    // (md5_32("hp:p:d") mod 2^20 — exact in float and double), sign
    // signatures, multi-probe at Hamming 1, cosine re-rank of the
    // deduped candidates.
    "qX_ann_lsh" ->
      """WITH planes AS (
        |  SELECT p.p AS p, list_transform(range(64), d ->
        |    CAST(CAST(('0x' || substr(md5('hp:' || CAST(p.p AS VARCHAR) || ':' ||
        |      CAST(d AS VARCHAR)), 1, 8)) AS BIGINT) % 1048576 AS DOUBLE)
        |      / 1048576.0 - 0.5) AS plane
        |  FROM (SELECT unnest(range(10)) AS p) p),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
        |sigs AS (
        |  SELECT e.vec_id, sum(CASE WHEN list_dot_product(e.vec, pl.plane) > 0
        |      THEN (CAST(1 AS BIGINT) << pl.p) ELSE 0 END) AS sig
        |  FROM e CROSS JOIN planes pl GROUP BY 1),
        |qp AS (SELECT vec_id AS qid, sig FROM sigs WHERE vec_id < 5),
        |probes AS (
        |  SELECT qid, sig AS bucket FROM qp
        |  UNION ALL
        |  SELECT qid, xor(sig, (CAST(1 AS BIGINT) << i.i)) AS bucket
        |  FROM qp CROSS JOIN (SELECT unnest(range(10)) AS i) i),
        |cand AS (
        |  SELECT DISTINCT p.qid, s.vec_id AS id
        |  FROM probes p JOIN sigs s ON p.bucket = s.sig
        |  WHERE s.vec_id <> p.qid),
        |scored AS (
        |  SELECT c.qid, c.id,
        |    round(list_cosine_similarity(qe.vec, ce.vec), 4) AS sim
        |  FROM cand c
        |  JOIN e qe ON qe.vec_id = c.qid
        |  JOIN e ce ON ce.vec_id = c.id),
        |ranked AS (
        |  SELECT qid, id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, id ASC) AS rn
        |  FROM scored)
        |SELECT qid, id, sim FROM ranked WHERE rn <= 5
        |ORDER BY qid, sim DESC, id""".stripMargin,

    // Replays qX_image_dedup from doc_id arithmetic: dHash bit
    // (8y + 2j) = bit (4y + j) of md5_32(source id) by the bit-pattern
    // construction (renderBitPatternPng), the scaled duplicate hashes
    // identically, then the maxDist≤3 pigeonhole chunk join (4 chunks
    // × 16 bits, half-aligned) and per-half popcount distance.
    "qX_image_dedup" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 200),
        |recs AS (
        |  SELECT doc_id AS id, doc_id AS src FROM ids
        |  UNION ALL
        |  SELECT doc_id + 100000 AS id, doc_id AS src FROM ids),
        |pat AS (
        |  SELECT id,
        |    CAST(('0x' || substr(md5(CAST(src AS VARCHAR)), 1, 8)) AS BIGINT) AS p
        |  FROM recs),
        |grid AS (
        |  SELECT y.y AS y, j.j AS j
        |  FROM (SELECT unnest(range(8)) AS y) y,
        |       (SELECT unnest(range(4)) AS j) j),
        |halves AS (
        |  SELECT id,
        |    sum(CASE WHEN g.y >= 4 AND ((p >> (4 * g.y + g.j)) & 1) = 1
        |        THEN (CAST(1 AS BIGINT) << (8 * (g.y - 4) + 2 * g.j))
        |        ELSE 0 END) AS hi,
        |    sum(CASE WHEN g.y < 4 AND ((p >> (4 * g.y + g.j)) & 1) = 1
        |        THEN (CAST(1 AS BIGINT) << (8 * g.y + 2 * g.j))
        |        ELSE 0 END) AS lo
        |  FROM pat CROSS JOIN grid g GROUP BY id),
        |chunks AS (
        |  SELECT id, hi, lo, c.c AS c,
        |    CASE WHEN c.c < 2 THEN (lo >> (16 * c.c)) & 65535
        |         ELSE (hi >> (16 * c.c - 32)) & 65535 END AS key
        |  FROM halves CROSS JOIN (SELECT unnest(range(4)) AS c) c),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2,
        |    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS dist
        |  FROM chunks a JOIN chunks b
        |    ON a.c = b.c AND a.key = b.key AND a.id < b.id)
        |SELECT id1, id2, dist FROM pairs WHERE dist <= 3
        |ORDER BY id1 ASC, id2 ASC""".stripMargin,

    "qX_image_phash" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM documents WHERE doc_id < 150""".stripMargin,

    // Replays qX_video_dedup from doc_id arithmetic: frame k of clip
    // id carries the bit-pattern image of md5_32(src ':' k) (src
    // shifted for the half-overlap variant's fresh tail), per-frame
    // dHash bit (8y+2j) = pattern bit (4y+j), and at maxDist 0 a
    // frame matches iff both hash words are equal — count aligned
    // matches per pair, frac over the 4-frame clips, 0.8 bar.
    "qX_scene_cuts" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 100),
        |pat AS (
        |  SELECT doc_id AS id, k.k AS frame_no,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
        |      CAST(CASE WHEN k.k < 2 THEN 0 ELSE 1 END AS VARCHAR)),
        |      1, 8)) AS BIGINT) AS p
        |  FROM ids CROSS JOIN (SELECT unnest(range(4)) AS k) k),
        |grid AS (
        |  SELECT y.y AS y, j.j AS j
        |  FROM (SELECT unnest(range(8)) AS y) y,
        |       (SELECT unnest(range(4)) AS j) j),
        |halves AS (
        |  SELECT id, frame_no,
        |    sum(CASE WHEN g.y >= 4 AND ((p >> (4 * g.y + g.j)) & 1) = 1
        |        THEN (CAST(1 AS BIGINT) << (8 * (g.y - 4) + 2 * g.j))
        |        ELSE 0 END) AS hi,
        |    sum(CASE WHEN g.y < 4 AND ((p >> (4 * g.y + g.j)) & 1) = 1
        |        THEN (CAST(1 AS BIGINT) << (8 * g.y + 2 * g.j))
        |        ELSE 0 END) AS lo
        |  FROM pat CROSS JOIN grid g GROUP BY id, frame_no),
        |lagged AS (
        |  SELECT id, frame_no, hi, lo,
        |    lag(hi) OVER (PARTITION BY id ORDER BY frame_no) AS phi,
        |    lag(lo) OVER (PARTITION BY id ORDER BY frame_no) AS plo
        |  FROM halves)
        |SELECT id, frame_no FROM lagged
        |WHERE phi IS NOT NULL AND (hi <> phi OR lo <> plo)
        |ORDER BY id, frame_no""".stripMargin,
    "qX_video_dedup" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 100),
        |clips AS (
        |  SELECT doc_id AS id, doc_id AS src, 0 AS variant FROM ids
        |  UNION ALL
        |  SELECT doc_id + 100000 AS id, doc_id AS src, 0 AS variant FROM ids
        |  UNION ALL
        |  SELECT doc_id + 200000 AS id, doc_id AS src, 1 AS variant FROM ids),
        |pat AS (
        |  SELECT id, k.k AS frame_no,
        |    CAST(('0x' || substr(md5(
        |      CAST(CASE WHEN variant = 1 AND k.k >= 2
        |           THEN src + 500000 ELSE src END AS VARCHAR)
        |      || ':' ||
        |      CAST(CASE WHEN variant = 1 AND k.k >= 2
        |           THEN k.k - 2 ELSE k.k END AS VARCHAR)), 1, 8)) AS BIGINT) AS p
        |  FROM clips CROSS JOIN (SELECT unnest(range(4)) AS k) k),
        |grid AS (
        |  SELECT y.y AS y, j.j AS j
        |  FROM (SELECT unnest(range(8)) AS y) y,
        |       (SELECT unnest(range(4)) AS j) j),
        |halves AS (
        |  SELECT id, frame_no,
        |    sum(CASE WHEN g.y >= 4 AND ((p >> (4 * g.y + g.j)) & 1) = 1
        |        THEN (CAST(1 AS BIGINT) << (8 * (g.y - 4) + 2 * g.j))
        |        ELSE 0 END) AS hi,
        |    sum(CASE WHEN g.y < 4 AND ((p >> (4 * g.y + g.j)) & 1) = 1
        |        THEN (CAST(1 AS BIGINT) << (8 * g.y + 2 * g.j))
        |        ELSE 0 END) AS lo
        |  FROM pat CROSS JOIN grid g GROUP BY id, frame_no),
        |fm AS (
        |  SELECT a.id AS id1, b.id AS id2, count(*) AS matched
        |  FROM halves a JOIN halves b
        |    ON a.frame_no = b.frame_no AND a.hi = b.hi AND a.lo = b.lo
        |       AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, matched, round(matched / 4.0, 4) AS frac
        |FROM fm WHERE round(matched / 4.0, 4) >= 0.8
        |ORDER BY id1 ASC, id2 ASC""".stripMargin,

    // Replays qX_audio_dedup from doc_id arithmetic: fingerprint bit
    // (2j) = bit j of md5_32(source id) by the pattern-WAV
    // construction (renderPatternWav), the half-gain duplicate hashes
    // identically, then the maxDist≤3 pigeonhole chunk join (4 × 16
    // bits) and per-half popcount distance. Even positions:
    // j <= 15 land in the low 32-bit word at bit 2j, j >= 16 in the
    // high word at bit 2j-32.
    "qX_audio_dedup" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 150),
        |recs AS (
        |  SELECT doc_id AS id, doc_id AS src FROM ids
        |  UNION ALL
        |  SELECT doc_id + 100000 AS id, doc_id AS src FROM ids),
        |pat AS (
        |  SELECT id,
        |    CAST(('0x' || substr(md5(CAST(src AS VARCHAR)), 1, 8)) AS BIGINT) AS p
        |  FROM recs),
        |halves AS (
        |  SELECT id,
        |    sum(CASE WHEN j.j >= 16 AND ((p >> j.j) & 1) = 1
        |        THEN (CAST(1 AS BIGINT) << (2 * (j.j - 16))) ELSE 0 END) AS hi,
        |    sum(CASE WHEN j.j < 16 AND ((p >> j.j) & 1) = 1
        |        THEN (CAST(1 AS BIGINT) << (2 * j.j)) ELSE 0 END) AS lo
        |  FROM pat CROSS JOIN (SELECT unnest(range(32)) AS j) j
        |  GROUP BY id),
        |chunks AS (
        |  SELECT id, hi, lo, c.c AS c,
        |    CASE WHEN c.c < 2 THEN (lo >> (16 * c.c)) & 65535
        |         ELSE (hi >> (16 * c.c - 32)) & 65535 END AS key
        |  FROM halves CROSS JOIN (SELECT unnest(range(4)) AS c) c),
        |pairs AS (
        |  SELECT DISTINCT a.id AS id1, b.id AS id2,
        |    CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS dist
        |  FROM chunks a JOIN chunks b
        |    ON a.c = b.c AND a.key = b.key AND a.id < b.id)
        |SELECT id1, id2, dist FROM pairs WHERE dist <= 3
        |ORDER BY id1 ASC, id2 ASC""".stripMargin,

    // Full replay of the stub-codec multimodal ANN: feature i of a
    // payload is md5_32(payload || ':' || i) mod 2^10 over 2^10 − 0.5
    // (FakeCodec.embed — the payloads are UTF-8 text bytes, so
    // md5(text || ':' || i) recomputes them), then brute-force cosine
    // top-3 for queries id < 3.
    "qX_multimodal_ann" ->
      """WITH f AS (
        |  SELECT doc_id AS id, list_transform(range(16), i ->
        |    CAST(CAST(('0x' || substr(md5(text || ':' || CAST(i AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 1024 AS DOUBLE) / 1024.0 - 0.5) AS emb
        |  FROM documents WHERE doc_id < 500),
        |scored AS (
        |  SELECT q.id AS qid, c.id,
        |    round(list_cosine_similarity(q.emb, c.emb), 4) AS sim
        |  FROM f q JOIN f c ON c.id <> q.id
        |  WHERE q.id < 3),
        |ranked AS (
        |  SELECT qid, id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, id ASC) AS rn
        |  FROM scored)
        |SELECT qid, id, sim FROM ranked WHERE rn <= 3
        |ORDER BY qid, sim DESC, id""".stripMargin,

    "qX_embed_drift" ->
      """WITH dims AS (SELECT unnest(range(64)) AS pos),
        |ea AS (SELECT d.pos,
        |    CAST(sum(CAST(round(e.embedding[d.pos + 1] * 1e6) AS BIGINT))
        |      AS BIGINT) AS sa, count(*) AS na
        |  FROM embeddings e CROSS JOIN dims d WHERE e.vec_id % 2 = 0
        |  GROUP BY 1),
        |eb AS (SELECT d.pos,
        |    CAST(sum(CAST(round(e.embedding[d.pos + 1] * 1e6) AS BIGINT))
        |      AS BIGINT) AS sb, count(*) AS nb
        |  FROM embeddings e CROSS JOIN dims d WHERE e.vec_id % 2 = 1
        |  GROUP BY 1),
        |t AS (SELECT ea.na, eb.nb,
        |    CAST(round(ea.sa * 1.0 / ea.na * (eb.sb * 1.0 / eb.nb) / 1e6)
        |      AS BIGINT) AS tab,
        |    CAST(round(ea.sa * 1.0 / ea.na * (ea.sa * 1.0 / ea.na) / 1e6)
        |      AS BIGINT) AS taa,
        |    CAST(round(eb.sb * 1.0 / eb.nb * (eb.sb * 1.0 / eb.nb) / 1e6)
        |      AS BIGINT) AS tbb
        |  FROM ea JOIN eb USING (pos)),
        |s AS (SELECT max(na) AS n_a, max(nb) AS n_b,
        |  CAST(sum(tab) AS BIGINT) AS sab, CAST(sum(taa) AS BIGINT) AS saa,
        |  CAST(sum(tbb) AS BIGINT) AS sbb FROM t)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |  CAST(CASE WHEN saa > 0 AND sbb > 0
        |    THEN trunc(1e6 * sab / sqrt(CAST(saa AS DOUBLE) * sbb))
        |    ELSE 0 END AS BIGINT) AS cos_micros,
        |  saa - 2 * sab + sbb AS gap_micros
        |FROM s""".stripMargin,
    "qX_matryoshka" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id < 5),
        |fs AS (SELECT q.qid, e.vec_id AS id,
        |    round(list_cosine_similarity(q.qvec,
        |      CAST(e.embedding AS DOUBLE[])), 4) AS sim
        |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
        |fr AS (SELECT qid, id, row_number() OVER (
        |  PARTITION BY qid ORDER BY sim DESC, id) AS rn FROM fs),
        |ts AS (SELECT q.qid, e.vec_id AS id,
        |    round(list_cosine_similarity(q.qvec[1:8],
        |      CAST(e.embedding AS DOUBLE[])[1:8]), 4) AS sim
        |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
        |tr AS (SELECT qid, id, row_number() OVER (
        |  PARTITION BY qid ORDER BY sim DESC, id) AS rn FROM ts),
        |hits AS (SELECT f.qid, count(*) AS nv
        |  FROM (SELECT qid, id FROM fr WHERE rn <= 10) f
        |  JOIN (SELECT qid, id FROM tr WHERE rn <= 10) t
        |  USING (qid, id) GROUP BY 1)
        |SELECT q.qid, CAST(coalesce(h.nv, 0) AS BIGINT) AS n_overlap
        |FROM (SELECT DISTINCT qid FROM fr) q
        |LEFT JOIN hits h USING (qid) ORDER BY q.qid""".stripMargin,
    "qX_ann_cosine" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id < 5),
        |sims AS (
        |  SELECT q.qid, e.vec_id AS id,
        |    round(list_cosine_similarity(q.qvec,
        |      CAST(e.embedding AS DOUBLE[])), 4) AS sim
        |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
        |ranked AS (
        |  SELECT qid, id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, id ASC) AS rn
        |  FROM sims)
        |SELECT qid, id, sim FROM ranked WHERE rn <= 5
        |ORDER BY qid, sim DESC, id""".stripMargin,
    "qX_ild" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id < 5),
        |sims AS (
        |  SELECT q.qid, e.vec_id AS id,
        |    round(list_cosine_similarity(q.qvec,
        |      CAST(e.embedding AS DOUBLE[])), 4) AS sim
        |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
        |recs AS (
        |  SELECT qid, id FROM (
        |    SELECT qid, id, row_number() OVER (
        |      PARTITION BY qid ORDER BY sim DESC, id ASC) AS rn
        |    FROM sims) x WHERE rn <= 5),
        |rv AS (SELECT r.qid, r.id, CAST(e.embedding AS DOUBLE[]) AS v
        |  FROM recs r JOIN embeddings e ON e.vec_id = r.id),
        |pairs AS (
        |  SELECT a.qid,
        |    CAST(round(1e6 * (1.0
        |      - round(list_cosine_similarity(a.v, b.v), 4))) AS BIGINT)
        |      AS d
        |  FROM rv a JOIN rv b ON a.qid = b.qid AND a.id < b.id)
        |SELECT qid, count(*) AS n_pairs,
        |  CAST(floor(CAST(sum(d) AS DOUBLE) / count(*)) AS BIGINT)
        |    AS ild_micros
        |FROM pairs GROUP BY 1 ORDER BY qid""".stripMargin,
    "qX_silhouette" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < 8),
        |assigned AS (
        |  SELECT vec_id AS id, v, cid AS cell FROM (
        |    SELECT e.vec_id, e.v, c.cid, row_number() OVER (
        |      PARTITION BY e.vec_id
        |      ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6)
        |        DESC, c.cid) AS rn
        |    FROM e CROSS JOIN c) x WHERE rn = 1),
        |d AS (SELECT a.id, a.cell,
        |    min(CASE WHEN c.cid = a.cell
        |      THEN 1.0 - round(list_cosine_similarity(a.v, c.cvec), 6)
        |      END) AS da,
        |    min(CASE WHEN c.cid <> a.cell
        |      THEN 1.0 - round(list_cosine_similarity(a.v, c.cvec), 6)
        |      END) AS db
        |  FROM assigned a CROSS JOIN c GROUP BY 1, 2),
        |s AS (SELECT cell,
        |    CASE WHEN greatest(da, db) = 0 THEN 0
        |      ELSE CAST(round(1e6 * (db - da) / greatest(da, db))
        |        AS BIGINT) END AS sc
        |  FROM d)
        |SELECT cell, count(*) AS n,
        |  CAST(floor(CAST(sum(sc) AS DOUBLE) / count(*)) AS BIGINT)
        |    AS mean_sil_micros
        |FROM s GROUP BY 1 ORDER BY cell""".stripMargin,
    "qX_norm_stats" ->
      """WITH q AS (SELECT vec_id, unnest(embedding) AS x
        |  FROM embeddings),
        |n2 AS (SELECT vec_id,
        |    CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
        |      * CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))
        |      AS BIGINT) AS s2,
        |    count(*) AS dim
        |  FROM q GROUP BY 1),
        |nm AS (SELECT vec_id, dim,
        |    CAST(floor(sqrt(CAST(s2 AS DOUBLE))) AS BIGINT) AS v
        |  FROM n2),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, vec_id) AS rn
        |  FROM nm),
        |cnt AS (SELECT count(*) AS n, min(dim) AS min_dim,
        |    max(dim) AS max_dim, CAST(sum(v) AS BIGINT) AS s FROM nm)
        |SELECT cnt.n, cnt.min_dim, cnt.max_dim,
        |  CAST(floor(CAST(cnt.s AS DOUBLE) / cnt.n) AS BIGINT)
        |    AS mean_micros,
        |  CAST(max(CASE WHEN rn = (cnt.n + 1) // 2 THEN v END)
        |    AS BIGINT) AS p50_micros,
        |  CAST(max(CASE WHEN rn = (9 * cnt.n + 9) // 10 THEN v END)
        |    AS BIGINT) AS p90_micros,
        |  CAST(max(CASE WHEN rn = (99 * cnt.n + 99) // 100 THEN v END)
        |    AS BIGINT) AS p99_micros
        |FROM r CROSS JOIN cnt GROUP BY 1, 2, 3, 4""".stripMargin,
    "qX_ivf_balance" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < 8),
        |assigned AS (
        |  SELECT vec_id AS id, cid AS cell FROM (
        |    SELECT e.vec_id, c.cid, row_number() OVER (
        |      PARTITION BY e.vec_id
        |      ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6)
        |        DESC, c.cid) AS rn
        |    FROM e CROSS JOIN c) x WHERE rn = 1),
        |sizes AS (SELECT cell, count(*) AS c FROM assigned GROUP BY 1),
        |s AS (SELECT count(*) AS k_cells, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(min(c) AS BIGINT) AS min_cell,
        |    CAST(max(c) AS BIGINT) AS max_cell,
        |    CAST(sum(c * CAST(round(1e6 * ln(CAST(c AS DOUBLE)))
        |      AS BIGINT)) AS BIGINT) AS slnc
        |  FROM sizes)
        |SELECT k_cells, n, min_cell, max_cell,
        |  CAST(floor(1e6 * CAST(max_cell AS DOUBLE) * k_cells / n)
        |    AS BIGINT) AS imbalance_micros,
        |  CAST(floor(1e6 * ln(CAST(n AS DOUBLE))
        |    - CAST(slnc AS DOUBLE) / n) AS BIGINT) AS entropy_micros
        |FROM s""".stripMargin,
    "qX_hard_neg" ->
      """WITH q AS (
        |  SELECT vec_id AS qid, label AS qlabel,
        |    CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id < 5),
        |sims AS (
        |  SELECT q.qid, e.vec_id AS id,
        |    round(list_cosine_similarity(q.qvec,
        |      CAST(e.embedding AS DOUBLE[])), 4) AS sim
        |  FROM q, embeddings e
        |  WHERE e.vec_id <> q.qid AND e.label <> q.qlabel),
        |ranked AS (
        |  SELECT qid, id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, id ASC) AS rn
        |  FROM sims)
        |SELECT qid, id, sim FROM ranked WHERE rn <= 5
        |ORDER BY qid, sim DESC, id""".stripMargin,

    "qX_dedup_embed" ->
      """WITH base AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 500),
        |planted AS (
        |  SELECT vec_id + 100000 AS vec_id, list_prepend(0.0, v[2:]) AS v
        |  FROM base),
        |allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |pairs AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    round(list_cosine_similarity(a.v, b.v), 4) AS sim
        |  FROM allv a JOIN allv b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, sim FROM pairs WHERE sim >= 0.9
        |ORDER BY sim DESC, id1, id2""".stripMargin,

    "qX_pq_recall" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM embeddings WHERE vec_id < 100""".stripMargin,
    "qX_opq" ->
      """SELECT count(*) AS n_planted, count(*) AS n_recovered
        |FROM embeddings WHERE vec_id < 100""".stripMargin,

    "qX_sq8" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |dimtab AS (SELECT unnest(range(1, 65)) AS dim),
        |dims AS (
        |  SELECT d.dim, min(e.v[d.dim]) AS mn, max(e.v[d.dim]) AS mx
        |  FROM e CROSS JOIN dimtab d GROUP BY 1),
        |p AS (SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs
        |  FROM dims),
        |enc AS (
        |  SELECT e.vec_id, list_transform(range(1, 65), i ->
        |    CASE WHEN p.mxs[i] > p.mns[i] THEN
        |      least(greatest(CAST(round(255.0 * (e.v[i] - p.mns[i])
        |        / (p.mxs[i] - p.mns[i])) AS BIGINT), 0), 255)
        |    ELSE 0 END) AS codes
        |  FROM e CROSS JOIN p),
        |rec AS (
        |  SELECT enc.vec_id, list_transform(range(1, 65), i ->
        |    p.mns[i] + enc.codes[i] * (p.mxs[i] - p.mns[i]) / 255.0) AS rv
        |  FROM enc CROSS JOIN p),
        |rn AS (SELECT vec_id, rv, sqrt(list_inner_product(rv, rv)) AS rnorm
        |  FROM rec),
        |q AS (SELECT vec_id AS qid, v, sqrt(list_inner_product(v, v)) AS qn
        |  FROM e WHERE vec_id >= 100 AND vec_id < 105),
        |scored AS (
        |  SELECT q.qid, r.vec_id AS id,
        |    round(list_inner_product(q.v, r.rv) / (q.qn * r.rnorm), 4) AS sim
        |  FROM q JOIN rn r ON r.vec_id <> q.qid)
        |SELECT qid, id, sim FROM (
        |  SELECT qid, id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, id) AS rn FROM scored) x
        |WHERE rn <= 5 ORDER BY qid, sim DESC, id""".stripMargin,

    "qX_pca_moments" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 200),
        |d AS (SELECT unnest(range(1, 65)) AS di),
        |firsts AS (
        |  SELECT CAST(di - 1 AS INTEGER) AS i, -1 AS j,
        |    CAST(sum(CAST(trunc(v[di] * 1e6) AS BIGINT)) AS BIGINT) AS s,
        |    count(*) AS n
        |  FROM e CROSS JOIN d GROUP BY 1, 2),
        |pairs AS (
        |  SELECT CAST(a.di - 1 AS INTEGER) AS i,
        |    CAST(b.di - 1 AS INTEGER) AS j,
        |    CAST(sum(CAST(trunc(e.v[a.di] * e.v[b.di] * 1e6) AS BIGINT))
        |      AS BIGINT) AS s,
        |    count(*) AS n
        |  FROM e CROSS JOIN d a CROSS JOIN d b
        |  WHERE b.di >= a.di GROUP BY 1, 2)
        |SELECT * FROM firsts UNION ALL SELECT * FROM pairs
        |ORDER BY i, j""".stripMargin,
    "qX_random_projection" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 200),
        |jj AS (SELECT unnest(range(0, 16)) AS j),
        |ii AS (SELECT unnest(range(0, 64)) AS i),
        |cells AS (SELECT jj.j, ii.i,
        |    CASE (CAST(('0x' || substr(md5('rp:' || jj.j || ':' || ii.i),
        |      1, 8)) AS BIGINT) % 6)
        |      WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS r
        |  FROM jj CROSS JOIN ii),
        |terms AS (
        |  SELECT e.vec_id, CAST(c.j AS INTEGER) AS component,
        |    CAST(trunc(e.v[c.i + 1] * c.r * 1e6) AS BIGINT) AS t
        |  FROM e CROSS JOIN cells c)
        |SELECT vec_id, component, CAST(sum(t) AS BIGINT) AS y_micro
        |FROM terms GROUP BY 1, 2
        |ORDER BY vec_id, component""".stripMargin,
    "qX_pca_project" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id < 200),
        |d AS (SELECT unnest(range(1, 65)) AS di),
        |r AS (SELECT unnest(range(0, 8)) AS comp),
        |terms AS (
        |  SELECT e.vec_id, CAST(r.comp AS INTEGER) AS component,
        |    CAST(trunc(e.v[d.di] *
        |      (((r.comp * 64 + (d.di - 1)) * 2654435761) % 1000
        |        / 1000.0 - 0.5) * 1e6) AS BIGINT) AS t
        |  FROM e CROSS JOIN d CROSS JOIN r)
        |SELECT vec_id, component, CAST(sum(t) AS BIGINT) AS y_micro
        |FROM terms GROUP BY 1, 2
        |ORDER BY vec_id, component""".stripMargin,
    "qX_pq" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ss AS (SELECT unnest([0, 1, 2, 3]) AS s),
        |subs AS (
        |  SELECT e.vec_id, ss.s, e.v[ss.s*16+1 : ss.s*16+16] AS sv
        |  FROM e CROSS JOIN ss),
        |cb AS (SELECT s, vec_id AS cid, sv AS cv FROM subs WHERE vec_id < 16),
        |asg AS (
        |  SELECT subs.vec_id, subs.s, cb.cid, row_number() OVER (
        |    PARTITION BY subs.vec_id, subs.s
        |    ORDER BY round(pow(list_distance(subs.sv, cb.cv), 2), 6) ASC,
        |      cb.cid ASC) AS rn
        |  FROM subs JOIN cb ON cb.s = subs.s),
        |codes AS (SELECT vec_id, s, cid FROM asg WHERE rn = 1),
        |cn AS (
        |  SELECT c.vec_id, sum(list_inner_product(cb.cv, cb.cv)) AS cnorm2
        |  FROM codes c JOIN cb ON cb.s = c.s AND cb.cid = c.cid
        |  GROUP BY c.vec_id),
        |q AS (
        |  SELECT vec_id AS qid, v, sqrt(list_inner_product(v, v)) AS qn
        |  FROM e WHERE vec_id >= 100 AND vec_id < 105),
        |qsub AS (
        |  SELECT q.qid, ss.s, q.v[ss.s*16+1 : ss.s*16+16] AS qv, q.qn
        |  FROM q CROSS JOIN ss),
        |adc AS (
        |  SELECT qs.qid, c.vec_id AS id,
        |    sum(list_inner_product(qs.qv, cb.cv)) AS dotr,
        |    any_value(qs.qn) AS qn, any_value(cn.cnorm2) AS cnorm2
        |  FROM codes c
        |  JOIN cb ON cb.s = c.s AND cb.cid = c.cid
        |  JOIN qsub qs ON qs.s = c.s
        |  JOIN cn ON cn.vec_id = c.vec_id
        |  WHERE c.vec_id <> qs.qid
        |  GROUP BY qs.qid, c.vec_id),
        |scored AS (
        |  SELECT qid, id, round(dotr / (qn * sqrt(cnorm2)), 4) AS sim FROM adc)
        |SELECT qid, id, sim FROM (
        |  SELECT qid, id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, id) AS rn FROM scored) x
        |WHERE rn <= 5 ORDER BY qid, sim DESC, id""".stripMargin,

    "qX_ivfpq" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ss AS (SELECT unnest([0, 1, 2, 3]) AS s),
        |subs AS (
        |  SELECT e.vec_id, ss.s, e.v[ss.s*16+1 : ss.s*16+16] AS sv
        |  FROM e CROSS JOIN ss),
        |cb AS (SELECT s, vec_id AS cid, sv AS cv FROM subs WHERE vec_id < 16),
        |asg AS (
        |  SELECT subs.vec_id, subs.s, cb.cid, row_number() OVER (
        |    PARTITION BY subs.vec_id, subs.s
        |    ORDER BY round(pow(list_distance(subs.sv, cb.cv), 2), 6) ASC,
        |      cb.cid ASC) AS rn
        |  FROM subs JOIN cb ON cb.s = subs.s),
        |codes AS (SELECT vec_id, s, cid FROM asg WHERE rn = 1),
        |cn AS (
        |  SELECT c.vec_id, sum(list_inner_product(cb.cv, cb.cv)) AS cnorm2
        |  FROM codes c JOIN cb ON cb.s = c.s AND cb.cid = c.cid
        |  GROUP BY c.vec_id),
        |cc AS (SELECT vec_id AS ccid, v AS ccv FROM e WHERE vec_id < 8),
        |cells AS (
        |  SELECT vec_id AS id, ccid AS cell FROM (
        |    SELECT e.vec_id, cc.ccid, row_number() OVER (
        |      PARTITION BY e.vec_id
        |      ORDER BY round(list_cosine_similarity(e.v, cc.ccv), 6) DESC,
        |        cc.ccid) AS rn
        |    FROM e CROSS JOIN cc) x WHERE rn = 1),
        |q AS (
        |  SELECT vec_id AS qid, v, sqrt(list_inner_product(v, v)) AS qn
        |  FROM e WHERE vec_id >= 100 AND vec_id < 105),
        |probes AS (
        |  SELECT qid, cell FROM (
        |    SELECT q.qid, cc.ccid AS cell, row_number() OVER (
        |      PARTITION BY q.qid
        |      ORDER BY round(list_cosine_similarity(q.v, cc.ccv), 6) DESC,
        |        cc.ccid) AS rn
        |    FROM q CROSS JOIN cc) x WHERE rn <= 2),
        |qsub AS (
        |  SELECT q.qid, ss.s, q.v[ss.s*16+1 : ss.s*16+16] AS qv, q.qn
        |  FROM q CROSS JOIN ss),
        |adc AS (
        |  SELECT qs.qid, c.vec_id AS id,
        |    sum(list_inner_product(qs.qv, cb.cv)) AS dotr,
        |    any_value(qs.qn) AS qn, any_value(cn.cnorm2) AS cnorm2
        |  FROM codes c
        |  JOIN cells ON cells.id = c.vec_id
        |  JOIN probes p ON p.cell = cells.cell
        |  JOIN cb ON cb.s = c.s AND cb.cid = c.cid
        |  JOIN qsub qs ON qs.s = c.s AND qs.qid = p.qid
        |  JOIN cn ON cn.vec_id = c.vec_id
        |  WHERE c.vec_id <> p.qid
        |  GROUP BY qs.qid, c.vec_id),
        |scored AS (
        |  SELECT qid, id, round(dotr / (qn * sqrt(cnorm2)), 4) AS sim FROM adc)
        |SELECT qid, id, sim FROM (
        |  SELECT qid, id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, id) AS rn FROM scored) x
        |WHERE rn <= 5 ORDER BY qid, sim DESC, id""".stripMargin,

    "qX_ann_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < 8),
        |assigned AS (
        |  SELECT vec_id AS id, v AS vec, cid AS cell FROM (
        |    SELECT e.vec_id, e.v, c.cid, row_number() OVER (
        |      PARTITION BY e.vec_id
        |      ORDER BY round(list_cosine_similarity(e.v, c.cvec), 6) DESC, c.cid) AS rn
        |    FROM e CROSS JOIN c) x WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, v AS qvec FROM e
        |  WHERE vec_id >= 100 AND vec_id < 105),
        |probes AS (
        |  SELECT qid, qvec, cid AS cell FROM (
        |    SELECT q.qid, q.qvec, c.cid, row_number() OVER (
        |      PARTITION BY q.qid
        |      ORDER BY round(list_cosine_similarity(q.qvec, c.cvec), 6) DESC, c.cid) AS rn
        |    FROM q CROSS JOIN c) x WHERE rn <= 2),
        |cand AS (
        |  SELECT p.qid, a.id, round(list_cosine_similarity(p.qvec, a.vec), 4) AS sim
        |  FROM probes p JOIN assigned a ON p.cell = a.cell
        |  WHERE p.qid <> a.id)
        |SELECT qid, id, sim FROM (
        |  SELECT qid, id, sim, row_number() OVER (
        |    PARTITION BY qid ORDER BY sim DESC, id) AS rn FROM cand) x
        |WHERE rn <= 5 ORDER BY qid, sim DESC, id""".stripMargin,

    // the streaming IVF store's final (id, cell) assignment: LWW
    // winners (every 17th id carries its neighbor's vector — absent
    // neighbor keeps the original), then nearest-centroid cell under
    // the same round-6 cosine / cid-asc tiebreak as qX_ann_ivf
    "qX_stream_ivf" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < 8),
        |upd AS (
        |  SELECT e.vec_id, n.v FROM e
        |  JOIN e n ON n.vec_id = e.vec_id + 1
        |  WHERE e.vec_id % 17 = 0),
        |final AS (
        |  SELECT e.vec_id, COALESCE(u.v, e.v) AS v
        |  FROM e LEFT JOIN upd u ON u.vec_id = e.vec_id)
        |SELECT vec_id AS id, cell FROM (
        |  SELECT f.vec_id, c.cid AS cell, row_number() OVER (
        |    PARTITION BY f.vec_id
        |    ORDER BY round(list_cosine_similarity(f.v, c.cvec), 6) DESC, c.cid) AS rn
        |  FROM final f CROSS JOIN c) x WHERE rn = 1
        |ORDER BY id""".stripMargin)
}
