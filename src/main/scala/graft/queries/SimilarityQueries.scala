package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Similarity-search + sketch-dedup queries over `embeddings` and
  * `documents`. The brute-force cosine top-k is oracle-checked
  * (DuckDB `list_cosine_similarity` over DOUBLE[] matches our
  * deterministic sequential fold at round-4); the LSH / MinHash /
  * SimHash variants hash with xxhash64 and are not SQL-reproducible —
  * they get rows-only checks here and exact-recall assertions in
  * ScalaTest (vs the brute-force ground truth).
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

    // sign-LSH ANN (multi-probe) — scale path; rows-only check.
    "qX_ann_lsh" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
      Similarity.lshTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", 5, m = 10)
    }),

    // MinHash+LSH near-dup candidate pairs, exact-verified; rows-only.
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

    // SimHash near-dup pairs (Hamming <= 3 via pigeonhole bands); rows-only.
    "qX_dedup_simhash" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents").filter(col("doc_id") < 1000)
      Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 6)
        .orderBy(asc("dist"), asc("id1"), asc("id2"))
        .limit(200)
    }))

  val oracles: Map[String, String] = Map(
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
        |ORDER BY qid, sim DESC, id""".stripMargin)
}
