package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Dedup sketches (MinHash-LSH, SimHash) and ANN validated against
  * their exact counterparts — the sketch result must be a subset of /
  * consistent with brute force, and must catch planted near-dups.
  */
class DedupSimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("clusters: chained near-dups collapse to one canonical; singletons kept") {
    // pair graph: 1-2, 2-3 (chain — 1~3 NOT a pair), 10-11; 99 unpaired
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.85), (10L, 11L, 0.8))
      .toDF("id1", "id2", "jaccard")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val got = graft.operators.Dedup.clusters(pairs, docs, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got == Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false),
      10L -> (10L, true), 11L -> (10L, false), 99L -> (99L, true)))
  }

  val base = "the quick brown fox jumps over the lazy dog and runs far away " +
    "into the deep green forest while the sun sets slowly behind distant hills"
  val docs = Seq(
    (0L, base),
    (1L, base + " tonight"),                       // near-dup of 0
    (2L, base.replace("quick", "slow")),           // near-dup of 0
    (3L, "completely different content about spark catalyst optimizer rules"),
    (4L, "completely different content about spark catalyst optimizer rules"), // exact dup of 3
    (5L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per digest") {
    val kept = Dedup.exact(docs, "text", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L, 3L, 5L)) // 4 deduped into 3
  }

  test("exact n-gram jaccard finds the planted near-dup pairs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)))
    assert(pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("minhash-lsh candidates catch the near-dups and verify exactly") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id",
      n = 2, k = 64, bands = 32, minJaccard = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // every LSH pair is exact-verified → identical jaccard as ground truth
    lsh.foreach { case (pair, j) => assert(exact(pair) == j, s"pair $pair") }
    // high-similarity pairs must be found (32 bands of 2 rows → P(miss) ~ 0)
    val found = lsh.map(_._1).toSet
    assert(found.contains((3L, 4L)))
    assert(found.contains((0L, 1L)))
  }

  test("simhash: identical docs at distance 0, near-dups close, unrelated far") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(sh(a) ^ sh(b))
    assert(dist(3, 4) == 0)
    assert(dist(0, 1) < dist(0, 5), "near-dup closer than unrelated")
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 4L)))
  }

  test("ANN: brute force is exact; LSH finds planted near-duplicates") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // queries = scaled copies of corpus vectors (cosine 1.0 to their
    // source) — the shape LSH must bucket together; random vectors are
    // near-orthogonal and are NOT a fair sketch-recall target.
    val q = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val brute = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding",
      "vec_id", "embedding", 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // brute-force top-1 per query is its source vector at cosine ~1.0
    for (i <- 0L to 2L) assert(brute((i + 10000, i)) >= 0.9999, s"query $i")
    val lsh = Similarity.lshTopK(q, emb, "vec_id", "embedding",
      "vec_id", "embedding", 5, m = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(lsh.nonEmpty)
    // sketch sims must agree exactly with brute-force sims
    lsh.foreach { case (pair, sim) =>
      brute.get(pair).foreach(bs => assert(bs == sim, s"sim mismatch $pair")) }
    // identical-direction vectors share the bucket → LSH must find them
    val found = lsh.map(_._1).toSet
    for (i <- 0L to 2L) assert(found.contains((i + 10000, i)), s"missed planted dup $i")
  }

  test("embedLshPairs: subset of exact all-pairs with identical sims; dups guaranteed") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
    val planted = emb.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val all = emb.unionAll(planted)
    val exact = Dedup.embedCosinePairs(all, "vec_id", "embedding", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val lsh = Dedup.embedLshPairs(all, "vec_id", "embedding", 0.5, m = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // no duplicate candidate pairs (one bucket per vector)
    assert(lsh.map(_._1).distinct.length == lsh.length)
    // every LSH pair exists in the exact set with the identical sim
    lsh.foreach { case (pair, sim) =>
      assert(exact.get(pair).contains(sim), s"pair $pair not exact-consistent") }
    // identical copies are structurally recovered
    val found = lsh.map(_._1).toSet
    for (i <- 0L until 100L)
      assert(found.contains((i, i + 10000)), s"missed planted dup $i")
  }
}
