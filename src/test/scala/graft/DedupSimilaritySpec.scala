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

  test("fuzzyJoin: LSH form is a subset of exact with identical jaccards; near-copies recovered") {
    import graft.operators.Dedup
    val left = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six"),
      (3L, "mango banana papaya guava lychee")).toDF("id", "text")
    val right = Seq(
      (10L, "alpha beta gamma delta epsilon"),   // near-copy of 1
      (11L, "one two three four five six"),      // exact copy of 2
      (12L, "totally different words here now")).toDF("id", "text")
    val exact = Dedup.fuzzyJoinExact(left, "id", "text",
        right, "id", "text", 2, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.contains((1L, 10L)) && exact((2L, 11L)) == 1.0)
    assert(!exact.keySet.exists(_._2 == 12L))
    val lsh = Dedup.fuzzyJoin(left, "id", "text", right, "id", "text",
        n = 2, k = 64, bands = 32, minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // subset with identical verified jaccards; the planted pairs recovered
    lsh.foreach { case (k, v) => assert(exact(k) == v) }
    assert(lsh.contains((1L, 10L)) && lsh.contains((2L, 11L)))
  }

  test("hammingBandPairs: pigeonhole completeness against brute force; maxDist cap enforced") {
    // deterministic pseudo-random 64-bit hashes (md5-derived — no RNG
    // state): every pair within maxDist MUST surface, because some
    // 8-bit chunk is untouched by <= 7 flipped bits. Plant controlled
    // near pairs by flipping exactly d bits of a base hash.
    import graft.functions.expr.PortableHash
    val base = (0 until 40).map(i => PortableHash.md5_64("hbp:" + i))
    val planted = (0 to 7).map { d =>
      val h = base(d)
      // flip d bits spread across different chunks
      (0 until d).foldLeft(h)((acc, b) => acc ^ (1L << (b * 9)))
    }
    val all = (base ++ planted).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }
    val df = all.toDF("id", "sh")
    for (maxDist <- Seq(3, 7)) {
      val got = graft.operators.Dedup.hammingBandPairs(df, maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val brute = (for {
        a <- all; b <- all if a._1 < b._1
        d = java.lang.Long.bitCount(a._2 ^ b._2) if d <= maxDist
      } yield (a._1, b._1, d)).toSet
      assert(got == brute, s"maxDist=$maxDist: banding missed or invented pairs")
      assert(got.forall(_._3 <= maxDist))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.hammingBandPairs(df, 8)
    }
  }

  test("media hash edge cases: short audio degenerates, pHash size contract") {
    import graft.operators.Multimodal
    // clips shorter than the window count cannot carry an envelope —
    // fixed degenerate hash, not a crash
    assert(Multimodal.audioHash64(Array.fill(10)(0.5f)) == 0L)
    // pHash demands the canonical 32x32 plane
    intercept[IllegalArgumentException] {
      Multimodal.pHash64(Array.fill(16)(0.5f))
    }
    // dHash plane wider than 64 bits is rejected
    intercept[IllegalArgumentException] {
      Multimodal.dHash64(Array.fill(200)(0.5f), 20, 10)
    }
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

  // ------------------------------------------------------- kmeans / semdedup

  /** 2D spherical toy: two tight direction bundles around the x and y
    * axes. Cosine clustering must split them along the diagonal. */
  private def axisBundles = Seq(
    (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.1f)),
    (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.1f, 1.0f))
  ).toDF("id", "vec")

  test("kmeansFit k=2 known values: axis bundles split, centroids are bundle means") {
    for (pool <- Seq(0, 16)) { // exact-traversal oracle form AND pool init
      val (assigned, cents) = Similarity.kmeansFit(axisBundles, "id", "vec",
        k = 2, iters = 3, seedPool = pool)
      val byId = assigned.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(byId(0L) == byId(1L) && byId(2L) == byId(3L), s"pool=$pool bundles intact")
      assert(byId(0L) != byId(2L), s"pool=$pool bundles separated")
      val cvs = cents.orderBy("cid").collect()
        .map(_.getSeq[Float](1).toArray)
      assert(cvs.length == 2)
      // one centroid is the x-bundle mean (1.0, 0.05), the other the
      // y-bundle mean (0.05, 1.0) — order depends on seed choice
      val sorted = cvs.sortBy(_.apply(0))
      assert(math.abs(sorted(1)(0) - 1.0f) < 1e-6 && math.abs(sorted(1)(1) - 0.05f) < 1e-6)
      assert(math.abs(sorted(0)(0) - 0.05f) < 1e-6 && math.abs(sorted(0)(1) - 1.0f) < 1e-6)
    }
  }

  test("kmeansFit is deterministic run-to-run") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 60).select(col("vec_id"), col("embedding"))
    def run() = Similarity.kmeansFit(emb, "vec_id", "embedding",
        k = 4, iters = 2, seedPool = 32)._1
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("kmeansFit trainCap >= n is the identity; capped training still assigns everyone") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 60).select(col("vec_id"), col("embedding"))
    def run(cap: Int) = Similarity.kmeansFit(emb, "vec_id", "embedding",
        k = 4, iters = 2, seedPool = 32, trainCap = cap)._1
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(1000) == run(0), "trainCap >= n must be the exact computation")
    // Lloyd stats from a 20-of-60 hash-spread sample: the ASSIGNMENT
    // pass is still full-corpus (every id present exactly once)
    val capped = run(20)
    assert(capped.map(_._1) == (0L until 60L).toSeq)
  }

  test("containmentPairs: full quote inclusion reads 1.0 where Jaccard reads 0.4") {
    val docs = Seq((1L, "a b c d e f"), (2L, "a b c")).toDF("doc_id", "text")
    val c = Dedup.containmentPairs(docs, "text", "doc_id", 2, 0.9).collect()
    assert(c.length == 1 &&
      (c.head.getLong(0), c.head.getLong(1), c.head.getDouble(2)) ==
        ((1L, 2L, 1.0)))
    // the same pair at the same bar is invisible to Jaccard
    assert(Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.9).isEmpty)
    assert(Dedup.ngramJaccardPairs(docs, "text", "doc_id", 2, 0.3)
      .head().getDouble(2) == 0.4)
  }

  test("ngramNovelty: seen fraction exact, full copy scores zero") {
    val ref = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val test = Seq(
      (1L, "a b c x y"), // trigrams: abc(seen) bcx cxy → novelty 2/3
      (2L, "a b c d")    // full copy → novelty 0
    ).toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(test, "doc_id", "text", ref, "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(1L -> ((3L, 1L, 666666L)),
      2L -> ((2L, 2L, 0L))))
  }

  test("intraListDiversity: identical list 0, orthogonal list 1e6") {
    val emb = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(1f, 0f)),
      (3L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val recs = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 3L))
      .toDF("qid", "id")
    val got = Similarity.intraListDiversity(recs, emb, "qid", "id",
        "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got == Map(10L -> ((1L, 0L)), 20L -> ((1L, 1000000L))))
  }

  test("silhouetteSimplified: centroid points score 1, a straddler scores (b-a)/b") {
    val cents = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("cid", "cvec")
    val assigned = Seq(
      (10L, Seq(1.0f, 0.0f), 0L),  // exactly on centroid 0 → s = 1
      (11L, Seq(0.0f, 1.0f), 1L),  // exactly on centroid 1 → s = 1
      (12L, Seq(0.8f, 0.6f), 0L))  // a = .2, b = .4 → s = .5
      .toDF("vec_id", "embedding", "cid")
    val got = Similarity.silhouetteSimplified(assigned, cents, "vec_id",
        "embedding", "cid")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(1L) == ((1L, 1000000L)))
    val (n0, s0) = got(0L)
    assert(n0 == 2L && math.abs(s0 - 750000L) <= 5L, s"cell0 $s0")
  }

  test("ivfBalance: uniform two-cell assignment has ln2 entropy, imbalance k·max/n") {
    val assigned = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("vec_id", "cid")
    val r = Similarity.ivfBalance(assigned, "cid").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 4L, 2L, 2L)))
    assert(r.getLong(4) == 1000000L) // perfectly balanced
    assert(math.abs(r.getLong(5) - 693147L) <= 1L) // ln 2 micros
  }

  test("containmentPairsBanded ⊆ exact with identical scores; df cap prunes stopword-only pairs") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 300)
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = asSet(Dedup.containmentPairs(docs, "text", "doc_id", 2, 0.1))
    // generous cap: banded must reproduce the exact result here
    val banded = asSet(Dedup.containmentPairsBanded(
      docs, "text", "doc_id", 2, 0.1, maxDf = 1000))
    assert(banded == exact, s"banded ${banded.size} vs exact ${exact.size}")
    // tight cap: still a subset, with the SAME score per surviving pair
    val capped = asSet(Dedup.containmentPairsBanded(
      docs, "text", "doc_id", 2, 0.1, maxDf = 4))
    assert(capped.subsetOf(exact), "df-capped pairs must verify exactly")
    // a pair whose only shared shingle is hot (df > cap) must be pruned
    val hot = Seq((1L, "the of the of x1 y1"), (2L, "the of z2 w2"),
      (3L, "the of q3 r3")).toDF("doc_id", "text")
    assert(Dedup.containmentPairsBanded(hot, "text", "doc_id", 2, 0.1,
      maxDf = 2).isEmpty)
    assert(Dedup.containmentPairs(hot, "text", "doc_id", 2, 0.1)
      .count() > 0)
  }

  test("truncationRecall: truncation flips the winner at k=1, agrees at k=2") {
    // q=[0,1,1,1]: full winner is 2 (cos ⅔ vs 0.577); first-2-dims
    // winner is 1 (cos 1 vs 0) — the ablation the metric must expose
    val emb = Seq(
      (0L, Seq(0f, 1f, 1f, 1f)),
      (1L, Seq(0f, 1f, 0f, 0f)),
      (2L, Seq(1f, 0f, 1f, 1f))).toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0L)
    val r1 = Similarity.truncationRecall(emb, q, "vec_id", "embedding",
      dims = 2, k = 1).collect()
    assert(r1.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 0L)))
    val r2 = Similarity.truncationRecall(emb, q, "vec_id", "embedding",
      dims = 2, k = 2).collect()
    assert(r2.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 2L)))
  }

  test("kmeansFit stops at the distinct-direction count instead of duplicating centroids") {
    // 5 points, only 2 distinct directions, k=3 requested
    val pts = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, 3.0f))
    ).toDF("id", "vec")
    for (pool <- Seq(0, 16)) {
      val (assigned, cents) = Similarity.kmeansFit(pts, "id", "vec",
        k = 3, iters = 2, seedPool = pool)
      assert(cents.count() == 2, s"pool=$pool: 2 distinct directions -> 2 centroids")
      val clusters = assigned.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(clusters.values.toSet.size == 2)
      assert(clusters(0L) == clusters(1L) && clusters(1L) == clusters(2L))
      assert(clusters(3L) == clusters(4L))
    }
  }

  test("kmeansFit: zero-norm vectors are never seeds and never duplicate centroids") {
    // a zero vector scores -1 against everything: if it were seedable,
    // farthest-first would pick it and then re-pick it k times (its
    // self-similarity is NaN, not the 1.0 the duplicate guard detects)
    val pts = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.0f, 0.0f))
    ).toDF("id", "vec")
    for (pool <- Seq(0, 16)) {
      val (assigned, cents) = Similarity.kmeansFit(pts, "id", "vec",
        k = 3, iters = 2, seedPool = pool)
      val cvs = cents.collect().map(_.getSeq[Float](1).toSeq)
      assert(cvs.length == 3, s"pool=$pool: 3 non-zero directions seeded")
      assert(cvs.distinct.length == 3, s"pool=$pool: no duplicated centroid")
      assert(cvs.forall(_.exists(_ != 0f)), s"pool=$pool: no zero centroid")
      assert(assigned.count() == 4, "zero vector still assigned")
    }
  }

  test("kmeansFit: zero-norm vector lands deterministically in cluster 0, no NaN/NULL") {
    val pts = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.0f, 0.0f)) // zero norm
    ).toDF("id", "vec")
    val (assigned, _) = Similarity.kmeansFit(pts, "id", "vec",
      k = 2, iters = 2, seedPool = 0)
    val rows = assigned.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows(3L) == 0, "all sims -1 -> first-max argmax -> cluster 0")
    assert(rows.size == 4, "no row dropped or nulled")
  }

  test("normStats: exact integer norms, rank-selected quantiles") {
    import graft.operators.Similarity
    // (3,4) -> norm 5e6 micros; zero vector -> 0
    val emb = Seq((1L, Seq(3.0f, 4.0f)), (2L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.normStats(emb, "vec_id", "embedding").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getLong(6)) ==
      ((2L, 2L, 2L, 2500000L, 0L, 5000000L, 5000000L)))
  }

  test("semDeDup prunes planted in-cluster duplicates; centroids serve ivfTopK") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 80).select(col("vec_id"), col("embedding"))
    val planted = emb.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val (survivors, cents) = Similarity.semDeDup(emb.unionAll(planted),
      "vec_id", "embedding", k = 4, threshold = 0.95, iters = 2, seedPool = 32)
    // survivor set == originals: every copy has a smaller-id twin at sim
    // 1.0 in its own cluster; random originals never cross 0.95
    assert(survivors.select("id").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 80L))
    // the SAME fit serves the ANN index: ivfTopK over the fitted
    // centroids with full probing must recover each planted twin at top-1
    val q = emb.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
    val top1 = Similarity.ivfTopK(q, emb, cents, "vec_id", "embedding",
      "vec_id", "embedding", k = 1, nprobe = 4)
    val hits = top1.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.length == 80)
    hits.foreach { case (qid, id, sim) =>
      assert(id == qid - 10000 && sim == 1.0, s"twin miss for $qid") }
  }

  test("duplicated n-gram spans: cross-doc detection, island merge, within-doc excluded") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a quick brown fox jumps over a fence today yes"),
      (3L, "x y z x y z"),                       // within-doc repeat only
      (4L, "quick brown fox END fox jumps over") // two disjoint dup spans
    ).toDF("doc_id", "text")

    val grams = Dedup.duplicatedNgrams(docs, "doc_id", "text", 3, 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(grams == Map(
      "quick brown fox" -> ((3L, 3L)),
      "brown fox jumps" -> ((2L, 2L)),
      "fox jumps over"  -> ((3L, 3L))))
    assert(!grams.contains("x y z")) // df=1: within-doc repeats don't count

    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", 3, 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getLong(3))))
      .toMap
    // docs 1/2: hits at starts 1,2,3 — one merged island [1, 6)
    // doc 4: hits at 0 and 4 — 4 > 0+3, so two islands [0,3) and [4,7)
    assert(spans == Map(
      (1L, 1) -> ((6, 3L)), (2L, 1) -> ((6, 3L)),
      (4L, 0) -> ((3, 1L)), (4L, 4) -> ((7, 1L))))
  }
}
