package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Eval, GraphAnalytics, Hybrid, SearchIndex, Similarity}

/** Golden tests for the round-9 evaluation / fusion / diversity /
  * graph-quality operators: rank-AUC, calibration bins, RRF fusion,
  * batch search, MMR, modularity, landmark distances.
  */
class EvalHybridSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ AUC

  test("aucRank: perfect, inverted, and tie-corrected hand cases") {
    // perfect separation: all positives above all negatives -> AUC 1
    val perfect = Seq((1, 900000L), (1, 800000L), (0, 200000L), (0, 100000L))
      .toDF("y", "p")
    val r1 = Eval.aucRank(perfect, "y", "p").collect()(0)
    assert(r1.getAs[Long]("n_pos") === 2L)
    assert(r1.getAs[Long]("n_neg") === 2L)
    assert(r1.getAs[Long]("auc_micros") === 1000000L)

    // inverted -> AUC 0
    val inverted = Seq((0, 900000L), (0, 800000L), (1, 200000L), (1, 100000L))
      .toDF("y", "p")
    assert(Eval.aucRank(inverted, "y", "p").collect()(0)
      .getAs[Long]("auc_micros") === 0L)

    // all four tied at one score -> AUC exactly 1/2 (average ranks)
    val tied = Seq((1, 500000L), (1, 500000L), (0, 500000L), (0, 500000L))
      .toDF("y", "p")
    assert(Eval.aucRank(tied, "y", "p").collect()(0)
      .getAs[Long]("auc_micros") === 500000L)

    // mixed with a tie straddling the classes:
    // scores: pos {3, 2}, neg {2, 1} -> ranks 1,(2.5,2.5),4
    // R+ = 4 + 2.5 = 6.5, U = 6.5 - 3 = 3.5, AUC = 3.5/4 = 0.875
    val mixed = Seq((1, 3L), (1, 2L), (0, 2L), (0, 1L)).toDF("y", "p")
    assert(Eval.aucRank(mixed, "y", "p").collect()(0)
      .getAs[Long]("auc_micros") === 875000L)
  }

  test("calibrationBins + ece: hand case with top-edge clamp") {
    // bins=2: p<500000 -> bin 0, else bin 1; p=1e6 clamps into bin 1
    val df = Seq((0, 100000L), (1, 300000L), (1, 700000L), (1, 1000000L))
      .toDF("y", "p")
    val bins = Eval.calibrationBins(df, "y", "p", 2)
    val rows = bins.collect().map(r => r.getAs[Long]("bin") -> r).toMap
    assert(rows(0L).getAs[Long]("n") === 2L)
    assert(rows(0L).getAs[Long]("n_pos") === 1L)
    assert(rows(0L).getAs[Long]("acc_micros") === 500000L)
    assert(rows(0L).getAs[Long]("conf_micros") === 200000L)
    assert(rows(1L).getAs[Long]("n") === 2L)
    assert(rows(1L).getAs[Long]("acc_micros") === 1000000L)
    assert(rows(1L).getAs[Long]("conf_micros") === 850000L)
    // ECE = (2*|500000-200000| + 2*|1000000-850000|) / 4 = 225000
    val e = Eval.ece(bins).collect()(0)
    assert(e.getAs[Long]("n") === 4L)
    assert(e.getAs[Long]("ece_micros") === 225000L)
  }

  // ----------------------------------------------------------- BLEU

  test("corpusBleu: identical pair scores exactly 1e6") {
    val pairs = Seq((1L, "a b c d e", "a b c d e")).toDF("pid", "c", "r")
    val row = Eval.corpusBleu(pairs, "pid", "c", "r", 4).collect()(0)
    assert(row.getAs[Long]("bleu_micros") === 1000000L)
    assert(row.getAs[Long]("match_4") === 2L)
    assert(row.getAs[Long]("total_4") === 2L)
  }

  test("corpusBleu: clipping caps repeated grams; zero n-gram overlap zeroes BLEU") {
    // the classic clipping case: 7×"the" vs "the cat" — unigram match
    // clips to 1, no bigram overlap → BLEU 0 but counts still report
    val pairs = Seq((1L, "the the the the the the the", "the cat"))
      .toDF("pid", "c", "r")
    val row = Eval.corpusBleu(pairs, "pid", "c", "r", 2).collect()(0)
    assert(row.getAs[Long]("match_1") === 1L)
    assert(row.getAs[Long]("total_1") === 7L)
    assert(row.getAs[Long]("match_2") === 0L)
    assert(row.getAs[Long]("bleu_micros") === 0L)
  }

  test("corpusBleu: brevity penalty branch and corpus pooling match hand math") {
    // truncated candidate: every n-gram matches, BP = exp(1 - 6/4)
    val short = Seq((1L, "a b c d", "a b c d e f")).toDF("pid", "c", "r")
    val r1 = Eval.corpusBleu(short, "pid", "c", "r", 4).collect()(0)
    assert(r1.getAs[Long]("c_len") === 4L)
    assert(r1.getAs[Long]("r_len") === 6L)
    assert(r1.getAs[Long]("bleu_micros") ===
      math.round(1e6 * math.exp(1.0 - 6.0 / 4)))
    // pooling across pairs: counts sum over the corpus BEFORE the
    // precision ratio (corpus BLEU, not mean sentence BLEU)
    val two = Seq((1L, "a b", "a b"), (2L, "x y", "x z")).toDF("pid", "c", "r")
    val r2 = Eval.corpusBleu(two, "pid", "c", "r", 2).collect()(0)
    assert(r2.getAs[Long]("match_1") === 3L) // 2 + 1 (y misses)
    assert(r2.getAs[Long]("match_2") === 1L) // "a b" only
    assert(r2.getAs[Long]("bleu_micros") ===
      math.round(1e6 * math.exp((math.log(3.0 / 4) + math.log(1.0 / 2)) / 2)))
  }

  // ------------------------------------------------------------ RRF

  test("rrf: hand-computed fusion, rank ties broken by id") {
    // run A ranks: d1=1, d2=2; run B ranks: d2=1, d3=2
    val runA = Seq((0L, 1L, 10.0), (0L, 2L, 5.0)).toDF("qid", "id", "score")
    val runB = Seq((0L, 2L, 0.9), (0L, 3L, 0.8)).toDF("qid", "id", "score")
    val got = Hybrid.rrf(Seq(runA, runB), k = 3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("rrf_micros")))
    val c1 = 1000000L / 61 // floor contributions
    val c2 = 1000000L / 62
    // d2 appears in both runs (rank 2 + rank 1) and must win
    assert(got.toSeq === Seq((2L, c2 + c1), (1L, c1), (3L, c2)))
  }

  test("batchQuery: equals per-query loop of SearchIndex scoring") {
    val docs = Seq(
      (0L, "spark join fast"), (1L, "spark spark window"),
      (2L, "join window batch"), (3L, "stream batch spark join")
    ).toDF("doc_id", "text")
    val (postings, stats, n) = SearchIndex.build(docs, "doc_id", Seq("text"))
    val batch = docs.filter(col("doc_id") < 2)
      .select(col("doc_id").as("qid"),
        explode(graft.functions.GraftFunctions.tokenize(col("text")))
          .as("term"))
    val got = SearchIndex.batchQuery(postings, stats, n, "text", batch, 10,
        excludeSelf = true)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("id"),
        r.getAs[Long]("score")))
    // per-query twin: same integer-milli fold via SearchIndex.query's
    // idf formula, computed per query text
    for (qid <- Seq(0L, 1L)) {
      val qtext = docs.filter(col("doc_id") === qid)
        .collect()(0).getAs[String]("text")
      val terms = qtext.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
      val idf = stats.filter(col("term").isin(terms.toSeq: _*))
        .select(col("term"),
          log(lit(1.0)
            + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
            .as("idf"))
      val expect = postings.filter(col("term").isin(terms.toSeq: _*))
        .join(idf, "term")
        .filter(col("doc") =!= qid)
        .groupBy(col("doc"))
        .agg(sum(round(col("tf") * col("idf") * lit(1000.0)).cast("long"))
          .as("score"))
        .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Long]("score")))
        .toMap
      val mine = got.filter(_._1 == qid).map(t => t._2 -> t._3).toMap
      assert(mine === expect, s"qid $qid")
    }
  }

  test("fleissKappa: hand-computed 4-item 3-rater case; unanimity guard") {
    // votes n1 = 3,0,2,1: pbar = 16/24, p1 = 1/2, pe = 1/2 ->
    // kappa = 1/3 -> 333333
    val df = Seq((1L, 1L, 1L), (0L, 0L, 0L), (1L, 1L, 0L), (1L, 0L, 0L))
      .toDF("r1", "r2", "r3")
    val r = Eval.fleissKappa(df, Seq("r1", "r2", "r3")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 3L, 16L, 6L, 333333L)))
    val uni = Seq((1L, 1L, 1L), (1L, 1L, 1L)).toDF("r1", "r2", "r3")
    assert(Eval.fleissKappa(uni, Seq("r1", "r2", "r3")).head()
      .getLong(4) == 0L)
  }

  test("errAtK: hand-computed cascade sum, exact rational numerator") {
    // grades 3,0,2 at ranks 1..3 (denom 8, lcm(1..3) = 6, D = 3072):
    // ERR = 7/8 + 0 + (1/3)(3/8)(1/8) = 57/64 -> err_num 2736,
    // err_micros floor(1e6*2736/3072) = 890625
    val run = Seq((1L, 10L, 3.0), (1L, 20L, 2.0), (1L, 30L, 1.0))
      .toDF("qid", "id", "score")
    val qrels = Seq((1L, 10L, 3L), (1L, 20L, 0L), (1L, 30L, 2L))
      .toDF("qid", "id", "grade")
    val r = Eval.errAtK(run, qrels, k = 3, maxGrade = 3).head()
    assert((r.getLong(1), r.getLong(2)) == ((2736L, 890625L)))
  }

  test("errAtK: unjudged run members grade 0; all-zero grades give 0") {
    val run = Seq((1L, 10L, 2.0), (1L, 20L, 1.0)).toDF("qid", "id", "score")
    val qrels = Seq((1L, 99L, 3L)).toDF("qid", "id", "grade")
    val r = Eval.errAtK(run, qrels, k = 3, maxGrade = 3).head()
    assert((r.getLong(1), r.getLong(2)) == ((0L, 0L)))
  }

  test("ndcgAtK: perfect ranking scores 1e6; swapped ranking matches hand math") {
    val qrels = Seq((0L, 10L, 3L), (0L, 11L, 2L), (0L, 12L, 1L))
      .toDF("qid", "id", "rel")
    // run in ideal order -> ndcg exactly 1.0
    val perfect = Seq((0L, 10L, 30.0), (0L, 11L, 20.0), (0L, 12L, 10.0))
      .toDF("qid", "id", "score")
    assert(Eval.ndcgAtK(perfect, qrels, 2).collect()(0)
      .getAs[Long]("ndcg_micros") === 1000000L)
    // swapped top-2 (11 before 10), k=2 — replicate the integer-micro
    // discount arithmetic exactly
    val swapped = Seq((0L, 11L, 30.0), (0L, 10L, 20.0)).toDF("qid", "id", "score")
    val r = Eval.ndcgAtK(swapped, qrels, 2).collect()(0)
    val dcg = math.floor(1e6 * 2 / (math.log(2) / math.log(2))).toLong +
      math.floor(1e6 * 3 / (math.log(3) / math.log(2))).toLong
    val idcg = math.floor(1e6 * 3 / (math.log(2) / math.log(2))).toLong +
      math.floor(1e6 * 2 / (math.log(3) / math.log(2))).toLong
    assert(r.getAs[Long]("dcg_micros") === dcg)
    assert(r.getAs[Long]("idcg_micros") === idcg)
    assert(r.getAs[Long]("ndcg_micros") ===
      math.floor(1e6 * dcg / idcg).toLong)
  }

  // ------------------------------------------------------------ PMI

  test("pmiPairs: window bounds and hand-computed PMI values") {
    // window-2 pair extraction over one doc: (a,d) is out of range
    val doc = Seq(Tuple1("a b c d")).toDF("text")
    val got = graft.operators.TextAnalysis.pmiPairs(doc, "text", 2, 1L)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        r.getAs[Long]("n_ab")).toMap
    assert(got.keySet === Set(("a", "b"), ("a", "c"), ("b", "c"),
      ("b", "d"), ("c", "d")))
    assert(got.values.forall(_ == 1L))

    // PMI arithmetic: "x y" x8, "z w" x2 -> T=10;
    // pmi(x,y) = ln(8*10/(8*8)) = ln(1.25); pmi(w,z) = ln(2*10/(2*2)) = ln(5)
    val corpus = (Seq.fill(8)("x y") ++ Seq.fill(2)("z w"))
      .toDF("text")
    val pmi = graft.operators.TextAnalysis.pmiPairs(corpus, "text", 3, 2L)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        r.getAs[Long]("pmi_micros")).toMap
    assert(pmi(("x", "y")) === math.round(1e6 * math.log(1.25)))
    assert(pmi(("w", "z")) === math.round(1e6 * math.log(5.0)))
  }

  // ------------------------------------------------------------ MMR

  test("mmr: first pick is the top-sim item; duplicate is skipped for diversity") {
    // query q at e1; corpus: a ~ q, a2 == a (duplicate), b orthogonal-ish
    val q = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.9f, 0.1f, 0.0f)),  // closest to q
      (2L, Array(0.9f, 0.1f, 0.0f)),  // exact duplicate of 1
      (3L, Array(0.5f, 0.0f, 0.5f))   // farther from q, but novel
    ).toDF("vec_id", "embedding")
    val got = Similarity.mmr(q, corpus, "vec_id", "embedding",
        "vec_id", "embedding", nCand = 3, k = 2, lambda = 0.5)
      .orderBy(col("step"))
      .collect().map(r => (r.getAs[Int]("step"), r.getAs[Long]("id")))
    // step 1: id 1 (highest sim, tie with 2 broken by id asc)
    // step 2: id 3 — the duplicate (id 2, sim-to-selected = 1.0) loses
    // to the novel item despite higher query similarity
    assert(got.toSeq === Seq((1, 1L), (2, 3L)))
  }

  test("rankMetricsAtK: hand-computed MRR/P/R, no-hit query, qrels-only queries") {
    // q1: run (10,20,30) by score; relevant {20, 99} -> hit at rank 2
    // q2: run (40); relevant {50} -> no hit
    // q3: judged but never retrieved -> all-zero row must still appear
    val run = Seq((1L, 10L, 3.0), (1L, 20L, 2.0), (1L, 30L, 1.0),
      (2L, 40L, 1.0)).toDF("qid", "id", "score")
    val qrels = Seq((1L, 20L), (1L, 99L), (2L, 50L), (3L, 7L))
      .toDF("qid", "id")
    val got = graft.operators.Eval.rankMetricsAtK(run, qrels, 3)
      .collect().map(r => r.getAs[Long]("qid") ->
        ((r.getAs[Long]("n_rel"), r.getAs[Long]("n_hit"),
          r.getAs[Long]("mrr_micros"), r.getAs[Long]("prec_micros"),
          r.getAs[Long]("recall_micros")))).toMap
    assert(got(1L) === ((2L, 1L, 500000L, 333333L, 500000L)))
    assert(got(2L) === ((1L, 0L, 0L, 0L, 0L)))
    assert(got(3L) === ((1L, 0L, 0L, 0L, 0L)))
    assert(got.size === 3)
  }

  test("mmrIndexed at nprobe = #cells equals brute-force mmr exactly") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") < 3)
    val (_, cents) =
      Similarity.kmeansFit(emb, "vec_id", "embedding", k = 4, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Int]("step"),
        r.getAs[Long]("id"), r.getAs[Double]("mmr"))).toSeq
    val brute = rows(Similarity.mmr(q, emb, "vec_id", "embedding",
      "vec_id", "embedding", nCand = 15, k = 5, lambda = 0.5))
    // full probe: the IVF candidate set IS the brute-force top-nCand
    // (same rounded sims, same id tiebreak) -> identical greedy picks
    val idx = rows(Similarity.mmrIndexed(q, emb, cents, "vec_id", "embedding",
      "vec_id", "embedding", nCand = 15, k = 5, lambda = 0.5, nprobe = 4))
    assert(brute.nonEmpty && idx === brute)
  }

  // ----------------------------------------------------- modularity

  test("modularity: two triangles joined by one edge, hand-computed") {
    // communities {1,2,3} and {4,5,6}; m = 7 edges; e_c = 3 each;
    // d_c = 7 each: Q = 2*(3/7 - (7/14)^2) = 2*(3/7 - 1/4)
    // per-community term: floor(1e6*(4*7*3 - 49)/(4*49)) = floor(1e6*35/196)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val comms = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("id", "lbl")
    val r = GraphAnalytics.modularity(edges, comms).collect()(0)
    assert(r.getAs[Long]("m") === 7L)
    assert(r.getAs[Long]("n_comms") === 2L)
    val term = math.floor(1e6 * (4 * 7 * 3 - 49) / (4.0 * 49)).toLong
    assert(r.getAs[Long]("q_micros") === 2 * term)
    // single community over everything -> exactly 0
    val one = comms.select(col("id"), lit(0L).as("lbl"))
    assert(GraphAnalytics.modularity(edges, one).collect()(0)
      .getAs[Long]("q_micros") === 0L)
  }

  test("landmarkDistances: agrees with harmonic's BFS on a path graph") {
    // path 1-2-3-4-5; landmarks are hash-spread but BFS distances are
    // checkable directly: d(s,v) = |s - v| within depth 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = GraphAnalytics.landmarkDistances(edges, numSources = 5,
        maxDepth = 2)
      .collect().map(r => (r.getAs[Long]("s"), r.getAs[Long]("v")) ->
        r.getAs[Int]("d")).toMap
    // all 5 vertices are landmarks (numSources = 5)
    for (s <- 1L to 5L; v <- 1L to 5L) {
      val d = math.abs(s - v).toInt
      if (d <= 2) assert(got((s, v)) === d, s"d($s,$v)")
      else assert(!got.contains((s, v)), s"d($s,$v) beyond horizon")
    }
  }

  test("averagePrecisionAtK: hand-computed AP, no-hit query, @k normalization") {
    import spark.implicits._
    // q1: relevant at ranks 1 and 3 of {a,b,c,d} → AP terms 1/1, 2/3;
    // n_rel = 2 → ap = (1000000 + 666666) / 2 = 833333
    val run = Seq((1L, "a", 40L), (1L, "b", 30L), (1L, "c", 20L),
      (1L, "d", 10L), (2L, "a", 5L), (2L, "b", 4L))
      .toDF("qid", "id", "score")
    val qrels = Seq((1L, "a"), (1L, "c"), (2L, "zzz"))
      .toDF("qid", "id")
    val got = graft.operators.Eval.averagePrecisionAtK(run, qrels, 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (2L, 2L, 833333L))
    assert(got(2L) == (1L, 0L, 0L)) // judged but never retrieved
    // @k normalization: k=1 cuts the run to rank 1 (one hit of two
    // relevant) but divides by min(n_rel, k) = 1 → AP@1 = 1.0
    val at1 = graft.operators.Eval.averagePrecisionAtK(run, qrels, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(at1(1L) == 1000000L)
  }

  test("teamDraft: balanced picks, per-team run order, taken docs skipped") {
    import spark.implicits._
    val runA = Seq((1L, "a1", 40L), (1L, "a2", 30L), (1L, "sh", 20L),
      (1L, "a4", 10L)).toDF("qid", "id", "score")
    val runB = Seq((1L, "sh", 40L), (1L, "b2", 30L), (1L, "b3", 20L),
      (1L, "b4", 10L)).toDF("qid", "id", "score")
    val got = graft.operators.Hybrid.teamDraft(runA, runB, 6)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.length == 6)
    // team balance: at every prefix |#A - #B| <= 1
    var na = 0; var nb = 0
    got.foreach { case (_, _, tm) =>
      if (tm == "A") na += 1 else nb += 1
      assert(math.abs(na - nb) <= 1, s"unbalanced at $got")
    }
    assert(na == 3 && nb == 3)
    // per-team picks follow each run's own rank order
    def order(team: String, run: Seq[String]) = {
      val picks = got.filter(_._3 == team).map(_._2).toSeq
      assert(picks == run.filter(picks.contains(_)).take(picks.length),
        s"$team picks $picks out of order")
    }
    order("A", Seq("a1", "a2", "sh", "a4"))
    order("B", Seq("sh", "b2", "b3", "b4"))
    // the shared doc appears exactly once (skip-taken rule)
    assert(got.count(_._2 == "sh") == 1)
    // positions are 1..6 with no gaps
    assert(got.map(_._1).toSeq == (1 to 6).toSeq)
  }

  test("teamDraft: exhausted team falls through to the other run") {
    import spark.implicits._
    // team A has ONE doc; once taken, every later preferred-A step must
    // fall through to B's best remaining doc instead of emitting nothing
    val runA = Seq((1L, "a1", 40L)).toDF("qid", "id", "score")
    val runB = Seq((1L, "b1", 40L), (1L, "b2", 30L), (1L, "b3", 20L),
      (1L, "b4", 10L)).toDF("qid", "id", "score")
    val got = graft.operators.Hybrid.teamDraft(runA, runB, 5)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    // all 5 distinct docs drafted, positions 1..5, no starvation
    assert(got.map(_._1).toSeq == (1 to 5).toSeq, got.mkString(","))
    assert(got.map(_._2).toSet == Set("a1", "b1", "b2", "b3", "b4"))
    // a1 keeps team A credit; B picks stay in B's run order
    assert(got.filter(_._2 == "a1").head._3 == "A")
    val bPicks = got.filter(_._3 == "B").map(_._2).toSeq
    assert(bPicks == Seq("b1", "b2", "b3", "b4").filter(bPicks.contains(_)))
  }

  test("teamDraft: single-pass expression equals the round-by-round spec") {
    import spark.implicits._
    // multi-query, overlapping docs, score ties, uneven run lengths —
    // every draft rule exercised; long ids (the gate shape)
    val rnd = new scala.util.Random(11)
    def run(seed: Int) = (1 to 40).map { i =>
      (i % 7L, (rnd.nextInt(15) + seed * 100).toLong,
        rnd.nextInt(5).toLong)
    }.distinct.toDF("qid", "id", "score")
    val a = run(0); val b = run(1).unionAll(run(0).limit(10))
    for (k <- Seq(1, 3, 6)) {
      val fast = graft.operators.Hybrid.teamDraft(a, b, k).collect().toSet
      val spec = graft.operators.Hybrid.teamDraftRounds(a, b, k)
        .orderBy(col("qid"), col("pos")).collect().toSet
      assert(fast == spec, s"k=$k")
    }
  }

  test("textRank: the hub word outranks equally-frequent spokes") {
    import spark.implicits._
    // "core" co-occurs with every spoke; spokes only see "core" and
    // one neighbor — centrality concentrates on the hub
    val docs = (1 to 6).flatMap(i => Seq.fill(3)(
      (i.toLong, s"core spoke$i core spoke$i"))).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .textRankKeywords(docs, "text", window = 3, minCount = 2L,
        topN = 10, iters = 3)
      .collect().map(r => (r.getString(0), r.getInt(2)))
    assert(got.head._1 == "core" && got.head._2 == 1, got.mkString(","))
    assert(got.length == 7) // hub + 6 spokes survive minCount
  }

  test("winnow: shared-run guarantee, density, rightmost tie on a repeated gram") {
    import spark.implicits._
    val a = "the quick brown fox jumps over the lazy dog tonight"
    val b = "we saw the quick brown fox jumps over a fence yesterday"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fp = graft.operators.TextAnalysis
      .winnow(docs, "doc_id", "text", k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
    // shared token run "the quick brown fox jumps over" has length 6
    // = w + k - 1 → the guarantee: at least one shared fingerprint
    assert((h1 & h2).nonEmpty, s"no shared fingerprint: $h1 vs $h2")
    // density: selected positions are a strict subset of all positions
    assert(fp.count(_._1 == 1L) < 8) // doc 1 has 8 shingle positions
    // rightmost tie: a doc of one repeated token has equal hashes
    // everywhere — each window keeps its RIGHTMOST position, so the
    // selected set is every position from w-1 on (windows slide by 1)
    val rep = Seq((3L, Array.fill(8)("x").mkString(" ")))
      .toDF("doc_id", "text")
    val rfp = graft.operators.TextAnalysis
      .winnow(rep, "doc_id", "text", k = 3, w = 4)
      .collect().map(_.getLong(1)).sorted
    assert(rfp.toSeq == Seq(3L, 4L, 5L)) // 6 shingles, windows 0..2
  }
}
