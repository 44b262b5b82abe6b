package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — combining a lexical run
  * ([[SearchIndex]] BM25/tf-idf) with a dense run ([[Similarity]]
  * cosine ANN) per query, the standard first stage of a modern
  * retrieval pipeline (and of retrieval-based training-data curation:
  * fuse keyword and embedding recall before dedup/selection).
  *
  * Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
  * `score(d) = Σ_runs 1/(k0 + rank_run(d))` — rank-based, so the runs'
  * incomparable score scales (integer tf-idf millis vs cosine in
  * [-1,1]) never need calibrating. k0 = 60 per the paper.
  */
object Hybrid {

  /** Fuse ranked runs. Each run is (qid, id, score) with scores
    * already quantized by the retriever (integer millis / 4-decimal
    * sims — the round-9 audit rule: any float-scored top-k quantizes
    * BEFORE ranking); within a run, rank = row_number by
    * (score desc, id asc).
    *
    * Per-run contributions are `floor(1e6/(k0+rank))` INTEGER micros,
    * so the fused sum is order-independent and engine-exact; the
    * fused ranking ties break id asc.
    *
    * 100 TB shape: each run is already top-k-bounded per query (k
    * rows/query — retrievers rank-limit at source), so the per-run
    * window sorts k rows per query, the union shuffles runs·k rows
    * per query once on qid, and the final top-k is the bounded-heap
    * aggregate ([[TopK.grouped]]), never a corpus-wide sort.
    *
    * @return (qid, id, rrf_micros) — top `k` per query, ranked
    *         (rrf_micros desc, id asc).
    */
  def rrf(runs: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrf needs at least one run")
    val contribs = runs.map { r =>
      val w = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
      r.select(col("qid"), col("id"), row_number().over(w).as("rank"))
        .select(col("qid"), col("id"),
          floor(lit(1e6) / (lit(k0) + col("rank"))).cast("long").as("c"))
    }
    val fused = contribs.reduce(_ unionAll _)
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("c")).as("rrf_micros"))
    TopK.grouped(fused, Seq("qid"),
        struct((-col("rrf_micros")).as("ns"), col("id").as("i")), k)
      .select(col("qid"), col("best.i").as("id"),
        (-col("best.ns")).as("rrf_micros"))
      .orderBy(col("qid"), desc("rrf_micros"), col("id"))
  }

  /** Team-draft interleaving (Radlinski, Kurup & Joachims, CIKM 2008)
    * — the ONLINE-eval companion to [[rrf]]: instead of fusing two
    * rankers, interleave them into one list users actually see, so
    * clicks credit the team whose pick earned them (an unbiased
    * paired ranker comparison with live traffic). Per position the
    * team with fewer picks goes next; ties flip the md5 coin
    * `md5("td:qid:pos") mod 2` — deterministic, rerun-stable, and
    * replayable, so the whole k-step draft unrolls in the SQL oracle.
    * Each team contributes its highest-ranked not-yet-selected doc
    * (docs already taken by the other team are skipped, the paper's
    * rule).
    *
    * Shape: runs arrive top-k-bounded; each of the k steps is one
    * count fold + one anti join + one bounded-heap argmin over the
    * k-bounded runs — the mmrFromCandidates loop cadence, O(1)
    * driver state.
    *
    * @return (qid, pos, id, team) — pos 1-based, team 'A'/'B'.
    */
  def teamDraft(runA: DataFrame, runB: DataFrame, k: Int): DataFrame = {
    def prep(df: DataFrame, tag: String) = {
      val w = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
      df.select(col("qid"), col("id"), col("score"))
        .withColumn("rnk", row_number().over(w))
        .withColumn("team", lit(tag))
        .drop("score")
    }
    // whole draft per query in ONE codegen pass (TeamDraftExpr): the
    // per-query state is independent, so k rounds of join/anti-join/
    // top-1 jobs collapse to rank → collect per qid → draft → explode.
    // [[teamDraftRounds]] keeps the round-by-round form as the
    // equivalence-tested executable spec (EvalHybridSpec).
    val runs = prep(runA, "A").unionByName(prep(runB, "B"))
    val cands = runs.groupBy("qid").agg(collect_list(struct(
      (col("team") === "A").as("isA"), col("rnk"), col("id"))).as("cands"))
    cands.select(col("qid"), explode(graft.functions.expr.TextExprs
        .team_draft(col("qid").cast("string"), col("cands"), k)).as("p"))
      .select(col("qid"), col("p.pos").as("pos"), col("p.id").as("id"),
        col("p.team").as("team"))
      .orderBy(col("qid"), col("pos"))
  }

  /** Round-by-round team draft — [[teamDraft]]'s executable spec (the
    * unrolled-oracle shape): k rounds of balance/coin team choice,
    * anti-join of taken docs, preferred-team-first top-1. */
  private[graft] def teamDraftRounds(runA: DataFrame, runB: DataFrame,
                                     k: Int): DataFrame = {
    def prep(df: DataFrame, tag: String) = {
      val w = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
      df.select(col("qid"), col("id"), col("score"))
        .withColumn("rnk", row_number().over(w))
        .withColumn("team", lit(tag))
        .drop("score")
    }
    val runs = prep(runA, "A").unionByName(prep(runB, "B"))
      .localCheckpoint(true)
    val qids = runs.select("qid").distinct().localCheckpoint(true)
    var selected = runs
      .select(col("qid"), lit(0).as("pos"), col("id"), col("team"))
      .limit(0)
    for (t <- 1 to k) {
      val cnt = selected.groupBy("qid").agg(
        sum(when(col("team") === "A", 1L).otherwise(0L)).as("na"),
        sum(when(col("team") === "B", 1L).otherwise(0L)).as("nb"))
      val coin = when(
        Sampling.md5Bucket(concat(lit("td:"), col("qid").cast("string"),
          lit(s":$t"))) % 2 === 0, lit("A")).otherwise(lit("B"))
      val team = qids.join(cnt, Seq("qid"), "left")
        .select(col("qid"),
          when(coalesce(col("na"), lit(0L)) < coalesce(col("nb"), lit(0L)),
            lit("A"))
            .when(coalesce(col("na"), lit(0L)) >
              coalesce(col("nb"), lit(0L)), lit("B"))
            .otherwise(coin).as("team"))
      // Candidates from BOTH teams, ordered (preferred-team-first, rnk,
      // id): when the preferred team's run is exhausted the other team's
      // best remaining doc is picked (the paper's fall-through) instead
      // of emitting nothing and starving the rest of the draft.
      val cands = runs
        .join(selected.select("qid", "id"), Seq("qid", "id"), "left_anti")
        .join(team.withColumnRenamed("team", "pref"), Seq("qid"))
      val pick = TopK.grouped(cands, Seq("qid"),
          struct(when(col("team") === col("pref"), 0).otherwise(1).as("np"),
            col("rnk").as("r"), col("id").as("i"),
            col("team").as("tm")), 1)
        .select(col("qid"), lit(t).as("pos"), col("best.i").as("id"),
          col("best.tm").as("team"))
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    selected.orderBy(col("qid"), col("pos"))
  }
}
