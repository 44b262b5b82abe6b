package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate analytics — the D-tier counting extensions
  * (SURVEY §2.D counts/hit-totals) re-expressed for 100 TB, where
  * exact `count(DISTINCT …)` is a full shuffle of every distinct value
  * and exact percentiles are a global sort.
  *
  * Two properties carry the scale story:
  *  - **Bounded state**: an HLL sketch (Spark's DataSketches-backed
  *    `hll_sketch_agg`) is a few KB per group regardless of
  *    cardinality; a KLL/GK quantile summary (`percentile_approx`)
  *    is O(1/ε) per group. Partial aggregation stays map-side.
  *  - **Mergeability**: sketches of disjoint slices union into the
  *    sketch of the whole — register-wise max for HLL — so per-day /
  *    per-partition sketches can be PRE-COMPUTED, stored a few KB per
  *    slice, and folded over any date range without rescanning raw
  *    data. [[distinctContract]] gate-checks exactly this: the
  *    union-of-slice-sketches estimate must EQUAL the one-pass
  *    estimate, and both must sit within tolerance of exact.
  */
object Sketches {

  /** Per-group approximate distinct count, one pass (lgK-configurable
    * HLL; default 12 ≈ 1.6% relative standard error, ~2.5 KB/group). */
  def distinctEstimate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol), lgK))
        .as("approx_distinct"))

  /** The mergeable (pre-aggregated) shape: sketch per
    * (group, `bucketCol`) slice — the form you'd persist per day/
    * partition — then union the slice sketches per group and estimate.
    * NOTE: not bit-identical to [[distinctEstimate]] — DataSketches
    * HLL unions through a different internal mode than direct updates
    * (sparse→dense promotion differs), so the two estimates can drift
    * a fraction of the sketch's rse at high cardinality; they agree
    * exactly in sparse mode. [[distinctContract]] therefore pins
    * tolerance-agreement, not equality. */
  def distinctEstimateMerged(df: DataFrame, groupCols: Seq[String],
                             bucketCol: Column, valueCol: String,
                             lgK: Int = 12): DataFrame =
    df.groupBy((groupCols.map(col) :+ bucketCol.as("_bucket")): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("_sketch"))
      .groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("_sketch"))).as("approx_distinct"))

  /** Gate contract over both estimate paths vs exact: one row
    * (n_groups, n_merge_agree, n_within_tol). `n_merge_agree` counts
    * groups where the slice-merged estimate is within `tol` of the
    * one-pass estimate (mergeability — see the mode-drift note on
    * [[distinctEstimateMerged]]); `n_within_tol` where BOTH estimates
    * are within `tol` relative error of the exact distinct count. A
    * healthy engine reports (g, g, g). */
  /** EXACT distributed quantiles by global-rank selection — the
    * no-tolerance sibling of the approx percentile contract: the
    * quantile at q is the row whose global rank under the total order
    * `(valueCol, tieCol)` equals `max(1, ⌈q·N⌉)`. Rank comes from
    * [[Packing.globalRank]] (range partition + local windows +
    * O(#partitions) offsets) — NO single-partition global sort, the
    * plan that survives 100 TB where a global `ntile`/`percentile`
    * window cannot. Selection is one broadcast join against the
    * (q, rank) table.
    *
    * @param qsMicros quantiles in integer micros (500000 = median).
    * @return (q_micros, `valueCol`) one row per requested quantile.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, tieCol: String,
                     qsMicros: Seq[Long]): DataFrame = {
    val (ranked, n) = Packing.globalRank(
      df.select(col(valueCol), col(tieCol)), Seq(valueCol, tieCol))
    val spark = df.sparkSession
    import spark.implicits._
    val targets = qsMicros
      .map(q => (q, math.max(1L, math.ceil(q / 1e6 * n).toLong)))
      .toDF("q_micros", "rank")
    ranked.join(broadcast(targets), col("_grank") === col("rank"))
      .select(col("q_micros"), col(valueCol))
      .orderBy("q_micros")
  }

  /** md5-portable HyperLogLog distinct-count estimate — the
    * cross-engine sibling of [[distinctContract]]'s
    * `approx_count_distinct` (whose xxhash registers no other engine
    * can replay): 16 registers, `j = h mod 16`,
    * `rho = trailing-zero rank of ⌊h/16⌋` (`round(log2(w & −w))` —
    * SQL-exact on powers of two, 29 cap when the payload bits are all
    * zero), register folds are integer max, the harmonic sum is over
    * DYADIC 2⁻ʳʰᵒ terms (exact in double in any order) and the
    * small-range branch is linear counting — bit-identical across
    * engines, so the ESTIMATE itself is full-oracle, not just
    * tolerance-checked. One map-side-combined 16-row fold; mergeable
    * by construction (max of register tables).
    *
    * @return one row (n_rows, est). */
  def portableHllDistinct(df: DataFrame, valueCol: String): DataFrame = {
    val h = graft.operators.Sampling.md5Bucket(col(valueCol))
    val w = floor(h / lit(16)).cast("long")
    val rho = when(w === 0, lit(29L))
      .otherwise(round(log2(w.bitwiseAND(-w))).cast("long") + 1)
    val regs = df.select((h % 16).as("j"), rho.as("rho"),
        lit(1L).as("one"))
      .groupBy("j").agg(max(col("rho")).as("rho"), sum(col("one")).as("n"))
    val folded = regs.agg(
      (sum(pow(lit(2.0), -col("rho"))) + (lit(16) - count(lit(1)))).as("s"),
      (lit(16) - count(lit(1))).as("v0"),
      sum(col("n")).as("n_rows"))
    val raw = lit(0.673) * lit(256.0) / col("s")
    folded.select(col("n_rows"),
      when(raw <= lit(40.0) && col("v0") > 0,
        round(lit(16.0) * log(lit(16.0) / col("v0"))).cast("long"))
        .otherwise(round(raw).cast("long")).as("est"))
  }

  /** Per-KEY [[portableHllDistinct]] — distinct users per domain /
    * per event type / per tenant in ONE pass: the same md5-portable
    * 16-register sketch, grouped. Register state is 16 rows per key
    * (mergeable integer max — partial aggregation collapses the fan-in
    * map-side), the dyadic harmonic fold stays order-free-exact, so
    * every per-key ESTIMATE is a full-oracle value, not a tolerance
    * check.
    *
    * @return (keyCol, n_rows, est) ordered by key.
    */
  def portableHllDistinctBy(df: DataFrame, keyCol: String,
                            valueCol: String): DataFrame = {
    val h = graft.operators.Sampling.md5Bucket(col(valueCol))
    val w = floor(h / lit(16)).cast("long")
    val rho = when(w === 0, lit(29L))
      .otherwise(round(log2(w.bitwiseAND(-w))).cast("long") + 1)
    val regs = df.select(col(keyCol).as("key"), (h % 16).as("j"),
        rho.as("rho"), lit(1L).as("one"))
      .groupBy("key", "j")
      .agg(max(col("rho")).as("rho"), sum(col("one")).as("n"))
    val folded = regs.groupBy("key").agg(
      (sum(pow(lit(2.0), -col("rho"))) + (lit(16) - count(lit(1)))).as("s"),
      (lit(16) - count(lit(1))).as("v0"),
      sum(col("n")).as("n_rows"))
    val raw = lit(0.673) * lit(256.0) / col("s")
    folded.select(col("key").as(keyCol), col("n_rows"),
        when(raw <= lit(40.0) && col("v0") > 0,
          round(lit(16.0) * log(lit(16.0) / col("v0"))).cast("long"))
          .otherwise(round(raw).cast("long")).as("est"))
      .orderBy(col(keyCol))
  }

  def distinctContract(df: DataFrame, groupCols: Seq[String],
                       bucketCol: Column, valueCol: String,
                       tol: Double = 0.05, lgK: Int = 12): DataFrame = {
    val exact = df.groupBy(groupCols.map(col): _*)
      .agg(countDistinct(col(valueCol)).as("exact_distinct"))
    val onePass = distinctEstimate(df, groupCols, valueCol, lgK)
      .withColumnRenamed("approx_distinct", "est1")
    val merged = distinctEstimateMerged(df, groupCols, bucketCol, valueCol, lgK)
      .withColumnRenamed("approx_distinct", "est2")
    exact.join(onePass, groupCols).join(merged, groupCols)
      .agg(count(lit(1)).as("n_groups"),
        count(when(abs(col("est1") - col("est2"))
          <= col("est1") * tol, 1)).as("n_merge_agree"),
        count(when(abs(col("est1") - col("exact_distinct"))
          <= col("exact_distinct") * tol &&
          abs(col("est2") - col("exact_distinct"))
          <= col("exact_distinct") * tol, 1)).as("n_within_tol"))
  }

  // ---------------------------------------------------- Count-Min sketch

  /** (d, b) cell coordinates of a value across all `depth` hash rows —
    * md5-derived ([[Sampling.md5Bucket]] over `"d:value"`) so every
    * cell is engine-portable and the DuckDB oracle recomputes the
    * sketch bit-for-bit. */
  private def cmsCells(value: Column, width: Int, depth: Int): Column =
    array((0 until depth).map(d => struct(lit(d).as("d"),
      pmod(Sampling.md5Bucket(concat_ws(":", lit(d), value)),
        lit(width)).as("b"))): _*)

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) of a value
    * column, AS A TABLE: (d, b, cnt) with at most depth·width rows —
    * fixed-size frequency state for unbounded key cardinality, the
    * counting sibling of the HLL sketch above. One keyed fold with
    * map-side partials (each input row contributes `depth` cell
    * increments; partials collapse to ≤ depth·width per task).
    * Estimates never under-count (`est ≥ exact` is a hard guarantee;
    * over-count ≤ e·N/width with prob 1−(1/e)^depth). Mergeable by
    * plain cell-wise ADDITION — persist per-day/per-partition
    * sketches and fold any range without rescanning
    * ([[cmsMerged]] / [[cmsContract]] pin this exactly, not within
    * tolerance: counts add). */
  def cmsBuild(df: DataFrame, valueCol: String,
               width: Int = 2048, depth: Int = 4): DataFrame =
    df.select(explode(cmsCells(col(valueCol), width, depth)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** The pre-aggregated shape: per-(group-slice) sketches summed
    * cell-wise — bit-identical to [[cmsBuild]] over the union (the
    * mergeability contract; HLL's union only promises tolerance). */
  def cmsMerged(df: DataFrame, valueCol: String, bucketCol: Column,
                width: Int = 2048, depth: Int = 4): DataFrame =
    df.select(bucketCol.as("_slice"),
        explode(cmsCells(col(valueCol), width, depth)).as("db"))
      .groupBy(col("_slice"), col("db.d").as("d"), col("db.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("d"), col("b"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for `keys` against a built sketch:
    * `est = min_d cnt[d][h_d(key)]` — the sketch (≤ depth·width rows)
    * broadcasts into the probe; empty cells read 0. */
  def cmsEstimate(keys: DataFrame, keyCol: String, sketch: DataFrame,
                  width: Int = 2048, depth: Int = 4): DataFrame =
    keys.select(col(keyCol),
        explode(cmsCells(col(keyCol), width, depth)).as("db"))
      .select(col(keyCol), col("db.d").as("d"), col("db.b").as("b"))
      .join(broadcast(sketch), Seq("d", "b"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Merge-exactness contract: the slice-merged sketch must equal the
    * one-pass sketch CELL-FOR-CELL. One row (n_cells, n_agree);
    * healthy = (n, n). */
  def cmsContract(df: DataFrame, valueCol: String, bucketCol: Column,
                  width: Int = 2048, depth: Int = 4): DataFrame = {
    val whole = cmsBuild(df, valueCol, width, depth)
    val merged = cmsMerged(df, valueCol, bucketCol, width, depth)
      .withColumnRenamed("cnt", "mcnt")
    whole.join(merged, Seq("d", "b"), "full")
      .agg(count(lit(1)).as("n_cells"),
        count(when(col("cnt") === col("mcnt"), 1)).as("n_agree"))
  }

  /** Equi-join cardinality estimation from two Count-Min sketches
    * (Cormode & Muthukrishnan 2005 §4.3): `|A ⋈ B|` on a key is the
    * inner product of the two key-frequency vectors, and the CMS
    * estimate is `min_d Σ_b cntA[d][b]·cntB[d][b]` — never an
    * under-estimate, over by ≤ n_A·n_B/width per row w.h.p. The
    * planner-style use at 100 TB: decide shuffle-vs-broadcast or
    * pre-size AQE partitions for a join WITHOUT running it, from two
    * KB-sized sketches that each cost one map-side-combined scan
    * (and which [[cmsMerged]] can fold incrementally per ingest
    * batch — estimate tomorrow's join from today's sketches).
    *
    * The full-outer cell join keeps depth rows whose cells co-occupy
    * nothing (ip = 0) so the min is taken over ALL depth rows.
    *
    * @return one row (depth, width, est_join_size).
    */
  def cmsJoinSize(a: DataFrame, keyA: String, b: DataFrame, keyB: String,
                  width: Int = 2048, depth: Int = 4): DataFrame = {
    val sa = cmsBuild(a, keyA, width, depth).withColumnRenamed("cnt", "ca")
    val sb = cmsBuild(b, keyB, width, depth).withColumnRenamed("cnt", "cb")
    sa.join(sb, Seq("d", "b"), "full")
      .groupBy(col("d"))
      .agg(sum(coalesce(col("ca"), lit(0L)) * coalesce(col("cb"), lit(0L)))
        .as("ip"))
      // Both inputs empty ⇒ zero cell rows ⇒ min over nothing; the
      // documented one-row contract still owes an estimate: 0.
      .agg(coalesce(min(col("ip")), lit(0L)).as("est_join_size"))
      .select(lit(depth.toLong).as("depth"), lit(width.toLong).as("width"),
        col("est_join_size"))
  }

  // ------------------------------------------------- KMV (theta) sketch

  /** Bottom-k (KMV / theta) distinct sketch (Bar-Yossef et al. 2002;
    * Beyer et al. 2007): the `k` smallest DISTINCT md5-portable hash
    * values of `valueCol`. Unlike HLL this sketch supports SET
    * OPERATIONS — two sketches intersect/union by comparing their
    * retained hash samples under the smaller theta
    * ([[kmvIntersectEstimate]]) — which is why engines keep both.
    *
    * Determinism/portability: hashes are [[Sampling.md5Bucket]] 32-bit
    * words, the bottom-k of a distinct set is unique, so the SKETCH
    * ITSELF (not just its estimate) replays bit-for-bit in any engine
    * with md5.
    *
    * 100 TB shape: distinct-then-TakeOrdered — per-partition bottom-k
    * heaps merge on the driver, k·8 bytes of state per partition;
    * mergeable by construction (bottom-k of a union = bottom-k of the
    * concatenated sketches).
    *
    * @return (hv) — at most k rows, ascending hash values.
    */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int): DataFrame =
    df.select(Sampling.md5Bucket(col(valueCol)).as("hv"))
      .where(col("hv").isNotNull)
      .distinct()
      .orderBy(col("hv"))
      .limit(k)

  /** Distinct-count estimate from the KMV sketch: with fewer than k
    * retained hashes the sketch holds EVERY distinct hash and the
    * count is exact; at capacity, theta = h_k/2³² and the classic
    * unbiased estimate is (k−1)/theta. All operands are exact-in-double
    * integers (≤2⁴⁰), so the floored estimate is engine-exact.
    *
    * @return one row (n_kept, est). */
  def kmvEstimate(df: DataFrame, valueCol: String, k: Int): DataFrame =
    kmvSketch(df, valueCol, k)
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("hk"))
      .select(col("n_kept"),
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(floor(lit((k - 1).toLong * 4294967296L) /
            greatest(col("hk"), lit(1L))))
          .cast("long").as("est"))

  /** Theta-sketch set operations over two KMV sketches: intersection
    * and union distinct estimates plus the derived Jaccard — the
    * audience-overlap / cross-corpus-contamination question HLL
    * cannot answer without inclusion-exclusion error blowup.
    *
    * theta = min of the two sketch thresholds (a side below capacity
    * contributes theta = 2³², i.e. no truncation); each sketch is
    * re-cut to hashes strictly below theta; the intersection sample is
    * the hash-join of the two cuts and scales back by 1/theta. When
    * both sides are below capacity the "estimates" are exact distinct
    * counts of the hashed values. Every operand is an exact-in-double
    * integer, so the floored outputs replay cross-engine.
    *
    * @return one row (theta, n_inter_sample, est_intersect, est_union,
    *         jaccard_micros).
    */
  def kmvIntersectEstimate(a: DataFrame, aCol: String,
                           b: DataFrame, bCol: String, k: Int): DataFrame = {
    val full = 4294967296L
    def cut(df: DataFrame, vc: String, tag: String) = {
      val sk = kmvSketch(df, vc, k).localCheckpoint(true) // k rows, reused
      val theta = sk.agg(
        when(count(lit(1)) < k, lit(full))
          .otherwise(max(col("hv"))).as(s"theta_$tag"))
      (sk.withColumnRenamed("hv", s"hv_$tag"), theta)
    }
    val (ska, ta) = cut(a, aCol, "a")
    val (skb, tb) = cut(b, bCol, "b")
    val theta = ta.crossJoin(tb)
      .select(least(col("theta_a"), col("theta_b")).as("theta"))
    val cutA = ska.crossJoin(broadcast(theta))
      .where(col("hv_a") < col("theta")).select(col("hv_a").as("hv"))
    val cutB = skb.crossJoin(broadcast(theta))
      .where(col("hv_b") < col("theta")).select(col("hv_b").as("hv"))
    val counts = cutA.join(cutB, Seq("hv"))
      .agg(count(lit(1)).as("n_inter"))
      .crossJoin(cutA.unionByName(cutB).distinct()
        .agg(count(lit(1)).as("n_union")))
    theta.crossJoin(counts).select(
      col("theta"),
      col("n_inter").as("n_inter_sample"),
      floor(col("n_inter") * lit(full.toDouble) / col("theta"))
        .cast("long").as("est_intersect"),
      floor(col("n_union") * lit(full.toDouble) / col("theta"))
        .cast("long").as("est_union"),
      when(col("n_union") === 0, lit(0L))
        .otherwise(floor(lit(1e6) * col("n_inter") / col("n_union")))
        .cast("long").as("jaccard_micros"))
  }

  /** Per-group approximate percentiles (GK summary, rank error ≤
    * 1/accuracy). Returns one array column aligned with `qs`. */
  def quantileEstimate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       qs: Seq[Double], accuracy: Int = 1000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(percentile_approx(col(valueCol),
        array(qs.map(lit): _*), lit(accuracy)).as("approx_q"))

  /** Gate contract for [[quantileEstimate]]: each approximate q-th
    * percentile must lie within the exact [q−eps, q+eps] percentile
    * window (the GK rank-error guarantee, eps = 1/accuracy, widened by
    * `slack` to keep the gate off the knife edge). One row:
    * (n_groups, n_q_checked, n_q_ok). */
  def quantileContract(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       qs: Seq[Double], accuracy: Int = 1000,
                       slack: Double = 0.01): DataFrame = {
    val eps = 1.0 / accuracy + slack
    val lows = qs.map(q => math.max(0.0, q - eps))
    val highs = qs.map(q => math.min(1.0, q + eps))
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(col(valueCol), array(lows.map(lit): _*)).as("lo"),
        percentile(col(valueCol), array(highs.map(lit): _*)).as("hi"))
    val est = quantileEstimate(df, groupCols, valueCol, qs, accuracy)
    val okPerQ = qs.indices.map(i =>
      when(col("approx_q")(i) >= col("lo")(i) &&
        col("approx_q")(i) <= col("hi")(i), 1).otherwise(0))
    est.join(bounds, groupCols)
      .select(okPerQ.reduce(_ + _).as("n_ok"))
      .agg(count(lit(1)).as("n_groups"),
        sum(lit(qs.length)).as("n_q_checked"),
        sum(col("n_ok")).as("n_q_ok"))
  }
}
