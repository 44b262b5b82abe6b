package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitors — the check a 100 TB ingest runs before
  * trusting this week's data against last week's: Population Stability
  * Index over fixed bins and the two-sample Kolmogorov–Smirnov
  * statistic. Both reduce the corpus to a bounded grid (bins / distinct
  * quantized values) with map-side-combined counts FIRST; every
  * windowed or driver-visible structure is over that grid, never over
  * rows.
  *
  * Determinism: counts are exact integers; each reported metric is one
  * fixed IEEE expression tree over those integers (micros-rounded), so
  * results are bit-identical across engines and partition orders.
  */
object Drift {

  /** Population Stability Index between a baseline and a current
    * sample over fixed-width bins of `[lo, hi)`.
    *
    * Values are binned by `clamp(⌊(v−lo)/(hi−lo)·bins⌋, 0, bins−1)`
    * (out-of-range mass lands in the edge bins — drift you want
    * counted, not dropped). Bin proportions are add-1 smoothed
    * (`p̂ = (n+1)/(N+bins)`) so empty bins contribute finite terms.
    * Per-bin contribution `term_micros =
    * round(1e6·(p̂a−p̂b)·ln(p̂a/p̂b))`; PSI is their sum. Standard read:
    * < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
    *
    * @return `bins` rows (bin, n_base, n_curr, term_micros) ordered by
    *         bin, plus a total row `bin = −1` carrying the full counts
    *         and `term_micros` = PSI.
    */
  def psi(base: DataFrame, curr: DataFrame, valueCol: String,
          lo: Double, hi: Double, bins: Int): DataFrame = {
    // ONE tagged aggregation builds both histograms (two separate
    // groupBys + two grid joins each paid their own shuffle and
    // broadcast build — pure fixed cost on the per-trigger stream path)
    def binExpr = least(greatest(floor((col(valueCol) - lo) / (hi - lo) * bins),
      lit(0L)), lit(bins - 1L)).cast("long")
    def tag(df: DataFrame, t: Int) =
      df.select(binExpr.as("bin"), lit(t).as("t"))
    val counts = tag(base, 0).unionAll(tag(curr, 1))
      .groupBy("bin")
      .agg(sum(when(col("t") === 0, 1L).otherwise(0L)).as("n_base"),
        sum(when(col("t") === 1, 1L).otherwise(0L)).as("n_curr"))
    val grid = base.sparkSession.range(0, bins, 1, 1).select(col("id").as("bin"))
    val g = grid
      .join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_curr"), lit(0L)).as("n_curr"))
    val tot = g.agg(sum("n_base").as("tot_a"), sum("n_curr").as("tot_b"))
    val terms = g.crossJoin(broadcast(tot))
      .withColumn("pa", (col("n_base") + lit(1L)) / (col("tot_a") + lit(bins)))
      .withColumn("pb", (col("n_curr") + lit(1L)) / (col("tot_b") + lit(bins)))
      .select(col("bin"), col("n_base"), col("n_curr"),
        round(lit(1e6) * (col("pa") - col("pb")) * log(col("pa") / col("pb")))
          .cast("long").as("term_micros"))
    val total = terms.agg(sum("n_base").as("n_base"),
        sum("n_curr").as("n_curr"), sum("term_micros").as("term_micros"))
      .select(lit(-1L).as("bin"), col("n_base"), col("n_curr"),
        col("term_micros"))
    terms.unionAll(total).orderBy("bin")
  }

  /** Jensen–Shannon divergence between two CATEGORICAL distributions
    * (Lin 1991) — the symmetric, always-finite companion to [[psi]]
    * for unbounded key spaces (token vocabularies, URL hosts, label
    * sets) where fixed value bins don't apply and one-sided zeros
    * would blow KL up: each side's missing keys contribute through
    * the mixture M = (P+Q)/2, no smoothing needed, and JSD ≤ ln 2.
    *
    * Per key the contribution
    * `round(5e5·(p·ln(p/m) + q·ln(q/m)))` micros (0·ln0 = 0) is an
    * integer, so the total is fold-order-free; proportions are exact
    * integer ratios. One full-outer count join + one broadcast of the
    * two totals — never a driver-side vocabulary.
    *
    * @return one row (n_keys, n_a, n_b, jsd_micros).
    */
  def jsDivergence(a: DataFrame, b: DataFrame, keyCol: String): DataFrame = {
    def cnt(df: DataFrame, n: String) =
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as(n))
    val g = cnt(a, "na").join(cnt(b, "nb"), Seq("k"), "full")
      .select(col("k"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val tot = g.agg(sum("na").as("ta"), sum("nb").as("tb"))
    val terms = g.crossJoin(broadcast(tot))
      .withColumn("pa", col("na") / col("ta"))
      .withColumn("pb", col("nb") / col("tb"))
      .withColumn("m", (col("pa") + col("pb")) / lit(2.0))
      .select(
        round(lit(5e5) *
          (when(col("na") > 0, col("pa") * log(col("pa") / col("m")))
            .otherwise(lit(0.0)) +
           when(col("nb") > 0, col("pb") * log(col("pb") / col("m")))
            .otherwise(lit(0.0)))).cast("long").as("term"),
        col("ta"), col("tb"))
    terms.agg(count(lit(1)).as("n_keys"), max(col("ta")).as("n_a"),
      max(col("tb")).as("n_b"), sum(col("term")).as("jsd_micros"))
  }

  /** One-sided CUSUM change-point detection (Page 1954) over
    * day-bucketed means — the sequential-drift sibling of [[psi]]:
    * `S_t = max(0, S_{t−1} + (x̄_t − ref − slack))` alarms when the
    * cumulative upward drift exceeds the threshold.
    *
    * The recurrence is NOT computed sequentially: CUSUM equals
    * `P_t − min(0, min_{j≤t} P_j)` with `P` the prefix sum of
    * deviations — two windows over the BUCKET table (≤ #days rows,
    * the corpus collapses to daily integer means map-side first).
    * Deviations are exact integer micros (reference = retrospective
    * mean of daily means), so the whole statistic is engine-exact.
    *
    * @return (bucket, mean_micros, s_micros, alarm) ordered by day.
    */
  def cusum(df: DataFrame, tsCol: String, valueCol: String,
            slackMicros: Long, thresholdMicros: Long): DataFrame = {
    val daily = df
      .groupBy(date_trunc("day", col(tsCol)).as("bucket"))
      .agg(floor(sum(floor(col(valueCol) * lit(1e6)).cast("long"))
        .cast("double") / count(lit(1))).cast("long").as("mean_micros"))
    val ref = daily.agg(floor(sum(col("mean_micros")).cast("double") /
      count(lit(1))).cast("long").as("ref"))
    // BOUNDED global window: per-DAY aggregate (calendar grid)
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(ref))
      .withColumn("dev",
        col("mean_micros") - col("ref") - lit(slackMicros))
      .withColumn("p", sum(col("dev")).over(w))
      .withColumn("s",
        col("p") - least(lit(0L), min(col("p")).over(w)))
      .select(date_format(col("bucket"), "yyyy-MM-dd").as("bucket"),
        col("mean_micros"), col("s").as("s_micros"),
        (col("s") > thresholdMicros).as("alarm"))
      .orderBy("bucket")
  }

  /** Embedding-centroid drift between two corpus slices — the
    * vector-space face of [[psi]]: when this week's embeddings come
    * from a different distribution (new domain mix, a changed
    * encoder), the slice centroids separate before any scalar column
    * drifts. Per-dim components quantize to integer micros BEFORE
    * the fold (the PCA-moment convention — raw float sums are
    * partition-order-dependent), cross terms quantize per dim, and
    * the readouts are fixed IEEE expressions over three exact
    * integer sums: centroid cosine (truncated micros) and the
    * squared centroid gap `Saa − 2·Sab + Sbb`.
    *
    * Shape: one posexplode + dim-keyed fold per slice (dims rows),
    * one dim join, one scalar fold. Nothing corpus-pairwise.
    *
    * @return one row (n_a, n_b, cos_micros, gap_micros).
    */
  def centroidDrift(a: DataFrame, b: DataFrame,
                    vecCol: String): DataFrame = {
    def cen(df: DataFrame, s: String, n: String) =
      df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy(col("pos"))
        .agg(sum(round(col("x").cast("double") * lit(1e6)).cast("long"))
          .as(s), count(lit(1)).as(n))
    val t = cen(a, "sa", "na").join(cen(b, "sb", "nb"), "pos")
      .select(col("na"), col("nb"),
        round(col("sa") / col("na") * (col("sb") / col("nb")) / lit(1e6))
          .cast("long").as("tab"),
        round(col("sa") / col("na") * (col("sa") / col("na")) / lit(1e6))
          .cast("long").as("taa"),
        round(col("sb") / col("nb") * (col("sb") / col("nb")) / lit(1e6))
          .cast("long").as("tbb"))
    t.agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(col("tab")).as("sab"), sum(col("taa")).as("saa"),
        sum(col("tbb")).as("sbb"))
      .select(col("n_a"), col("n_b"),
        when(col("saa") > 0 && col("sbb") > 0,
          (lit(1e6) * col("sab")
            / sqrt(col("saa").cast("double") * col("sbb"))).cast("long"))
          .otherwise(lit(0L)).as("cos_micros"),
        (col("saa") - lit(2L) * col("sab") + col("sbb")).as("gap_micros"))
  }

  /** EWMA control chart over daily means (Roberts 1959) — the
    * small-shift detector between [[cusum]]'s cumulative alarm and a
    * plain threshold: `s_t = λ·x_t + (1−λ)·s_{t−1}` with the DYADIC
    * λ = ½ and `s_0 = x_0`. Computed CLOSED-FORM, not recursively:
    * `s_t = Σ_{i≤t} x_i·w(i,t)` with `w = 2^{−(t−i+1)}` (and `2^{−t}`
    * for i = 0) — each term is the integer `x_i · 2^{31−k}` (weights
    * PRE-SCALED by 2³¹, so the fold is exact BIGINT in any order — a
    * float dyadic sum would span > 53 bits here and round
    * order-dependently), the result one arithmetic right-shift.
    * Terms past k = 31 are dropped (weight < 2⁻³¹ of a micro —
    * below the output grid). The pairwise weight join is over the
    * ≤ #days bucket table (days², bounded), never corpus rows.
    * Alarm when |s_t − ref| > threshold, ref = retrospective mean of
    * daily means (the [[cusum]] convention). Values are assumed
    * non-negative (the shift-as-floor identity).
    *
    * @return (bucket, mean_micros, ewma_micros, alarm) per day.
    */
  def ewma(df: DataFrame, tsCol: String, valueCol: String,
           thresholdMicros: Long): DataFrame = {
    val daily = df
      .groupBy(date_trunc("day", col(tsCol)).as("bucket"))
      .agg(floor(sum(floor(col(valueCol) * lit(1e6)).cast("long"))
        .cast("double") / count(lit(1))).cast("long").as("mean_micros"))
    // BOUNDED global window: per-DAY aggregate (calendar grid)
    val w = Window.orderBy("bucket")
    val idx = daily
      .withColumn("t", row_number().over(w) - 1)
      .localCheckpoint(true) // both sides of the days² weight join
    val ref = idx.agg(floor(sum(col("mean_micros")).cast("double") /
      count(lit(1))).cast("long").as("ref"))
    val src = idx.select(col("t").as("i"), col("mean_micros").as("x"))
    idx.join(src, col("i") <= col("t"))
      .withColumn("k", when(col("i") === 0, col("t"))
        .otherwise(col("t") - col("i") + 1))
      .filter(col("k") <= 31)
      .groupBy(col("bucket"), col("mean_micros"))
      .agg(sum(col("x") * pow(lit(2.0), lit(31) - col("k")).cast("long"))
        .as("sraw"))
      .crossJoin(broadcast(ref))
      .select(date_format(col("bucket"), "yyyy-MM-dd").as("bucket"),
        col("mean_micros"),
        shiftright(col("sraw"), 31).as("ewma_micros"),
        (abs(shiftright(col("sraw"), 31) - col("ref")) > thresholdMicros)
          .as("alarm"))
      .orderBy("bucket")
  }

  /** Autocorrelation function of the daily event-count series at lags
    * `1..maxLag` — the seasonality/burst readout that tells a drift
    * monitor whether a [[cusum]] alarm is a level shift or just the
    * weekly cycle. The corpus collapses map-side to the ≤ #days bucket
    * table; lag pairing is a self-join on the row index (consecutive
    * OBSERVED days — gaps close ranks, the [[cusum]] ordering
    * convention).
    *
    * Exactness: with `n` days, total `S`, deviations scale to
    * `a_t = x_t·n − S` (exact BIGINT), `acf(L) = Σ a_t·a_{t+L} / Σ a_t²`
    * — two exact integer folds, ONE fixed IEEE division, micros by
    * TRUNCATION (signed values; round would straddle engines at .5).
    *
    * @return (lag, n_pairs, acf_micros) for each lag, ordered.
    */
  def acf(df: DataFrame, tsCol: String, maxLag: Int): DataFrame = {
    val daily = df.groupBy(date_trunc("day", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("x"))
    // BOUNDED global window: per-DAY aggregate (calendar grid)
    val w = Window.orderBy("bucket")
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val idx = daily.withColumn("rn", row_number().over(w))
      .crossJoin(broadcast(tot))
      .select(col("rn"), (col("x") * col("n") - col("s")).as("a"))
      .localCheckpoint(true) // ≤ #days rows, scanned per lag side
    val den = idx.agg(sum(col("a") * col("a")).as("den"))
    val lags = df.sparkSession.range(1, maxLag + 1, 1, 1)
      .select(col("id").as("lag"))
    idx.select(col("rn"), col("a"))
      .crossJoin(broadcast(lags))
      .join(idx.select(col("rn").as("rn2"), col("a").as("a2")),
        col("rn2") === col("rn") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("a") * col("a2")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        (lit(1e6) * col("num") / col("den")).cast("long").as("acf_micros"))
      .orderBy(col("lag"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic: the maximal ECDF gap
    * between baseline and current, in micros.
    *
    * Values are quantized to integer micros (`⌊1e6·v⌋`), both samples
    * collapse to per-distinct-value counts (map-side combine), and the
    * cumulative window runs over the DISTINCT quantized grid only —
    * never corpus rows. The gap at each grid point is
    * `|⌊1e6·cumₐ/A⌋ − ⌊1e6·cum_b/B⌋|` — exact integer arithmetic, so
    * the max-fold is order-independent. For value domains whose
    * micro-grid is itself unbounded, pre-bin (e.g. [[psi]] bins or
    * [[Sketches.quantiles]] edges) before calling.
    *
    * @return one row (n_base, n_curr, ks_micros).
    */
  def ksStatistic(base: DataFrame, curr: DataFrame,
                  valueCol: String): DataFrame = {
    def q(df: DataFrame) = df
      .select(floor(col(valueCol) * lit(1e6)).cast("long").as("v"))
      .groupBy("v").agg(count(lit(1)).as("n"))
    val g = q(base).withColumnRenamed("n", "na")
      .join(q(curr).withColumnRenamed("n", "nb"), Seq("v"), "full_outer")
      .select(col("v"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    // BOUNDED global window: input is the DISTINCT quantized-value
    // grid (micros of a bounded metric), collapsed by the groupBy above
    val w = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g.withColumn("ca", sum("na").over(w))
      .withColumn("cb", sum("nb").over(w))
    val tot = g.agg(sum("na").as("tot_a"), sum("nb").as("tot_b"))
    cum.crossJoin(broadcast(tot))
      .select(col("tot_a"), col("tot_b"),
        abs(floor(lit(1000000L) * col("ca") / col("tot_a")) -
          floor(lit(1000000L) * col("cb") / col("tot_b"))).as("d"))
      .groupBy(col("tot_a").as("n_base"), col("tot_b").as("n_curr"))
      .agg(max("d").as("ks_micros"))
  }

  /** Quantile-shift report between two samples — the "WHAT moved"
    * companion to the KS statistic's "something moved": the exact
    * base and current values at each requested quantile, side by
    * side, with the signed shift. Both sides rank on
    * [[graft.operators.Sketches.exactQuantiles]]'s distributed-rank
    * primitive (ceil-rank convention, tie-broken).
    *
    * @param base/curr (valueCol micro-quantizable double, tieCol).
    * @return (q_micros, base_v_micros, curr_v_micros, shift_micros)
    *         per requested quantile, ordered.
    */
  def quantileShift(base: DataFrame, curr: DataFrame, valueCol: String,
                    tieCol: String,
                    qs: Seq[Long] = Seq(100000L, 500000L, 900000L))
      : DataFrame = {
    def side(df: DataFrame, out: String) =
      graft.operators.Sketches.exactQuantiles(
          df.select(floor(col(valueCol) * lit(1e6)).cast("long").as("v"),
            col(tieCol).as("tie")), "v", "tie", qs)
        .withColumnRenamed("v", out)
    side(base, "base_v_micros")
      .join(side(curr, "curr_v_micros"), Seq("q_micros"))
      .withColumn("shift_micros",
        col("curr_v_micros") - col("base_v_micros"))
      .orderBy(col("q_micros"))
  }

  /** Western Electric control rules over daily means (WECO 1956) —
    * the four classic out-of-control patterns a plain threshold
    * misses: R1 one point beyond 3σ, R2 two of three consecutive
    * beyond 2σ (same side), R3 four of five beyond 1σ (same side),
    * R4 eight consecutive on one side of center. Center and σ come
    * from the retrospective day moments (micro-quantized, one
    * broadcast); per-day signed-zone flags are integers, the rule
    * lookbacks are bounded `rowsBetween` windows over the calendar
    * grid.
    *
    * @return (bucket, mean_micros, zone, r1, r2, r3, r4) per day —
    *         `zone` ∈ {−3..3} is the signed σ band.
    */
  def westernElectric(df: DataFrame, tsCol: String,
                      valueCol: String): DataFrame = {
    val daily = df
      .groupBy(date_trunc("day", col(tsCol)).as("bucket"))
      .agg(floor(sum(floor(col(valueCol) * lit(1e6)).cast("long"))
        .cast("double") / count(lit(1))).cast("long").as("mean_micros"))
    val mom = daily.agg(count(lit(1)).as("n"),
      sum(col("mean_micros")).as("s"),
      sum(col("mean_micros") * col("mean_micros")).as("q"))
    val center = col("s").cast("double") / col("n")
    val sig = sqrt((col("q").cast("double") -
      col("s").cast("double") * col("s") / col("n")) / (col("n") - 1))
    val banded = daily.crossJoin(broadcast(
        mom.select(floor(center).cast("long").as("c"),
          floor(sig).cast("long").as("sg"))))
      .withColumn("dev", col("mean_micros") - col("c"))
      // signed σ band, clamped to ±3; sg = 0 degenerates to zone 0
      .withColumn("zone",
        when(col("sg") === 0, lit(0L))
          // floor BEFORE least: a bare double→long cast truncates in
          // Spark but rounds in DuckDB — floor is the shared rule
          .otherwise(signum(col("dev")).cast("long") *
            least(floor(abs(col("dev")) / col("sg")).cast("long"),
              lit(3L))))
    // BOUNDED lookbacks over the calendar grid
    val w = Window.orderBy("bucket")
    def cnt(cond: Column, back: Int) =
      sum(cond.cast("long")).over(w.rowsBetween(-(back - 1), 0))
    banded.select(
        date_format(col("bucket"), "yyyy-MM-dd").as("bucket"),
        col("mean_micros"), col("zone"),
        (abs(col("zone")) >= 3).as("r1"),
        (cnt(col("zone") >= 2, 3) >= 2 ||
          cnt(col("zone") <= -2, 3) >= 2).as("r2"),
        (cnt(col("zone") >= 1, 5) >= 4 ||
          cnt(col("zone") <= -1, 5) >= 4).as("r3"),
        (cnt(col("dev") > 0, 8) === 8 ||
          cnt(col("dev") < 0, 8) === 8).as("r4"))
      .orderBy("bucket")
  }

  /** 1-D earth mover's distance (Wasserstein-1) between two slices
    * over the [[psi]] fixed-bin grid — the drift number that keeps
    * MAGNITUDE when PSI/KS only see overlap: on a 1-D grid
    * `EMD = Σ_bins |CDF_a − CDF_b| · binwidth`, here reported in
    * probability-mass micros per bin step (caller multiplies by the
    * bin width in value units). Per-bin cumulative mass differences
    * are exact integer cross-products (`|cum_a·tot_b − cum_b·tot_a|`
    * — no per-bin division at all), one final division.
    *
    * @return one row (n_a, n_b, emd_micros).
    */
  def emd1d(base: DataFrame, curr: DataFrame, valueCol: String,
            lo: Double, hi: Double, bins: Int): DataFrame = {
    def binned(df: DataFrame) = df.select(
        least(greatest(floor((col(valueCol) - lo) / (hi - lo) * bins),
          lit(0L)), lit(bins - 1L)).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val grid = base.sparkSession.range(0, bins, 1, 1).select(col("id").as("bin"))
    val g = grid
      .join(binned(base).withColumnRenamed("n", "na"), Seq("bin"), "left")
      .join(binned(curr).withColumnRenamed("n", "nb"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    // BOUNDED global window: the `bins`-row grid
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = g.withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
    val tot = c.agg(max(col("ca")).as("tot_a"), max(col("cb")).as("tot_b"))
    c.crossJoin(broadcast(tot))
      .select(col("tot_a"), col("tot_b"),
        abs(col("ca") * col("tot_b") - col("cb") * col("tot_a")).as("x"))
      .groupBy(col("tot_a"), col("tot_b"))
      .agg(sum(col("x")).as("sx"))
      .select(col("tot_a").as("n_a"), col("tot_b").as("n_b"),
        when(col("tot_a") === 0 || col("tot_b") === 0, lit(0L))
          .otherwise(floor(lit(1e6) * col("sx").cast("double") /
            (col("tot_a").cast("double") * col("tot_b"))).cast("long"))
          .as("emd_micros"))
  }

  /** Single best change-point over daily means — the retrospective
    * companion to [[cusum]]/[[pageHinkley]]'s sequential alarms
    * (binary segmentation's first split, Scott & Knott 1974): every
    * candidate split day scores `|mean_left − mean_right|` from
    * cumulative sums over the BOUNDED day grid, both side-means
    * floor-quantized to integer micros BEFORE the compare, and the
    * winner is the max (earliest day on ties) — a deterministic
    * integer argmax, no variance estimate needed.
    *
    * @return one row (split_day, n_left, n_right, delta_micros) —
    *         the split is AFTER split_day; empty/1-day input → empty.
    */
  def changepoint(df: DataFrame, tsCol: String,
                  valueCol: String): DataFrame = {
    val daily = df
      .groupBy(date_trunc("day", col(tsCol)).as("bucket"))
      .agg(floor(sum(floor(col(valueCol) * lit(1e6)).cast("long"))
        .cast("double") / count(lit(1))).cast("long").as("mean_micros"))
    // BOUNDED global windows: the per-day calendar grid
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = daily.agg(count(lit(1)).as("nn"),
      sum(col("mean_micros")).as("st"))
    daily.crossJoin(broadcast(tot))
      .withColumn("t", count(lit(1)).over(w))
      .withColumn("sl", sum(col("mean_micros")).over(w))
      .filter(col("t") < col("nn"))
      .select(date_format(col("bucket"), "yyyy-MM-dd").as("split_day"),
        col("t").as("n_left"), (col("nn") - col("t")).as("n_right"),
        abs(floor(col("sl").cast("double") / col("t")).cast("long") -
          floor((col("st") - col("sl")).cast("double") /
            (col("nn") - col("t"))).cast("long")).as("delta_micros"))
      .orderBy(desc("delta_micros"), col("split_day"))
      .limit(1)
  }

  /** Page–Hinkley test over daily means (Page 1954; the streaming
    * form in Gama et al. 2014) — the sequential mean-shift detector
    * between [[cusum]] (fixed reference) and [[ewma]] (exponential
    * memory): each day deviates from the RUNNING mean so far,
    * `m_t = Σ_{i≤t}(x_i − x̄_i − δ)`, and the alarm statistic is the
    * drawup `PH_t = m_t − min_{i≤t} m_i > λ`. The running mean
    * quantizes per day (`⌊S_t/t⌋`, integer micros) BEFORE the
    * cumulative fold, so every window value is an exact long.
    *
    * Shape: one day fold, then three cumulative windows over the
    * BOUNDED calendar grid (≤ #days rows) — never corpus rows.
    *
    * @return (bucket, mean_micros, ph_micros, alarm) per day.
    */
  def pageHinkley(df: DataFrame, tsCol: String, valueCol: String,
                  slackMicros: Long, thresholdMicros: Long): DataFrame = {
    val daily = df
      .groupBy(date_trunc("day", col(tsCol)).as("bucket"))
      .agg(floor(sum(floor(col(valueCol) * lit(1e6)).cast("long"))
        .cast("double") / count(lit(1))).cast("long").as("mean_micros"))
    // BOUNDED global windows: per-DAY grid (calendar-bounded)
    val w = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("run_mean",
        floor(sum(col("mean_micros")).over(w).cast("double")
          / count(lit(1)).over(w)).cast("long"))
      .withColumn("m",
        sum(col("mean_micros") - col("run_mean") - lit(slackMicros))
          .over(w))
      .withColumn("ph", col("m") - min(col("m")).over(w))
      .select(date_format(col("bucket"), "yyyy-MM-dd").as("bucket"),
        col("mean_micros"), col("ph").as("ph_micros"),
        (col("ph") > thresholdMicros).as("alarm"))
      .orderBy("bucket")
  }
}
