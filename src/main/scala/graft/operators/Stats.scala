package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inference statistics for experiment readouts — the A/B layer over
  * the `events` stream: a recommender change ships behind a metric
  * comparison, and at 100 TB both the test statistic and its
  * uncertainty must come out of one pass, not a driver-side resample.
  *
  * Determinism contract: values quantize to integer millis/micros
  * up front, every accumulated quantity is an exact integer fold, and
  * each final statistic is ONE fixed IEEE expression over those
  * integers — engine-exact, full-SQL-oracle-able.
  */
object Stats {

  /** Welch's unequal-variance t statistic between two samples.
    *
    * Values quantize to integer millis (`⌊1000·v⌋`); per group the
    * sufficient statistics (n, Σv, Σv²) are exact integer folds; the
    * statistic `t = (m_a − m_b)/√(s²_a/n_a + s²_b/n_b)` is one fixed
    * IEEE expression over them (sample variances, n−1). Callers
    * compare |t| against their critical value — no p-value erf
    * approximation is smuggled in.
    *
    * @return one row (n_a, n_b, mean_a_milli, mean_b_milli, t_micros);
    *         degenerate variances (n < 2 or zero spread) report t = 0.
    */
  def welchT(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def stats(df: DataFrame, tag: String) = df
      .select(floor(col(valueCol) * lit(1000)).cast("long").as("v"))
      .agg(count(lit(1)).as(s"n_$tag"), sum(col("v")).as(s"s_$tag"),
        sum(col("v") * col("v")).as(s"q_$tag"))
    val j = stats(a, "a").crossJoin(stats(b, "b"))
    def mean(tag: String) =
      col(s"s_$tag").cast("double") / col(s"n_$tag")
    def varOverN(tag: String) =
      ((col(s"q_$tag").cast("double") -
        col(s"s_$tag").cast("double") * col(s"s_$tag").cast("double") /
          col(s"n_$tag")) / (col(s"n_$tag") - lit(1))) / col(s"n_$tag")
    val se2 = varOverN("a") + varOverN("b")
    j.select(col("n_a"), col("n_b"),
      floor(mean("a")).cast("long").as("mean_a_milli"),
      floor(mean("b")).cast("long").as("mean_b_milli"),
      when(col("n_a") < 2 || col("n_b") < 2 || se2 <= 0, lit(0L))
        .otherwise(floor(lit(1e6) * ((mean("a") - mean("b")) / sqrt(se2)))
          .cast("long"))
        .as("t_micros"))
  }

  /** Trimmed mean — the robust location estimate that survives the
    * fat tails a 100 TB ingest always carries (one bad scraper
    * shifting the plain mean): drop the lowest and highest
    * `⌊trimFrac·n⌋` values and average the rest. Ranks come from
    * [[Packing.globalRank]] (range partition + per-partition
    * windows + O(#partitions) offsets — never one global sort
    * window), tie-broken by `tieCol`; the mean is one floored
    * division of exact integer micros.
    *
    * @return one row (n, n_trimmed_each, n_kept,
    *         trimmed_mean_micros).
    */
  def trimmedMean(df: DataFrame, valueCol: String, tieCol: String,
                  trimFrac: Double): DataFrame = {
    val (ranked, n) = Packing.globalRank(
      df.select(floor(col(valueCol) * lit(1e6)).cast("long").as("v"),
        col(tieCol).as("tie")), Seq("v", "tie"))
    val k = math.floor(trimFrac * n).toLong
    ranked.filter(col("_grank") > k && col("_grank") <= n - k)
      .agg(count(lit(1)).as("n_kept"), sum(col("v")).as("s"))
      .select(lit(n).as("n"), lit(k).as("n_trimmed_each"), col("n_kept"),
        floor(col("s").cast("double") / col("n_kept")).cast("long")
          .as("trimmed_mean_micros"))
  }

  /** Mann–Whitney U test (Mann & Whitney 1947) — the NONPARAMETRIC
    * A/B readout beside [[welchT]]: no normality assumption, robust
    * to the heavy tails that break t-tests on revenue metrics. Both
    * samples rank together under the (value, side, id) TOTAL order
    * via [[Packing.globalRank]] (tie-broken ranks, not midranks — the
    * [[graft.operators.Eval.spearman]] convention, documented; with
    * heavy ties prefer the exact-count tests); U_a = R_a −
    * n_a(n_a+1)/2, and the normal-approximation z uses one
    * correctly-rounded sqrt over exact integer moments.
    *
    * @return one row (n_a, n_b, r_a, u_a, u_b, z_micros).
    */
  def mannWhitneyU(a: DataFrame, b: DataFrame, valueCol: String,
                   tieCol: String): DataFrame = {
    val both = a.select(floor(col(valueCol) * lit(1e6)).cast("long")
        .as("v"), lit(0).as("side"), col(tieCol).as("tie"))
      .unionByName(b.select(floor(col(valueCol) * lit(1e6)).cast("long")
        .as("v"), lit(1).as("side"), col(tieCol).as("tie")))
    val (ranked, _) = Packing.globalRank(both, Seq("v", "side", "tie"))
    val s = ranked.agg(
      sum(when(col("side") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("side") === 1, 1L).otherwise(0L)).as("nb"),
      sum(when(col("side") === 0, col("_grank")).otherwise(0L)).as("ra"))
    val ua = (col("ra") - col("na") * (col("na") + 1) / lit(2))
      .cast("long")
    val ub = col("na") * col("nb") - ua
    // z = (U_a − n_a·n_b/2) / sqrt(n_a·n_b·(n_a+n_b+1)/12): exact
    // integer numerator (doubled to keep /2 exact), one sqrt
    val num2 = lit(2) * ua - col("na") * col("nb")
    // variance product in double from the first multiply: the long form
    // n_a·n_b·(n_a+n_b+1) exceeds int64 once each arm passes ~1.6M rows
    // (2m³ > 2⁶³), which would yield a negative radicand and NaN silently
    val sig = sqrt(col("na").cast("double") * col("nb")
      * (col("na") + col("nb") + 1) / lit(12.0))
    s.select(col("na").as("n_a"), col("nb").as("n_b"), col("ra").as("r_a"),
      ua.as("u_a"), ub.as("u_b"),
      when(col("na") === 0 || col("nb") === 0, lit(0L))
        .otherwise(floor(lit(1e6) * num2.cast("double")
          / (lit(2.0) * sig)).cast("long")).as("z_micros"))
  }

  /** Bradley–Terry preference-strength fitting (Bradley & Terry
    * 1952; Hunter 2004's MM iteration) — the pairwise-comparison
    * model behind interleaving readouts and preference-data curation:
    * from win counts n_ab, item strengths w satisfy
    * P(a beats b) = w_a/(w_a + w_b); each MM round is
    * `w_a ← W_a / Σ_b (n_ab + n_ba)/(w_a + w_b)`, then strengths
    * renormalize to mean 1e6 micros. Every per-pair denominator term
    * quantizes to a long BEFORE the per-item fold (order-free; the
    * modularity-term rule), so the fixed `rounds` computation unrolls
    * in the DuckDB oracle.
    *
    * 100 TB shape per round: one pair-keyed join against the B-row
    * strength table + one item fold — comparisons never self-join.
    *
    * @param wins (aCol, bCol, winsCol): wins of a over b (one row per
    *             ordered pair present).
    * @return (item, w_micros, n_wins) ordered by item.
    */
  def bradleyTerry(wins: DataFrame, aCol: String, bCol: String,
                   winsCol: String, rounds: Int = 3): DataFrame = {
    val pairs = wins.select(col(aCol).as("a"), col(bCol).as("b"),
        col(winsCol).cast("long").as("nw"))
      .localCheckpoint(true)
    // symmetric comparison counts n_ab + n_ba, and per-item win totals
    val comp = pairs.select(col("a"), col("b"), col("nw"))
      .unionByName(pairs.select(col("b").as("a"), col("a").as("b"),
        lit(0L).as("nw")))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("nw")).as("n_ab"))
    val sym = comp.select(col("a"), col("b"), col("n_ab"))
      .join(comp.select(col("b").as("a"), col("a").as("b"),
        col("n_ab").as("n_ba")), Seq("a", "b"), "left")
      .select(col("a"), col("b"),
        (col("n_ab") + coalesce(col("n_ba"), lit(0L))).as("n_tot"))
      .localCheckpoint(true)
    val winTot = sym.join(
        comp.withColumnRenamed("n_ab", "nw"), Seq("a", "b"), "left")
      .groupBy(col("a").as("item"))
      .agg(sum(coalesce(col("nw"), lit(0L))).as("big_w"))
      .localCheckpoint(true)
    var w = winTot.select(col("item"), lit(1000000L).as("w_micros"))
    for (_ <- 1 to rounds) {
      // per-pair term floor(1e12·n_tot/(w_a+w_b)) — micro-quantized
      // BEFORE the per-item sum so the fold is order-free
      val denom = sym
        .join(w.select(col("item").as("a"), col("w_micros").as("wa")), "a")
        .join(w.select(col("item").as("b"), col("w_micros").as("wb")), "b")
        .select(col("a").as("item"),
          floor(lit(1000000000000L) * col("n_tot")
            / (col("wa") + col("wb"))).cast("long").as("t"))
        .groupBy(col("item")).agg(sum(col("t")).as("d"))
      val raw = winTot.join(denom, Seq("item"))
        .select(col("item"),
          when(col("d") === 0, lit(1000000L))
            .otherwise(floor(lit(1e12) * col("big_w") / col("d"))
              .cast("long")).as("w_raw"))
      // renormalize to mean 1e6 (BT is scale-invariant; keeps the
      // integers bounded round over round)
      val tot = raw.agg(sum(col("w_raw")).as("s"),
        count(lit(1)).as("k")).head()
      val (s, kk) = (tot.getLong(0), tot.getLong(1))
      w = raw.select(col("item"),
          floor(col("w_raw").cast("double") * lit(1e6) * kk / s)
            .cast("long").as("w_micros"))
        .localCheckpoint(true)
    }
    w.join(winTot.withColumnRenamed("item", "_wi"),
        col("item") === col("_wi"))
      .select(col("item"), col("w_micros"), col("big_w").as("n_wins"))
      .orderBy(col("item"))
  }

  /** CUPED variance reduction (Deng et al. 2013) — the A/B-test
    * sensitivity booster beside [[diffInDiff]]: with a pre-period
    * covariate x and the experiment metric y per unit,
    * θ = Cov(x,y)/Var(x) and ŷ = y − θ(x − x̄) shrinks the metric's
    * variance by the factor ρ² (the squared correlation) without
    * moving its mean. All five sufficient statistics are exact
    * BIGINT folds of MILLI-quantized inputs (micros² would overflow
    * the n·Σxy cross products — the [[welchT]] convention); θ and ρ²
    * come out as fixed IEEE expressions over the cross-multiplied
    * integers (n·Σxy − ΣxΣy over n·Σx² − (Σx)²).
    *
    * @return one row (n, theta_micros, rho2_micros, var_y_milli2,
    *         var_adj_milli2) — var columns are n²·Var (exact
    *         integers and their float-free adjusted counterpart).
    */
  def cuped(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val base = df.select(
      floor(col(xCol) * lit(1000)).cast("long").as("x"),
      floor(col(yCol) * lit(1000)).cast("long").as("y"))
    val s = base.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denx = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    s.select(col("n"),
      when(denx === 0, lit(0L))
        .otherwise(floor(lit(1e6) * num.cast("double") / denx.cast("double"))
          .cast("long")).as("theta_micros"),
      when(denx === 0 || deny === 0, lit(0L))
        .otherwise(floor(lit(1e6) * num.cast("double") * num.cast("double")
          / (denx.cast("double") * deny.cast("double"))).cast("long"))
        .as("rho2_micros"),
      deny.as("var_y_milli2"),
      when(denx === 0 || deny === 0, deny)
        .otherwise(floor(deny.cast("double") * (lit(1.0)
          - num.cast("double") * num.cast("double")
            / (denx.cast("double") * deny.cast("double"))))
          .cast("long")).as("var_adj_milli2"))
  }

  /** Winsorized mean — [[trimmedMean]]'s clamping sibling (outliers
    * are PULLED IN to the tail quantile values instead of dropped, so
    * n stays constant — the robust-mean form a revenue metric wants
    * when big orders are real but shouldn't dominate): with
    * k = ⌊frac·n⌋, values are clamped into [v(k+1), v(n−k)] under the
    * (value, tie) total order from the same exact distributed-rank
    * primitive ([[Packing.globalRank]] — range partition +
    * per-partition row_number, no global window), then one exact
    * integer-micro fold and one floored division.
    *
    * @return one row (n, n_clamped_each, lo_micros, hi_micros,
    *         wins_mean_micros).
    */
  def winsorizedMean(df: DataFrame, valueCol: String, tieCol: String,
                     frac: Double): DataFrame = {
    val (ranked, n) = Packing.globalRank(
      df.select(floor(col(valueCol) * lit(1e6)).cast("long").as("v"),
        col(tieCol).as("tie")), Seq("v", "tie"))
    val k = math.floor(frac * n).toLong
    val lo = ranked.filter(col("_grank") === k + 1)
      .select(col("v").as("lo"))
    val hi = ranked.filter(col("_grank") === n - k)
      .select(col("v").as("hi"))
    ranked.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
      .agg(min(col("lo")).as("lo_micros"), min(col("hi")).as("hi_micros"),
        sum(greatest(col("lo"), least(col("hi"), col("v")))).as("s"))
      .select(lit(n).as("n"), lit(k).as("n_clamped_each"),
        col("lo_micros"), col("hi_micros"),
        floor(col("s").cast("double") / lit(n.toDouble)).cast("long")
          .as("wins_mean_micros"))
  }

  /** Difference-in-differences estimator — the experimentation
    * readout for a rollout with no randomized holdout: with
    * treatment/control groups and a pre/post cutover,
    * `DiD = (ȳ_t,post − ȳ_t,pre) − (ȳ_c,post − ȳ_c,pre)` cancels both
    * the persistent group gap and the common time trend. One
    * map-side-combined fold to the 2×2 (treat, post) sufficient
    * statistics — exact integer micro sums and counts — then ONE
    * fixed IEEE expression; micros by truncation (signed).
    *
    * @param treatCol BOOLEAN Column: row belongs to the treated group.
    * @param postCol  BOOLEAN Column: row is after the cutover.
    * @return one row (n_t_pre, n_t_post, n_c_pre, n_c_post,
    *         did_micros); EMPTY when any of the four cells has no
    *         rows (an estimator over a missing cell is meaningless —
    *         callers see the absence, not a fake 0).
    */
  def diffInDiff(df: DataFrame, treatCol: Column, postCol: Column,
                 valueCol: String): DataFrame = {
    val cells = df.select(treatCol.as("t"), postCol.as("p"),
        floor(col(valueCol) * lit(1e6)).cast("long").as("v"))
      .groupBy(col("t"), col("p"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    def cell(t: Boolean, p: Boolean, out: String) =
      cells.filter(col("t") === t && col("p") === p)
        .select(col("n").as(s"n_$out"), col("s").as(s"s_$out"))
    val j = cell(true, false, "t_pre").crossJoin(cell(true, true, "t_post"))
      .crossJoin(cell(false, false, "c_pre"))
      .crossJoin(cell(false, true, "c_post"))
    def mean(out: String) = col(s"s_$out").cast("double") / col(s"n_$out")
    j.select(col("n_t_pre"), col("n_t_post"), col("n_c_pre"),
      col("n_c_post"),
      ((mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre")))
        .cast("long").as("did_micros"))
  }

  /** Poisson-bootstrap confidence interval for a mean (Chamandy et
    * al. 2012 — the bootstrap that SCALES: instead of B resampling
    * passes, each row draws a Poisson(1) multiplicity per replicate
    * in the SAME scan, map-side). Multiplicities are md5-derived
    * (`u = (bucket+0.5)/2³²` against hard-coded Poisson CDF cut
    * points — deterministic, engine-replayable, no RNG); replicate
    * means are exact integer divisions of integer folds; the CI reads
    * ranked replicate means at the 2.5%/97.5% ranks.
    *
    * @return one row (b_reps, mean_micros, lo_micros, hi_micros).
    */
  def bootstrapCI(df: DataFrame, idCol: String, valueCol: String,
                  b: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val reps = spark.range(b).select(col("id").as("rep"))
    val v = df.select(col(idCol).as("bid"),
      floor(col(valueCol) * lit(1e6)).cast("long").as("v"))
    val u = (Sampling.md5Bucket(concat(col("rep").cast("string"), lit(":"),
      col("bid").cast("string"))).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    // Poisson(1) inverse CDF — cut points are cumulative e^-1/k!
    val mult = when(u < lit(0.36787944117144233), lit(0L))
      .when(u < lit(0.7357588823428847), lit(1L))
      .when(u < lit(0.919698602928606), lit(2L))
      .when(u < lit(0.9810118431238462), lit(3L))
      .when(u < lit(0.9963401531726563), lit(4L))
      .otherwise(lit(5L))
    // ONE scan of the fan-out (the r13 fusion — was 3 scans + 2
    // broadcast barriers): the per-rep fold also carries the raw
    // sum/count on the rep-0 stripe (each replicate sees every base
    // row exactly once, so rep 0's raw fold IS the full-data mean),
    // then the CI bracket reads the b-row replicate table through one
    // bounded collect_list sort — b rows by construction, the
    // [[bootstrapCI]] contract — instead of a global window + two
    // broadcast-filter barriers.
    val perRep = v.crossJoin(reps)
      .select(col("rep"), mult.as("m"), col("v"))
      .groupBy("rep")
      .agg(floor(sum(col("m") * col("v")).cast("double") / sum(col("m")))
        .cast("long").as("mean_micros"),
        sum(when(col("rep") === 0, col("v"))).as("raw_s"),
        count(when(col("rep") === 0, lit(1))).as("raw_n"))
    val lo = math.max(1, math.ceil(0.025 * b).toInt)
    val hi = math.min(b, math.ceil(0.975 * b).toInt)
    // sort_array over (mean, rep) structs ≡ the row_number ranking
    // (mean asc, rep asc); element_at is 1-based
    val ms = sort_array(collect_list(
      struct(col("mean_micros"), col("rep"))))
    perRep.agg(
        floor(max(col("raw_s")).cast("double") / max(col("raw_n")))
          .cast("long").as("mean_micros"),
        element_at(ms, lo).getField("mean_micros").as("lo_micros"),
        element_at(ms, hi).getField("mean_micros").as("hi_micros"),
        count(lit(1)).as("_nr"))
      .filter(col("_nr") > 0) // empty input → empty output, as before
      .select(lit(b.toLong).as("b_reps"), col("mean_micros"),
        col("lo_micros"), col("hi_micros"))
  }

  /** Wilson score interval (Wilson 1927) for a binomial proportion per
    * group — the conversion-rate CI that stays inside [0,1] and
    * behaves at small n where the normal approximation collapses (the
    * readout next to [[Events.ucbScores]]' exploration bound). Counts
    * are exact integer folds; center and half-width are ONE fixed IEEE
    * expression over them at the caller's z (default 1.96 ≈ 95%),
    * floored to micros — engine-exact, one grouped aggregate.
    *
    * @return (group, n, wins, p_micros, lo_micros, hi_micros) ordered.
    */
  def wilsonInterval(df: DataFrame, groupCol: Column, successCol: Column,
                     z: Double = 1.96): DataFrame = {
    val g = df.select(groupCol.as("grp"),
        successCol.cast("long").as("s"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("s")).as("wins"))
    val n = col("n").cast("double")
    val p = col("wins") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / n +
      z2 / (lit(4.0) * n * n)) / denom
    g.select(col("grp"), col("n"), col("wins"),
        floor(lit(1e6) * p).cast("long").as("p_micros"),
        floor(lit(1e6) * (center - half)).cast("long").as("lo_micros"),
        floor(lit(1e6) * (center + half)).cast("long").as("hi_micros"))
      .orderBy("grp")
  }

  /** A/B sample-size and minimum-detectable-effect planner — the
    * question every experiment review actually asks ("how long must
    * this run"): with the two-sided 5% / 80%-power constant
    * `z = z_{α/2} + z_β = 2.801585` (a FIXED literal shared with the
    * oracle) and the pooled variance of the two current samples,
    * `n_required = ⌈2·z²·s_p²/Δ²⌉` per arm to confirm the OBSERVED
    * gap Δ, and `MDE = z·√(2·s_p²/n_min)` is the smallest gap the
    * CURRENT sizes could confirm. Values quantize to millis; both
    * outputs are single IEEE expressions over exact integer moments.
    *
    * @return one row (n_a, n_b, delta_milli, n_required, mde_milli);
    *         zero gap / degenerate variance report 0.
    */
  def powerMde(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, p: String) = df
      .select(floor(col(valueCol) * lit(1000)).cast("long").as("v"))
      .agg(count(lit(1)).as(s"n_$p"), sum(col("v")).as(s"s_$p"),
        sum(col("v") * col("v")).as(s"q_$p"))
    def ss(p: String) = col(s"q_$p").cast("double") -
      col(s"s_$p").cast("double") * col(s"s_$p") / col(s"n_$p")
    val j = side(a, "a").crossJoin(side(b, "b"))
    val sp2 = (ss("a") + ss("b")) / (col("n_a") + col("n_b") - 2)
    val dInt = floor(col("s_a").cast("double") / col("n_a")).cast("long") -
      floor(col("s_b").cast("double") / col("n_b")).cast("long")
    val delta = col("s_a").cast("double") / col("n_a") -
      col("s_b").cast("double") / col("n_b")
    val z = lit(2.801585)
    val bad = col("n_a") < 2 || col("n_b") < 2 || sp2 <= 0
    j.select(col("n_a"), col("n_b"), dInt.as("delta_milli"),
      when(bad || dInt === 0, lit(0L))
        .otherwise(ceil(lit(2.0) * z * z * sp2 / (delta * delta))
          .cast("long")).as("n_required"),
      when(bad, lit(0L))
        .otherwise(floor(z * sqrt(lit(2.0) * sp2 /
          least(col("n_a"), col("n_b")))).cast("long")).as("mde_milli"))
  }

  /** Log–log OLS slope (constant-elasticity fit) — the econometric
    * readout over (price, quantity)-shaped pairs: the slope of
    * `ln y` on `ln x` IS the elasticity. Each row's logs quantize to
    * integer MILLIS (`round(1000·ln v)` — millis, not micros, so the
    * cross-moment Σxy stays long-exact at the gate SFs), the five
    * sufficient statistics are exact integer folds, and slope and
    * intercept are fixed IEEE expressions over them. Non-positive
    * rows are excluded (logs undefined).
    *
    * @return one row (n, slope_micros, intercept_milli); zero
    *         x-variance reports 0/0.
    */
  def olsLogLog(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val q = df.filter(col(xCol) > 0 && col(yCol) > 0)
      .select(round(lit(1000) * log(col(xCol))).cast("long").as("x"),
        round(lit(1000) * log(col(yCol))).cast("long").as("y"))
    val s = q.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val den = col("n").cast("double") * col("sxx") -
      col("sx").cast("double") * col("sx")
    val slope = (col("n").cast("double") * col("sxy") -
      col("sx").cast("double") * col("sy")) / den
    s.select(col("n"),
      when(col("n") < 2 || den <= 0, lit(0L))
        .otherwise(floor(lit(1e6) * slope).cast("long"))
        .as("slope_micros"),
      when(col("n") < 2 || den <= 0, lit(0L))
        .otherwise(floor((col("sy") - slope * col("sx")) / col("n"))
          .cast("long")).as("intercept_milli"))
  }

  /** Two-sample Poisson rate test under equal exposure — the
    * error-budget monitor's statistic (did the error rate move
    * relative to the click rate): conditional on k₁+k₂, the count
    * split is Binomial(½), so `z = (k₁−k₂)/√(k₁+k₂)`. Pure counting;
    * the statistic is one integer-ratio sqrt expression.
    *
    * @return one row (k_a, k_b, z_micros); k_a + k_b = 0 reports 0.
    */
  def rateTest(a: DataFrame, b: DataFrame): DataFrame = {
    val ka = a.agg(count(lit(1)).as("k_a"))
    val kb = b.agg(count(lit(1)).as("k_b"))
    ka.crossJoin(kb).select(col("k_a"), col("k_b"),
      when(col("k_a") + col("k_b") === 0, lit(0L))
        .otherwise(floor(lit(1e6) * (col("k_a") - col("k_b")) /
          sqrt((col("k_a") + col("k_b")).cast("double"))).cast("long"))
        .as("z_micros"))
  }

  /** Benford first-digit screen (Newcomb 1881; Benford 1938) — the
    * fabricated-data detector on any naturally-spread positive
    * metric: observed leading-digit counts against `log₁₀(1+1/d)`,
    * reported per digit with its χ² contribution. Values quantize to
    * integer millis and the leading digit comes from the INTEGER's
    * decimal string (`substr(cast(m as string), 1, 1)` — exact on
    * both engines; float log₁₀ would bin-flip at powers of ten). The
    * Benford masses are fixed micro literals shared with the oracle;
    * each χ² term `⌊1e6·(o−e)²/e⌋` is one fixed IEEE expression.
    *
    * @return (digit, n_obs, exp_obs, term_micros) for digits
    *         1..9 present in the data, ordered.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    // round(1e6·log10(1 + 1/d)), d = 1..9 — shared with the oracle
    val p = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val m = df.select(floor(col(valueCol) * lit(1000)).cast("long")
        .as("m"))
      .filter(col("m") > 0)
      .select(substring(col("m").cast("string"), 1, 1).cast("long")
        .as("digit"))
    val obs = m.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = obs.agg(sum(col("n_obs")).as("n"))
    val pCol = (1 to 9).map(d =>
        when(col("digit") === d.toLong, lit(p(d - 1))))
      .reduceRight(_ otherwise _)
    val e = col("n").cast("double") * pCol / lit(1e6)
    obs.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        floor(col("n") * pCol / lit(1e6)).cast("long").as("exp_obs"),
        floor(lit(1e6) * (col("n_obs") - e) * (col("n_obs") - e) / e)
          .cast("long").as("term_micros"))
      .orderBy(col("digit"))
  }

  /** Wald–Wolfowitz runs test over the daily-mean sequence — the
    * randomness check behind "is this metric oscillating or
    * trending": days sign as above/below the DOUBLED median of daily
    * means (exact-integer percentile convention), the run count
    * `R = 1 + Σ 1[s_d ≠ s_{d−1}]` folds over the bounded day grid,
    * and `z = (R − μ)/σ` with `μ = 2n₁n₀/n + 1`,
    * `σ² = (μ−1)(μ−2)/(n−1)` is one fixed expression over exact
    * integers.
    *
    * @return one row (n_days, n_above, n_runs, z_micros); a
    *         degenerate one-sided sequence reports 0.
    */
  def runsTest(df: DataFrame, tsCol: String,
               valueCol: String): DataFrame = {
    val daily = df
      .groupBy(date_trunc("day", col(tsCol)).as("bucket"))
      .agg(floor(sum(floor(col(valueCol) * lit(1e6)).cast("long"))
        .cast("double") / count(lit(1))).cast("long").as("mean_micros"))
    val med = daily.agg(
      expr("CAST(2 * percentile(mean_micros, 0.5) AS BIGINT)").as("med2"))
    // BOUNDED global window: the per-day calendar grid
    val w = Window.orderBy("bucket")
    val signed = daily.crossJoin(broadcast(med))
      .withColumn("s", (lit(2L) * col("mean_micros") > col("med2"))
        .cast("long"))
      .withColumn("flip",
        when(lag(col("s"), 1).over(w).isNull, 1L)
          .otherwise((col("s") =!= lag(col("s"), 1).over(w))
            .cast("long")))
    val agg = signed.agg(count(lit(1)).as("n"), sum(col("s")).as("n1"),
      sum(col("flip")).as("r"))
    val mu = lit(2.0) * col("n1") * (col("n") - col("n1")) / col("n") +
      lit(1.0)
    val sig2 = (mu - 1.0) * (mu - 2.0) / (col("n") - 1)
    agg.select(col("n").as("n_days"), col("n1").as("n_above"),
      col("r").as("n_runs"),
      when(col("n1") === 0 || col("n1") === col("n") || col("n") < 3,
          lit(0L))
        .otherwise(floor(lit(1e6) * (col("r") - mu) / sqrt(sig2))
          .cast("long")).as("z_micros"))
  }

  /** McNemar's test for two PAIRED classifiers (McNemar 1947) — the
    * right comparison when both models score the SAME items (accuracy
    * deltas double-count the easy items): only the discordant counts
    * matter, `b` = A right & B wrong, `c` = A wrong & B right,
    * `χ² = (b−c)²/(b+c)` (no continuity correction — documented; the
    * caller compares against their χ²₁ critical value). Everything is
    * an exact integer fold; the statistic is one integer-ratio floor.
    *
    * Shape: one projection + one scalar fold.
    *
    * @return one row (n, b, c, chi2_micros); b + c = 0 reports 0.
    */
  def mcnemar(df: DataFrame, labelCol: String, aCol: String,
              bCol: String): DataFrame = {
    val y = col(labelCol).cast("long")
    val okA = (col(aCol).cast("long") === y).cast("long")
    val okB = (col(bCol).cast("long") === y).cast("long")
    val s = df.agg(count(lit(1)).as("n"),
      sum(okA * (lit(1L) - okB)).as("b"),
      sum((lit(1L) - okA) * okB).as("c"))
    s.select(col("n"), col("b"), col("c"),
      when(col("b") + col("c") === 0, lit(0L))
        .otherwise(floor(lit(1e6) * (col("b") - col("c")) *
          (col("b") - col("c")) / (col("b") + col("c"))).cast("long"))
        .as("chi2_micros"))
  }

  /** Cohen's d standardized effect size between two samples — the
    * practical-significance companion to [[welchT]]'s p-ranking
    * (a tiny p on 1e8 rows can still be a 0.01σ effect nobody should
    * ship): `d = (m_a − m_b)/s_p` with the pooled standard deviation
    * `s_p² = ((n_a−1)s_a² + (n_b−1)s_b²)/(n_a+n_b−2)`. Values
    * quantize to integer millis; per side (n, Σv, Σv²) are exact
    * integer folds and d is ONE fixed IEEE expression over them
    * (sqrt correctly rounded, engine-exact).
    *
    * @return one row (n_a, n_b, d_micros); degenerate spread → 0.
    */
  def cohensD(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def side(df: DataFrame, p: String) = df
      .select(floor(col(valueCol) * lit(1000)).cast("long").as("v"))
      .agg(count(lit(1)).as(s"n_$p"), sum(col("v")).as(s"s_$p"),
        sum(col("v") * col("v")).as(s"q_$p"))
    def ss(p: String) = col(s"q_$p").cast("double") -
      col(s"s_$p").cast("double") * col(s"s_$p") / col(s"n_$p")
    val j = side(a, "a").crossJoin(side(b, "b"))
    val sp2 = (ss("a") + ss("b")) / (col("n_a") + col("n_b") - 2)
    val d = (col("s_a").cast("double") / col("n_a") -
      col("s_b").cast("double") / col("n_b")) / sqrt(sp2)
    j.select(col("n_a"), col("n_b"),
      when(col("n_a") < 2 || col("n_b") < 2 || sp2 <= 0, lit(0L))
        .otherwise(floor(lit(1e6) * d).cast("long")).as("d_micros"))
  }

  /** Mutual information between two CATEGORICAL columns — the
    * dependence screen behind feature selection and leakage hunts
    * (does weekday predict event type at all): over the r×c
    * contingency table, `MI = Σ (n_xy/N)·ln(n_xy·N/(n_x·n_y))` in
    * nats. Each cell term `round(1e6·(n_xy/N)·ln(n_xy·N/(n_x·n_y)))`
    * quantizes to a long BEFORE the fold (the
    * [[graft.operators.TextAnalysis.pmiPairs]] convention — the ln
    * argument is a ratio of exact integer products, the accepted ln
    * residual class), so the sum is order-free and SQL-replayable.
    *
    * Shape: one cell fold (r·c rows) + two marginal folds + one
    * scalar fold — never corpus rows past the first groupBy.
    *
    * @return one row (n, n_cells, mi_micros).
    */
  def categoricalMi(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
      .localCheckpoint(true) // marginals AND terms read it
    val nx = cells.groupBy("x").agg(sum(col("nxy")).as("nx"))
    val ny = cells.groupBy("y").agg(sum(col("nxy")).as("ny"))
    val tot = cells.agg(sum(col("nxy")).as("n"))
    cells.join(nx, "x").join(ny, "y").crossJoin(broadcast(tot))
      .select(col("n"),
        round(lit(1e6) * (col("nxy").cast("double") / col("n")) *
          log((col("nxy") * col("n")).cast("double") /
            (col("nx") * col("ny")))).cast("long").as("t"))
      .groupBy(col("n"))
      .agg(count(lit(1)).as("n_cells"), sum(col("t")).as("mi_micros"))
      .select(col("n"), col("n_cells"), col("mi_micros"))
  }

  /** Cramér's V of an r×c contingency table — the [0,1]-normalized
    * effect size over the χ² dependence test ([[categoricalMi]]'s
    * bounded sibling; the per-pair matrix form is qX_corr_matrix for
    * numeric series): each cell contributes
    * `⌊1e6·(o−e)²/e⌋` with `e = n_x·n_y/N` (one fixed IEEE expression
    * over exact integer marginals, quantized BEFORE the fold), and
    * `V = √(χ²/(N·(min(r,c)−1)))` is one final sqrt (IEEE
    * correctly-rounded, engine-exact).
    *
    * @return one row (n, r, c, chi2_micros, v_micros).
    */
  def cramersV(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("nxy"))
      .localCheckpoint(true)
    val nx = cells.groupBy("x").agg(sum(col("nxy")).as("nx"))
    val ny = cells.groupBy("y").agg(sum(col("nxy")).as("ny"))
    val tot = cells.agg(sum(col("nxy")).as("n"),
      countDistinct(col("x")).as("r"), countDistinct(col("y")).as("c"))
    // DENSE r×c grid: an absent cell still contributes (0−e)²/e
    val dense = nx.crossJoin(ny)
      .join(cells, Seq("x", "y"), "left")
      .withColumn("o", coalesce(col("nxy"), lit(0L)))
    val e = col("nx").cast("double") * col("ny") / col("n")
    val chi = dense.crossJoin(broadcast(tot))
      .select(col("n"), col("r"), col("c"),
        floor(lit(1e6) * (col("o") - e) * (col("o") - e) / e)
          .cast("long").as("t"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(sum(col("t")).as("chi2_micros"))
    chi.select(col("n"), col("r"), col("c"), col("chi2_micros"),
      when(least(col("r"), col("c")) < 2 || col("chi2_micros") <= 0,
          lit(0L))
        .otherwise(floor(lit(1e6) * sqrt(
          (col("chi2_micros").cast("double") / lit(1e6)) /
            (col("n") * (least(col("r"), col("c")) - 1))))
          .cast("long")).as("v_micros"))
  }

  /** Benjamini–Hochberg FDR screen over per-cell mean shifts
    * (Benjamini & Hochberg 1995) — the multiple-comparisons gate a
    * metrics dashboard needs the moment it watches 35 cells at once:
    * each (group…) cell tests its mean against the global mean with
    * the DISTRIBUTION-FREE Chebyshev bound
    * `p ≤ min(1, (s²/n)/Δ²)` (no erf — a conservative p that is one
    * fixed IEEE expression over exact integer sums, engine-exact),
    * then BH: sort p ascending, reject every cell ranked ≤ k* where
    * `k* = max{i : p_i·m ≤ α·i}` (the comparison is INTEGER —
    * `p_micros·m ≤ alphaMicros·rank`). Values quantize to millis; the
    * Δ = 0 / n < 2 degeneracies report p = 1.
    *
    * Shape: one cell fold (m rows out) + two 1-row broadcast folds +
    * one window over the ≤m-row p table — never corpus rows.
    *
    * @return (group…, n, p_micros, rnk, rejected) ordered by rank.
    */
  def bhFdr(df: DataFrame, valueCol: String, groupCols: Seq[String],
            alphaMicros: Long = 100000L): DataFrame = {
    val q = df.select(groupCols.map(col) :+
      floor(col(valueCol) * lit(1000)).cast("long").as("v"): _*)
    val cells = q.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("qq"))
    val glob = q.agg(count(lit(1)).as("nn"), sum(col("v")).as("st"))
    // integer Δ gate (micro-millis) decides the degenerate branch;
    // the p value itself is one fixed IEEE expression
    val dInt = floor(lit(1e6) * col("s") / col("n")).cast("long") -
      floor(lit(1e6) * col("st") / col("nn")).cast("long")
    val mean = col("s").cast("double") / col("n")
    val gmean = col("st").cast("double") / col("nn")
    val varHat = (col("qq").cast("double") -
      col("s").cast("double") * col("s") / col("n")) / (col("n") - 1)
    val p = least(lit(1000000L),
      floor(lit(1e6) * (varHat / col("n")) /
        ((mean - gmean) * (mean - gmean))).cast("long"))
    val withP = cells.crossJoin(broadcast(glob))
      .withColumn("p_micros",
        when(col("n") < 2 || dInt === 0, lit(1000000L)).otherwise(p))
    val tot = withP.agg(count(lit(1)).as("m"))
    // BOUNDED global window: the ≤m-row hypothesis table
    val w = Window.orderBy((col("p_micros") +: groupCols.map(col)): _*)
    val ranked = withP.crossJoin(broadcast(tot))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("flag",
        col("p_micros") * col("m") <= lit(alphaMicros) * col("rnk"))
    val ks = ranked.agg(max(when(col("flag"), col("rnk"))
      .otherwise(lit(0L))).as("kstar"))
    ranked.crossJoin(broadcast(ks))
      .select(groupCols.map(col) ++ Seq(col("n"), col("p_micros"),
        col("rnk"), (col("rnk") <= col("kstar")).as("rejected")): _*)
      .orderBy(col("rnk"))
  }

  /** One-way ANOVA F statistic across ≥2 groups — the k-arm
    * generalization of [[welchT]] (equal-variance form): does ANY
    * event-type arm move the metric. Values quantize to integer
    * DECI-units (`⌊10·v⌋` — coarser than Welch's millis so every
    * squared sum stays long-exact: S_g ≤ ~1e8 ⇒ S_g² ≤ ~1e16 per
    * group at the gate SFs); per group (n_g, S_g) and globally Σv²
    * are exact integer folds, the between/within sums of squares use
    * INTEGER-truncated group terms `⌊S_g²/n_g⌋` (identical truncation
    * on every engine — determinism over the last decimal, the
    * [[bradleyTerry]] per-term quantize rule), and
    * `F = (ssb/(k−1))/(ssw/(n−k))` is one fixed IEEE expression.
    *
    * 100 TB shape: one groupBy over the group key (k rows out) + one
    * scalar fold — no joins, no windows.
    *
    * @return one row (k, n, ssb, ssw, f_micros); degenerate inputs
    *         (k < 2, n ≤ k, or zero within-variance) report f = 0.
    */
  def anovaF(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val q = df.select(col(groupCol).as("g"),
      floor(col(valueCol) * lit(10)).cast("long").as("v"))
    val perGroup = q.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"),
        sum(col("v") * col("v")).as("qg"))
      // ⌊S_g²/n_g⌋ quantizes BEFORE the cross-group fold (order-free)
      .select(col("ng"), col("sg"), col("qg"),
        floor(col("sg") * col("sg") / col("ng")).cast("long").as("tg"))
    val s = perGroup.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
      sum(col("sg")).as("s"), sum(col("qg")).as("q"),
      sum(col("tg")).as("mt"))
    val ssb = col("mt") - floor(col("s") * col("s") / col("n")).cast("long")
    val ssw = col("q") - col("mt")
    s.select(col("k"), col("n"), ssb.as("ssb"), ssw.as("ssw"),
      when(col("k") < 2 || col("n") <= col("k") || ssw <= 0 || ssb < 0,
          lit(0L))
        .otherwise(floor(lit(1e6) *
          (ssb.cast("double") / (col("k") - 1)) /
          (ssw.cast("double") / (col("n") - col("k")))).cast("long"))
        .as("f_micros"))
  }
}
