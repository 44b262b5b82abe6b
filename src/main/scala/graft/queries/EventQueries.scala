package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Drift, Events}

/** Event-analytics + drift-monitoring oracle gates over `events`
  * (the behavioral layer on the reference's activity stream —
  * funnels, cohorts, transition models, outlier screens, PSI/KS
  * drift).
  *
  * Time-split convention: "early" = ts < 2024-01-16, "late" = the
  * rest — the month of synthetic events split into two comparable
  * 15-day windows for the two-sample drift gates.
  */
object EventQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val SplitTs = "2024-01-16 00:00:00"

  /** Unrolled Bradley–Terry MM oracle: wins from per-user type-count
    * comparisons, then per round the micro-quantized pair
    * denominators, the MM update and the mean-1e6 renormalization —
    * the exact replay of [[graft.operators.Stats.bradleyTerry]]. */
  private def btSql(rounds: Int): String = {
    val head =
      """WITH cnt AS (SELECT user_id, event_type AS t, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |wn AS (SELECT a.t AS a, b.t AS b, count(*) AS nw
        |  FROM cnt a JOIN cnt b ON a.user_id = b.user_id
        |    AND a.t <> b.t AND a.c > b.c
        |  GROUP BY 1, 2),
        |comp AS (SELECT a, b, CAST(sum(nw) AS BIGINT) AS n_ab FROM (
        |    SELECT a, b, nw FROM wn
        |    UNION ALL SELECT b AS a, a AS b, 0 AS nw FROM wn) x
        |  GROUP BY 1, 2),
        |sym AS (SELECT c1.a, c1.b,
        |    c1.n_ab + coalesce(c2.n_ab, 0) AS n_tot
        |  FROM comp c1 LEFT JOIN comp c2
        |    ON c2.a = c1.b AND c2.b = c1.a),
        |wt AS (SELECT sym.a AS item,
        |    CAST(sum(coalesce(c.n_ab, 0)) AS BIGINT) AS big_w
        |  FROM sym LEFT JOIN comp c ON c.a = sym.a AND c.b = sym.b
        |  GROUP BY 1),
        |w0 AS (SELECT item, CAST(1000000 AS BIGINT) AS w FROM wt)""".stripMargin
    val rs = (1 to rounds).map { r =>
      s"""d$r AS (SELECT s.a AS item,
         |    CAST(sum(CAST(floor(1000000000000 * s.n_tot
         |      / (wa.w + wb.w)) AS BIGINT)) AS BIGINT) AS d
         |  FROM sym s JOIN w${r - 1} wa ON wa.item = s.a
         |  JOIN w${r - 1} wb ON wb.item = s.b GROUP BY 1),
         |r$r AS (SELECT wt.item,
         |    CASE WHEN d.d = 0 THEN CAST(1000000 AS BIGINT)
         |      ELSE CAST(floor(1e12 * wt.big_w / d.d) AS BIGINT)
         |    END AS w_raw
         |  FROM wt JOIN d$r d USING (item)),
         |t$r AS (SELECT CAST(sum(w_raw) AS BIGINT) AS s, count(*) AS k
         |  FROM r$r),
         |w$r AS (SELECT r.item,
         |    CAST(floor(CAST(r.w_raw AS DOUBLE) * 1e6 * t.k / t.s)
         |      AS BIGINT) AS w
         |  FROM r$r r CROSS JOIN t$r t)""".stripMargin
    }
    (Seq(head) ++ rs).mkString(",\n") +
      s"""
         |SELECT w$rounds.item, w$rounds.w AS w_micros, wt.big_w AS n_wins
         |FROM w$rounds JOIN wt USING (item) ORDER BY item""".stripMargin
  }

  /** DuckDB fragment: the item–item CF pipeline ending at ranked CTE
    * `r` (item, rec, co, sim_micros, rn) — shared by qX_item_sim and
    * qX_rec_gini so the rec table cannot drift between them. */
  private val ItemSimCte: String =
    """WITH ui AS (
      |  SELECT DISTINCT user_id AS u,
      |    CAST(floor("value") AS BIGINT) % 50 AS item
      |  FROM events WHERE event_type IN ('click', 'view')),
      |kept AS (SELECT u, item FROM ui
      |  QUALIFY count(*) OVER (PARTITION BY u) <= 50),
      |p AS (SELECT a.item AS i, b.item AS j, count(*) AS co
      |  FROM kept a JOIN kept b ON a.u = b.u AND a.item < b.item
      |  GROUP BY 1, 2),
      |deg AS (SELECT item, count(*) AS d FROM kept GROUP BY 1),
      |sym AS (SELECT i, j, co FROM p
      |  UNION ALL SELECT j AS i, i AS j, co FROM p),
      |sc AS (SELECT sym.i AS item, sym.j AS rec, sym.co,
      |  CAST(floor(1e6 * (CAST(sym.co AS DOUBLE) /
      |    sqrt(CAST(di.d * dj.d AS DOUBLE)))) AS BIGINT) AS sim_micros
      |  FROM sym JOIN deg di ON di.item = sym.i
      |            JOIN deg dj ON dj.item = sym.j),
      |r AS (SELECT item, rec, co, sim_micros, row_number() OVER (
      |  PARTITION BY item ORDER BY sim_micros DESC, rec) AS rn FROM sc)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Windowed ordered funnel signup → view → purchase within 7 days
    // of the signup anchor: per-step min-fold levels, user-keyed
    // shrinking joins — never a per-user event sort.
    "qX_funnel" -> ((s, dir) => {
      Events.funnel(t(s, dir, "events"), "user_id", "ts", "event_type",
        Seq("signup", "view", "purchase"), "7 DAYS")
    }),

    // Weekly cohort retention: cohort = Monday week of first event,
    // retention_micros = floor(1e6 * active / cohort_size) per offset.
    "qX_retention" -> ((s, dir) => {
      Events.retentionCohorts(t(s, dir, "events"), "user_id", "ts", 8)
    }),

    // First-order behavior Markov chain: per-user lag window (ties
    // broken by event_id), pair counts, row-normalized micros.
    "qX_transitions" -> ((s, dir) => {
      Events.transitionMatrix(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("event_id"))
    }),

    // Hampel (median/MAD) outlier screen per event type — doubled
    // medians keep interpolated ranks exact BIGINTs.
    "qX_outliers" -> ((s, dir) => {
      Events.robustOutliers(t(s, dir, "events"), "event_type", "value")
    }),

    // PSI drift of `value` early-half vs late-half over 10 fixed bins
    // of [0, 500): per-bin add-1-smoothed terms + the bin=-1 total.
    "qX_psi" -> ((s, dir) => {
      val e = t(s, dir, "events")
      Drift.psi(e.filter(col("ts") < lit(SplitTs).cast("timestamp")),
        e.filter(col("ts") >= lit(SplitTs).cast("timestamp")),
        "value", 0.0, 500.0, 10)
    }),

    // Last-touch attribution: each purchase attributes to the latest
    // click/view of the same user within 3 days (as-of join shape;
    // equal-ts touches collapse to max id first).
    "qX_attribution" -> ((s, dir) => {
      Events.lastTouchAttribution(t(s, dir, "events"), "user_id", "ts",
        "event_type", "event_id", "purchase", Seq("click", "view"),
        windowMicros = 3L * 86400L * 1000000L)
    }),

    // Linear multi-touch attribution over the same window: every
    // qualifying touch splits the credit, floor + remainder-to-last
    // so each conversion sums to exactly 1e6 micros.
    "qX_linear_attrib" -> ((s, dir) => {
      Events.linearAttribution(t(s, dir, "events"), "user_id", "ts",
        "event_type", "event_id", "purchase", Seq("click", "view"),
        windowMicros = 3L * 86400L * 1000000L)
    }),

    // Popularity-bias Gini over the item-item rec table — exact
    // integer Lorenz fold over the catalog-sized count table.
    "qX_rec_gini" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id"),
          (floor(col("value")).cast("long") % 50).as("item"))
      val recs = graft.operators.Pymk.itemItemTopK(e, "user_id", "item",
        k = 5, userCap = 50)
      graft.operators.Eval.exposureGini(recs, "rec")
    }),

    // Catalog coverage + mean novelty of the item-item recs — the
    // aggregate-diversity dials next to qX_rec_gini's concentration.
    "qX_rec_coverage" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id"),
          (floor(col("value")).cast("long") % 50).as("item"))
      val recs = graft.operators.Pymk.itemItemTopK(e, "user_id", "item",
        k = 5, userCap = 50)
      graft.operators.Eval.coverageNovelty(recs, "rec", e,
        "user_id", "item")
    }),

    // Difference-in-differences: md5-even users as "treated", the KS
    // split timestamp as cutover — 2×2 integer sufficient statistics,
    // one IEEE estimator expression.
    "qX_did" -> ((s, dir) => {
      graft.operators.Stats.diffInDiff(t(s, dir, "events"),
        pmod(graft.operators.Sampling.md5Bucket(col("user_id")),
          lit(2L)) === 0L,
        col("ts") >= lit(SplitTs).cast("timestamp"), "value")
    }),

    // Welch's t statistic between click and view values — exact
    // integer sufficient statistics, one IEEE expression.
    "qX_welch" -> ((s, dir) => {
      val e = t(s, dir, "events")
      graft.operators.Stats.welchT(
        e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "view"), "value")
    }),

    // Poisson-bootstrap 95% CI of the mean value — md5 multiplicities,
    // 32 replicates in ONE scan, ranked replicate means.
    "qX_bootstrap" -> ((s, dir) => {
      graft.operators.Stats.bootstrapCI(t(s, dir, "events"),
        "event_id", "value", b = 32)
    }),

    // Exponentially time-decayed interaction weights per (user, type)
    // — integer-micro contributions, order-free keyed fold.
    "qX_decay" -> ((s, dir) => {
      graft.operators.Features.decayedCounts(t(s, dir, "events"),
        Seq("user_id", "event_type"), "ts", "2024-02-01 00:00:00",
        halfLifeDays = 7.0)
    }),

    // Item–item collaborative filtering: "also viewed" top-5 per item
    // by binary cosine over co-occurrence — user-cap guard, quantized
    // ranking.
    "qX_item_sim" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id"),
          (floor(col("value")).cast("long") % 50).as("item"))
      graft.operators.Pymk.itemItemTopK(e, "user_id", "item",
        k = 5, userCap = 50)
    }),

    // Reciprocal best matches of the item-item rec table: pairs that
    // are each other's rank-1 — the high-precision mutual cut.
    "qX_mutual_best" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("user_id"),
          (floor(col("value")).cast("long") % 50).as("item"))
      val recs = graft.operators.Pymk.itemItemTopK(e, "user_id", "item",
        k = 5, userCap = 50)
      graft.operators.Pymk.mutualBest(recs, "item", "rec", "sim_micros")
    }),

    // Wilson 95% score interval per item arm — the conversion-rate CI
    // that stays in [0,1] at small n; one fixed IEEE expression over
    // exact integer folds.
    "qX_wilson" -> ((s, dir) => {
      graft.operators.Stats.wilsonInterval(t(s, dir, "events"),
        floor(col("value")).cast("long") % 50,
        (col("event_type") === "purchase").cast("int"))
    }),

    // EXACT distributed quantiles by global-rank selection — no
    // tolerance band: the oracle must agree on the exact row.
    "qX_exact_quantile" -> ((s, dir) => {
      val e = t(s, dir, "events").select(
        floor(col("value") * lit(1e6)).cast("long").as("v"),
        col("event_id"))
      graft.operators.Sketches.exactQuantiles(e, "v", "event_id",
        Seq(500000L, 900000L, 990000L))
    }),

    // md5-portable HLL distinct estimate — the ESTIMATE itself is the
    // oracle contract (registers are cross-engine-replayable).
    "qX_hll_portable" -> ((s, dir) => {
      graft.operators.Sketches.portableHllDistinct(
        t(s, dir, "events"), "user_id")
    }),

    // Row-level rule violations — the actionable constraint face:
    // offending event_ids per named predicate.
    "qX_violations" -> ((s, dir) => {
      graft.operators.Profile.violations(t(s, dir, "events"), "event_id",
        Seq(("value_lt_480", col("value") < 480),
          ("user_known", col("user_id") <= 140)))
    }),

    // CUSUM change-point over daily means — prefix-sum minus
    // running-min identity, two windows over the 30-day bucket table.
    "qX_cusum" -> ((s, dir) => {
      graft.operators.Drift.cusum(t(s, dir, "events"), "ts", "value",
        slackMicros = 1000000L, thresholdMicros = 50000000L)
    }),

    // ACF of the daily event-count series at lags 1..7 — exact
    // integer deviation folds, one truncated division per lag; the
    // weekly-cycle readout next to the CUSUM alarm.
    "qX_acf" -> ((s, dir) => {
      graft.operators.Drift.acf(t(s, dir, "events"), "ts", maxLag = 7)
    }),

    // EWMA control chart (λ = ½) over daily means — closed-form
    // 2³¹-scaled integer weights, exact BIGINT fold, one right-shift.
    "qX_ewma" -> ((s, dir) => {
      graft.operators.Drift.ewma(t(s, dir, "events"), "ts", "value",
        thresholdMicros = 20000000L)
    }),

    // 5% two-sided trimmed mean of value — robust location on the
    // exact distributed rank.
    "qX_trimmed" -> ((s, dir) => {
      graft.operators.Stats.trimmedMean(t(s, dir, "events"), "value",
        "event_id", trimFrac = 0.05)
    }),

    // Two-sample KS statistic of `value` early vs late on the
    // micro-quantized grid.
    "qX_ks" -> ((s, dir) => {
      val e = t(s, dir, "events")
      Drift.ksStatistic(e.filter(col("ts") < lit(SplitTs).cast("timestamp")),
        e.filter(col("ts") >= lit(SplitTs).cast("timestamp")), "value")
    }),

    // Per-user Markov sequence likelihood — the behavioral-anomaly
    // score: each user's event chain scored under the global add-1
    // first-order transition model, integer-micro log-prob sums.
    "qX_seq_score" -> ((s, dir) => {
      Events.sequenceScore(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("event_id"))
    }),

    // Equal-frequency quantile binning on the distributed global-rank
    // primitive — exact bins, never a single global sort window.
    "qX_quantile_bins" -> ((s, dir) => {
      val e = t(s, dir, "events").select(col("event_id"),
        floor(col("value") * lit(1e6)).cast("long").as("v"))
      graft.operators.Features.quantileBins(e, "v", "event_id", 10)
        .orderBy(col("event_id"))
    }),

    // UCB1 bandit readout per item arm: mean purchase reward +
    // sqrt(2 ln N / n) exploration bonus, one fixed IEEE expression
    // over exact integer pull/win folds.
    "qX_ucb" -> ((s, dir) => {
      Events.ucbScores(t(s, dir, "events"),
        floor(col("value")).cast("long") % 50,
        (col("event_type") === "purchase").cast("int"))
    }),

    // RFM segmentation: per-user recency/frequency/monetary quintiles
    // (1-5 each) on the exact distributed-rank primitive — never one
    // global window over users.
    "qX_rfm" -> ((s, dir) => {
      Events.rfm(t(s, dir, "events"), "user_id", "ts", "value")
    }),

    // DAU/MAU stickiness per month — exact integer engagement ratio.
    "qX_stickiness" -> ((s, dir) => {
      Events.stickiness(t(s, dir, "events"), "user_id", "ts")
    }),

    // Sequential patterns (PrefixSpan/GSP length-2 core): a→b user
    // support via the min-ts(a) < max-ts(b) reduction — journey
    // ordering mined from two vocabulary-bounded folds, never a
    // per-event self-join.
    "qX_seq_pairs" -> ((s, dir) => {
      Events.sequentialPairs(t(s, dir, "events"), "user_id", "ts",
        "event_type", minSupport = 5L)
    }),

    // Lorenz curve of per-user activity — "the top decile produces
    // X% of events", the distribution behind the Gini number.
    "qX_lorenz" -> ((s, dir) => {
      val per = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("w"))
      graft.operators.Eval.lorenzCurve(per, "w", "user_id")
    }),

    // Longest consecutive-day streaks — the engagement leaderboard
    // via the gaps-and-islands key, rank quantized before the limit.
    "qX_streaks" -> ((s, dir) => {
      Events.longestStreaks(t(s, dir, "events"), "user_id", "ts", 20)
    }),

    // Western Electric control rules over daily means — the four
    // classic out-of-control patterns a plain threshold misses.
    "qX_spc" -> ((s, dir) => {
      Drift.westernElectric(t(s, dir, "events"), "ts", "value")
    }),

    // Week-over-week growth — the topline trend table.
    "qX_wow" -> ((s, dir) => {
      Events.weekOverWeek(t(s, dir, "events"), "ts")
    }),

    // Relative risk + odds ratio: is a weekend event likelier to be
    // a purchase — the epidemiology 2x2 pointed at behavior.
    "qX_relative_risk" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(
        dayofweek(col("ts")).isin(1, 7).cast("long").as("exposed"),
        (col("event_type") === "purchase").cast("long").as("y"))
      Events.relativeRisk(ev, "exposed", "y")
    }),

    // First-touch event-type mix — the acquisition-funnel entry
    // distribution (last-touch is qX_attribution's job).
    "qX_first_touch" -> ((s, dir) => {
      Events.firstTouch(t(s, dir, "events"), "user_id", "ts",
        "event_type", "event_id")
    }),

    // Weekday × hour activity heatmap with corpus shares — the
    // capacity-planning grid.
    "qX_heatmap" -> ((s, dir) => {
      Events.activityGrid(t(s, dir, "events"), "ts")
    }),

    // Lead-lag cross-correlation click → purchase at lags 0..7 —
    // does engagement today predict purchases in k days.
    "qX_lead_lag" -> ((s, dir) => {
      Events.leadLagCorr(t(s, dir, "events"), "ts", "event_type",
        "click", "purchase", maxLag = 7)
    }),

    // Audience churn across the mid-month split — Jaccard of active
    // sets, churned and new shares.
    "qX_audience_churn" -> ((s, dir) => {
      // 2024-01-16T00:00:00Z (SplitTs) in epoch micros
      Events.audienceChurn(t(s, dir, "events"), "user_id", "ts",
        cutUs = 1705363200000000L)
    }),

    // Day-over-day movers: top-10 (type, day) count changes — the
    // "what changed" report, ranked by integer |delta| before limit.
    "qX_movers" -> ((s, dir) => {
      Events.dailyMovers(t(s, dir, "events"), "ts", "event_type", 10)
    }),

    // Daily-count dispersion index — Poisson overdispersion check
    // beside the per-user burstiness.
    "qX_dispersion" -> ((s, dir) => {
      Events.dispersionIndex(t(s, dir, "events"), "ts")
    }),

    // 1-D earth mover's distance early-vs-late on the PSI bin grid —
    // the drift number that keeps magnitude, exact cross-product
    // CDF differences.
    "qX_emd" -> ((s, dir) => {
      val e = t(s, dir, "events")
      Drift.emd1d(e.filter(col("ts") < lit(SplitTs).cast("timestamp")),
        e.filter(col("ts") >= lit(SplitTs).cast("timestamp")),
        "value", 0.0, 500.0, 10)
    }),

    // Within-session event-type co-occurrence lift — does a purchase
    // share a SITTING with an error; the session face of
    // qX_type_overlap.
    "qX_session_cooccur" -> ((s, dir) => {
      Events.sessionCooccur(t(s, dir, "events"), "user_id", "ts",
        "event_type", "event_id", gapUs = 30L * 60L * 1000000L)
    }),

    // Sample-size / MDE planner from the click-vs-view moments —
    // "how long must this test run" with the fixed 5%/80% z literal.
    "qX_power_mde" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Stats.powerMde(
        ev.filter(col("event_type") === "click").select(col("value")),
        ev.filter(col("event_type") === "view").select(col("value")),
        "value")
    }),

    // Retrospective best change-point over daily means — binary
    // segmentation's first split, a deterministic integer argmax.
    "qX_changepoint" -> ((s, dir) => {
      Drift.changepoint(t(s, dir, "events"), "ts", "value")
    }),

    // Inter-event gap p50/p90/p99 per type — exact rank-selected
    // quantiles (integer ceil-index arithmetic, no interpolation).
    "qX_gap_quantiles" -> ((s, dir) => {
      Events.gapQuantiles(t(s, dir, "events"), "user_id", "ts",
        "event_type", "event_id")
    }),

    // Two-sample Poisson rate z between click and error volumes —
    // the error-budget monitor's statistic.
    "qX_rate_test" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Stats.rateTest(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "error"))
    }),

    // Benford leading-digit screen on value — per digit the observed
    // count, expected count, and chi-square contribution; digits come
    // from the integer's decimal string, never float log10.
    "qX_benford" -> ((s, dir) => {
      graft.operators.Stats.benford(t(s, dir, "events"), "value")
    }),

    // Wald–Wolfowitz runs test over daily means vs their doubled
    // median — oscillation vs trend on the bounded day grid.
    "qX_runs_test" -> ((s, dir) => {
      graft.operators.Stats.runsTest(t(s, dir, "events"), "ts", "value")
    }),

    // Information gain of the value-decile split against the
    // purchase label — the decision-tree criterion beside qX_woe.
    "qX_info_gain" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("value"), col("event_id"),
        (col("event_type") === "purchase").cast("long").as("y"))
      graft.operators.Features.infoGain(ev, "value", "event_id", "y", 10)
    }),

    // Session health report: bounce rate, depth, dwell over the
    // 30-min-gap sessionization.
    "qX_session_stats" -> ((s, dir) => {
      Events.sessionStats(t(s, dir, "events"), "user_id", "ts",
        "event_id", gapUs = 30L * 60L * 1000000L)
    }),

    // Theil T inequality of per-user activity — the decomposable
    // inequality number beside qX_lorenz/qX_hhi, unit terms
    // ln-quantized before the fold.
    "qX_theil" -> ((s, dir) => {
      graft.operators.Eval.theilIndex(t(s, dir, "events"), "user_id")
    }),

    // Audience Jaccard between event-type user sets — do clickers
    // also purchase; the categorical face of qX_corr_matrix.
    "qX_type_overlap" -> ((s, dir) => {
      Events.typeOverlap(t(s, dir, "events"), "event_type", "user_id")
    }),

    // McNemar's paired-classifier test: activity-threshold vs
    // click-threshold raters against the heavy-purchaser label —
    // only the discordant users decide.
    "qX_mcnemar" -> ((s, dir) => {
      val u = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_ev"),
          sum((col("event_type") === "purchase").cast("long")).as("np"),
          sum((col("event_type") === "click").cast("long")).as("nc"))
        .select((col("np") >= 14).cast("long").as("y"),
          (col("n_ev") >= 67).cast("long").as("a"),
          (col("nc") >= 14).cast("long").as("b"))
      graft.operators.Stats.mcnemar(u, "y", "a", "b")
    }),

    // Cohen's d of click vs view values — the effect size beside
    // qX_welch's t statistic.
    "qX_cohens_d" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Stats.cohensD(
        ev.filter(col("event_type") === "click").select(col("value")),
        ev.filter(col("event_type") === "view").select(col("value")),
        "value")
    }),

    // Mutual information between event type and weekday — the
    // categorical dependence screen, per-cell terms PMI-quantized
    // before the fold.
    "qX_mi" -> ((s, dir) => {
      graft.operators.Stats.categoricalMi(
        t(s, dir, "events")
          .withColumn("weekday", dayofweek(col("ts")).cast("long")),
        "event_type", "weekday")
    }),

    // Cramér's V over the same contingency — the bounded [0,1]
    // effect size on the chi-square, one final engine-exact sqrt.
    "qX_cramers_v" -> ((s, dir) => {
      graft.operators.Stats.cramersV(
        t(s, dir, "events")
          .withColumn("weekday", dayofweek(col("ts")).cast("long")),
        "event_type", "weekday")
    }),

    // Herfindahl–Hirschman concentration of per-user activity +
    // effective user count — the market-concentration face of
    // qX_rec_gini/qX_lorenz.
    "qX_hhi" -> ((s, dir) => {
      graft.operators.Eval.hhi(t(s, dir, "events"), "user_id")
    }),

    // Benjamini–Hochberg FDR screen over the 35 (type, weekday)
    // cells — distribution-free Chebyshev p-bounds, integer BH
    // comparison p·m <= alpha·rank.
    "qX_bh_fdr" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("weekday", dayofweek(col("ts")).cast("long"))
      graft.operators.Stats.bhFdr(ev, "value",
        Seq("event_type", "weekday"), alphaMicros = 100000L)
    }),

    // Page–Hinkley mean-shift alarm over daily means — the
    // running-mean sequential detector between qX_cusum and qX_ewma.
    "qX_page_hinkley" -> ((s, dir) => {
      Drift.pageHinkley(t(s, dir, "events"), "ts", "value",
        slackMicros = 1000000L, thresholdMicros = 50000000L)
    }),

    // Stationary distribution of the event-type Markov chain (4
    // power-iteration rounds, per-edge terms quantized before the
    // fold) — where the session walk spends its time in the limit.
    "qX_stationary" -> ((s, dir) => {
      Events.stationaryDistribution(t(s, dir, "events"), "user_id",
        "ts", "event_type", Seq("event_id"), rounds = 4)
    }),

    // Cumulative gains / lift by activity-score decile against the
    // purchased label — the campaign-targeting curve beside qX_auc.
    "qX_gain" -> ((s, dir) => {
      val per = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("score"),
          max((col("event_type") === "purchase").cast("long")).as("y"))
      graft.operators.Eval.gainCurve(per, "score", "y", "user_id")
    }),

    // One-way ANOVA F across the five event-type arms on value —
    // the k-arm readout beside qX_welch's two arms.
    "qX_anova" -> ((s, dir) => {
      graft.operators.Stats.anovaF(t(s, dir, "events"), "value",
        "event_type")
    }),

    // Expected reciprocal rank @10 of the per-type top-user run
    // (grades n%4 — synthetic but exact): the cascade-model metric
    // beside qX_ndcg, closed-form exact-integer, no log/exp.
    "qX_err" -> ((s, dir) => {
      val per = t(s, dir, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Eval.errAtK(
        per.select(col("event_type").as("qid"), col("user_id").as("id"),
          col("n").as("score")),
        per.select(col("event_type").as("qid"), col("user_id").as("id"),
          (col("n") % 4).as("grade")),
        k = 10, maxGrade = 3)
    }),

    // Koren bias baseline: μ + b_u + b_i by two regularized keyed
    // folds — the model every CF comparison subtracts first.
    "qX_bias_model" -> ((s, dir) => {
      val ratings = t(s, dir, "events")
        .select(col("user_id"),
          (floor(col("value")).cast("long") % 50).as("item"),
          col("value"))
      graft.operators.Pymk.biasBaseline(ratings, "user_id", "item",
        "value", lambda = 10L)
    }),

    // Churn-label builder: per active user-week, did the user go
    // silent the following week — the supervised retention dataset,
    // last week dropped (label unknowable).
    "qX_churn_labels" -> ((s, dir) => {
      Events.churnLabels(t(s, dir, "events"), "user_id", "ts")
    }),

    // Quantile-shift report between the early and late halves — the
    // "what moved" companion to qX_ks: exact per-quantile values side
    // by side with the signed delta.
    "qX_quantile_shift" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Drift.quantileShift(
        ev.filter(col("ts") < lit(SplitTs).cast("timestamp"))
          .select(col("value"), col("event_id")),
        ev.filter(col("ts") >= lit(SplitTs).cast("timestamp"))
          .select(col("value"), col("event_id")),
        "value", "event_id")
    }),

    // Pairwise Pearson correlation of per-type daily activity over
    // the dense day×type grid — do clicks and purchases move together.
    "qX_corr_matrix" -> ((s, dir) => {
      Events.typeCorrelationMatrix(t(s, dir, "events"), "ts",
        "event_type")
    }),

    // Systematic every-97th sample under the exact event_id order —
    // guaranteed-coverage eval subsets.
    "qX_systematic" -> ((s, dir) => {
      graft.operators.Sampling.systematicSample(
          t(s, dir, "events").select(col("event_id")),
          Seq("event_id"), 97)
        .agg(count(lit(1)).as("n_kept"),
          sum(col("event_id")).as("id_sum"))
    }),

    // Seasonal Hampel screen: each day flags against ITS weekday's
    // doubled-median/MAD band — a Sunday dip is only anomalous
    // relative to other Sundays.
    "qX_seasonal" -> ((s, dir) => {
      Events.seasonalOutliers(t(s, dir, "events"), "ts")
    }),

    // Mann–Whitney U: the nonparametric A/B test beside qX_welch —
    // click vs view values, tie-broken joint ranks on the exact
    // distributed-rank primitive.
    "qX_mannwhitney" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.Stats.mannWhitneyU(
        ev.filter(col("event_type") === "click")
          .select(col("value"), col("event_id")),
        ev.filter(col("event_type") === "view")
          .select(col("value"), col("event_id")),
        "value", "event_id")
    }),

    // WOE / information value of decile-binned value vs the purchase
    // label — the credit-scoring feature screen beside qX_chi2.
    "qX_woe" -> ((s, dir) => {
      val ev = t(s, dir, "events").select(col("value"), col("event_id"),
        (col("event_type") === "purchase").cast("int").as("y"))
      graft.operators.Features.woeIv(ev, "value", "event_id", "y", 10)
    }),

    // Per-cohort cumulative LTV curves — the revenue companion of
    // qX_retention: average w-week value per cohort user, cumulative
    // windows over the offset grid only.
    "qX_ltv" -> ((s, dir) => {
      Events.ltvCurves(t(s, dir, "events"), "user_id", "ts", "value",
        maxOffset = 8)
    }),

    // Funnel latency: p50/p90/p99 of signup→purchase delay via the
    // exact distributed-rank quantile primitive.
    "qX_time_to_convert" -> ((s, dir) => {
      Events.timeToConvert(t(s, dir, "events"), "user_id", "ts",
        "event_type", "signup", "purchase")
    }),

    // Per-user burstiness B = (σ−μ)/(σ+μ) of inter-event gaps —
    // metronome bots → −1, Poisson → 0, bursty humans → +1; exact
    // integer folds, one sqrt (IEEE-correctly-rounded, engine-exact).
    "qX_burstiness" -> ((s, dir) => {
      Events.burstiness(t(s, dir, "events"), "user_id", "ts", "event_id")
    }),

    // Gap-based batch sessionization (30-min idle gap): per-user
    // lag-gap flag + running count, one fold per session — windows
    // partitioned by user, never global.
    "qX_sessionize" -> ((s, dir) => {
      Events.sessionize(t(s, dir, "events"), "user_id", "ts",
        "event_id", gapUs = 30L * 60L * 1000000L)
    }),

    // STREAMING incremental additive rollup, oracle-gated (X33
    // promoted from spec-only, the qX_stream_neardup playbook): fold
    // the events table through a BucketStore rollup in 3 deterministic
    // micro-batches (user_id mod 3 — additive merges are commutative,
    // so ANY disjoint batching must land on the same table), refold
    // the last batch to exercise the at-least-once replay fence (a
    // double-count would hash-mismatch), then gate the accumulated
    // per-(type, user-shard) sums. The DuckDB oracle is the plain
    // global GROUP BY the rollup must equal; values fold as integer
    // micros so partial-sum order can't matter.
    "qX_stream_rollup" -> ((s, dir) => {
      import graft.streaming.CardStream
      // tiny child session: the fold's cost is fixed per-trigger jobs
      // over a few hundred partial rows, not data (qX_stream_neardup's
      // rationale); isolated SQLConf, shared SparkContext
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
      val ev = Tables.load(fold, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(97L)).as("g"),
          floor(col("value") * lit(1e6)).cast("long").as("v_micros"),
          lit(1L).as("n"))
        .localCheckpoint(true)
      GateTmp.withStore("graft-rugate") { root =>
        val store = root + "/ru"
        // 8 store buckets — a few-hundred-key rollup wants few bucket
        // files (read/write planning is linear in them; a 100 TB
        // rollup would size UP from the 64 default instead)
        (0 to 2).foreach { i =>
          CardStream.mergeAdditive(fold,
            ev.filter(pmod(col("g"), lit(3L)) === i),
            store, Seq("event_type", "g"), Seq("v_micros", "n"),
            batchId = i.toLong, storeBuckets = 8)
        }
        // at-least-once redelivery of the last batch: fenced no-op
        val replayed = CardStream.mergeAdditive(fold,
          ev.filter(pmod(col("g"), lit(3L)) === 2),
          store, Seq("event_type", "g"), Seq("v_micros", "n"),
          batchId = 2L, storeBuckets = 8)
        require(replayed == 0L, "replay fence must no-op")
        // materialize BEFORE the helper deletes the tmpfs store
        CardStream.readRollup(s, store)
          .select(col("event_type"), col("g"), col("v_micros"), col("n"))
          .orderBy(col("event_type"), col("g"))
          .localCheckpoint(true)
      }
    }),

    // STREAMING admission gate, oracle-gated (X124 promoted from
    // spec-only): same 3-batch rollup fold as qX_stream_rollup, but
    // each batch must pass a declarative constraint suite BEFORE it
    // folds — and the middle batch is built to FAIL its compliance
    // check (every row has g % 3 = 1), so it quarantines and the
    // rollup accumulates only batches 0 and 2. The oracle is the
    // GROUP BY over exactly the admitted two-thirds: a contaminated
    // fold (quarantined rows leaking into the sums) hash-mismatches.
    "qX_stream_gated" -> ((s, dir) => {
      import graft.streaming.CardStream
      import graft.operators.Profile.{Completeness, Compliance}
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
      val ev = Tables.load(fold, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(97L)).as("g"),
          floor(col("value") * lit(1e6)).cast("long").as("v_micros"),
          lit(1L).as("n"))
        .localCheckpoint(true)
      val checks = Seq(
        Completeness("event_type", 1.0),
        // the admission rule the middle batch violates by construction
        Compliance("g_mod3_not_1", "g", pmod(col("g"), lit(3L)) =!= 1L, 1.0))
      GateTmp.withStore("graft-aggate") { root =>
        val store = root + "/ag"
        val verdicts = (0 to 2).map { i =>
          CardStream.gatedMergeAdditive(fold,
            ev.filter(pmod(col("g"), lit(3L)) === i),
            store, Seq("event_type", "g"), Seq("v_micros", "n"), checks,
            batchId = i.toLong, storeBuckets = 8)._1
        }
        require(verdicts == Seq(true, false, true),
          "admission verdicts must be (pass, quarantine, pass)")
        // the quarantined batch is preserved verbatim for reprocessing
        require(fold.read.parquet(s"$store/quarantine/b=1").count() > 0,
          "quarantined batch must land under quarantine/")
        CardStream.readRollup(s, store)
          .select(col("event_type"), col("g"), col("v_micros"), col("n"))
          .orderBy(col("event_type"), col("g"))
          .localCheckpoint(true)
      }
    }),

    // STREAMING drift tripwire, oracle-gated (X145 promoted — the
    // third of the admission/maintenance trio): each batch is
    // PSI-scored against a fixed baseline before folding. Batches 0-1
    // are plain user shards (PSI ≈ shard noise, admitted); batch 2 is
    // the same shard with values TRIPLED — every row individually
    // valid, so the constraint gate of qX_stream_gated would wave it
    // through, but the distribution piles into the top PSI bin and
    // trips the 0.2 threshold → quarantined. The rollup must equal
    // the GROUP BY over the two admitted shards.
    "qX_stream_drift" -> ((s, dir) => {
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
      val ev = Tables.load(fold, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(97L)).as("g"),
          floor(col("value") * lit(1e6)).cast("long").as("v_micros"),
          lit(1L).as("n"))
        .localCheckpoint(true)
      // the drifted ingest: batch 2's shard with tripled values (an
      // upstream unit-change bug — the shape constraint checks can't see)
      val drifted = ev.filter(pmod(col("g"), lit(3L)) === 2)
        .withColumn("v_micros", col("v_micros") * lit(3L))
      val baseline = ev.filter(pmod(col("g"), lit(3L)) === 0)
      GateTmp.withStore("graft-drgate") { root =>
        val store = root + "/dr"
        val batches = Seq(
          ev.filter(pmod(col("g"), lit(3L)) === 0),
          ev.filter(pmod(col("g"), lit(3L)) === 1),
          drifted)
        val verdicts = batches.zipWithIndex.map { case (b, i) =>
          CardStream.driftMonitoredMerge(fold, b, store,
            Seq("event_type", "g"), Seq("v_micros", "n"), baseline,
            "v_micros", lo = 0.0, hi = 5e8, bins = 10,
            psiThresholdMicros = 200000L, batchId = i.toLong,
            storeBuckets = 8)._1
        }
        require(verdicts == Seq(true, true, false),
          "drift verdicts must be (pass, pass, quarantine)")
        require(fold.read.parquet(s"$store/quarantine/b=2").count() > 0,
          "drifted batch must land under quarantine/")
        CardStream.readRollup(s, store)
          .select(col("event_type"), col("g"), col("v_micros"), col("n"))
          .orderBy(col("event_type"), col("g"))
          .localCheckpoint(true)
      }
    }),

    // STREAMING trending leaderboard, oracle-gated (X171 promoted —
    // the read side of the rollup store): fold the same 3 user-shard
    // batches into a (event_type, g)-keyed count rollup, replay the
    // last batch against the fence, then rank each event_type's top-5
    // shards by count with the bounded-heap top-k. The oracle is the
    // global GROUP BY + rank — leaderboard freshness equals rollup
    // freshness, so a stale or double-counted store mis-ranks and
    // hash-mismatches.
    "qX_stream_trending" -> ((s, dir) => {
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
      val ev = Tables.load(fold, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(97L)).as("g"),
          lit(1L).as("n"))
        .localCheckpoint(true)
      GateTmp.withStore("graft-trgate") { root =>
        val store = root + "/tr"
        (0 to 2).foreach { i =>
          CardStream.mergeAdditive(fold,
            ev.filter(pmod(col("g"), lit(3L)) === i),
            store, Seq("event_type", "g"), Seq("n"),
            batchId = i.toLong, storeBuckets = 8)
        }
        val replayed = CardStream.mergeAdditive(fold,
          ev.filter(pmod(col("g"), lit(3L)) === 2),
          store, Seq("event_type", "g"), Seq("n"),
          batchId = 2L, storeBuckets = 8)
        require(replayed == 0L, "replay fence must no-op")
        CardStream.trendingTopK(s, store, Seq("event_type"), "g", "n", 5)
          .localCheckpoint(true)
      }
    }),

    // Winsorized mean of event value (5% each tail clamped to the
    // tail quantile) — the robust revenue mean on the exact
    // distributed-rank primitive.
    "qX_winsorize" -> ((s, dir) => {
      graft.operators.Stats.winsorizedMean(
        t(s, dir, "events"), "value", "event_id", 0.05)
    }),

    // Spearman ρ between per-user activity (event count) and spend
    // (value sum) — "do heavy users spend more", rank-monotone, both
    // rankings on the exact distributed-rank primitive.
    "qX_spearman" -> ((s, dir) => {
      val per = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("nx"),
          sum(floor(col("value") * lit(1e6)).cast("long")).as("vy"))
      graft.operators.Eval.spearman(per, "nx", "vy", "user_id")
    }),

    // IPS/SNIPS offline policy evaluation: what a uniform-random
    // recommender would have earned, from logs under the popularity
    // policy — clipped inverse-propensity weights, exact folds.
    "qX_ips" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .select((floor(col("value")).cast("long") % 50).as("item"),
          (col("event_type") === "purchase").cast("long").as("r"))
      val pop = ev.groupBy(col("item")).agg(count(lit(1)).as("ni"))
      val tot = pop.agg(sum(col("ni")).as("nt"))
      val logged = ev.join(broadcast(pop), "item")
        .crossJoin(broadcast(tot))
        .select(col("r"),
          floor(col("ni") * lit(1000000L) / col("nt")).cast("long")
            .as("p_micros"))
      graft.operators.Eval.ipsEval(logged, "r", "p_micros",
        k = 50, clipMicros = 1000L)
    }),

    // Bradley–Terry preference strengths over event types: a beats b
    // for a user when it occurs more often; 3 MM rounds, integer-
    // micro quantized per-pair terms.
    "qX_bradley_terry" -> ((s, dir) => {
      val cnt = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val wins = cnt
        .select(col("user_id"), col("event_type").as("a"),
          col("c").as("ca"))
        .join(cnt.select(col("user_id"), col("event_type").as("b"),
          col("c").as("cb")), "user_id")
        .filter(col("a") =!= col("b") && col("ca") > col("cb"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_wins"))
      graft.operators.Stats.bradleyTerry(wins, "a", "b", "n_wins",
        rounds = 3)
    }),

    // CUPED variance reduction: per-user pre-period activity as the
    // covariate for the post-period metric — θ and ρ² from exact
    // cross-multiplied integer folds.
    "qX_cuped" -> ((s, dir) => {
      val per = t(s, dir, "events").groupBy(col("user_id"))
        .agg(sum(when(col("ts") < lit(SplitTs).cast("timestamp"), 1L)
          .otherwise(0L)).cast("double").as("x"),
          sum(when(col("ts") >= lit(SplitTs).cast("timestamp"), 1L)
            .otherwise(0L)).cast("double").as("y"))
      graft.operators.Stats.cuped(per, "x", "y")
    }),

    // Per-key portable HLL: distinct users per event type in one
    // 16-register pass — every per-key ESTIMATE full-oracle.
    "qX_hll_grouped" -> ((s, dir) => {
      graft.operators.Sketches.portableHllDistinctBy(
        t(s, dir, "events"), "event_type", "user_id")
    }),

    // Purged temporal split: train strictly before cutover − 2-day
    // embargo, test at/after cutover, the straddling band dropped —
    // the leakage-safe time split for trailing-window features.
    "qX_purged_split" -> ((s, dir) => {
      graft.operators.Sampling.purgedTimeSplit(
          t(s, dir, "events"), "ts",
          cutoverUs = 1705363200000000L, // 2024-01-16 00:00:00 UTC
          embargoUs = 2L * 86400L * 1000000L)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("id_sum"))
        .orderBy(col("split"))
    }),

    // Per-user behavioral entropy over event types — the diversity
    // feature a bot screen reads next to the Markov sequence score.
    "qX_user_entropy" -> ((s, dir) => {
      Events.behaviorEntropy(t(s, dir, "events"), "user_id", "event_type")
    }),

    // Kaplan–Meier churn survival: last-active-day churn events,
    // final-day censoring, integer-micro log terms summed in the day
    // window, one exp per row.
    "qX_kaplan_meier" -> ((s, dir) => {
      Events.kaplanMeier(t(s, dir, "events"), "user_id", "ts")
    }),

    // KMV bottom-k distinct estimate — the md5-portable theta sketch;
    // the ESTIMATE is the oracle contract (the sketch itself replays).
    "qX_kmv" -> ((s, dir) => {
      graft.operators.Sketches.kmvEstimate(t(s, dir, "events"), "user_id", 64)
    }),

    // Theta-sketch set ops: early-window vs late-window active-user
    // overlap — intersection/union estimates + Jaccard, the question
    // HLL cannot answer.
    "qX_kmv_intersect" -> ((s, dir) => {
      val e = t(s, dir, "events")
      graft.operators.Sketches.kmvIntersectEstimate(
        e.filter(col("ts") < lit(SplitTs).cast("timestamp")), "user_id",
        e.filter(col("ts") >= lit(SplitTs).cast("timestamp")), "user_id", 64)
    })
  )

  val oracles: Map[String, String] = Map(
    "qX_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id AS u, min(ts) AS t,
        |    min(ts) + INTERVAL 7 DAY AS deadline
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS t, max(s1.deadline) AS deadline
        |  FROM events e JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'view' AND e.ts > s1.t AND e.ts <= s1.deadline
        |  GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id AS u, min(e.ts) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |    AND e.ts <= s2.deadline
        |  GROUP BY 1)
        |SELECT 1 AS step, 'signup' AS step_name, count(*) AS users FROM s1
        |UNION ALL
        |SELECT 2, 'view', count(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', count(*) FROM s3
        |ORDER BY step""".stripMargin,

    "qX_retention" ->
      """WITH first AS (
        |  SELECT user_id AS u, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY 1),
        |act AS (
        |  SELECT f.cohort,
        |    CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) / 7
        |      AS BIGINT) AS week_offset,
        |    count(DISTINCT e.user_id) AS active_users
        |  FROM events e JOIN first f ON e.user_id = f.u
        |  WHERE CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) / 7
        |      AS BIGINT) <= 8
        |  GROUP BY 1, 2),
        |sizes AS (SELECT cohort, count(*) AS cohort_size FROM first
        |  GROUP BY 1)
        |SELECT strftime(a.cohort, '%Y-%m-%d') AS cohort_week, a.week_offset,
        |  a.active_users, s.cohort_size,
        |  CAST(floor(1000000 * a.active_users / s.cohort_size) AS BIGINT)
        |    AS retention_micros
        |FROM act a JOIN sizes s USING (cohort)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "qX_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |    event_type AS dst
        |  FROM events),
        |c AS (SELECT src, dst, count(*) AS n FROM p
        |  WHERE src IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, n,
        |  CAST(floor(1000000 * n / sum(n) OVER (PARTITION BY src))
        |    AS BIGINT) AS p_micros
        |FROM c ORDER BY src, dst""".stripMargin,

    "qX_outliers" ->
      """WITH e AS (
        |  SELECT event_type AS g,
        |    CAST(floor("value" * 1000000.0) AS BIGINT) AS v
        |  FROM events),
        |med AS (
        |  SELECT g, count(*) AS n_rows,
        |    CAST(2 * quantile_cont(v, 0.5) AS BIGINT) AS med2
        |  FROM e GROUP BY 1),
        |dev AS (
        |  SELECT e.g, med.n_rows, med.med2, abs(2 * e.v - med.med2) AS adev2
        |  FROM e JOIN med USING (g)),
        |mad AS (
        |  SELECT g, CAST(2 * quantile_cont(adev2, 0.5) AS BIGINT) AS mad4
        |  FROM dev GROUP BY 1)
        |SELECT d.g AS event_type, d.n_rows, d.med2 AS med2_micros,
        |  m.mad4 AS mad4_micros,
        |  CAST(sum(CASE WHEN 2 * d.adev2 > 3 * m.mad4 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev d JOIN mad m USING (g)
        |GROUP BY 1, 2, 3, 4 ORDER BY event_type""".stripMargin,

    "qX_psi" ->
      """WITH grid AS (SELECT unnest(range(10)) AS bin),
        |a AS (
        |  SELECT least(greatest(CAST(floor(("value" - 0.0) / 500.0 * 10)
        |      AS BIGINT), 0), 9) AS bin, count(*) AS n
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1),
        |b AS (
        |  SELECT least(greatest(CAST(floor(("value" - 0.0) / 500.0 * 10)
        |      AS BIGINT), 0), 9) AS bin, count(*) AS n
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1),
        |g AS (
        |  SELECT grid.bin, coalesce(a.n, 0) AS n_base,
        |    coalesce(b.n, 0) AS n_curr
        |  FROM grid LEFT JOIN a USING (bin) LEFT JOIN b USING (bin)),
        |tot AS (SELECT CAST(sum(n_base) AS BIGINT) AS ta,
        |  CAST(sum(n_curr) AS BIGINT) AS tb FROM g),
        |terms AS (
        |  SELECT g.bin, g.n_base, g.n_curr,
        |    CAST(round(1000000.0 * ((g.n_base + 1) / (tot.ta + 10) -
        |        (g.n_curr + 1) / (tot.tb + 10)) *
        |      ln(((g.n_base + 1) / (tot.ta + 10)) /
        |         ((g.n_curr + 1) / (tot.tb + 10)))) AS BIGINT)
        |      AS term_micros
        |  FROM g CROSS JOIN tot)
        |SELECT bin, n_base, n_curr, term_micros FROM terms
        |UNION ALL
        |SELECT -1, CAST(sum(n_base) AS BIGINT), CAST(sum(n_curr) AS BIGINT),
        |  CAST(sum(term_micros) AS BIGINT) FROM terms
        |ORDER BY bin""".stripMargin,

    "qX_attribution" ->
      """WITH conv AS (
        |  SELECT user_id AS u, ts, event_id AS conv_id FROM events
        |  WHERE event_type = 'purchase'),
        |t0 AS (
        |  SELECT user_id AS u, ts, event_id AS touch_id,
        |    event_type AS touch_type,
        |    row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_type IN ('click', 'view')),
        |tch AS (SELECT u, ts, touch_id, touch_type FROM t0 WHERE rn = 1),
        |j AS (
        |  SELECT c.conv_id, t.touch_id, t.touch_type,
        |    row_number() OVER (PARTITION BY c.conv_id
        |      ORDER BY t.ts DESC, t.touch_id DESC) AS rn
        |  FROM conv c LEFT JOIN tch t ON t.u = c.u AND t.ts <= c.ts
        |    AND t.ts >= c.ts - INTERVAL 3 DAY)
        |SELECT conv_id, touch_id, touch_type FROM j WHERE rn = 1
        |ORDER BY conv_id""".stripMargin,

    "qX_linear_attrib" ->
      """WITH conv AS (SELECT user_id AS u, epoch_us(ts) AS cts,
        |    event_id AS conv_id FROM events WHERE event_type = 'purchase'),
        |touch AS (SELECT user_id AS u, epoch_us(ts) AS tts,
        |    event_id AS touch_id, event_type AS touch_type
        |  FROM events WHERE event_type IN ('click', 'view')),
        |j AS (SELECT c.conv_id, t.touch_id, t.touch_type, t.tts
        |  FROM conv c JOIN touch t ON t.u = c.u
        |    AND t.tts <= c.cts AND t.tts > c.cts - 259200000000),
        |r AS (SELECT j.*, count(*) OVER (PARTITION BY conv_id) AS n,
        |    row_number() OVER (PARTITION BY conv_id
        |      ORDER BY tts DESC, touch_id DESC) AS rn
        |  FROM j)
        |SELECT conv_id, touch_id, touch_type,
        |  CAST(floor(1000000 / n) + CASE WHEN rn = 1
        |    THEN 1000000 - n * CAST(floor(1000000 / n) AS BIGINT)
        |    ELSE 0 END AS BIGINT) AS credit_micros
        |FROM r ORDER BY conv_id, touch_id""".stripMargin,

    "qX_rec_coverage" ->
      (ItemSimCte + """,
        |recs AS (SELECT rec AS item FROM r WHERE rn <= 5),
        |pop AS (SELECT item, count(*) AS pop FROM ui GROUP BY 1),
        |un AS (SELECT count(DISTINCT u) AS n_users FROM ui),
        |cat AS (SELECT count(*) AS catalog FROM pop),
        |tm AS (SELECT recs.item,
        |    CAST(round(1e6 * ln(un.n_users * 1.0 / pop.pop) / ln(2))
        |      AS BIGINT) AS t
        |  FROM recs JOIN pop USING (item) CROSS JOIN un),
        |s AS (SELECT count(*) AS n_rec_rows,
        |    count(DISTINCT item) AS n_rec_items,
        |    CAST(sum(t) AS BIGINT) AS sum_t FROM tm)
        |SELECT s.n_rec_rows, s.n_rec_items, cat.catalog,
        |  CAST(floor(1000000 * s.n_rec_items * 1.0 / cat.catalog)
        |    AS BIGINT) AS coverage_micros,
        |  CAST(floor(CAST(sum_t AS DOUBLE) / s.n_rec_rows) AS BIGINT)
        |    AS novelty_microbits
        |FROM s CROSS JOIN cat""".stripMargin),

    "qX_did" ->
      s"""WITH c AS (SELECT
         |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
         |      AS BIGINT) % 2 = 0 AS t,
         |    ts >= TIMESTAMP '$SplitTs' AS p,
         |    CAST(floor("value" * 1e6) AS BIGINT) AS v
         |  FROM events),
         |g AS (SELECT t, p, count(*) AS n, CAST(sum(v) AS BIGINT) AS s
         |  FROM c GROUP BY 1, 2)
         |SELECT
         |  max(CASE WHEN t AND NOT p THEN n END) AS n_t_pre,
         |  max(CASE WHEN t AND p THEN n END) AS n_t_post,
         |  max(CASE WHEN NOT t AND NOT p THEN n END) AS n_c_pre,
         |  max(CASE WHEN NOT t AND p THEN n END) AS n_c_post,
         |  CAST(trunc(
         |    (max(CASE WHEN t AND p THEN s END) * 1.0
         |       / max(CASE WHEN t AND p THEN n END)
         |     - max(CASE WHEN t AND NOT p THEN s END) * 1.0
         |       / max(CASE WHEN t AND NOT p THEN n END))
         |    - (max(CASE WHEN NOT t AND p THEN s END) * 1.0
         |         / max(CASE WHEN NOT t AND p THEN n END)
         |       - max(CASE WHEN NOT t AND NOT p THEN s END) * 1.0
         |         / max(CASE WHEN NOT t AND NOT p THEN n END)))
         |    AS BIGINT) AS did_micros
         |FROM g
         |HAVING max(CASE WHEN t AND NOT p THEN n END) IS NOT NULL
         |  AND max(CASE WHEN t AND p THEN n END) IS NOT NULL
         |  AND max(CASE WHEN NOT t AND NOT p THEN n END) IS NOT NULL
         |  AND max(CASE WHEN NOT t AND p THEN n END) IS NOT NULL""".stripMargin,

    "qX_welch" ->
      """WITH a AS (SELECT CAST(floor("value" * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'click'),
        |b AS (SELECT CAST(floor("value" * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'view'),
        |sa AS (SELECT count(*) AS n_a, CAST(sum(v) AS BIGINT) AS s_a,
        |  CAST(sum(v * v) AS BIGINT) AS q_a FROM a),
        |sb AS (SELECT count(*) AS n_b, CAST(sum(v) AS BIGINT) AS s_b,
        |  CAST(sum(v * v) AS BIGINT) AS q_b FROM b),
        |m AS (SELECT n_a, n_b,
        |  CAST(s_a AS DOUBLE) / n_a AS ma, CAST(s_b AS DOUBLE) / n_b AS mb,
        |  ((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
        |      / n_a) / (n_a - 1)) / n_a +
        |  ((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
        |      / n_b) / (n_b - 1)) / n_b AS se2
        |  FROM sa CROSS JOIN sb)
        |SELECT n_a, n_b, CAST(floor(ma) AS BIGINT) AS mean_a_milli,
        |  CAST(floor(mb) AS BIGINT) AS mean_b_milli,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR se2 <= 0 THEN 0
        |    ELSE CAST(floor(1e6 * ((ma - mb) / sqrt(se2))) AS BIGINT) END
        |    AS t_micros
        |FROM m""".stripMargin,

    "qX_bootstrap" ->
      """WITH v AS (SELECT event_id AS bid,
        |  CAST(floor("value" * 1000000.0) AS BIGINT) AS v FROM events),
        |reps AS (SELECT unnest(range(32)) AS rep),
        |um AS (SELECT r.rep, v.v,
        |  (CAST(CAST(('0x' || substr(md5(CAST(r.rep AS VARCHAR) || ':' ||
        |    CAST(v.bid AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE) + 0.5)
        |    / 4294967296.0 AS u
        |  FROM v CROSS JOIN reps r),
        |mm AS (SELECT rep, v,
        |  CASE WHEN u < 0.36787944117144233 THEN 0
        |       WHEN u < 0.7357588823428847 THEN 1
        |       WHEN u < 0.919698602928606 THEN 2
        |       WHEN u < 0.9810118431238462 THEN 3
        |       WHEN u < 0.9963401531726563 THEN 4
        |       ELSE 5 END AS m
        |  FROM um),
        |pr AS (SELECT rep,
        |  CAST(floor(CAST(sum(m * v) AS DOUBLE) / sum(m)) AS BIGINT)
        |    AS mean_micros
        |  FROM mm GROUP BY 1),
        |rk AS (SELECT rep, mean_micros, row_number() OVER (
        |  ORDER BY mean_micros, rep) AS rn FROM pr),
        |fl AS (SELECT CAST(floor(CAST(sum(v) AS DOUBLE) / count(*))
        |  AS BIGINT) AS mean_micros FROM v)
        |SELECT CAST(32 AS BIGINT) AS b_reps, fl.mean_micros,
        |  lo.mean_micros AS lo_micros, hi.mean_micros AS hi_micros
        |FROM fl
        |CROSS JOIN (SELECT mean_micros FROM rk WHERE rn = 1) lo
        |CROSS JOIN (SELECT mean_micros FROM rk WHERE rn = 32) hi""".stripMargin,

    "qX_decay" ->
      """SELECT user_id, event_type,
        |  CAST(sum(CAST(round(1e6 * pow(2.0,
        |    -((epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(ts))
        |      / 86400000000.0 / 7.0))) AS BIGINT)) AS BIGINT) AS w_micros,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,

    "qX_item_sim" ->
      (ItemSimCte +
        """
          |SELECT item, rec, co, sim_micros FROM r WHERE rn <= 5
          |ORDER BY item, sim_micros DESC, rec""".stripMargin),

    "qX_rec_gini" ->
      (ItemSimCte +
        """,
          |recs AS (SELECT rec FROM r WHERE rn <= 5),
          |cnt AS (SELECT rec AS item, count(*) AS x FROM recs GROUP BY 1),
          |rkd AS (SELECT item, x, row_number() OVER (ORDER BY x, item)
          |  AS i FROM cnt),
          |agg AS (SELECT count(*) AS n_items,
          |  CAST(sum(x) AS BIGINT) AS total_recs,
          |  CAST(sum(i * x) AS BIGINT) AS six FROM rkd)
          |SELECT n_items, total_recs,
          |  CAST(floor(1000000 * (2 * six - (n_items + 1) * total_recs)
          |    / (n_items * total_recs)) AS BIGINT) AS gini_micros
          |FROM agg""".stripMargin),

    "qX_exact_quantile" ->
      """WITH t AS (
        |  SELECT CAST(floor("value" * 1000000.0) AS BIGINT) AS v, event_id
        |  FROM events),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, event_id) AS rn
        |  FROM t),
        |nn AS (SELECT count(*) AS n FROM t),
        |q AS (SELECT unnest([500000, 900000, 990000]) AS qm)
        |SELECT CAST(q.qm AS BIGINT) AS q_micros, r.v
        |FROM q CROSS JOIN nn JOIN r
        |  ON r.rn = greatest(1, CAST(ceil(q.qm / 1e6 * nn.n) AS BIGINT))
        |ORDER BY q_micros""".stripMargin,

    "qX_hll_portable" ->
      """WITH hh AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |    AS BIGINT) AS hv
        |  FROM events),
        |ww AS (SELECT hv % 16 AS j, CAST(floor(hv / 16) AS BIGINT) AS w
        |  FROM hh),
        |rr AS (SELECT j,
        |  CASE WHEN w = 0 THEN 29
        |       ELSE CAST(round(log2(w & (-w))) AS BIGINT) + 1 END AS rho
        |  FROM ww),
        |regs AS (SELECT j, max(rho) AS rho, count(*) AS n FROM rr
        |  GROUP BY 1),
        |f AS (SELECT sum(pow(2.0, -rho)) + (16 - count(*)) AS s,
        |  16 - count(*) AS v0, CAST(sum(n) AS BIGINT) AS n_rows FROM regs)
        |SELECT n_rows,
        |  CASE WHEN 0.673 * 256.0 / s <= 40.0 AND v0 > 0
        |    THEN CAST(round(16.0 * ln(16.0 / v0)) AS BIGINT)
        |    ELSE CAST(round(0.673 * 256.0 / s) AS BIGINT) END AS est
        |FROM f""".stripMargin,

    "qX_violations" ->
      """SELECT 'value_lt_480' AS rule, event_id FROM events
        |WHERE NOT coalesce("value" < 480, FALSE)
        |UNION ALL
        |SELECT 'user_known', event_id FROM events
        |WHERE NOT coalesce(user_id <= 140, FALSE)
        |ORDER BY rule, event_id""".stripMargin,

    "qX_cusum" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS bucket,
        |    CAST(floor(CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT))
        |      AS DOUBLE) / count(*)) AS BIGINT) AS mean_micros
        |  FROM events GROUP BY 1),
        |ref AS (SELECT CAST(floor(CAST(sum(mean_micros) AS DOUBLE)
        |  / count(*)) AS BIGINT) AS ref FROM daily),
        |p AS (SELECT d.bucket, d.mean_micros,
        |  sum(d.mean_micros - ref.ref - 1000000) OVER (
        |    ORDER BY d.bucket ROWS UNBOUNDED PRECEDING) AS p
        |  FROM daily d CROSS JOIN ref),
        |s AS (SELECT bucket, mean_micros,
        |  CAST(p - least(0, min(p) OVER (ORDER BY bucket
        |    ROWS UNBOUNDED PRECEDING)) AS BIGINT) AS s_micros
        |  FROM p)
        |SELECT strftime(bucket, '%Y-%m-%d') AS bucket, mean_micros,
        |  s_micros, s_micros > 50000000 AS alarm
        |FROM s ORDER BY bucket""".stripMargin,

    "qX_user_entropy" ->
      """WITH ct AS (SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |    count(*) AS n_types,
        |    CAST(sum(c * CAST(round(ln(c) * 1e6) AS BIGINT)) AS BIGINT)
        |      AS slc
        |  FROM ct GROUP BY 1)
        |SELECT user_id, n_events, n_types,
        |  CAST(round(ln(n_events) * 1e6) AS BIGINT)
        |    - CAST(floor(CAST(slc AS DOUBLE) / n_events) AS BIGINT)
        |    AS entropy_micros
        |FROM g ORDER BY user_id""".stripMargin,

    "qX_ewma" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS bucket,
        |    CAST(floor(CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT))
        |      AS DOUBLE) / count(*)) AS BIGINT) AS mean_micros
        |  FROM events GROUP BY 1),
        |idx AS (SELECT bucket, mean_micros,
        |    row_number() OVER (ORDER BY bucket) - 1 AS t FROM daily),
        |ref AS (SELECT CAST(floor(CAST(sum(mean_micros) AS DOUBLE)
        |  / count(*)) AS BIGINT) AS ref FROM idx),
        |pairs AS (SELECT tt.bucket, tt.mean_micros, tt.t,
        |    CASE WHEN ii.t = 0 THEN tt.t ELSE tt.t - ii.t + 1 END AS k,
        |    ii.mean_micros AS x
        |  FROM idx tt JOIN idx ii ON ii.t <= tt.t),
        |s AS (SELECT bucket, mean_micros,
        |    CAST(sum(x * CAST(power(2, 31 - k) AS BIGINT)) AS BIGINT)
        |      AS sraw
        |  FROM pairs WHERE k <= 31 GROUP BY 1, 2)
        |SELECT strftime(s.bucket, '%Y-%m-%d') AS bucket, s.mean_micros,
        |  s.sraw >> 31 AS ewma_micros,
        |  abs((s.sraw >> 31) - ref.ref) > 20000000 AS alarm
        |FROM s CROSS JOIN ref ORDER BY bucket""".stripMargin,

    "qX_trimmed" ->
      """WITH t AS (SELECT CAST(floor("value" * 1e6) AS BIGINT) AS v,
        |    event_id AS tie FROM events),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, tie) AS rn FROM t),
        |n AS (SELECT count(*) AS n FROM t),
        |kept AS (SELECT v FROM r, n
        |  WHERE rn > floor(0.05 * n.n) AND rn <= n.n - floor(0.05 * n.n))
        |SELECT (SELECT n FROM n) AS n,
        |  CAST(floor(0.05 * (SELECT n FROM n)) AS BIGINT)
        |    AS n_trimmed_each,
        |  count(*) AS n_kept,
        |  CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT)
        |    AS trimmed_mean_micros
        |FROM kept""".stripMargin,

    "qX_acf" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS bucket,
        |    count(*) AS x FROM events GROUP BY 1),
        |tot AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s
        |  FROM daily),
        |idx AS (SELECT row_number() OVER (ORDER BY bucket) AS rn,
        |    CAST(x * t.n - t.s AS BIGINT) AS a FROM daily, tot t),
        |den AS (SELECT CAST(sum(a * a) AS BIGINT) AS den FROM idx),
        |lags AS (SELECT unnest(range(1, 8)) AS lag),
        |num AS (SELECT l.lag, count(*) AS n_pairs,
        |    CAST(sum(i.a * j.a) AS BIGINT) AS num
        |  FROM lags l JOIN idx i ON TRUE JOIN idx j ON j.rn = i.rn + l.lag
        |  GROUP BY 1)
        |SELECT num.lag, num.n_pairs,
        |  CAST(trunc(1e6 * num.num / den.den) AS BIGINT) AS acf_micros
        |FROM num, den ORDER BY num.lag""".stripMargin,

    "qX_ks" ->
      """WITH a AS (
        |  SELECT CAST(floor("value" * 1000000.0) AS BIGINT) AS v,
        |    count(*) AS na
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1),
        |b AS (
        |  SELECT CAST(floor("value" * 1000000.0) AS BIGINT) AS v,
        |    count(*) AS nb
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1),
        |g AS (
        |  SELECT coalesce(a.v, b.v) AS v, coalesce(a.na, 0) AS na,
        |    coalesce(b.nb, 0) AS nb
        |  FROM a FULL OUTER JOIN b ON a.v = b.v),
        |cum AS (
        |  SELECT v, sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
        |      AS ca,
        |    sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
        |  FROM g),
        |tot AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
        |  CAST(sum(nb) AS BIGINT) AS tb FROM g)
        |SELECT tot.ta AS n_base, tot.tb AS n_curr,
        |  max(abs(CAST(floor(1000000 * cum.ca / tot.ta) AS BIGINT) -
        |          CAST(floor(1000000 * cum.cb / tot.tb) AS BIGINT)))
        |    AS ks_micros
        |FROM cum CROSS JOIN tot GROUP BY 1, 2""".stripMargin,

    "qX_mutual_best" ->
      (ItemSimCte +
        """,
          |best AS (SELECT item AS a, rec AS b, sim_micros AS score_a
          |  FROM r WHERE rn = 1)
          |SELECT x.a, x.b, x.score_a, y.score_a AS score_b
          |FROM best x JOIN best y ON y.a = x.b AND y.b = x.a
          |WHERE x.a < x.b ORDER BY x.a, x.b""".stripMargin),

    "qX_wilson" ->
      """WITH g AS (SELECT CAST(floor("value") AS BIGINT) % 50 AS grp,
        |    count(*) AS n,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS wins
        |  FROM events GROUP BY 1)
        |SELECT grp, CAST(n AS BIGINT) AS n, wins,
        |  CAST(floor(1e6 * (wins / CAST(n AS DOUBLE))) AS BIGINT)
        |    AS p_micros,
        |  CAST(floor(1e6 * (
        |    ((wins / CAST(n AS DOUBLE)) + (1.96 * 1.96) /
        |      (2.0 * CAST(n AS DOUBLE)))
        |      / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
        |    - 1.96 * sqrt(
        |        (wins / CAST(n AS DOUBLE)) * (1.0 - wins / CAST(n AS DOUBLE))
        |          / CAST(n AS DOUBLE)
        |        + (1.96 * 1.96) /
        |          (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |      / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))))
        |    AS BIGINT) AS lo_micros,
        |  CAST(floor(1e6 * (
        |    ((wins / CAST(n AS DOUBLE)) + (1.96 * 1.96) /
        |      (2.0 * CAST(n AS DOUBLE)))
        |      / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))
        |    + 1.96 * sqrt(
        |        (wins / CAST(n AS DOUBLE)) * (1.0 - wins / CAST(n AS DOUBLE))
        |          / CAST(n AS DOUBLE)
        |        + (1.96 * 1.96) /
        |          (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
        |      / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE))))
        |    AS BIGINT) AS hi_micros
        |FROM g ORDER BY grp""".stripMargin,

    "qX_seq_score" ->
      """WITH p AS (
        |  SELECT user_id AS u, lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |    event_type AS dst
        |  FROM events),
        |pp AS (SELECT u, src, dst FROM p WHERE src IS NOT NULL),
        |cab AS (SELECT src, dst, count(*) AS c_ab FROM pp GROUP BY 1, 2),
        |ca AS (SELECT src, count(*) AS c_a FROM pp GROUP BY 1),
        |vv AS (SELECT count(DISTINCT event_type) AS v FROM events),
        |model AS (SELECT cab.src, cab.dst,
        |    CAST(round(1e6 * ln(CAST(cab.c_ab + 1 AS DOUBLE)
        |      / (ca.c_a + vv.v))) AS BIGINT) AS lp_micros
        |  FROM cab JOIN ca USING (src) CROSS JOIN vv),
        |sc AS (SELECT pp.u, count(*) AS n_trans,
        |    CAST(sum(m.lp_micros) AS BIGINT) AS logprob_micros
        |  FROM pp JOIN model m ON m.src = pp.src AND m.dst = pp.dst
        |  GROUP BY 1)
        |SELECT u AS user_id, CAST(n_trans AS BIGINT) AS n_trans,
        |  logprob_micros,
        |  CAST(floor(logprob_micros / CAST(n_trans AS DOUBLE)) AS BIGINT)
        |    AS avg_micros
        |FROM sc ORDER BY user_id""".stripMargin,

    "qX_quantile_bins" ->
      """WITH t AS (SELECT event_id,
        |    CAST(floor("value" * 1e6) AS BIGINT) AS v FROM events),
        |r AS (SELECT event_id, v,
        |    row_number() OVER (ORDER BY v, event_id) AS rn FROM t),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT event_id, v,
        |  CAST(floor(10 * (rn - 1) / n.n) AS BIGINT) AS bin
        |FROM r CROSS JOIN n ORDER BY event_id""".stripMargin,

    "qX_stickiness" ->
      """WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS day,
        |    date_trunc('month', ts) AS month, user_id FROM events),
        |dau AS (SELECT month, day, count(*) AS dau FROM du GROUP BY 1, 2),
        |md AS (SELECT month, count(*) AS n_days,
        |  CAST(sum(dau) AS BIGINT) AS sum_dau FROM dau GROUP BY 1),
        |mau AS (SELECT month, count(*) AS mau FROM (
        |  SELECT DISTINCT month, user_id FROM du) GROUP BY 1)
        |SELECT strftime(md.month, '%Y-%m') AS month, md.n_days,
        |  md.sum_dau, mau.mau,
        |  CAST(floor(1e6 * md.sum_dau / (md.n_days * mau.mau)) AS BIGINT)
        |    AS stickiness_micros
        |FROM md JOIN mau USING (month) ORDER BY month""".stripMargin,

    "qX_kaplan_meier" ->
      """WITH ld AS (SELECT user_id, max(date_trunc('day', ts)) AS last_day
        |  FROM events GROUP BY 1),
        |mx AS (SELECT max(last_day) AS max_day FROM ld),
        |bd AS (SELECT last_day AS day, count(*) AS n_last,
        |    CAST(sum(CASE WHEN last_day < mx.max_day THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_churn
        |  FROM ld CROSS JOIN mx GROUP BY 1),
        |tu AS (SELECT CAST(sum(n_last) AS BIGINT) AS n_users FROM bd),
        |r AS (SELECT day, n_churn,
        |    tu.n_users - coalesce(sum(n_last) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM bd CROSS JOIN tu),
        |t2 AS (SELECT day, n_risk, n_churn,
        |    CASE WHEN n_risk > n_churn THEN
        |      CAST(round(ln((n_risk - n_churn) * 1.0 / n_risk) * 1e6)
        |        AS BIGINT)
        |    ELSE CAST(-1000000000000 AS BIGINT) END AS term
        |  FROM r),
        |c AS (SELECT day, n_risk, n_churn,
        |    CAST(sum(term) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS km_log_micros
        |  FROM t2)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(n_risk AS BIGINT) AS n_risk, n_churn, km_log_micros,
        |  CAST(floor(1e6 * exp(km_log_micros / 1e6)) AS BIGINT)
        |    AS survival_micros
        |FROM c ORDER BY day""".stripMargin,

    "qX_rfm" ->
      """WITH per AS (SELECT user_id, epoch_us(max(ts)) AS last_ts_us,
        |    count(*) AS freq,
        |    CAST(sum(CAST(floor("value" * 1e6) AS BIGINT)) AS BIGINT)
        |      AS monetary_micros
        |  FROM events GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM per),
        |r AS (SELECT user_id, CAST(floor(5 * (row_number() OVER (
        |    ORDER BY last_ts_us, user_id) - 1) / n.n) + 1 AS BIGINT)
        |    AS r_score FROM per CROSS JOIN n),
        |f AS (SELECT user_id, CAST(floor(5 * (row_number() OVER (
        |    ORDER BY freq, user_id) - 1) / n.n) + 1 AS BIGINT)
        |    AS f_score FROM per CROSS JOIN n),
        |m AS (SELECT user_id, CAST(floor(5 * (row_number() OVER (
        |    ORDER BY monetary_micros, user_id) - 1) / n.n) + 1 AS BIGINT)
        |    AS m_score FROM per CROSS JOIN n)
        |SELECT per.user_id, CAST(per.last_ts_us AS BIGINT) AS last_ts_us,
        |  per.freq, per.monetary_micros, r.r_score, f.f_score, m.m_score,
        |  r.r_score * 100 + f.f_score * 10 + m.m_score AS rfm
        |FROM per JOIN r USING (user_id) JOIN f USING (user_id)
        |  JOIN m USING (user_id)
        |ORDER BY per.user_id""".stripMargin,

    "qX_streaks" ->
      """WITH days AS (SELECT DISTINCT user_id AS u,
        |    CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
        |r AS (SELECT u, d,
        |    CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT)
        |      - row_number() OVER (PARTITION BY u ORDER BY d) AS grp
        |  FROM days),
        |isl AS (SELECT u, grp, count(*) AS len FROM r GROUP BY 1, 2),
        |best AS (SELECT u, CAST(max(len) AS BIGINT) AS best_len
        |  FROM isl GROUP BY 1),
        |act AS (SELECT u, count(*) AS n_days FROM days GROUP BY 1)
        |SELECT best.u AS user_id, act.n_days, best.best_len
        |FROM best JOIN act USING (u)
        |ORDER BY best.best_len DESC, best.u LIMIT 20""".stripMargin,

    "qX_spc" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS bucket,
        |    CAST(floor(CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT))
        |      AS DOUBLE) / count(*)) AS BIGINT) AS mean_micros
        |  FROM events GROUP BY 1),
        |mom AS (SELECT count(*) AS n,
        |    CAST(sum(mean_micros) AS BIGINT) AS s,
        |    CAST(sum(mean_micros * mean_micros) AS BIGINT) AS q
        |  FROM daily),
        |cs AS (SELECT CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT) AS c,
        |    CAST(floor(sqrt((CAST(q AS DOUBLE)
        |      - CAST(s AS DOUBLE) * s / n) / (n - 1))) AS BIGINT) AS sg
        |  FROM mom),
        |b AS (SELECT daily.bucket, daily.mean_micros,
        |    daily.mean_micros - cs.c AS dev,
        |    CASE WHEN cs.sg = 0 THEN 0
        |      ELSE CAST(sign(daily.mean_micros - cs.c) AS BIGINT)
        |        * least(CAST(floor(abs(daily.mean_micros - cs.c)
        |            / cs.sg) AS BIGINT), 3)
        |    END AS zone
        |  FROM daily CROSS JOIN cs),
        |f AS (SELECT bucket, mean_micros, zone, dev,
        |    sum(CASE WHEN zone >= 2 THEN 1 ELSE 0 END) OVER w3 AS hi2,
        |    sum(CASE WHEN zone <= -2 THEN 1 ELSE 0 END) OVER w3 AS lo2,
        |    sum(CASE WHEN zone >= 1 THEN 1 ELSE 0 END) OVER w5 AS hi1,
        |    sum(CASE WHEN zone <= -1 THEN 1 ELSE 0 END) OVER w5 AS lo1,
        |    sum(CASE WHEN dev > 0 THEN 1 ELSE 0 END) OVER w8 AS hi0,
        |    sum(CASE WHEN dev < 0 THEN 1 ELSE 0 END) OVER w8 AS lo0
        |  FROM b
        |  WINDOW
        |    w3 AS (ORDER BY bucket
        |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |    w5 AS (ORDER BY bucket
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |    w8 AS (ORDER BY bucket
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
        |SELECT strftime(bucket, '%Y-%m-%d') AS bucket, mean_micros,
        |  zone, abs(zone) >= 3 AS r1,
        |  hi2 >= 2 OR lo2 >= 2 AS r2,
        |  hi1 >= 4 OR lo1 >= 4 AS r3,
        |  hi0 = 8 OR lo0 = 8 AS r4
        |FROM f ORDER BY bucket""".stripMargin,

    "qX_wow" ->
      """WITH weekly AS (SELECT date_trunc('week', ts) AS wk,
        |    count(*) AS n FROM events GROUP BY 1),
        |d AS (SELECT wk, n, lag(n) OVER (ORDER BY wk) AS prev_n
        |  FROM weekly)
        |SELECT strftime(wk, '%Y-%m-%d') AS week, n, prev_n,
        |  CASE WHEN prev_n IS NULL OR prev_n = 0 THEN NULL
        |    ELSE CAST(floor(1000000 * (n - prev_n) / prev_n) AS BIGINT)
        |  END AS growth_micros
        |FROM d ORDER BY week""".stripMargin,

    "qX_relative_risk" ->
      """WITH q AS (SELECT
        |    CASE WHEN CAST(dayofweek(ts) + 1 AS BIGINT) IN (1, 7)
        |      THEN 1 ELSE 0 END AS e,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |s AS (SELECT CAST(sum(e * y) AS BIGINT) AS a,
        |    CAST(sum(e * (1 - y)) AS BIGINT) AS b,
        |    CAST(sum((1 - e) * y) AS BIGINT) AS c,
        |    CAST(sum((1 - e) * (1 - y)) AS BIGINT) AS d FROM q)
        |SELECT a, b, c, d,
        |  CASE WHEN a + b = 0 OR c + d = 0 OR c = 0 THEN 0
        |    ELSE CAST(floor(1e6 * (CAST(a AS DOUBLE) / (a + b))
        |      / (CAST(c AS DOUBLE) / (c + d))) AS BIGINT)
        |  END AS rr_micros,
        |  CASE WHEN b = 0 OR c = 0 THEN 0
        |    ELSE CAST(floor(1e6 * CAST(a * d AS DOUBLE) / (b * c))
        |      AS BIGINT)
        |  END AS or_micros
        |FROM s""".stripMargin,

    "qX_first_touch" ->
      """WITH r AS (SELECT event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |f AS (SELECT event_type, count(*) AS n_users FROM r
        |  WHERE rn = 1 GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS n FROM f)
        |SELECT f.event_type, f.n_users,
        |  CAST(floor(1000000 * f.n_users / tot.n) AS BIGINT)
        |    AS share_micros
        |FROM f CROSS JOIN tot ORDER BY f.event_type""".stripMargin,

    "qX_heatmap" ->
      """WITH cells AS (SELECT CAST(dayofweek(ts) + 1 AS BIGINT)
        |    AS weekday, CAST(hour(ts) AS BIGINT) AS hour,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM cells)
        |SELECT weekday, hour, n,
        |  CAST(floor(1000000 * n / tot.tot) AS BIGINT) AS share_micros
        |FROM cells CROSS JOIN tot ORDER BY weekday, hour""".stripMargin,

    "qX_lead_lag" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS bucket,
        |    event_type AS et, CAST(count(*) AS BIGINT) AS n
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1, 2),
        |days AS (SELECT DISTINCT bucket FROM daily),
        |idx AS (SELECT bucket, CAST(row_number() OVER (ORDER BY bucket)
        |    AS BIGINT) AS i FROM days),
        |a AS (SELECT idx.i, coalesce(d.n, 0) AS na FROM idx
        |  LEFT JOIN daily d ON d.bucket = idx.bucket AND d.et = 'click'),
        |b AS (SELECT idx.i AS j, coalesce(d.n, 0) AS nb FROM idx
        |  LEFT JOIN daily d ON d.bucket = idx.bucket
        |    AND d.et = 'purchase'),
        |lags AS (SELECT unnest(range(8)) AS lag),
        |p AS (SELECT lags.lag, a.na, b.nb FROM a CROSS JOIN lags
        |  JOIN b ON a.i + lags.lag = b.j),
        |s AS (SELECT lag, count(*) AS n_days,
        |    CAST(sum(na) AS BIGINT) AS sx,
        |    CAST(sum(nb) AS BIGINT) AS sy,
        |    CAST(sum(na * nb) AS BIGINT) AS sxy,
        |    CAST(sum(na * na) AS BIGINT) AS sxx,
        |    CAST(sum(nb * nb) AS BIGINT) AS syy
        |  FROM p GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n_days,
        |  CASE WHEN n_days * sxx - sx * sx = 0
        |      OR n_days * syy - sy * sy = 0 THEN 0
        |    ELSE CAST(floor(1e6
        |      * CAST(n_days * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
        |        * CAST(n_days * syy - sy * sy AS DOUBLE))) AS BIGINT)
        |  END AS r_micros
        |FROM s ORDER BY lag""".stripMargin,

    "qX_audience_churn" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS ts_us
        |  FROM events),
        |early AS (SELECT DISTINCT u FROM e
        |  WHERE ts_us < 1705363200000000),
        |late AS (SELECT DISTINCT u FROM e
        |  WHERE ts_us >= 1705363200000000),
        |b AS (SELECT count(*) AS n_both FROM early
        |  WHERE u IN (SELECT u FROM late)),
        |ne AS (SELECT count(*) AS n_early FROM early),
        |nl AS (SELECT count(*) AS n_late FROM late)
        |SELECT ne.n_early, nl.n_late, b.n_both,
        |  CASE WHEN ne.n_early + nl.n_late - b.n_both = 0 THEN 0
        |    ELSE CAST(floor(1000000 * b.n_both
        |      / (ne.n_early + nl.n_late - b.n_both)) AS BIGINT)
        |  END AS jaccard_micros,
        |  CASE WHEN ne.n_early = 0 THEN 0
        |    ELSE CAST(floor(1000000 * (ne.n_early - b.n_both)
        |      / ne.n_early) AS BIGINT)
        |  END AS churn_micros,
        |  CASE WHEN nl.n_late = 0 THEN 0
        |    ELSE CAST(floor(1000000 * (nl.n_late - b.n_both)
        |      / nl.n_late) AS BIGINT)
        |  END AS new_micros
        |FROM ne CROSS JOIN nl CROSS JOIN b""".stripMargin,

    "qX_movers" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts)
        |    AS bucket, count(*) AS n FROM events GROUP BY 1, 2),
        |d AS (SELECT event_type, bucket, n,
        |    coalesce(lag(n) OVER (PARTITION BY event_type
        |      ORDER BY bucket), 0) AS prev_n
        |  FROM daily)
        |SELECT event_type, strftime(bucket, '%Y-%m-%d') AS day, n,
        |  prev_n, n - prev_n AS delta
        |FROM d ORDER BY abs(n - prev_n) DESC, event_type, day
        |LIMIT 10""".stripMargin,

    "qX_dispersion" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS bucket,
        |    count(*) AS n FROM events GROUP BY 1),
        |s AS (SELECT count(*) AS d, CAST(sum(n) AS BIGINT) AS sn,
        |    CAST(sum(n * n) AS BIGINT) AS qn FROM daily)
        |SELECT d AS n_days,
        |  CAST(floor(1000.0 * (CAST(sn AS DOUBLE) / d)) AS BIGINT)
        |    AS mean_milli,
        |  CAST(floor(1000.0 * ((CAST(qn AS DOUBLE)
        |    - CAST(sn AS DOUBLE) * sn / d) / (d - 1))) AS BIGINT)
        |    AS var_milli,
        |  CASE WHEN d < 2 OR sn = 0 THEN 0
        |    ELSE CAST(floor(1e6 * ((CAST(qn AS DOUBLE)
        |      - CAST(sn AS DOUBLE) * sn / d) / (d - 1))
        |      / (CAST(sn AS DOUBLE) / d)) AS BIGINT)
        |  END AS dispersion_micros
        |FROM s""".stripMargin,

    "qX_emd" ->
      """WITH grid AS (SELECT unnest(range(10)) AS bin),
        |a AS (
        |  SELECT least(greatest(CAST(floor(("value" - 0.0) / 500.0 * 10)
        |      AS BIGINT), 0), 9) AS bin, count(*) AS n
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1),
        |b AS (
        |  SELECT least(greatest(CAST(floor(("value" - 0.0) / 500.0 * 10)
        |      AS BIGINT), 0), 9) AS bin, count(*) AS n
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
        |  GROUP BY 1),
        |g AS (
        |  SELECT grid.bin, coalesce(a.n, 0) AS na, coalesce(b.n, 0) AS nb
        |  FROM grid LEFT JOIN a USING (bin) LEFT JOIN b USING (bin)),
        |c AS (SELECT bin,
        |    CAST(sum(na) OVER w AS BIGINT) AS ca,
        |    CAST(sum(nb) OVER w AS BIGINT) AS cb
        |  FROM g WINDOW w AS (ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT CAST(max(ca) AS BIGINT) AS tot_a,
        |    CAST(max(cb) AS BIGINT) AS tot_b FROM c),
        |x AS (SELECT tot.tot_a, tot.tot_b,
        |    abs(c.ca * tot.tot_b - c.cb * tot.tot_a) AS x
        |  FROM c CROSS JOIN tot)
        |SELECT tot_a AS n_a, tot_b AS n_b,
        |  CASE WHEN tot_a = 0 OR tot_b = 0 THEN 0
        |    ELSE CAST(floor(1e6 * CAST(sum(x) AS DOUBLE)
        |      / (CAST(tot_a AS DOUBLE) * tot_b)) AS BIGINT)
        |  END AS emd_micros
        |FROM x GROUP BY 1, 2""".stripMargin,

    "qX_session_cooccur" ->
      """WITH e AS (SELECT user_id, event_type AS et,
        |    epoch_us(ts) AS ts_us, event_id FROM events),
        |f AS (SELECT user_id, et, ts_us, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |s2 AS (SELECT user_id, et,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS sid
        |  FROM f),
        |inc AS (SELECT DISTINCT user_id, sid, et FROM s2),
        |tot AS (SELECT count(*) AS n_sess FROM
        |  (SELECT DISTINCT user_id, sid FROM s2)),
        |deg AS (SELECT et, CAST(count(*) AS BIGINT) AS d FROM inc
        |  GROUP BY 1),
        |p AS (SELECT a.et AS a, b.et AS b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM inc a JOIN inc b ON a.user_id = b.user_id
        |    AND a.sid = b.sid AND a.et < b.et
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, p.n_ab, da.d AS n_a, db.d AS n_b,
        |  CAST(floor(1e6 * (CAST(p.n_ab AS DOUBLE) * tot.n_sess)
        |    / (da.d * db.d)) AS BIGINT) AS lift_micros
        |FROM p JOIN deg da ON da.et = p.a JOIN deg db ON db.et = p.b
        |CROSS JOIN tot ORDER BY p.a, p.b""".stripMargin,

    "qX_power_mde" ->
      """WITH aa AS (SELECT CAST(floor("value" * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'click'),
        |bb AS (SELECT CAST(floor("value" * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'view'),
        |sa AS (SELECT count(*) AS n_a, CAST(sum(v) AS BIGINT) AS s_a,
        |    CAST(sum(v * v) AS BIGINT) AS q_a FROM aa),
        |sb AS (SELECT count(*) AS n_b, CAST(sum(v) AS BIGINT) AS s_b,
        |    CAST(sum(v * v) AS BIGINT) AS q_b FROM bb),
        |j AS (SELECT n_a, n_b,
        |    CAST(floor(CAST(s_a AS DOUBLE) / n_a) AS BIGINT)
        |      - CAST(floor(CAST(s_b AS DOUBLE) / n_b) AS BIGINT)
        |      AS delta_milli,
        |    CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b
        |      AS delta,
        |    ((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
        |      + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b))
        |      / (n_a + n_b - 2) AS sp2
        |  FROM sa CROSS JOIN sb)
        |SELECT n_a, n_b, delta_milli,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR sp2 <= 0 OR delta_milli = 0
        |    THEN 0
        |    ELSE CAST(ceil(2.0 * 2.801585 * 2.801585 * sp2
        |      / (delta * delta)) AS BIGINT)
        |  END AS n_required,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR sp2 <= 0 THEN 0
        |    ELSE CAST(floor(2.801585 * sqrt(2.0 * sp2
        |      / least(n_a, n_b))) AS BIGINT)
        |  END AS mde_milli
        |FROM j""".stripMargin,

    "qX_changepoint" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS bucket,
        |    CAST(floor(CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT))
        |      AS DOUBLE) / count(*)) AS BIGINT) AS mean_micros
        |  FROM events GROUP BY 1),
        |tot AS (SELECT count(*) AS nn, CAST(sum(mean_micros) AS BIGINT)
        |    AS st FROM daily),
        |c AS (SELECT bucket,
        |    CAST(count(*) OVER w AS BIGINT) AS t,
        |    CAST(sum(mean_micros) OVER w AS BIGINT) AS sl
        |  FROM daily
        |  WINDOW w AS (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT strftime(c.bucket, '%Y-%m-%d') AS split_day,
        |  c.t AS n_left, tot.nn - c.t AS n_right,
        |  abs(CAST(floor(CAST(c.sl AS DOUBLE) / c.t) AS BIGINT)
        |    - CAST(floor(CAST(tot.st - c.sl AS DOUBLE)
        |      / (tot.nn - c.t)) AS BIGINT)) AS delta_micros
        |FROM c CROSS JOIN tot WHERE c.t < tot.nn
        |ORDER BY delta_micros DESC, split_day LIMIT 1""".stripMargin,

    "qX_gap_quantiles" ->
      """WITH e AS (SELECT user_id, event_type,
        |    epoch_us(ts) AS ts_us, event_id FROM events),
        |g AS (SELECT event_type,
        |    ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts_us, event_id) AS gap
        |  FROM e),
        |gg AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
        |cnt AS (SELECT event_type, count(*) AS n FROM gg GROUP BY 1),
        |r AS (SELECT event_type, gap,
        |    row_number() OVER (PARTITION BY event_type ORDER BY gap)
        |      AS rn
        |  FROM gg),
        |j AS (SELECT r.event_type, r.gap, r.rn, cnt.n
        |  FROM r JOIN cnt USING (event_type))
        |SELECT event_type, n AS n_gaps,
        |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap END)
        |    AS BIGINT) AS p50_us,
        |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN gap END)
        |    AS BIGINT) AS p90_us,
        |  CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN gap END)
        |    AS BIGINT) AS p99_us
        |FROM j GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "qX_rate_test" ->
      """WITH ka AS (SELECT count(*) AS k_a FROM events
        |  WHERE event_type = 'click'),
        |kb AS (SELECT count(*) AS k_b FROM events
        |  WHERE event_type = 'error')
        |SELECT k_a, k_b,
        |  CASE WHEN k_a + k_b = 0 THEN 0
        |    ELSE CAST(floor(1e6 * (k_a - k_b)
        |      / sqrt(CAST(k_a + k_b AS DOUBLE))) AS BIGINT)
        |  END AS z_micros
        |FROM ka CROSS JOIN kb""".stripMargin,

    "qX_benford" ->
      """WITH m AS (SELECT CAST(floor("value" * 1000) AS BIGINT) AS m
        |  FROM events),
        |d AS (SELECT CAST(substr(CAST(m AS VARCHAR), 1, 1) AS BIGINT)
        |    AS digit
        |  FROM m WHERE m > 0),
        |obs AS (SELECT digit, count(*) AS n_obs FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM obs),
        |p AS (SELECT * FROM (VALUES (1, 301030), (2, 176091),
        |  (3, 124939), (4, 96910), (5, 79181), (6, 66947), (7, 57992),
        |  (8, 51153), (9, 45757)) AS t(digit, pm))
        |SELECT obs.digit, obs.n_obs,
        |  CAST(floor(tot.n * p.pm / 1e6) AS BIGINT) AS exp_obs,
        |  CAST(floor(1e6
        |    * (obs.n_obs - CAST(tot.n AS DOUBLE) * p.pm / 1e6)
        |    * (obs.n_obs - CAST(tot.n AS DOUBLE) * p.pm / 1e6)
        |    / (CAST(tot.n AS DOUBLE) * p.pm / 1e6)) AS BIGINT)
        |    AS term_micros
        |FROM obs JOIN p ON p.digit = obs.digit CROSS JOIN tot
        |ORDER BY obs.digit""".stripMargin,

    "qX_runs_test" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS bucket,
        |    CAST(floor(CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT))
        |      AS DOUBLE) / count(*)) AS BIGINT) AS mean_micros
        |  FROM events GROUP BY 1),
        |med AS (SELECT CAST(2 * quantile_cont(mean_micros, 0.5)
        |    AS BIGINT) AS med2 FROM daily),
        |sg AS (SELECT bucket,
        |    CASE WHEN 2 * mean_micros > med.med2 THEN 1 ELSE 0 END AS s
        |  FROM daily CROSS JOIN med),
        |f AS (SELECT s,
        |    CASE WHEN lag(s) OVER (ORDER BY bucket) IS NULL THEN 1
        |         WHEN s <> lag(s) OVER (ORDER BY bucket) THEN 1
        |         ELSE 0 END AS flip
        |  FROM sg),
        |a AS (SELECT count(*) AS n, CAST(sum(s) AS BIGINT) AS n1,
        |    CAST(sum(flip) AS BIGINT) AS r FROM f)
        |SELECT n AS n_days, n1 AS n_above, r AS n_runs,
        |  CASE WHEN n1 = 0 OR n1 = n OR n < 3 THEN 0
        |    ELSE CAST(floor(1e6 * (r - (2.0 * n1 * (n - n1) / n + 1.0))
        |      / sqrt((2.0 * n1 * (n - n1) / n + 1.0 - 1.0)
        |        * (2.0 * n1 * (n - n1) / n + 1.0 - 2.0) / (n - 1)))
        |      AS BIGINT)
        |  END AS z_micros
        |FROM a""".stripMargin,

    "qX_info_gain" ->
      """WITH d AS (SELECT "value" AS v, event_id AS tie,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |r AS (SELECT y, row_number() OVER (ORDER BY v, tie) AS rn
        |  FROM d),
        |nn AS (SELECT count(*) AS n FROM d),
        |binned AS (SELECT y,
        |    CAST(floor(10 * (rn - 1) / nn.n) AS BIGINT) AS bin
        |  FROM r CROSS JOIN nn),
        |b AS (SELECT bin, count(*) AS nb, CAST(sum(y) AS BIGINT) AS pb
        |  FROM binned GROUP BY 1),
        |tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n,
        |    CAST(sum(pb) AS BIGINT) AS pos, count(*) AS bins_used
        |  FROM b),
        |w AS (SELECT tot.n, tot.bins_used,
        |    (CASE WHEN tot.pos = 0 OR tot.pos = tot.n THEN 0
        |      ELSE CAST(round(-1e6 * (CAST(tot.pos AS DOUBLE) / tot.n)
        |        * ln(CAST(tot.pos AS DOUBLE) / tot.n)) AS BIGINT) END
        |    + CASE WHEN tot.n - tot.pos = 0 OR tot.n - tot.pos = tot.n
        |        THEN 0
        |      ELSE CAST(round(-1e6
        |        * (CAST(tot.n - tot.pos AS DOUBLE) / tot.n)
        |        * ln(CAST(tot.n - tot.pos AS DOUBLE) / tot.n))
        |        AS BIGINT) END) AS hy,
        |    CAST(floor(b.nb *
        |      (CASE WHEN b.pb = 0 OR b.pb = b.nb THEN 0
        |        ELSE CAST(round(-1e6 * (CAST(b.pb AS DOUBLE) / b.nb)
        |          * ln(CAST(b.pb AS DOUBLE) / b.nb)) AS BIGINT) END
        |      + CASE WHEN b.nb - b.pb = 0 OR b.nb - b.pb = b.nb THEN 0
        |        ELSE CAST(round(-1e6
        |          * (CAST(b.nb - b.pb AS DOUBLE) / b.nb)
        |          * ln(CAST(b.nb - b.pb AS DOUBLE) / b.nb)) AS BIGINT)
        |        END) / tot.n) AS BIGINT) AS wb
        |  FROM b CROSS JOIN tot)
        |SELECT n, bins_used, hy AS h_y_micros,
        |  CAST(sum(wb) AS BIGINT) AS h_cond_micros,
        |  hy - CAST(sum(wb) AS BIGINT) AS ig_micros
        |FROM w GROUP BY 1, 2, 3""".stripMargin,

    "qX_session_stats" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events),
        |f AS (SELECT user_id, ts_us, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |s AS (SELECT user_id, ts_us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_idx
        |  FROM f),
        |sess AS (SELECT user_id, session_idx, count(*) AS n_events,
        |    CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us
        |  FROM s GROUP BY 1, 2),
        |a AS (SELECT count(*) AS n_sessions,
        |    CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_bounce,
        |    CAST(sum(n_events) AS BIGINT) AS ne,
        |    CAST(sum(duration_us) AS BIGINT) AS du FROM sess)
        |SELECT n_sessions, n_bounce,
        |  CAST(floor(1000000 * n_bounce / n_sessions) AS BIGINT)
        |    AS bounce_micros,
        |  CAST(floor(1000 * ne / n_sessions) AS BIGINT)
        |    AS avg_events_milli,
        |  CAST(floor(CAST(du AS DOUBLE) / n_sessions) AS BIGINT)
        |    AS avg_duration_us
        |FROM a""".stripMargin,

    "qX_theil" ->
      """WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS ni
        |  FROM events GROUP BY 1),
        |tot AS (SELECT count(*) AS n_units, CAST(sum(ni) AS BIGINT)
        |    AS x FROM per),
        |t AS (SELECT tot.n_units, tot.x,
        |    CAST(round(1e6
        |      * (CAST(per.ni * tot.n_units AS DOUBLE) / tot.x)
        |      * ln(CAST(per.ni * tot.n_units AS DOUBLE) / tot.x))
        |      AS BIGINT) AS t
        |  FROM per CROSS JOIN tot)
        |SELECT n_units, x AS total,
        |  CAST(floor(CAST(sum(t) AS DOUBLE) / n_units) AS BIGINT)
        |    AS theil_micros
        |FROM t GROUP BY 1, 2""".stripMargin,

    "qX_type_overlap" ->
      """WITH inc AS (SELECT DISTINCT event_type AS t, user_id AS u
        |  FROM events),
        |deg AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM inc
        |  GROUP BY 1),
        |p AS (SELECT a.t AS a, b.t AS b, CAST(count(*) AS BIGINT) AS cn
        |  FROM inc a JOIN inc b ON a.u = b.u AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, p.cn, da.d AS n_a, db.d AS n_b,
        |  CAST(floor(1000000 * p.cn / (da.d + db.d - p.cn)) AS BIGINT)
        |    AS jaccard_micros
        |FROM p JOIN deg da ON da.t = p.a JOIN deg db ON db.t = p.b
        |ORDER BY p.a, p.b""".stripMargin,

    "qX_mcnemar" ->
      """WITH u AS (SELECT user_id, count(*) AS n_ev,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS np,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS nc
        |  FROM events GROUP BY 1),
        |r AS (SELECT CASE WHEN np >= 14 THEN 1 ELSE 0 END AS y,
        |    CASE WHEN n_ev >= 67 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN nc >= 14 THEN 1 ELSE 0 END AS b FROM u),
        |s AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN a = y AND b <> y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN a <> y AND b = y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM r)
        |SELECT n, b, c,
        |  CASE WHEN b + c = 0 THEN 0
        |    ELSE CAST(floor(1e6 * (b - c) * (b - c) / (b + c))
        |      AS BIGINT)
        |  END AS chi2_micros
        |FROM s""".stripMargin,

    "qX_cohens_d" ->
      """WITH aa AS (SELECT CAST(floor("value" * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'click'),
        |bb AS (SELECT CAST(floor("value" * 1000) AS BIGINT) AS v
        |  FROM events WHERE event_type = 'view'),
        |sa AS (SELECT count(*) AS n_a, CAST(sum(v) AS BIGINT) AS s_a,
        |    CAST(sum(v * v) AS BIGINT) AS q_a FROM aa),
        |sb AS (SELECT count(*) AS n_b, CAST(sum(v) AS BIGINT) AS s_b,
        |    CAST(sum(v * v) AS BIGINT) AS q_b FROM bb)
        |SELECT n_a, n_b,
        |  CASE WHEN n_a < 2 OR n_b < 2 OR
        |      ((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
        |        + (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * s_b / n_b))
        |        / (n_a + n_b - 2) <= 0 THEN 0
        |    ELSE CAST(floor(1e6 *
        |      ((CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b)
        |       / sqrt(
        |        ((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * s_a / n_a)
        |         + (CAST(q_b AS DOUBLE)
        |            - CAST(s_b AS DOUBLE) * s_b / n_b))
        |        / (n_a + n_b - 2)))) AS BIGINT)
        |  END AS d_micros
        |FROM sa CROSS JOIN sb""".stripMargin,

    "qX_mi" ->
      """WITH cells AS (SELECT event_type AS x,
        |    CAST(dayofweek(ts) + 1 AS BIGINT) AS y,
        |    CAST(count(*) AS BIGINT) AS nxy
        |  FROM events GROUP BY 1, 2),
        |nx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx
        |  FROM cells GROUP BY 1),
        |ny AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM cells),
        |t AS (SELECT tot.n,
        |    CAST(round(1e6 * (CAST(cells.nxy AS DOUBLE) / tot.n)
        |      * ln(CAST(cells.nxy * tot.n AS DOUBLE)
        |        / (nx.nx * ny.ny))) AS BIGINT) AS t
        |  FROM cells JOIN nx USING (x) JOIN ny USING (y)
        |  CROSS JOIN tot)
        |SELECT n, count(*) AS n_cells, CAST(sum(t) AS BIGINT)
        |  AS mi_micros
        |FROM t GROUP BY 1""".stripMargin,

    "qX_cramers_v" ->
      """WITH cells AS (SELECT event_type AS x,
        |    CAST(dayofweek(ts) + 1 AS BIGINT) AS y,
        |    CAST(count(*) AS BIGINT) AS nxy
        |  FROM events GROUP BY 1, 2),
        |nx AS (SELECT x, CAST(sum(nxy) AS BIGINT) AS nx
        |  FROM cells GROUP BY 1),
        |ny AS (SELECT y, CAST(sum(nxy) AS BIGINT) AS ny
        |  FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n,
        |    count(DISTINCT x) AS r, count(DISTINCT y) AS c FROM cells),
        |dense AS (SELECT nx.x, ny.y, nx.nx, ny.ny,
        |    coalesce(cells.nxy, 0) AS o
        |  FROM nx CROSS JOIN ny
        |  LEFT JOIN cells ON cells.x = nx.x AND cells.y = ny.y),
        |t AS (SELECT tot.n, tot.r, tot.c,
        |    CAST(floor(1e6
        |      * (dense.o - CAST(dense.nx AS DOUBLE) * dense.ny / tot.n)
        |      * (dense.o - CAST(dense.nx AS DOUBLE) * dense.ny / tot.n)
        |      / (CAST(dense.nx AS DOUBLE) * dense.ny / tot.n))
        |      AS BIGINT) AS t
        |  FROM dense CROSS JOIN tot),
        |chi AS (SELECT n, r, c, CAST(sum(t) AS BIGINT) AS chi2_micros
        |  FROM t GROUP BY 1, 2, 3)
        |SELECT n, r, c, chi2_micros,
        |  CASE WHEN least(r, c) < 2 OR chi2_micros <= 0 THEN 0
        |    ELSE CAST(floor(1e6 * sqrt(
        |      (CAST(chi2_micros AS DOUBLE) / 1e6)
        |        / (n * (least(r, c) - 1)))) AS BIGINT)
        |  END AS v_micros
        |FROM chi""".stripMargin,

    "qX_hhi" ->
      """WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS ni
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(ni) AS BIGINT) AS n FROM per),
        |s AS (SELECT tot.n,
        |    CAST(floor(1e6 * per.ni / tot.n) AS BIGINT) AS si
        |  FROM per CROSS JOIN tot),
        |g AS (SELECT n, count(*) AS n_units,
        |    CAST(sum(si * si) AS BIGINT) AS s2 FROM s GROUP BY 1)
        |SELECT n_units, n AS total,
        |  CAST(floor(CAST(s2 AS DOUBLE) / 1e6) AS BIGINT) AS hhi_micros,
        |  CASE WHEN CAST(floor(CAST(s2 AS DOUBLE) / 1e6) AS BIGINT) <= 0
        |    THEN 0
        |    ELSE CAST(floor(1e12 /
        |      CAST(floor(CAST(s2 AS DOUBLE) / 1e6) AS BIGINT))
        |      AS BIGINT)
        |  END AS eff_n_micros
        |FROM g""".stripMargin,

    "qX_bh_fdr" ->
      """WITH q AS (SELECT event_type,
        |    CAST(dayofweek(ts) + 1 AS BIGINT) AS weekday,
        |    CAST(floor("value" * 1000) AS BIGINT) AS v FROM events),
        |cells AS (SELECT event_type, weekday, count(*) AS n,
        |    CAST(sum(v) AS BIGINT) AS s,
        |    CAST(sum(v * v) AS BIGINT) AS qq
        |  FROM q GROUP BY 1, 2),
        |gg AS (SELECT count(*) AS nn, CAST(sum(v) AS BIGINT) AS st
        |  FROM q),
        |wp AS (SELECT event_type, weekday, n,
        |    CASE WHEN n < 2 OR CAST(floor(1e6 * s / n) AS BIGINT)
        |        - CAST(floor(1e6 * st / nn) AS BIGINT) = 0 THEN 1000000
        |      ELSE least(1000000, CAST(floor(1e6 *
        |        ((CAST(qq AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
        |          / (n - 1) / n)
        |        / ((CAST(s AS DOUBLE) / n - CAST(st AS DOUBLE) / nn)
        |          * (CAST(s AS DOUBLE) / n - CAST(st AS DOUBLE) / nn)))
        |        AS BIGINT))
        |    END AS p_micros
        |  FROM cells CROSS JOIN gg),
        |tot AS (SELECT count(*) AS m FROM wp),
        |rk AS (SELECT event_type, weekday, n, p_micros,
        |    CAST(row_number() OVER
        |      (ORDER BY p_micros, event_type, weekday) AS BIGINT)
        |      AS rnk, tot.m
        |  FROM wp CROSS JOIN tot),
        |ks AS (SELECT max(CASE WHEN p_micros * m <= 100000 * rnk
        |    THEN rnk ELSE 0 END) AS kstar FROM rk)
        |SELECT event_type, weekday, n, p_micros, rnk,
        |  rnk <= ks.kstar AS rejected
        |FROM rk CROSS JOIN ks ORDER BY rnk""".stripMargin,

    "qX_page_hinkley" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS bucket,
        |    CAST(floor(CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT))
        |      AS DOUBLE) / count(*)) AS BIGINT) AS mean_micros
        |  FROM events GROUP BY 1),
        |r AS (SELECT bucket, mean_micros,
        |    CAST(floor(CAST(sum(mean_micros) OVER w AS DOUBLE)
        |      / (count(*) OVER w)) AS BIGINT) AS run_mean
        |  FROM daily
        |  WINDOW w AS (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT bucket, mean_micros,
        |    CAST(sum(mean_micros - run_mean - 1000000) OVER
        |      (ORDER BY bucket
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS mm
        |  FROM r),
        |p AS (SELECT bucket, mean_micros,
        |    mm - min(mm) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
        |  FROM m)
        |SELECT strftime(bucket, '%Y-%m-%d') AS bucket, mean_micros,
        |  CAST(ph AS BIGINT) AS ph_micros, ph > 50000000 AS alarm
        |FROM p ORDER BY bucket""".stripMargin,

    "qX_stationary" ->
      """WITH seq AS (SELECT event_type AS et,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS src
        |  FROM events),
        |cnt AS (SELECT src, et AS dst, CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE src IS NOT NULL GROUP BY 1, 2),
        |ca AS (SELECT src, CAST(sum(n) AS BIGINT) AS c_src
        |  FROM cnt GROUP BY 1),
        |tr AS (SELECT cnt.src, cnt.dst, cnt.n, ca.c_src
        |  FROM cnt JOIN ca USING (src)),
        |st AS (SELECT DISTINCT state FROM (
        |  SELECT src AS state FROM cnt
        |  UNION ALL SELECT dst FROM cnt)),
        |kk AS (SELECT count(*) AS k FROM st),
        |p0 AS (SELECT state, CAST(floor(1000000 / kk.k) AS BIGINT) AS pi
        |  FROM st CROSS JOIN kk),
        |p1 AS (SELECT tr.dst AS state,
        |    CAST(sum(CAST(floor(p0.pi * tr.n / tr.c_src) AS BIGINT))
        |      AS BIGINT) AS pi
        |  FROM tr JOIN p0 ON p0.state = tr.src GROUP BY 1),
        |p2 AS (SELECT tr.dst AS state,
        |    CAST(sum(CAST(floor(p1.pi * tr.n / tr.c_src) AS BIGINT))
        |      AS BIGINT) AS pi
        |  FROM tr JOIN p1 ON p1.state = tr.src GROUP BY 1),
        |p3 AS (SELECT tr.dst AS state,
        |    CAST(sum(CAST(floor(p2.pi * tr.n / tr.c_src) AS BIGINT))
        |      AS BIGINT) AS pi
        |  FROM tr JOIN p2 ON p2.state = tr.src GROUP BY 1),
        |p4 AS (SELECT tr.dst AS state,
        |    CAST(sum(CAST(floor(p3.pi * tr.n / tr.c_src) AS BIGINT))
        |      AS BIGINT) AS pi
        |  FROM tr JOIN p3 ON p3.state = tr.src GROUP BY 1)
        |SELECT st.state, coalesce(p4.pi, 0) AS pi_micros
        |FROM st LEFT JOIN p4 USING (state) ORDER BY state""".stripMargin,

    "qX_gain" ->
      """WITH per AS (SELECT user_id, count(*) AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS y
        |  FROM events GROUP BY 1),
        |r AS (SELECT y, row_number() OVER (ORDER BY -score, user_id)
        |    AS rn FROM per),
        |nn AS (SELECT count(*) AS n FROM per),
        |b AS (SELECT CAST(floor(10 * (rn - 1) / nn.n) AS BIGINT)
        |      AS decile, y
        |  FROM r CROSS JOIN nn),
        |g AS (SELECT decile, count(*) AS n_units,
        |    CAST(sum(y) AS BIGINT) AS n_pos FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tot_pos,
        |    CAST(sum(n_units) AS BIGINT) AS tot_n FROM g),
        |c AS (SELECT decile, n_units, n_pos,
        |    CAST(sum(n_pos) OVER w AS BIGINT) AS cum_pos,
        |    CAST(sum(n_units) OVER w AS BIGINT) AS cum_n
        |  FROM g
        |  WINDOW w AS (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT c.decile, c.n_units, c.n_pos, c.cum_pos,
        |  CASE WHEN t.tot_pos = 0 THEN 0
        |    ELSE CAST(floor(1000000 * c.cum_pos / t.tot_pos) AS BIGINT)
        |  END AS gain_micros,
        |  CASE WHEN t.tot_pos = 0 THEN 0
        |    ELSE CAST(floor(1e6 *
        |      (CAST(c.cum_pos AS DOUBLE) / t.tot_pos)
        |      / (CAST(c.cum_n AS DOUBLE) / t.tot_n)) AS BIGINT)
        |  END AS lift_micros
        |FROM c CROSS JOIN t ORDER BY c.decile""".stripMargin,

    "qX_anova" ->
      """WITH q AS (SELECT event_type AS g,
        |    CAST(floor("value" * 10) AS BIGINT) AS v FROM events),
        |grp AS (SELECT g, count(*) AS ng,
        |    CAST(sum(v) AS BIGINT) AS sg,
        |    CAST(sum(v * v) AS BIGINT) AS qg
        |  FROM q GROUP BY 1),
        |tt AS (SELECT ng, sg, qg,
        |    CAST(floor(sg * sg / ng) AS BIGINT) AS tg FROM grp),
        |s AS (SELECT count(*) AS k, CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sg) AS BIGINT) AS sv, CAST(sum(qg) AS BIGINT) AS q,
        |    CAST(sum(tg) AS BIGINT) AS mt FROM tt)
        |SELECT k, n,
        |  mt - CAST(floor(sv * sv / n) AS BIGINT) AS ssb,
        |  q - mt AS ssw,
        |  CASE WHEN k < 2 OR n <= k OR q - mt <= 0
        |      OR mt - CAST(floor(sv * sv / n) AS BIGINT) < 0 THEN 0
        |    ELSE CAST(floor(1e6 *
        |      (CAST(mt - CAST(floor(sv * sv / n) AS BIGINT) AS DOUBLE)
        |        / (k - 1))
        |      / (CAST(q - mt AS DOUBLE) / (n - k))) AS BIGINT)
        |  END AS f_micros
        |FROM s""".stripMargin,

    "qX_err" ->
      """WITH per AS (SELECT event_type AS qid, user_id AS id,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT qid, id, n, (n % 4) AS grade,
        |    row_number() OVER (PARTITION BY qid ORDER BY n DESC, id)
        |      AS rnk FROM per),
        |num AS (SELECT qid, rnk,
        |    CAST(CASE grade WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3
        |      ELSE 7 END AS BIGINT) AS num
        |  FROM r WHERE rnk <= 10),
        |wide AS (SELECT qid,
        |    max(CASE WHEN rnk = 1 THEN num ELSE 0 END) AS n_1,
        |    max(CASE WHEN rnk = 2 THEN num ELSE 0 END) AS n_2,
        |    max(CASE WHEN rnk = 3 THEN num ELSE 0 END) AS n_3,
        |    max(CASE WHEN rnk = 4 THEN num ELSE 0 END) AS n_4,
        |    max(CASE WHEN rnk = 5 THEN num ELSE 0 END) AS n_5,
        |    max(CASE WHEN rnk = 6 THEN num ELSE 0 END) AS n_6,
        |    max(CASE WHEN rnk = 7 THEN num ELSE 0 END) AS n_7,
        |    max(CASE WHEN rnk = 8 THEN num ELSE 0 END) AS n_8,
        |    max(CASE WHEN rnk = 9 THEN num ELSE 0 END) AS n_9,
        |    max(CASE WHEN rnk = 10 THEN num ELSE 0 END) AS n_10
        |  FROM num GROUP BY 1),
        |s AS (SELECT qid, CAST(
        |    n_1 * 1 * 2520 * 134217728 +
        |    n_2 * (8 - n_1) * 1260 * 16777216 +
        |    n_3 * (8 - n_1) * (8 - n_2) * 840 * 2097152 +
        |    n_4 * (8 - n_1) * (8 - n_2) * (8 - n_3) * 630 * 262144 +
        |    n_5 * (8 - n_1) * (8 - n_2) * (8 - n_3) * (8 - n_4)
        |      * 504 * 32768 +
        |    n_6 * (8 - n_1) * (8 - n_2) * (8 - n_3) * (8 - n_4)
        |      * (8 - n_5) * 420 * 4096 +
        |    n_7 * (8 - n_1) * (8 - n_2) * (8 - n_3) * (8 - n_4)
        |      * (8 - n_5) * (8 - n_6) * 360 * 512 +
        |    n_8 * (8 - n_1) * (8 - n_2) * (8 - n_3) * (8 - n_4)
        |      * (8 - n_5) * (8 - n_6) * (8 - n_7) * 315 * 64 +
        |    n_9 * (8 - n_1) * (8 - n_2) * (8 - n_3) * (8 - n_4)
        |      * (8 - n_5) * (8 - n_6) * (8 - n_7) * (8 - n_8)
        |      * 280 * 8 +
        |    n_10 * (8 - n_1) * (8 - n_2) * (8 - n_3) * (8 - n_4)
        |      * (8 - n_5) * (8 - n_6) * (8 - n_7) * (8 - n_8)
        |      * (8 - n_9) * 252 AS BIGINT) AS err_num
        |  FROM wide)
        |SELECT qid, err_num,
        |  CAST(floor(1e6 * err_num / 2705829396480) AS BIGINT)
        |    AS err_micros
        |FROM s ORDER BY qid""".stripMargin,

    "qX_lorenz" ->
      """WITH per AS (SELECT user_id, count(*) AS w FROM events
        |  GROUP BY 1),
        |r AS (SELECT w, row_number() OVER (ORDER BY w, user_id) AS rn
        |  FROM per),
        |nn AS (SELECT count(*) AS n FROM per),
        |b AS (SELECT CAST(floor(10 * (rn - 1) / nn.n) AS BIGINT)
        |      AS decile, w
        |  FROM r CROSS JOIN nn),
        |g AS (SELECT decile, count(*) AS n_units,
        |    CAST(sum(w) AS BIGINT) AS weight FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(weight) AS BIGINT) AS tot FROM g),
        |c AS (SELECT decile, n_units, weight,
        |    CAST(sum(weight) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum_w
        |  FROM g)
        |SELECT c.decile, c.n_units, c.weight,
        |  CAST(floor(1000000 * c.weight / t.tot) AS BIGINT)
        |    AS share_micros,
        |  CAST(floor(1000000 * c.cum_w / t.tot) AS BIGINT)
        |    AS cum_share_micros
        |FROM c CROSS JOIN t ORDER BY c.decile""".stripMargin,

    "qX_bias_model" ->
      """WITH r AS (SELECT user_id AS u,
        |    CAST(floor("value") AS BIGINT) % 50 AS i,
        |    CAST(floor("value" * 1e6) AS BIGINT) AS r FROM events),
        |mu AS (SELECT CAST(floor(CAST(sum(r) AS DOUBLE) / count(*))
        |    AS BIGINT) AS mu FROM r),
        |bu AS (SELECT u, CAST(floor(
        |      CAST(sum(r) - count(*) * mu.mu AS DOUBLE)
        |      / (count(*) + 10)) AS BIGINT) AS bu
        |  FROM r CROSS JOIN mu GROUP BY u, mu.mu),
        |j AS (SELECT r.i, r.r - mu.mu - bu.bu AS d
        |  FROM r JOIN bu USING (u) CROSS JOIN mu)
        |SELECT i AS item, count(*) AS n_i,
        |  CAST(floor(CAST(sum(d) AS DOUBLE) / (count(*) + 10))
        |    AS BIGINT) AS bi_micros,
        |  (SELECT mu FROM mu) AS mu_micros
        |FROM j GROUP BY 1 ORDER BY item""".stripMargin,

    "qX_churn_labels" ->
      """WITH uw AS (SELECT DISTINCT user_id AS u,
        |    date_trunc('week', ts) AS wk FROM events),
        |mx AS (SELECT max(wk) AS m FROM uw),
        |l AS (SELECT u, wk,
        |    lead(wk) OVER (PARTITION BY u ORDER BY wk) AS nw FROM uw),
        |f AS (SELECT wk, CASE WHEN nw IS NULL
        |      OR date_diff('day', wk, nw) > 7 THEN 1 ELSE 0 END AS ch
        |  FROM l CROSS JOIN mx WHERE wk < mx.m)
        |SELECT strftime(wk, '%Y-%m-%d') AS week, count(*) AS n_active,
        |  CAST(sum(ch) AS BIGINT) AS n_churned_next,
        |  CAST(floor(1000000 * sum(ch) / count(*)) AS BIGINT)
        |    AS churn_rate_micros
        |FROM f GROUP BY 1 ORDER BY week""".stripMargin,

    "qX_quantile_shift" ->
      s"""WITH base AS (SELECT CAST(floor("value" * 1e6) AS BIGINT) AS v,
         |    event_id AS tie FROM events
         |  WHERE ts < TIMESTAMP '$SplitTs'),
         |curr AS (SELECT CAST(floor("value" * 1e6) AS BIGINT) AS v,
         |    event_id AS tie FROM events
         |  WHERE ts >= TIMESTAMP '$SplitTs'),
         |rb AS (SELECT v, row_number() OVER (ORDER BY v, tie) AS rn
         |  FROM base),
         |nb AS (SELECT count(*) AS n FROM base),
         |rc AS (SELECT v, row_number() OVER (ORDER BY v, tie) AS rn
         |  FROM curr),
         |ncn AS (SELECT count(*) AS n FROM curr),
         |q(q_micros) AS (VALUES (CAST(100000 AS BIGINT)),
         |  (CAST(500000 AS BIGINT)), (CAST(900000 AS BIGINT)))
         |SELECT q.q_micros, b.v AS base_v_micros, c.v AS curr_v_micros,
         |  c.v - b.v AS shift_micros
         |FROM q CROSS JOIN nb CROSS JOIN ncn
         |JOIN rb b ON b.rn = greatest(1,
         |  CAST(ceil(q.q_micros / 1e6 * nb.n) AS BIGINT))
         |JOIN rc c ON c.rn = greatest(1,
         |  CAST(ceil(q.q_micros / 1e6 * ncn.n) AS BIGINT))
         |ORDER BY q.q_micros""".stripMargin,

    "qX_corr_matrix" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    event_type AS t, count(*) AS n FROM events GROUP BY 1, 2),
        |days AS (SELECT DISTINCT d FROM daily),
        |types AS (SELECT DISTINCT t FROM daily),
        |dense AS (SELECT days.d, types.t, coalesce(daily.n, 0) AS n
        |  FROM days CROSS JOIN types
        |  LEFT JOIN daily ON daily.d = days.d AND daily.t = types.t),
        |p AS (SELECT a.t AS a, b.t AS b, count(*) AS nd,
        |    CAST(sum(a.n) AS BIGINT) AS sx,
        |    CAST(sum(b.n) AS BIGINT) AS sy,
        |    CAST(sum(a.n * b.n) AS BIGINT) AS sxy,
        |    CAST(sum(a.n * a.n) AS BIGINT) AS sxx,
        |    CAST(sum(b.n * b.n) AS BIGINT) AS syy
        |  FROM dense a JOIN dense b ON a.d = b.d AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT a, b, nd AS n_days,
        |  CASE WHEN nd * sxx - sx * sx = 0 OR nd * syy - sy * sy = 0
        |    THEN 0
        |    ELSE CAST(floor(1e6 * CAST(nd * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(nd * sxx - sx * sx AS DOUBLE)
        |        * CAST(nd * syy - sy * sy AS DOUBLE))) AS BIGINT)
        |  END AS r_micros
        |FROM p ORDER BY a, b""".stripMargin,

    "qX_systematic" ->
      """WITH r AS (SELECT event_id,
        |    row_number() OVER (ORDER BY event_id) AS rn FROM events)
        |SELECT count(*) AS n_kept, CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM r WHERE (rn - 1) % 97 = 0""".stripMargin,

    "qX_seasonal" ->
      """WITH daily AS (SELECT date_trunc('day', ts) AS d,
        |    count(*) AS n FROM events GROUP BY 1),
        |wd AS (SELECT d, n, CAST(dayofweek(d) + 1 AS BIGINT) AS weekday
        |  FROM daily),
        |med AS (SELECT weekday,
        |    CAST(2 * quantile_cont(n, 0.5) AS BIGINT) AS med2
        |  FROM wd GROUP BY 1),
        |dev AS (SELECT wd.d, wd.weekday, wd.n, med.med2,
        |    abs(2 * wd.n - med.med2) AS adev2
        |  FROM wd JOIN med USING (weekday)),
        |mad AS (SELECT weekday,
        |    CAST(2 * quantile_cont(adev2, 0.5) AS BIGINT) AS mad4
        |  FROM dev GROUP BY 1)
        |SELECT strftime(dev.d, '%Y-%m-%d') AS day, dev.weekday,
        |  dev.n, dev.med2, mad.mad4,
        |  2 * dev.adev2 > 3 * mad.mad4 AS is_outlier
        |FROM dev JOIN mad USING (weekday)
        |ORDER BY day""".stripMargin,

    "qX_mannwhitney" ->
      """WITH aa AS (SELECT CAST(floor("value" * 1e6) AS BIGINT) AS v,
        |    0 AS side, event_id AS tie FROM events
        |  WHERE event_type = 'click'),
        |bb AS (SELECT CAST(floor("value" * 1e6) AS BIGINT) AS v,
        |    1 AS side, event_id AS tie FROM events
        |  WHERE event_type = 'view'),
        |u AS (SELECT * FROM aa UNION ALL SELECT * FROM bb),
        |r AS (SELECT side, row_number() OVER (ORDER BY v, side, tie)
        |    AS rn FROM u),
        |s AS (SELECT
        |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS na,
        |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nb,
        |    CAST(sum(CASE WHEN side = 0 THEN rn ELSE 0 END) AS BIGINT)
        |      AS ra
        |  FROM r)
        |SELECT na AS n_a, nb AS n_b, ra AS r_a,
        |  CAST(ra - na * (na + 1) / 2 AS BIGINT) AS u_a,
        |  CAST(na * nb - (ra - na * (na + 1) / 2) AS BIGINT) AS u_b,
        |  CASE WHEN na = 0 OR nb = 0 THEN 0
        |    ELSE CAST(floor(1e6 *
        |      CAST(2 * (ra - na * (na + 1) / 2) - na * nb AS DOUBLE)
        |      / (2.0 * sqrt(CAST(na * nb * (na + nb + 1) AS DOUBLE)
        |        / 12.0))) AS BIGINT)
        |  END AS z_micros
        |FROM s""".stripMargin,

    "qX_woe" ->
      """WITH d AS (SELECT "value" AS v, event_id AS tie,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |r AS (SELECT y, row_number() OVER (ORDER BY v, tie) AS rn
        |  FROM d),
        |nn AS (SELECT count(*) AS n FROM d),
        |binned AS (SELECT y,
        |    CAST(floor(10 * (rn - 1) / nn.n) AS BIGINT) AS bin
        |  FROM r CROSS JOIN nn),
        |b AS (SELECT bin, CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS n_neg
        |  FROM binned GROUP BY 1),
        |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS pos,
        |    CAST(sum(n_neg) AS BIGINT) AS neg FROM b),
        |w AS (SELECT b.bin, b.n_pos, b.n_neg, t.pos, t.neg,
        |    CASE WHEN b.n_pos = 0 OR b.n_neg = 0 THEN NULL
        |      ELSE CAST(round(1e6 * ln(
        |        CAST(b.n_pos * t.neg AS DOUBLE)
        |          / CAST(b.n_neg * t.pos AS DOUBLE))) AS BIGINT)
        |    END AS woe_micros
        |  FROM b CROSS JOIN t)
        |SELECT bin, n_pos, n_neg, woe_micros,
        |  CASE WHEN woe_micros IS NULL THEN NULL
        |    ELSE CAST(floor((CAST(n_pos AS DOUBLE) / pos
        |      - CAST(n_neg AS DOUBLE) / neg) * woe_micros) AS BIGINT)
        |  END AS iv_term_micros
        |FROM w ORDER BY bin""".stripMargin,

    "qX_ltv" ->
      """WITH e AS (SELECT user_id AS u, ts,
        |    CAST(floor("value" * 1e6) AS BIGINT) AS v
        |  FROM events),
        |f AS (SELECT u, date_trunc('week', min(ts)) AS cohort
        |  FROM e GROUP BY 1),
        |bo AS (SELECT f.cohort,
        |    CAST(date_diff('day', f.cohort, date_trunc('week', e.ts)) / 7
        |      AS BIGINT) AS week_offset,
        |    CAST(sum(e.v) AS BIGINT) AS value_micros
        |  FROM e JOIN f USING (u)
        |  WHERE CAST(date_diff('day', f.cohort, date_trunc('week', e.ts))
        |      / 7 AS BIGINT) <= 8
        |  GROUP BY 1, 2),
        |sz AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY 1),
        |c AS (SELECT cohort, week_offset, value_micros,
        |    CAST(sum(value_micros) OVER (PARTITION BY cohort
        |      ORDER BY week_offset
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum
        |  FROM bo)
        |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week,
        |  c.week_offset, sz.cohort_size, c.value_micros,
        |  c.cum AS cum_value_micros,
        |  CAST(floor(CAST(c.cum AS DOUBLE) / sz.cohort_size) AS BIGINT)
        |    AS ltv_micros
        |FROM c JOIN sz USING (cohort)
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "qX_time_to_convert" ->
      """WITH e AS (SELECT user_id AS u, event_type AS t,
        |    epoch_us(ts) AS ts_us FROM events),
        |st AS (SELECT u, min(ts_us) AS t0 FROM e WHERE t = 'signup'
        |  GROUP BY 1),
        |cv AS (SELECT e.u, min(e.ts_us - st.t0) AS d_us
        |  FROM e JOIN st USING (u)
        |  WHERE e.t = 'purchase' AND e.ts_us > st.t0
        |  GROUP BY 1),
        |d AS (SELECT CAST(floor(d_us / 1000000) AS BIGINT) AS delay_s,
        |    u AS tie FROM cv),
        |r AS (SELECT delay_s, row_number() OVER (
        |    ORDER BY delay_s, tie) AS rn FROM d),
        |n AS (SELECT count(*) AS n FROM d),
        |q(q_micros) AS (VALUES (CAST(500000 AS BIGINT)),
        |  (CAST(900000 AS BIGINT)), (CAST(990000 AS BIGINT)))
        |SELECT q.q_micros, r.delay_s
        |FROM q CROSS JOIN n JOIN r
        |  ON r.rn = greatest(1, CAST(ceil(q.q_micros / 1e6 * n.n)
        |    AS BIGINT))
        |ORDER BY q.q_micros""".stripMargin,

    "qX_burstiness" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events),
        |gp AS (SELECT user_id,
        |    CAST(floor((ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id)) / 1000000) AS BIGINT) AS g
        |  FROM e),
        |s AS (SELECT user_id, count(*) AS n_gaps,
        |    CAST(sum(g) AS BIGINT) AS sg,
        |    CAST(sum(g * g) AS BIGINT) AS sgg
        |  FROM gp WHERE g IS NOT NULL GROUP BY 1
        |  HAVING count(*) >= 2)
        |SELECT user_id, n_gaps,
        |  CAST(floor(CAST(sg AS DOUBLE) / n_gaps) AS BIGINT)
        |    AS mean_gap_s,
        |  CASE WHEN sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) + sg = 0
        |    THEN 0
        |    ELSE CAST(floor(1e6 *
        |      (sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) - sg)
        |      / (sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE)) + sg))
        |      AS BIGINT)
        |  END AS b_micros
        |FROM s ORDER BY user_id""".stripMargin,

    // The rollup store must equal the one global GROUP BY it
    // materializes incrementally — batching and the replay fence are
    // invisible in the final table (that's the matview contract).
    "qX_stream_rollup" ->
      """SELECT event_type, CAST(user_id % 97 AS BIGINT) AS g,
        |  CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS v_micros,
        |  count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Only the admitted batches (g % 3 <> 1) may reach the rollup —
    // the quarantine leak check is the difference from qX_stream_rollup.
    "qX_stream_gated" ->
      """SELECT event_type, CAST(user_id % 97 AS BIGINT) AS g,
        |  CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS v_micros,
        |  count(*) AS n
        |FROM events WHERE (user_id % 97) % 3 <> 1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // Only the two clean shards reach the rollup; the value-tripled
    // shard trips PSI and quarantines (every row individually valid —
    // the distribution-shift case the constraint gate cannot see).
    "qX_stream_drift" ->
      """SELECT event_type, CAST(user_id % 97 AS BIGINT) AS g,
        |  CAST(sum(CAST(floor("value" * 1000000.0) AS BIGINT)) AS BIGINT)
        |    AS v_micros,
        |  count(*) AS n
        |FROM events WHERE (user_id % 97) % 3 < 2
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // The leaderboard read over the accumulated rollup must equal the
    // global count + rank: (n desc, item) total order, top-5 per type.
    "qX_stream_trending" ->
      """WITH agg AS (
        |  SELECT event_type, CAST(user_id % 97 AS BIGINT) AS item,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, item, n, row_number() OVER (
        |    PARTITION BY event_type ORDER BY n DESC, item) AS rn
        |  FROM agg)
        |SELECT event_type, item, n FROM r WHERE rn <= 5
        |ORDER BY event_type, n DESC, item""".stripMargin,

    "qX_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
        |  FROM events),
        |f AS (SELECT user_id, ts_us, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL THEN 1
        |         WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |         ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |s AS (SELECT user_id, ts_us,
        |    CAST(sum(new_s) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  CAST(min(ts_us) AS BIGINT) AS start_us,
        |  CAST(max(ts_us) AS BIGINT) AS end_us,
        |  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,

    "qX_winsorize" ->
      """WITH v AS (SELECT CAST(floor("value" * 1e6) AS BIGINT) AS v,
        |    event_id AS tie FROM events),
        |r AS (SELECT v, row_number() OVER (ORDER BY v, tie) AS rn FROM v),
        |p AS (SELECT count(*) AS n,
        |    CAST(floor(0.05 * count(*)) AS BIGINT) AS k FROM v),
        |lo AS (SELECT r.v AS lo FROM r, p WHERE r.rn = p.k + 1),
        |hi AS (SELECT r.v AS hi FROM r, p WHERE r.rn = p.n - p.k)
        |SELECT p.n, p.k AS n_clamped_each, lo.lo AS lo_micros,
        |  hi.hi AS hi_micros,
        |  CAST(floor(CAST(sum(greatest(lo.lo, least(hi.hi, v.v)))
        |    AS DOUBLE) / p.n) AS BIGINT) AS wins_mean_micros
        |FROM v CROSS JOIN p CROSS JOIN lo CROSS JOIN hi
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "qX_ips" ->
      """WITH ev AS (SELECT CAST(floor("value") AS BIGINT) % 50 AS item,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS r
        |  FROM events),
        |pop AS (SELECT item, count(*) AS ni FROM ev GROUP BY 1),
        |tot AS (SELECT CAST(sum(ni) AS BIGINT) AS nt FROM pop),
        |lg AS (SELECT ev.r,
        |    CAST(floor(pop.ni * 1000000 / tot.nt) AS BIGINT) AS p
        |  FROM ev JOIN pop USING (item) CROSS JOIN tot),
        |rw AS (SELECT r,
        |    CASE WHEN p < 1000 THEN 1 ELSE 0 END AS clipped,
        |    CAST(floor(1000000000000 / (50 * greatest(p, 1000)))
        |      AS BIGINT) AS w
        |  FROM lg),
        |s AS (SELECT count(*) AS n,
        |    CAST(sum(clipped) AS BIGINT) AS n_clipped,
        |    CAST(sum(w) AS BIGINT) AS sum_w,
        |    CAST(sum(r * w) AS BIGINT) AS sum_rw FROM rw)
        |SELECT n, n_clipped, sum_w,
        |  CAST(floor(CAST(sum_rw AS DOUBLE) / n) AS BIGINT) AS ips_micros,
        |  CASE WHEN sum_w = 0 THEN 0
        |    ELSE CAST(floor(1e6 * CAST(sum_rw AS DOUBLE)
        |      / CAST(sum_w AS DOUBLE)) AS BIGINT)
        |  END AS snips_micros
        |FROM s""".stripMargin,

    "qX_bradley_terry" -> btSql(3),

    "qX_cuped" ->
      s"""WITH per AS (SELECT user_id,
         |    sum(CASE WHEN ts < TIMESTAMP '$SplitTs' THEN 1 ELSE 0 END)
         |      * 1000 AS x,
         |    sum(CASE WHEN ts >= TIMESTAMP '$SplitTs' THEN 1 ELSE 0 END)
         |      * 1000 AS y
         |  FROM events GROUP BY 1),
         |s AS (SELECT count(*) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM per)
         |SELECT n,
         |  CASE WHEN n * sxx - sx * sx = 0 THEN 0
         |    ELSE CAST(floor(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
         |      / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
         |  END AS theta_micros,
         |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN 0
         |    ELSE CAST(floor(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
         |      * CAST(n * sxy - sx * sy AS DOUBLE)
         |      / (CAST(n * sxx - sx * sx AS DOUBLE)
         |         * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)
         |  END AS rho2_micros,
         |  CAST(n * syy - sy * sy AS BIGINT) AS var_y_milli2,
         |  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
         |    THEN CAST(n * syy - sy * sy AS BIGINT)
         |    ELSE CAST(floor(CAST(n * syy - sy * sy AS DOUBLE) * (1.0
         |      - CAST(n * sxy - sx * sy AS DOUBLE)
         |        * CAST(n * sxy - sx * sy AS DOUBLE)
         |        / (CAST(n * sxx - sx * sx AS DOUBLE)
         |           * CAST(n * syy - sy * sy AS DOUBLE)))) AS BIGINT)
         |  END AS var_adj_milli2
         |FROM s""".stripMargin,

    "qX_hll_grouped" ->
      """WITH hh AS (
        |  SELECT event_type AS key,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS hv
        |  FROM events),
        |ww AS (SELECT key, hv % 16 AS j,
        |    CAST(floor(hv / 16) AS BIGINT) AS w
        |  FROM hh),
        |rr AS (SELECT key, j,
        |  CASE WHEN w = 0 THEN 29
        |       ELSE CAST(round(log2(w & (-w))) AS BIGINT) + 1 END AS rho
        |  FROM ww),
        |regs AS (SELECT key, j, max(rho) AS rho, count(*) AS n FROM rr
        |  GROUP BY 1, 2),
        |f AS (SELECT key, sum(pow(2.0, -rho)) + (16 - count(*)) AS s,
        |  16 - count(*) AS v0, CAST(sum(n) AS BIGINT) AS n_rows FROM regs
        |  GROUP BY 1)
        |SELECT key AS event_type, n_rows,
        |  CASE WHEN 0.673 * 256.0 / s <= 40.0 AND v0 > 0
        |    THEN CAST(round(16.0 * ln(16.0 / v0)) AS BIGINT)
        |    ELSE CAST(round(0.673 * 256.0 / s) AS BIGINT) END AS est
        |FROM f ORDER BY event_type""".stripMargin,

    "qX_spearman" ->
      """WITH per AS (SELECT user_id, count(*) AS nx,
        |    CAST(sum(CAST(floor("value" * 1e6) AS BIGINT)) AS BIGINT)
        |      AS vy
        |  FROM events GROUP BY 1),
        |rx AS (SELECT user_id,
        |    row_number() OVER (ORDER BY nx, user_id) AS rx FROM per),
        |ry AS (SELECT user_id,
        |    row_number() OVER (ORDER BY vy, user_id) AS ry FROM per),
        |nn AS (SELECT count(*) AS n FROM per),
        |sd AS (SELECT CAST(sum((rx.rx - ry.ry) * (rx.rx - ry.ry))
        |      AS BIGINT) AS sum_d2
        |  FROM rx JOIN ry USING (user_id))
        |SELECT nn.n, sd.sum_d2,
        |  CAST(floor(1e6 * (1.0 - 6.0 * sd.sum_d2 /
        |    (CAST(nn.n AS DOUBLE) * nn.n * nn.n - nn.n))) AS BIGINT)
        |    AS rho_micros
        |FROM sd CROSS JOIN nn""".stripMargin,

    "qX_purged_split" ->
      """WITH s AS (SELECT event_id,
        |    CASE WHEN ts < TIMESTAMP '2024-01-14 00:00:00' THEN 'train'
        |         WHEN ts >= TIMESTAMP '2024-01-16 00:00:00' THEN 'test'
        |    END AS split
        |  FROM events)
        |SELECT split, count(*) AS n,
        |  CAST(sum(event_id) AS BIGINT) AS id_sum
        |FROM s WHERE split IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin,

    "qX_seq_pairs" ->
      """WITH ut AS (SELECT user_id AS u, event_type AS t,
        |    min(ts) AS first_ts, max(ts) AS last_ts
        |  FROM events GROUP BY 1, 2),
        |sup AS (SELECT a.t AS a, b.t AS b, count(*) AS support
        |  FROM ut a JOIN ut b ON a.u = b.u AND a.t <> b.t
        |    AND a.first_ts < b.last_ts
        |  GROUP BY 1, 2),
        |na AS (SELECT t AS a, count(*) AS n_a FROM ut GROUP BY 1)
        |SELECT sup.a, sup.b, sup.support, na.n_a,
        |  CAST(floor(sup.support * 1000000 / na.n_a) AS BIGINT)
        |    AS confidence_micros
        |FROM sup JOIN na USING (a)
        |WHERE sup.support >= 5
        |ORDER BY sup.a, sup.b""".stripMargin,

    "qX_ucb" ->
      """WITH g AS (SELECT CAST(floor("value") AS BIGINT) % 50 AS arm,
        |    count(*) AS n_pulls,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_wins
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(n_pulls) AS BIGINT) AS big_n FROM g)
        |SELECT arm, CAST(n_pulls AS BIGINT) AS n_pulls, n_wins,
        |  CAST(floor(1e6 * (n_wins / n_pulls +
        |    sqrt(2.0 * ln(big_n) / n_pulls))) AS BIGINT) AS ucb_micros
        |FROM g CROSS JOIN t ORDER BY arm""".stripMargin,

    "qX_kmv" ->
      """WITH h AS (SELECT DISTINCT
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS hv
        |  FROM events),
        |sk AS (SELECT hv FROM h ORDER BY hv LIMIT 64),
        |f AS (SELECT count(*) AS n_kept, max(hv) AS hk FROM sk)
        |SELECT CAST(n_kept AS BIGINT) AS n_kept,
        |  CASE WHEN n_kept < 64 THEN CAST(n_kept AS BIGINT)
        |       ELSE CAST(floor(270582939648 / greatest(hk, 1)) AS BIGINT)
        |  END AS est
        |FROM f""".stripMargin,

    "qX_kmv_intersect" ->
      """WITH ha AS (SELECT DISTINCT
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS hv
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'),
        |hb AS (SELECT DISTINCT
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) AS hv
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'),
        |ska AS (SELECT hv FROM ha ORDER BY hv LIMIT 64),
        |skb AS (SELECT hv FROM hb ORDER BY hv LIMIT 64),
        |tta AS (SELECT CASE WHEN count(*) < 64 THEN 4294967296
        |  ELSE max(hv) END AS theta_a FROM ska),
        |ttb AS (SELECT CASE WHEN count(*) < 64 THEN 4294967296
        |  ELSE max(hv) END AS theta_b FROM skb),
        |th AS (SELECT least(theta_a, theta_b) AS theta
        |  FROM tta CROSS JOIN ttb),
        |ca AS (SELECT hv FROM ska CROSS JOIN th WHERE hv < theta),
        |cb AS (SELECT hv FROM skb CROSS JOIN th WHERE hv < theta),
        |cnt AS (SELECT
        |  (SELECT count(*) FROM ca JOIN cb USING (hv)) AS n_inter,
        |  (SELECT count(*) FROM (SELECT hv FROM ca UNION
        |    SELECT hv FROM cb)) AS n_union)
        |SELECT th.theta,
        |  CAST(cnt.n_inter AS BIGINT) AS n_inter_sample,
        |  CAST(floor(cnt.n_inter * 4294967296.0 / th.theta) AS BIGINT)
        |    AS est_intersect,
        |  CAST(floor(cnt.n_union * 4294967296.0 / th.theta) AS BIGINT)
        |    AS est_union,
        |  CASE WHEN cnt.n_union = 0 THEN 0
        |    ELSE CAST(floor(1e6 * cnt.n_inter / cnt.n_union) AS BIGINT)
        |  END AS jaccard_micros
        |FROM th CROSS JOIN cnt""".stripMargin
  )
}
