package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event-stream analytics — the product-analytics layer the
  * reference feeds from its activity stream (the Kinesis event fan-out,
  * `photo-meta-data-puller/lambda_function.py`) but never aggregates:
  * conversion funnels, cohort retention, behavior transition models,
  * and robust outlier screens over the `events` table.
  *
  * Determinism contract: every reported ratio is an integer-micros
  * division of exact integer counts, every timestamp comparison is
  * exact micros arithmetic, and medians are reported DOUBLED
  * (`2·median` of integer-quantized values is always an exact BIGINT
  * even when the median interpolates between two ranks) — so each
  * result is bit-identical across engines and partition orders.
  */
object Events {

  /** Windowed ordered conversion funnel.
    *
    * Step 1 anchors at each user's EARLIEST `steps.head` event; step k
    * (k ≥ 2) requires a `steps(k-1)` event STRICTLY after the user's
    * step-(k−1) time and within `window` of the step-1 anchor. Each
    * step time is the MINIMAL qualifying timestamp (min-folds — exact
    * and order-independent). Output: one row per step,
    * `(step, step_name, users)`.
    *
    * 100 TB shape: each level is `filter(type) → groupBy(user).min(ts)`
    * (map-side-combined; the type filter is pushed to the scan) plus a
    * user-keyed join against the previous level, whose cardinality is
    * at most #converted-users — monotonically SHRINKING frames, never
    * a per-user event sort. The k levels are independent jobs; k is
    * small by construction (a funnel definition, not data).
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             window: String): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val base = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      col(typeCol).as("et"))
    val first = base.filter(col("et") === steps.head)
      .groupBy("u").agg(min("ts").as("t"))
      .withColumn("deadline", col("t") + expr(s"INTERVAL $window"))
    val levels = steps.toList.tail.scanLeft(first) { (prev, step) =>
      base.filter(col("et") === step)
        .join(prev.select(col("u"), col("t").as("prev_t"), col("deadline")),
          "u")
        .where(col("ts") > col("prev_t") && col("ts") <= col("deadline"))
        .groupBy("u")
        .agg(min("ts").as("t"), max("deadline").as("deadline"))
    }
    levels.zip(steps).zipWithIndex.map { case ((lvl, name), i) =>
      lvl.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"),
          col("users"))
    }.reduce(_.unionAll(_)).orderBy("step")
  }

  /** Weekly cohort retention.
    *
    * A user's cohort is the Monday-truncated week of their FIRST event;
    * `retention_micros` at offset w is `⌊1e6·active/cohort_size⌋` where
    * `active` counts distinct cohort users with any event in week
    * cohort+w. Offsets beyond `maxOffset` are dropped (reporting
    * horizon).
    *
    * 100 TB shape: first-event frame is one map-side-combined min-fold;
    * the activity join is user-keyed against that (≤ #users rows); the
    * distinct-count collapses (cohort, offset, user) partially before
    * the final count — no window, no sort, all exact integers.
    */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       maxOffset: Int): DataFrame = {
    val e = events.select(col(userCol).as("u"), col(tsCol).as("ts"))
    val first = e.groupBy("u").agg(min("ts").as("first_ts"))
      .select(col("u"), date_trunc("week", col("first_ts")).as("cohort"))
    val act = e.join(first, "u")
      .select(col("u"), col("cohort"),
        (datediff(date_trunc("week", col("ts")), col("cohort")) / lit(7))
          .cast("long").as("week_offset"))
      .filter(col("week_offset") <= maxOffset)
      .groupBy("cohort", "week_offset")
      .agg(countDistinct("u").as("active_users"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    act.join(sizes, "cohort")
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("active_users"), col("cohort_size"),
        floor(lit(1000000L) * col("active_users") / col("cohort_size"))
          .as("retention_micros"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Churn-label builder — the supervised-training-set generator for
    * a retention model: per (user, active-week) row, `churned_next` =
    * "the user has NO activity in the following calendar week". The
    * last observed week in the frame is dropped (its label is not yet
    * knowable — emitting it would leak the dataset boundary as fake
    * churn). One user-week distinct fold + one user-partitioned lead
    * over the per-user week list (bounded by a user's active weeks).
    *
    * @return (week, n_active, n_churned_next, churn_rate_micros) per
    *         week, ordered — the aggregate view; join keys are
    *         derivable from the same CTE for row-level training.
    */
  def churnLabels(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame = {
    val uw = events.select(col(userCol).as("u"),
        date_trunc("week", col(tsCol)).as("wk"))
      .distinct()
      .localCheckpoint(true) // lead windows + the max-week scalar
    val maxWk = uw.agg(max(col("wk"))).head().getTimestamp(0)
    // BOUNDED per-user window: one user's active-week list
    val w = Window.partitionBy(col("u")).orderBy(col("wk"))
    uw.withColumn("next_wk", lead(col("wk"), 1).over(w))
      .filter(col("wk") < lit(maxWk)) // label unknowable for the last week
      .withColumn("churned_next",
        col("next_wk").isNull ||
          datediff(col("next_wk"), col("wk")) > 7)
      .groupBy(col("wk"))
      .agg(count(lit(1)).as("n_active"),
        sum(col("churned_next").cast("long")).as("n_churned_next"))
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week"),
        col("n_active"), col("n_churned_next"),
        floor(lit(1000000L) * col("n_churned_next") / col("n_active"))
          .cast("long").as("churn_rate_micros"))
      .orderBy(col("week"))
  }

  /** Pairwise Pearson correlation of per-TYPE daily activity — do
    * clicks and purchases move together day over day (the metric-
    * coupling readout behind "did the feature launch shift BOTH"):
    * the dense day×type count grid (zeros filled — missing days are
    * real zeros, not absent data), then for each type pair one exact
    * integer fold of the five sufficient statistics and
    * `r = (nΣxy − ΣxΣy)/√(denx·deny)` as a fixed IEEE expression.
    * Grids are calendar×vocabulary bounded, never event-sized.
    *
    * @return (a, b, n_days, r_micros) for a < b, ordered.
    */
  def typeCorrelationMatrix(events: DataFrame, tsCol: String,
                            typeCol: String): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col(tsCol)).as("d"),
        col(typeCol).as("t"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // grid fill + both join sides
    val days = daily.select("d").distinct()
    val types = daily.select("t").distinct()
    val dense = days.crossJoin(types)
      .join(daily, Seq("d", "t"), "left")
      .select(col("d"), col("t"), coalesce(col("n"), lit(0L)).as("n"))
    val pairs = dense.select(col("d"), col("t").as("a"), col("n").as("x"))
      .join(dense.select(col("d"), col("t").as("b"), col("n").as("y")), "d")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("nd"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num = col("nd") * col("sxy") - col("sx") * col("sy")
    val denx = col("nd") * col("sxx") - col("sx") * col("sx")
    val deny = col("nd") * col("syy") - col("sy") * col("sy")
    pairs.select(col("a"), col("b"), col("nd").as("n_days"),
        when(denx === 0 || deny === 0, lit(0L))
          .otherwise(floor(lit(1e6) * num.cast("double")
            / sqrt(denx.cast("double") * deny.cast("double")))
            .cast("long")).as("r_micros"))
      .orderBy(col("a"), col("b"))
  }

  /** Seasonal-robust daily anomaly screen — [[robustOutliers]]'s
    * Hampel rule with a WEEKDAY baseline (a Sunday dip is only an
    * anomaly relative to other Sundays; a flat global median flags
    * every weekend): per weekday the DOUBLED median and doubled-MAD
    * of the daily event counts (exact-integer percentile convention),
    * then every day flags against ITS weekday's band. All percentile
    * groups are calendar-bounded (≤ #days/7 rows).
    *
    * @return (day, weekday, n, med2, mad4, is_outlier) per day,
    *         ordered — `day` formatted yyyy-MM-dd.
    */
  def seasonalOutliers(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col(tsCol)).as("d"))
      .agg(count(lit(1)).as("n"))
      .withColumn("weekday", dayofweek(col("d")).cast("long"))
      .localCheckpoint(true) // medians + the per-day flags
    val med = daily.groupBy("weekday")
      .agg(expr("CAST(2 * percentile(n, 0.5) AS BIGINT)").as("med2"))
    val dev = daily.join(med, "weekday")
      .withColumn("adev2", abs(lit(2L) * col("n") - col("med2")))
    val mad = dev.groupBy("weekday")
      .agg(expr("CAST(2 * percentile(adev2, 0.5) AS BIGINT)").as("mad4"))
    dev.join(mad, "weekday")
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("weekday"), col("n"), col("med2"), col("mad4"),
        (lit(2L) * col("adev2") > lit(3L) * col("mad4")).as("is_outlier"))
      .orderBy(col("day"))
  }

  /** Per-cohort cumulative-value (LTV) curves — the revenue companion
    * of [[retentionCohorts]]: users cohort by first-seen week and
    * every cohort accumulates its value sum across week offsets, so
    * column `cum_value_micros / cohort_size` at offset w IS the
    * average w-week LTV the payback model reads. Per-cohort
    * cumulative windows run over the WEEK-OFFSET grid (≤ maxOffset
    * rows per cohort), never events; value folds are exact integer
    * micros.
    *
    * @return (cohort_week, week_offset, cohort_size, value_micros,
    *         cum_value_micros, ltv_micros) ordered.
    */
  def ltvCurves(events: DataFrame, userCol: String, tsCol: String,
                valueCol: String, maxOffset: Int): DataFrame = {
    val e = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
      floor(col(valueCol) * lit(1e6)).cast("long").as("v"))
    val first = e.groupBy("u").agg(min("ts").as("first_ts"))
      .select(col("u"), date_trunc("week", col("first_ts")).as("cohort"))
      .localCheckpoint(true) // joined to events AND sized
    val byOffset = e.join(first, "u")
      .select(col("cohort"),
        (datediff(date_trunc("week", col("ts")), col("cohort")) / lit(7))
          .cast("long").as("week_offset"), col("v"))
      .filter(col("week_offset") <= maxOffset)
      .groupBy("cohort", "week_offset")
      .agg(sum(col("v")).as("value_micros"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
    // BOUNDED window: per-cohort offset grid (≤ maxOffset+1 rows)
    val w = Window.partitionBy("cohort").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byOffset.withColumn("cum_value_micros", sum(col("value_micros")).over(w))
      .join(sizes, "cohort")
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("cohort_size"), col("value_micros"),
        col("cum_value_micros"),
        floor(col("cum_value_micros").cast("double") / col("cohort_size"))
          .cast("long").as("ltv_micros"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Time-to-convert distribution — funnel latency percentiles every
    * growth team tracks: per user the delay from the first `fromType`
    * event to the first `toType` event AFTER it; exact p50/p90/p99
    * from [[graft.operators.Sketches.exactQuantiles]]'s
    * distributed-rank primitive (no global window).
    *
    * @return one row per requested quantile: (q_micros, delay_s).
    */
  def timeToConvert(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, fromType: String, toType: String,
                    qs: Seq[Long] = Seq(500000L, 900000L, 990000L))
      : DataFrame = {
    val e = events.select(col(userCol).as("u"), col(typeCol).as("t"),
      unix_micros(col(tsCol)).as("ts_us"))
    val starts = e.filter(col("t") === fromType)
      .groupBy("u").agg(min(col("ts_us")).as("t0"))
    val conv = e.filter(col("t") === toType)
      .join(starts, "u")
      .filter(col("ts_us") > col("t0"))
      .groupBy("u").agg(min(col("ts_us") - col("t0")).as("d_us"))
    val delays = conv.select(
      floor(col("d_us") / lit(1000000L)).cast("long").as("delay_s"),
      col("u").as("tie"))
    Sketches.exactQuantiles(delays, "delay_s", "tie", qs)
  }

  /** First-order behavior transition matrix (Markov chain over event
    * types): per-user event sequences ordered by `(ts, tieCols…)`
    * yield `(src, dst)` adjacent-pair counts and row-normalized
    * transition probabilities in integer micros.
    *
    * 100 TB shape: ONE per-user-partitioned window (`lag`) — user
    * partitions are bounded by per-user activity, never a global
    * sort — then a map-side-combined pair count; the row-total window
    * runs over the #types² matrix, not the corpus.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, tieCols: Seq[String]): DataFrame = {
    val e = events.select((Seq(col(userCol).as("u"), col(tsCol).as("ts"),
      col(typeCol).as("et")) ++ tieCols.map(col)): _*)
    val w = Window.partitionBy("u")
      .orderBy((col("ts") +: tieCols.map(col)): _*)
    val pairs = e.withColumn("src", lag(col("et"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("et").as("dst"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy("src")
    pairs
      .withColumn("p_micros",
        floor(lit(1000000L) * col("n") / sum(col("n")).over(tot)))
      .orderBy("src", "dst")
  }

  /** Longest consecutive-day activity streaks — the engagement
    * leaderboard (and the classic gaps-and-islands exercise): per
    * user the distinct active days, island key = day-number minus
    * per-user rank (constant within a run of consecutive days),
    * longest island per user, top-k users by (streak desc, user).
    * Everything integer; per-user windows only; rank quantized
    * before the limit.
    *
    * @return (user_id, n_days, best_len) top-k rows.
    */
  def longestStreaks(events: DataFrame, userCol: String, tsCol: String,
                     k: Int = 20): DataFrame = {
    val days = events.select(col(userCol).as("u"),
      date_trunc("day", col(tsCol)).cast("date").as("d")).distinct()
    // BOUNDED per-user window over that user's active days
    val w = Window.partitionBy("u").orderBy("d")
    val isl = days
      .withColumn("grp",
        datediff(col("d"), to_date(lit("1970-01-01"))).cast("long") -
          row_number().over(w))
      .groupBy(col("u"), col("grp")).agg(count(lit(1)).as("len"))
    val best = isl.groupBy(col("u")).agg(max(col("len")).as("best_len"))
    val act = days.groupBy(col("u")).agg(count(lit(1)).as("n_days"))
    best.join(act, "u")
      .select(col("u").as("user_id"), col("n_days"), col("best_len"))
      .orderBy(desc("best_len"), col("user_id"))
      .limit(k)
  }

  /** Week-over-week growth — the topline trend table: per ISO week
    * the event count and its growth vs the previous week present in
    * the data (`⌊1e6·(n−prev)/prev⌋`; the first week reads NULL).
    * One fold + one lag over the bounded week grid.
    *
    * @return (week, n, prev_n, growth_micros) ordered by week.
    */
  def weekOverWeek(events: DataFrame, tsCol: String): DataFrame = {
    val weekly = events
      .groupBy(date_trunc("week", col(tsCol)).as("wk"))
      .agg(count(lit(1)).as("n"))
    // BOUNDED global window: the calendar week grid
    val w = Window.orderBy("wk")
    weekly
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .select(date_format(col("wk"), "yyyy-MM-dd").as("week"), col("n"),
        col("prev_n"),
        when(col("prev_n").isNull || col("prev_n") === 0,
          lit(null).cast("long"))
          .otherwise(floor(lit(1000000L) * (col("n") - col("prev_n")) /
            col("prev_n")).cast("long")).as("growth_micros"))
      .orderBy(col("week"))
  }

  /** Relative risk + odds ratio of an outcome given a binary
    * exposure — the epidemiology 2×2 readout pointed at behavior
    * (is a weekend event likelier to be a purchase):
    * `RR = (a/(a+b)) / (c/(c+d))`, `OR = (a·d)/(b·c)` over the exact
    * 2×2 counts (a = exposed-positive … d = unexposed-negative), one
    * floored division each. Degenerate cells report 0.
    *
    * @return one row (a, b, c, d, rr_micros, or_micros).
    */
  def relativeRisk(df: DataFrame, exposedCol: String,
                   outcomeCol: String): DataFrame = {
    val e = col(exposedCol).cast("long")
    val y = col(outcomeCol).cast("long")
    val s = df.agg(
      sum(e * y).as("a"), sum(e * (lit(1L) - y)).as("b"),
      sum((lit(1L) - e) * y).as("c"),
      sum((lit(1L) - e) * (lit(1L) - y)).as("d"))
    s.select(col("a"), col("b"), col("c"), col("d"),
      when(col("a") + col("b") === 0 || col("c") + col("d") === 0 ||
          col("c") === 0, lit(0L))
        .otherwise(floor(lit(1e6) *
          (col("a").cast("double") / (col("a") + col("b"))) /
          (col("c").cast("double") / (col("c") + col("d"))))
          .cast("long")).as("rr_micros"),
      when(col("b") === 0 || col("c") === 0, lit(0L))
        .otherwise(floor(lit(1e6) * (col("a") * col("d")).cast("double")
          / (col("b") * col("c"))).cast("long")).as("or_micros"))
  }

  /** First-touch distribution — which event type OPENS a user's
    * history (the acquisition-funnel entry mix; last-touch is the
    * attribution family's job): per user the first event under the
    * total (ts, tie) order, then type counts and shares. One
    * per-user bounded window + one type fold.
    *
    * @return (event_type, n_users, share_micros) ordered by type.
    */
  def firstTouch(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
    val first = events
      .select(col(userCol), col(typeCol).as("et"), col(tsCol),
        col(tieCol))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val byType = first.groupBy(col("et").as("event_type"))
      .agg(count(lit(1)).as("n_users"))
    val tot = byType.agg(sum(col("n_users")).as("n"))
    byType.crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_users"),
        floor(lit(1000000L) * col("n_users") / col("n")).cast("long")
          .as("share_micros"))
      .orderBy(col("event_type"))
  }

  /** Weekday × hour activity grid — the traffic heatmap every ops
    * dashboard renders (and the capacity-planning input): counts and
    * corpus share per (weekday, hour) cell. One fold; the grid is
    * 7×24 rows.
    *
    * @return (weekday, hour, n, share_micros) ordered — weekday
    *         1 = Sunday (the Spark `dayofweek` convention).
    */
  def activityGrid(events: DataFrame, tsCol: String): DataFrame = {
    val cells = events
      .groupBy(dayofweek(col(tsCol)).cast("long").as("weekday"),
        hour(col(tsCol)).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum(col("n")).as("tot"))
    cells.crossJoin(broadcast(tot))
      .select(col("weekday"), col("hour"), col("n"),
        floor(lit(1000000L) * col("n") / col("tot")).cast("long")
          .as("share_micros"))
      .orderBy(col("weekday"), col("hour"))
  }

  /** Lead–lag cross-correlation between two event-type day series —
    * does A lead B (clicks today, purchases in k days): for each lag
    * 0..maxLag the Pearson r between A's count on day d and B's on
    * day d+k, over the dense indexed day grid (typeCorrelationMatrix
    * is this at lag 0). All sums are exact integers per lag; r is
    * the one fixed IEEE expression of the corr-matrix convention.
    *
    * Shape: one day fold, one ≤#days-row index window, one
    * (maxLag+1)-way shifted self-join of the day grid — everything
    * calendar-bounded.
    *
    * @return (lag, n_days, r_micros) for lags 0..maxLag, ordered.
    */
  def leadLagCorr(events: DataFrame, tsCol: String, typeCol: String,
                  typeA: String, typeB: String,
                  maxLag: Int = 7): DataFrame = {
    val spark = events.sparkSession
    val daily = events
      .filter(col(typeCol).isin(typeA, typeB))
      .groupBy(date_trunc("day", col(tsCol)).as("bucket"),
        col(typeCol).as("et"))
      .agg(count(lit(1)).as("n"))
    val days = daily.select(col("bucket")).distinct()
    // BOUNDED global window: the calendar day grid
    val idx = days.withColumn("i",
      row_number().over(Window.orderBy("bucket")).cast("long"))
    def series(t: String, out: String) = idx
      .join(daily.filter(col("et") === t), Seq("bucket"), "left")
      .select(col("i"), coalesce(col("n"), lit(0L)).as(out))
    val a = series(typeA, "na")
    val b = series(typeB, "nb")
    val lags = spark.range(0, maxLag + 1L, 1, 1).select(col("id").as("lag"))
    a.crossJoin(broadcast(lags))
      .join(b.withColumnRenamed("i", "j"),
        col("i") + col("lag") === col("j"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"), sum(col("na")).as("sx"),
        sum(col("nb")).as("sy"), sum(col("na") * col("nb")).as("sxy"),
        sum(col("na") * col("na")).as("sxx"),
        sum(col("nb") * col("nb")).as("syy"))
      .select(col("lag"), col("n_days"),
        when(col("n_days") * col("sxx") - col("sx") * col("sx") === 0 ||
            col("n_days") * col("syy") - col("sy") * col("sy") === 0,
          lit(0L))
          .otherwise(floor(lit(1e6) *
            (col("n_days") * col("sxy") - col("sx") * col("sy"))
              .cast("double") /
            sqrt((col("n_days") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("n_days") * col("syy") - col("sy") * col("sy"))))
            .cast("long")).as("r_micros"))
      .orderBy(col("lag"))
  }

  /** Audience churn across a time split — the retention-adjacent
    * set question ("how much of the early audience is still here"):
    * active-user sets before/after the cut compared by Jaccard,
    * churned share (early-only / early) and new share (late-only /
    * late). Three distinct folds + one semi-join-sized intersection
    * count — no windows.
    *
    * @param cutUs epoch-micros split point.
    * @return one row (n_early, n_late, n_both, jaccard_micros,
    *         churn_micros, new_micros).
    */
  def audienceChurn(events: DataFrame, userCol: String, tsCol: String,
                    cutUs: Long): DataFrame = {
    val e = events.select(col(userCol).as("u"),
      unix_micros(col(tsCol)).as("ts_us"))
    val early = e.filter(col("ts_us") < cutUs).select("u").distinct()
      .localCheckpoint(true)
    val late = e.filter(col("ts_us") >= cutUs).select("u").distinct()
      .localCheckpoint(true)
    val both = early.join(late, Seq("u"), "left_semi")
      .agg(count(lit(1)).as("n_both"))
    early.agg(count(lit(1)).as("n_early"))
      .crossJoin(late.agg(count(lit(1)).as("n_late")))
      .crossJoin(both)
      .select(col("n_early"), col("n_late"), col("n_both"),
        when(col("n_early") + col("n_late") - col("n_both") === 0,
          lit(0L))
          .otherwise(floor(lit(1000000L) * col("n_both") /
            (col("n_early") + col("n_late") - col("n_both")))
            .cast("long")).as("jaccard_micros"),
        when(col("n_early") === 0, lit(0L))
          .otherwise(floor(lit(1000000L) *
            (col("n_early") - col("n_both")) / col("n_early"))
            .cast("long")).as("churn_micros"),
        when(col("n_late") === 0, lit(0L))
          .otherwise(floor(lit(1000000L) *
            (col("n_late") - col("n_both")) / col("n_late"))
            .cast("long")).as("new_micros"))
  }

  /** Day-over-day movers — the "what changed" report: per (type,
    * day) counts, each day's delta against the SAME TYPE's previous
    * calendar day (lag over the bounded per-type day grid; a missing
    * previous day reads as 0), top-k by absolute move with a full
    * deterministic tie order — quantized-integer ranking before the
    * limit, the qG5 rule.
    *
    * @return (event_type, day, n, prev_n, delta) top-k rows.
    */
  def dailyMovers(events: DataFrame, tsCol: String, typeCol: String,
                  k: Int = 10): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("et"),
        date_trunc("day", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
    // BOUNDED per-type window: the calendar grid of one type
    val w = Window.partitionBy(col("et")).orderBy(col("bucket"))
    daily
      .withColumn("prev_n", coalesce(lag(col("n"), 1).over(w), lit(0L)))
      .select(col("et").as("event_type"),
        date_format(col("bucket"), "yyyy-MM-dd").as("day"),
        col("n"), col("prev_n"), (col("n") - col("prev_n")).as("delta"))
      .orderBy(abs(col("delta")).desc, col("event_type"), col("day"))
      .limit(k)
  }

  /** Variance-to-mean dispersion index of the daily count series —
    * the Poisson overdispersion check beside [[burstiness]]'s
    * per-user number (a Poisson-arrival day series has D ≈ 1;
    * campaign-driven traffic is overdispersed, metronome bots
    * under): `D = s²/m̄` over daily counts, from exact integer day
    * folds (the [[graft.operators.Stats]] moment convention), one
    * final division.
    *
    * @return one row (n_days, mean_milli, var_milli,
    *         dispersion_micros); < 2 days reports 0.
    */
  def dispersionIndex(events: DataFrame, tsCol: String): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"))
    val s = daily.agg(count(lit(1)).as("d"), sum(col("n")).as("sn"),
      sum(col("n") * col("n")).as("qn"))
    val mean = col("sn").cast("double") / col("d")
    val varHat = (col("qn").cast("double") -
      col("sn").cast("double") * col("sn") / col("d")) / (col("d") - 1)
    s.select(col("d").as("n_days"),
      floor(lit(1000.0) * mean).cast("long").as("mean_milli"),
      floor(lit(1000.0) * varHat).cast("long").as("var_milli"),
      when(col("d") < 2 || col("sn") === 0, lit(0L))
        .otherwise(floor(lit(1e6) * varHat / mean).cast("long"))
        .as("dispersion_micros"))
  }

  /** Within-SESSION event-type co-occurrence lift — do purchases and
    * errors happen in the SAME SITTING ([[typeOverlap]] asks the
    * same of whole users; sessions localize it to intent): sessions
    * from [[sessionize]]'s gap rule, per pair
    * `lift = P(a,b)/(P(a)·P(b))` over session incidence, floored to
    * micros from exact integer counts.
    *
    * @return (a, b, n_ab, n_a, n_b, lift_micros) for a < b, ordered.
    */
  def sessionCooccur(events: DataFrame, userCol: String, tsCol: String,
                     typeCol: String, tieCol: String,
                     gapUs: Long): DataFrame = {
    val flagged = events
      .select(col(userCol).as("u"), col(typeCol).as("et"),
        unix_micros(col(tsCol)).as("ts_us"), col(tieCol))
      .withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1)
          .over(Window.partitionBy(col("u"))
            .orderBy(col("ts_us"), col(tieCol))) > gapUs, 1L)
          .otherwise(when(lag(col("ts_us"), 1)
            .over(Window.partitionBy(col("u"))
              .orderBy(col("ts_us"), col(tieCol))).isNull, 1L)
            .otherwise(0L)))
      .withColumn("sid", sum(col("new_s"))
        .over(Window.partitionBy(col("u"))
          .orderBy(col("ts_us"), col(tieCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val inc = flagged.select(col("u"), col("sid"), col("et")).distinct()
      .localCheckpoint(true) // degrees AND both wedge sides
    val tot = inc.select(col("u"), col("sid")).distinct()
      .agg(count(lit(1)).as("n_sess"))
    val deg = inc.groupBy(col("et")).agg(count(lit(1)).as("d"))
    val pairs = inc.select(col("et").as("a"), col("u"), col("sid"))
      .join(inc.select(col("et").as("b"), col("u"), col("sid")),
        Seq("u", "sid"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(deg.select(col("et").as("a"), col("d").as("n_a")), "a")
      .join(deg.select(col("et").as("b"), col("d").as("n_b")), "b")
      .crossJoin(broadcast(tot))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        floor(lit(1e6) * (col("n_ab").cast("double") * col("n_sess")) /
          (col("n_a") * col("n_b"))).cast("long").as("lift_micros"))
      .orderBy(col("a"), col("b"))
  }

  /** Audience overlap between event types — per type pair the
    * Jaccard of their USER SETS (`|A∩B| / (|A|+|B|−|A∩B|)`): do the
    * people who click also purchase, or are the segments disjoint.
    * The categorical-audience face of the daily-series Pearson
    * (typeCorrelationMatrix). One distinct pass, one user-keyed
    * self-join of the (type, user) incidence (each user contributes
    * its own type-pair wedges — deg²_user per user, bounded by the
    * type-alphabet size), two integer folds.
    *
    * @return (a, b, cn, n_a, n_b, jaccard_micros) for a < b, ordered.
    */
  def typeOverlap(events: DataFrame, typeCol: String,
                  userCol: String): DataFrame = {
    val inc = events.select(col(typeCol).as("t"), col(userCol).as("u"))
      .distinct()
      .localCheckpoint(true) // degree fold AND both wedge sides
    val deg = inc.groupBy(col("t")).agg(count(lit(1)).as("d"))
    val pairs = inc.select(col("t").as("a"), col("u"))
      .join(inc.select(col("t").as("b"), col("u")), "u")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"))
    pairs
      .join(deg.select(col("t").as("a"), col("d").as("n_a")), "a")
      .join(deg.select(col("t").as("b"), col("d").as("n_b")), "b")
      .select(col("a"), col("b"), col("cn"), col("n_a"), col("n_b"),
        floor(lit(1000000L) * col("cn") /
          (col("n_a") + col("n_b") - col("cn"))).cast("long")
          .as("jaccard_micros"))
      .orderBy(col("a"), col("b"))
  }

  /** Stationary distribution of the [[transitionMatrix]] chain by
    * FIXED-ROUND power iteration — where the session random walk
    * spends its time in the long run (the behavioral PageRank over
    * event types): `π_{t+1}[j] = Σ_i π_t[i]·n_ij/n_i` from a uniform
    * start, each per-edge term `⌊π_i·n_ij/n_i⌋` quantized to a long
    * BEFORE the per-state fold (order-free — the
    * [[graft.operators.GraphAnalytics]] PageRank rule), so the fixed
    * `rounds` computation unrolls exactly in a SQL oracle. Floors
    * leak ≤ k micros of mass per round (reported, not renormalized —
    * renormalization would re-divide and double-quantize).
    *
    * Shape per round: one join of the k²-bounded transition-count
    * table against the k-row π table + one state fold — k = #event
    * types, everything broadcast-sized after the one count pass.
    *
    * @return (state, pi_micros) ordered by state.
    */
  def stationaryDistribution(events: DataFrame, userCol: String,
                             tsCol: String, typeCol: String,
                             tieCols: Seq[String],
                             rounds: Int = 4): DataFrame = {
    val e = events.select((Seq(col(userCol).as("u"), col(tsCol).as("ts"),
      col(typeCol).as("et")) ++ tieCols.map(col)): _*)
    val w = Window.partitionBy("u")
      .orderBy((col("ts") +: tieCols.map(col)): _*)
    val counts = e.withColumn("src", lag(col("et"), 1).over(w))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("et").as("dst"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // reused every round
    val ca = counts.groupBy("src").agg(sum(col("n")).as("c_src"))
    val trans = counts.join(ca, "src").localCheckpoint(true)
    val states = counts.select(col("src").as("state"))
      .unionAll(counts.select(col("dst").as("state"))).distinct()
      .localCheckpoint(true)
    val k = states.count()
    var pi = states.select(col("state"),
      lit(1000000L / math.max(k, 1L)).as("pi_micros"))
    for (_ <- 1 to rounds) {
      pi = trans
        .join(pi.select(col("state").as("src"), col("pi_micros")), "src")
        .select(col("dst").as("state"),
          floor(col("pi_micros") * col("n") / col("c_src")).cast("long")
            .as("t"))
        .groupBy(col("state")).agg(sum(col("t")).as("pi_micros"))
    }
    states.join(pi, Seq("state"), "left")
      .select(col("state"), coalesce(col("pi_micros"), lit(0L))
        .as("pi_micros"))
      .orderBy("state")
  }

  /** Per-user sequence likelihood under the GLOBAL first-order Markov
    * model — the behavioral-anomaly score a fraud/bot screen ranks
    * users by: train [[transitionMatrix]]-style counts over everyone,
    * then score each user's own event chain,
    * `logprob = Σ round(1e6·ln((c_ab + 1)/(c_a + V)))` (add-1 over the
    * V observed event types — unseen transitions stay finite). A user
    * whose chain fights the population model (scripted loops, scanner
    * sweeps) scores far below the per-transition average.
    *
    * Per-pair integer-micro log-probs make the per-user sum
    * fold-order-free; the chain order is total ((ts, tieCols) window,
    * the [[transitionMatrix]] convention); one count fold + one
    * broadcast-sized model join.
    *
    * @return (user, n_trans, logprob_micros, avg_micros) — users with
    *         ≥ 1 transition, ordered; avg = ⌊logprob/n_trans⌋.
    */
  def sequenceScore(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, tieCols: Seq[String]): DataFrame = {
    val e = events.select((Seq(col(userCol).as("u"), col(tsCol).as("ts"),
      col(typeCol).as("et")) ++ tieCols.map(col)): _*)
    val w = Window.partitionBy("u")
      .orderBy((col("ts") +: tieCols.map(col)): _*)
    val pairs = e.withColumn("src", lag(col("et"), 1).over(w))
      .filter(col("src").isNotNull)
      .select(col("u"), col("src"), col("et").as("dst"))
      .localCheckpoint(true) // model counts AND scoring read it
    val cab = pairs.groupBy("src", "dst").agg(count(lit(1)).as("c_ab"))
    val ca = pairs.groupBy("src").agg(count(lit(1)).as("c_a"))
    val v = e.agg(countDistinct(col("et")).as("v"))
    val model = cab.join(ca, "src").crossJoin(broadcast(v))
      .select(col("src"), col("dst"),
        round(lit(1e6) * log((col("c_ab") + lit(1L)).cast("double")
          / (col("c_a") + col("v")))).cast("long").as("lp_micros"))
    pairs.join(broadcast(model), Seq("src", "dst"))
      .groupBy(col("u").as(userCol))
      .agg(count(lit(1)).as("n_trans"),
        sum(col("lp_micros")).as("logprob_micros"))
      .withColumn("avg_micros",
        floor(col("logprob_micros") / col("n_trans")).cast("long"))
      .orderBy(userCol)
  }

  /** Last-touch attribution: assign each conversion event the LATEST
    * qualifying touch event of the same user at-or-before it within
    * `windowMicros` — the as-of join ([[AsOfJoin.asOf]]) specialized
    * to the marketing-attribution contract. Equal-timestamp touches
    * collapse to the max event id BEFORE the join (struct max-fold —
    * deterministic carry); conversions with no touch in the window
    * attribute to NULL (left-outer + staleness bound).
    *
    * 100 TB shape: inherits the as-of join's single key-partitioned
    * sort — no inequality join, no per-conversion probe.
    *
    * @return (conv_id, touch_id, touch_type), ordered by conv_id.
    */
  def lastTouchAttribution(events: DataFrame, userCol: String,
                           tsCol: String, typeCol: String, idCol: String,
                           convType: String, touchTypes: Seq[String],
                           windowMicros: Long): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), col(tsCol).as("ts"),
        col(idCol).as("conv_id"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .groupBy(col(userCol).as("u"), col(tsCol).as("ts"))
      .agg(max(struct(col(idCol).as("tid"), col(typeCol).as("ttype")))
        .as("m"))
      .select(col("u"), col("ts"), col("m.tid").as("touch_id"),
        col("m.ttype").as("touch_type"))
    AsOfJoin.asOf(conv, touch, "u", "ts", Seq("touch_id", "touch_type"),
        "backward", windowMicros)
      .select(col("conv_id"), col("asof_touch_id").as("touch_id"),
        col("asof_touch_type").as("touch_type"))
      .orderBy("conv_id")
  }

  /** Per-user behavioral entropy — Shannon entropy of each user's
    * event-type distribution, the diversity feature a bot/fraud
    * screen reads next to [[sequenceScore]] (single-action scripts
    * sit at 0; organic users spread). Uses the exact-quantized
    * identity `H = ln n − (Σ_t c_t·ln c_t)/n`: per-type terms
    * `c_t·round(1e6·ln c_t)` are exact BIGINTs (order-free fold),
    * then ONE fixed IEEE expression per user. Micro-nats.
    *
    * @return (userCol, n_events, n_types, entropy_micros) ordered.
    */
  def behaviorEntropy(events: DataFrame, userCol: String,
                      typeCol: String): DataFrame = {
    val ct = events.groupBy(col(userCol), col(typeCol))
      .agg(count(lit(1)).as("c"))
    ct.groupBy(col(userCol))
      .agg(sum(col("c")).as("n_events"), count(lit(1)).as("n_types"),
        sum(col("c") * round(log(col("c").cast("double")) * lit(1e6))
          .cast("long")).as("slc"))
      .select(col(userCol), col("n_events"), col("n_types"),
        (round(log(col("n_events").cast("double")) * lit(1e6)).cast("long")
          - floor(col("slc").cast("double") / col("n_events")).cast("long"))
          .as("entropy_micros"))
      .orderBy(col(userCol))
  }

  /** Linear (equal-credit) multi-touch attribution — the fairness
    * companion to [[lastTouchAttribution]]: every qualifying touch in
    * the lookback window splits the conversion's credit. Credit is
    * exact integer micros: each touch gets `⌊1e6/n⌋` and the LAST
    * touch (latest ts, id tiebreak) absorbs the remainder, so every
    * conversion's credits sum to exactly 1e6 — additive downstream
    * rollups stay exact. One user-keyed band join (per-user event
    * lists bound the pairs) + one conv-keyed fold.
    *
    * @return (conv_id, touch_id, touch_type, credit_micros) ordered.
    */
  def linearAttribution(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, idCol: String, convType: String,
                        touchTypes: Seq[String],
                        windowMicros: Long): DataFrame = {
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("cts"),
        col(idCol).as("conv_id"))
    val touch = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("u"), unix_micros(col(tsCol)).as("tts"),
        col(idCol).as("touch_id"), col(typeCol).as("touch_type"))
    val j = conv.join(touch, Seq("u"))
      .filter(col("tts") <= col("cts")
        && col("tts") > col("cts") - windowMicros)
      .localCheckpoint(true) // folded for n + last, then re-credited
    val per = j.groupBy(col("conv_id"))
      .agg(count(lit(1)).as("n_touch"),
        max(struct(col("tts"), col("touch_id"))).as("last"))
    j.join(per, Seq("conv_id"))
      .select(col("conv_id"), col("touch_id"), col("touch_type"),
        (floor(lit(1000000L) / col("n_touch")).cast("long")
          + when(col("tts") === col("last.tts")
              && col("touch_id") === col("last.touch_id"),
            lit(1000000L) - col("n_touch")
              * floor(lit(1000000L) / col("n_touch")).cast("long"))
            .otherwise(lit(0L))).as("credit_micros"))
      .orderBy(col("conv_id"), col("touch_id"))
  }

  /** Robust (median/MAD) outlier screen per group.
    *
    * Values are quantized to integer micros (`⌊1e6·v⌋` — one IEEE
    * multiply+floor, deterministic), then per group: `med2` = DOUBLED
    * median of the quantized values (exact BIGINT even at
    * even-count interpolation), `mad2` = doubled median of doubled
    * absolute deviations `|2v−med2|` (again exact), and a row is an
    * outlier iff `4·|v − med| > 3·MAD·4`, i.e. `2·|2v−med2| > 3·mad2`
    * — the whole Hampel test in exact integer arithmetic.
    *
    * Caveat (documented trade): `percentile` is Spark's exact
    * aggregate, which buffers per-group value COUNTS on the reducer —
    * right for grouped medians over bounded value grids; for unbounded
    * high-cardinality groups use [[Sketches.quantiles]] and accept
    * rank-error tolerance instead.
    *
    * @return per group: (group, n_rows, med2_micros, mad2_micros,
    *         n_outliers).
    */
  def robustOutliers(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame = {
    val e = df.select(col(groupCol).as("g"),
      floor(col(valueCol) * lit(1e6)).cast("long").as("v"))
    val med = e.groupBy("g").agg(
      count(lit(1)).as("n_rows"),
      expr("CAST(2 * percentile(v, 0.5) AS BIGINT)").as("med2"))
    val dev = e.join(med, "g")
      .withColumn("adev2", abs(lit(2L) * col("v") - col("med2")))
    val mad = dev.groupBy("g").agg(
      expr("CAST(2 * percentile(adev2, 0.5) AS BIGINT)").as("mad4"))
    dev.join(mad, "g")
      .groupBy(col("g"), col("med2").as("med2_micros"), col("mad4"),
        col("n_rows"))
      .agg(sum(when(lit(2L) * col("adev2") > lit(3L) * col("mad4"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .select(col("g").as(groupCol), col("n_rows"),
        col("med2_micros"), col("mad4").as("mad4_micros"),
        col("n_outliers"))
      .orderBy(groupCol)
  }

  /** UCB1 exploration scores (Auer, Cesa-Bianchi & Fischer 2002) per
    * arm from the interaction log — the deterministic bandit readout a
    * recommender replays offline: `mean_reward + √(2·ln N / n)`, the
    * arm with the highest bound is what UCB1 would pull next. Pulls
    * and wins are exact integer folds; the bound is ONE fixed IEEE
    * expression over them (the [[Stats.welchT]] convention), floored
    * to micros. Cold arms (few pulls) surface through the radical —
    * the exploration term the greedy mean-ranking lacks.
    *
    * @return (arm, n_pulls, n_wins, ucb_micros) ordered by arm.
    */
  def ucbScores(events: DataFrame, armCol: Column,
                rewardCol: Column): DataFrame = {
    val g = events.select(armCol.as("arm"), rewardCol.cast("long").as("r"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n_pulls"), sum(col("r")).as("n_wins"))
    g.crossJoin(broadcast(g.agg(sum(col("n_pulls")).as("big_n"))))
      .select(col("arm"), col("n_pulls"), col("n_wins"),
        floor(lit(1e6) * (col("n_wins") / col("n_pulls") +
            sqrt(lit(2.0) * log(col("big_n")) / col("n_pulls"))))
          .cast("long").as("ucb_micros"))
      .orderBy(col("arm"))
  }

  /** DAU/MAU stickiness per month — the engagement-health ratio
    * (what fraction of a month's actives show up on an average day).
    * The corpus collapses map-side to (day, user) then (day) and
    * (month) count tables; the ratio is exact:
    * `⌊1e6·Σdau/(n_days·mau)⌋` over integer folds.
    *
    * @return (month, n_days, sum_dau, mau, stickiness_micros)
    *         ordered by month.
    */
  def stickiness(events: DataFrame, userCol: String,
                 tsCol: String): DataFrame = {
    val dayUser = events.select(
        date_trunc("day", col(tsCol)).as("day"),
        date_trunc("month", col(tsCol)).as("month"),
        col(userCol).as("u"))
      .distinct().localCheckpoint(true) // feeds both the day and month folds
    val dau = dayUser.groupBy(col("month"), col("day"))
      .agg(count(lit(1)).as("dau"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
    val mau = dayUser.select(col("month"), col("u")).distinct()
      .groupBy(col("month")).agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("month"))
      .select(date_format(col("month"), "yyyy-MM").as("month"),
        col("n_days"), col("sum_dau"), col("mau"),
        floor(lit(1e6) * col("sum_dau") / (col("n_days") * col("mau")))
          .cast("long").as("stickiness_micros"))
      .orderBy(col("month"))
  }

  /** Kaplan–Meier retention curve over the event log (Kaplan & Meier
    * 1958) — the churn survival readout: a user "churns" on their
    * LAST active day; users still active on the log's final day are
    * censored (they leave the risk set without a churn event). Per
    * observed day `S(t) = Π_{i≤t} (1 − d_i/n_i)` with `n_i` the
    * at-risk count entering day i and `d_i` that day's churns.
    *
    * Determinism: the corpus collapses to the ≤ #days table; each
    * day's factor becomes an integer-micro LOG term
    * `round(1e6·ln((n−d)/n))` (one IEEE ln of an exact rational), the
    * cumulative window sums INTEGERS (order-free), and the survival
    * is one `exp` expression of that integer — so the curve replays
    * engine-exact. A day that empties the risk set gets the −1e12
    * sentinel (exp underflows to exactly 0 in both engines).
    *
    * @return (day, n_risk, n_churn, km_log_micros, survival_micros)
    *         ordered by day.
    */
  def kaplanMeier(events: DataFrame, userCol: String,
                  tsCol: String): DataFrame = {
    val lastDay = events
      .groupBy(col(userCol).as("u"))
      .agg(max(date_trunc("day", col(tsCol))).as("last_day"))
      .localCheckpoint(true)
    val maxDay = lastDay.agg(max(col("last_day")).as("max_day"))
    val byDay = lastDay.crossJoin(broadcast(maxDay))
      .groupBy(col("last_day").as("day"))
      .agg(count(lit(1)).as("n_last"),
        sum(when(col("last_day") < col("max_day"), 1L).otherwise(0L))
          .as("n_churn"))
    // BOUNDED global windows: input is the per-DAY aggregate (calendar
    // grid, ~365 rows/year), never the event corpus
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    byDay
      .crossJoin(broadcast(byDay.agg(sum(col("n_last")).as("n_users"))))
      .withColumn("n_risk",
        col("n_users") - coalesce(sum(col("n_last")).over(wPrev), lit(0L)))
      .withColumn("term", when(col("n_risk") > col("n_churn"),
          round(log((col("n_risk") - col("n_churn"))
            / col("n_risk").cast("double")) * lit(1e6)).cast("long"))
        .otherwise(lit(-1000000000000L)))
      .withColumn("km_log_micros", sum(col("term")).over(w))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_risk"), col("n_churn"), col("km_log_micros"),
        floor(lit(1e6) * exp(col("km_log_micros") / lit(1e6)))
          .cast("long").as("survival_micros"))
      .orderBy(col("day"))
  }

  /** RFM customer scoring (Hughes 1994) — the classic
    * recency/frequency/monetary segmentation a CRM runs over the
    * event log: per user the last-activity time, event count, and
    * value sum, each quintile-scored 1–5 so `555` is the
    * most-recently-active, most-frequent, highest-spend segment.
    * Quintiles come from [[Features.quantileBins]]'s exact
    * distributed global rank (range partition + per-partition
    * row_number + O(#partitions) offsets — never a single global
    * window over #users rows), tie-broken by user id, so every score
    * is engine-exact and the oracle replays them with row_number.
    *
    * @return (userCol, last_ts_us, freq, monetary_micros, r_score,
    *         f_score, m_score, rfm) ordered by user.
    */
  def rfm(events: DataFrame, userCol: String, tsCol: String,
          valueCol: String): DataFrame = {
    val per = events.groupBy(col(userCol))
      .agg(unix_micros(max(col(tsCol))).as("last_ts_us"),
        count(lit(1)).as("freq"),
        sum(floor(col(valueCol) * lit(1e6)).cast("long"))
          .as("monetary_micros"))
      .localCheckpoint(true) // ranked three times below
    def score(metric: String, out: String) =
      Features.quantileBins(per.select(col(metric), col(userCol)),
          metric, userCol, 5)
        .select(col(userCol), (col("bin") + 1L).as(out))
    per.join(score("last_ts_us", "r_score"), Seq(userCol))
      .join(score("freq", "f_score"), Seq(userCol))
      .join(score("monetary_micros", "m_score"), Seq(userCol))
      .select(col(userCol), col("last_ts_us"), col("freq"),
        col("monetary_micros"), col("r_score"), col("f_score"),
        col("m_score"),
        (col("r_score") * 100L + col("f_score") * 10L + col("m_score"))
          .as("rfm"))
      .orderBy(col(userCol))
  }

  /** Per-user burstiness of the inter-event-time distribution (Goh &
    * Barabási 2008): B = (σ − μ)/(σ + μ) over a user's gaps — B → −1
    * for a metronome (bots fire on timers), ≈ 0 for Poisson arrivals,
    * → +1 for bursty humans. Gaps come from a USER-partitioned lag
    * window (bounded by one user's history); n, Σg, Σg² are exact
    * BIGINT folds and σ, B are ONE fixed IEEE expression per user
    * (σ² = (n·Σg² − (Σg)²)/n², computed cross-multiplied).
    *
    * @return (userCol, n_gaps, mean_gap_us, b_micros) for users with
    *         ≥ 2 gaps, ordered.
    */
  def burstiness(events: DataFrame, userCol: String, tsCol: String,
                 tieCol: String): DataFrame = {
    // BOUNDED per-user window: one user's events, never the corpus
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us"), col(tieCol))
    val gaps = events
      .select(col(userCol), unix_micros(col(tsCol)).as("ts_us"),
        col(tieCol))
      // gaps quantize to whole SECONDS before the folds: µs gaps
      // square past int64 (a month² of µs² ≈ 7e24); B is scale-free
      // so the resolution choice only needs to match the oracle
      .withColumn("g", floor((col("ts_us")
        - lag(col("ts_us"), 1).over(w)) / lit(1000000L)).cast("long"))
      .filter(col("g").isNotNull)
    val s = gaps.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sg"),
        sum(col("g") * col("g")).as("sgg"))
      .filter(col("n_gaps") >= 2)
    // σ·n = sqrt(n·Σg² − (Σg)²): exact integer radicand, one sqrt;
    // B = (σn − Σg)/(σn + Σg) — the n's cancel
    val sigmaN = sqrt((col("n_gaps") * col("sgg") - col("sg") * col("sg"))
      .cast("double"))
    s.select(col(userCol), col("n_gaps"),
        floor(col("sg").cast("double") / col("n_gaps")).cast("long")
          .as("mean_gap_s"),
        when(sigmaN + col("sg") === 0.0, lit(0L))
          .otherwise(floor(lit(1e6) * (sigmaN - col("sg"))
            / (sigmaN + col("sg"))).cast("long")).as("b_micros"))
      .orderBy(col(userCol))
  }

  /** Gap-based BATCH sessionization — the canonical event-stream
    * segmentation (a new session starts when a user is idle longer
    * than `gapUs`): per user, events ordered by (ts, tie) get a
    * session index via the lag-gap flag + running count, then one
    * fold per session. The batch twin of the streaming sessionizer
    * ([[graft.streaming.CardStream]]); windows are PARTITIONED BY
    * USER (bounded by one user's history — never a global sort), and
    * the (ts, tieCol) pair must be a per-user total order so the lag
    * is deterministic.
    *
    * @return (userCol, session_idx, n_events, start_us, end_us,
    *         duration_us) ordered — session_idx 1-based per user.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 tieCol: String, gapUs: Long): DataFrame = {
    // BOUNDED per-user windows: one user's events, never the corpus
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("ts_us"), col(tieCol))
    val flagged = events
      .select(col(userCol), unix_micros(col(tsCol)).as("ts_us"),
        col(tieCol))
      .withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L)
          .otherwise(when(lag(col("ts_us"), 1).over(w).isNull, 1L)
            .otherwise(0L)))
      .withColumn("session_idx", sum(col("new_s"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
      .orderBy(col(userCol), col("session_idx"))
  }

  /** Inter-event gap quantiles per event type — the behavioral SLO
    * table (how long until the next click): per user the consecutive
    * same-type gaps (a per-user bounded window), then EXACT type-1
    * (rank-selected, no interpolation) p50/p90/p99 per type — the
    * index `⌈p·n⌉` is pure integer arithmetic (`(9n+9) DIV 10`), so
    * the selected value is an exact long on both engines;
    * interpolated quantiles at non-dyadic p would carry a last-ulp
    * cross-engine risk.
    *
    * Shape: one per-user lag window + one per-TYPE rank window (the
    * partition key bounds each sort to one type's gaps) + one fold.
    *
    * @return (event_type, n_gaps, p50_us, p90_us, p99_us) ordered.
    */
  def gapQuantiles(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, tieCol: String): DataFrame = {
    val gaps = events
      .select(col(userCol), col(typeCol).as("et"),
        unix_micros(col(tsCol)).as("ts_us"), col(tieCol))
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1)
        .over(Window.partitionBy(col(userCol), col("et"))
          .orderBy(col("ts_us"), col(tieCol))))
      .filter(col("gap").isNotNull)
      .select(col("et"), col("gap"))
    val cnt = gaps.groupBy(col("et")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("et")).orderBy(col("gap"))
    gaps.withColumn("rn", row_number().over(w))
      .join(cnt, "et")
      .groupBy(col("et").as("event_type"), col("n").as("n_gaps"))
      .agg(
        max(when(col("rn") === expr("(n + 1) DIV 2"), col("gap")))
          .as("p50_us"),
        max(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("gap")))
          .as("p90_us"),
        max(when(col("rn") === expr("(99 * n + 99) DIV 100"),
          col("gap"))).as("p99_us"))
      .orderBy(col("event_type"))
  }

  /** One-row session health report over [[sessionize]] output — the
    * engagement dashboard numbers (bounce rate, session depth, dwell
    * time) from one pass over the session table: bounce = 1-event
    * session. All folds are exact integers; the three rates are one
    * floored division each.
    *
    * @return one row (n_sessions, n_bounce, bounce_micros,
    *         avg_events_milli, avg_duration_us).
    */
  def sessionStats(events: DataFrame, userCol: String, tsCol: String,
                   tieCol: String, gapUs: Long): DataFrame =
    sessionize(events, userCol, tsCol, tieCol, gapUs)
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1L, 1L).otherwise(0L))
          .as("n_bounce"),
        sum(col("n_events")).as("ne"),
        sum(col("duration_us")).as("du"))
      .select(col("n_sessions"), col("n_bounce"),
        floor(lit(1000000L) * col("n_bounce") / col("n_sessions"))
          .cast("long").as("bounce_micros"),
        floor(lit(1000L) * col("ne") / col("n_sessions")).cast("long")
          .as("avg_events_milli"),
        floor(col("du").cast("double") / col("n_sessions")).cast("long")
          .as("avg_duration_us"))

  /** Sequential pattern support (the length-2 core of
    * PrefixSpan/GSP, Pei et al. 2001 / Srikant & Agrawal 1996) —
    * which event FOLLOWS which across user journeys: a user supports
    * the pattern a→b iff some occurrence of `a` strictly precedes
    * some occurrence of `b` in their stream, which reduces EXACTLY to
    * `min ts(a) < max ts(b)` — so the whole mining pass is one
    * (user, type) min/max fold plus a per-user self-join over the
    * type-bounded per-user summary (|types|² rows per user, never
    * events²). Confidence divides by the antecedent's user support;
    * both ratios quantize to micros by flooring (the engine/oracle
    * replay convention).
    *
    * 100 TB shape: one map-side-combined groupBy, one user-keyed
    * join of two vocabulary-bounded tables, one (a, b) fold — every
    * stage keyed, nothing quadratic in events.
    *
    * @return (a, b, support, n_a, confidence_micros) for pairs with
    *         support ≥ `minSupport`, ordered (a, b).
    */
  def sequentialPairs(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, minSupport: Long): DataFrame = {
    val ut = events.groupBy(col(userCol).as("u"), col(typeCol).as("t"))
      .agg(min(col(tsCol)).as("first_ts"), max(col(tsCol)).as("last_ts"))
      .localCheckpoint(true) // both sides of the per-user pair join
    val sup = ut.select(col("u").as("ua"), col("t").as("a"),
        col("first_ts"))
      .join(ut.select(col("u").as("ub"), col("t").as("b"),
        col("last_ts")), col("ua") === col("ub"))
      .filter(col("a") =!= col("b") && col("first_ts") < col("last_ts"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support")) // (user, a, b) is unique here
    val na = ut.groupBy(col("t").as("a"))
      .agg(count(lit(1)).as("n_a"))
    sup.filter(col("support") >= minSupport)
      .join(na, Seq("a"))
      .select(col("a"), col("b"), col("support"), col("n_a"),
        floor(col("support") * lit(1000000L) / col("n_a")).cast("long")
          .as("confidence_micros"))
      .orderBy(col("a"), col("b"))
  }
}
