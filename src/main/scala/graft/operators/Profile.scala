package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass data profiling — the first thing anyone runs against a new
  * 100 TB table: per-column row/null/distinct counts and min/max, all
  * folded into a SINGLE aggregation job (one scan, one reduce; the
  * naive per-column loop costs |cols| scans).
  *
  * `exact = false` (the scale default) uses HLL distinct estimates
  * (KB-bounded state per column — see [[Sketches]]); `exact = true`
  * uses `count(DISTINCT)` per column, which Spark plans as an expand +
  * one shuffle — fine at audit scale, and SQL-reproducible for the
  * qX_profile gate row.
  */
object Profile {

  def summarize(df: DataFrame, cols: Seq[String],
                exact: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c))
         else hll_sketch_estimate(hll_sketch_agg(col(c), 12)))
          .as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row into one row per column
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"${c}__n").as("n_rows"),
        col(s"${c}__nulls").as("n_nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** One declarative data-quality constraint (the Deequ/expectation-
    * suite model, Schelter et al. 2018): a named metric over one
    * column plus a minimum fraction that must hold. */
  sealed trait Check {
    def name: String; def column: String; def minFrac: Double
    final def thresholdMicros: Long = math.round(minFrac * 1e6)
  }
  /** Fraction of rows with `column` non-null ≥ `minFrac`. */
  final case class Completeness(column: String, minFrac: Double)
      extends Check { val name = s"completeness($column)" }
  /** TRUE Deequ uniqueness: fraction of rows whose value occurs
    * EXACTLY once ≥ `minFrac` (1.0 = key; NULL forms its own group).
    * Costs one grouped pass on `column` (a keyed, map-side-combined
    * shuffle) on top of the fold — the same price Deequ pays. */
  final case class Uniqueness(column: String, minFrac: Double)
      extends Check { val name = s"uniqueness($column)" }
  /** Deequ DISTINCTNESS: `count(DISTINCT column) / count(*)` ≥
    * `minFrac`. Coincides with [[Uniqueness]] only at minFrac = 1.0;
    * for sub-1.0 thresholds they check different properties (a value
    * repeated 100× counts once here, zero times there). */
  final case class Distinctness(column: String, minFrac: Double)
      extends Check { val name = s"distinctness($column)" }
  /** Fraction of rows satisfying `predicate` ≥ `minFrac` (NULL
    * predicate counts as a violation). Covers bounds / set-membership
    * / regex checks — the predicate is any Column expression. */
  final case class Compliance(name: String, column: String,
                              predicate: Column, minFrac: Double)
      extends Check

  /** Validate a declarative constraint suite — the admission gate a
    * pipeline runs on every new ingest batch before letting it into
    * the corpus. `Completeness` / `Distinctness` / `Compliance`
    * metrics all fold in a SINGLE scan+reduce (the [[summarize]]
    * shape; `Distinctness` adds `count(DISTINCT)` which Spark plans
    * as one expand+shuffle); each [[Uniqueness]] check adds exactly
    * one grouped pass on its column. The report is |checks| rows.
    *
    * Determinism: metrics are `floor(1e6·num/den)` over integer
    * counts — engine-exact, full-SQL-oracle-able (qX_constraints).
    *
    * Empty batch (n = 0): every metric reports 0, so any check with a
    * positive threshold FAILS — an empty/broken ingest never slips
    * through a `passed = false` filter as silently NULL.
    *
    * @return one row per check, ordered by constraint name:
    *         (constraint, column, metric_micros, threshold_micros,
    *         passed).
    */
  /** Row-level rule violations — the actionable face of
    * [[checkConstraints]]: instead of one pass/fail metric per rule,
    * return the OFFENDING ROW IDS per named predicate, so the
    * quarantine/triage step knows exactly what to pull. One scan per
    * rule batch (a union of filters over the same frame — Catalyst
    * shares the scan), no shuffles beyond the output sort.
    *
    * @param rules (name, predicate) — a row violates when the
    *              predicate is NOT satisfied (null-safe: NULL
    *              predicate counts as a violation).
    * @return (rule, idCol) per violating row, ordered.
    */
  def violations(df: DataFrame, idCol: String,
                 rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    rules.map { case (name, pred) =>
      df.filter(!coalesce(pred, lit(false)))
        .select(lit(name).as("rule"), col(idCol))
    }.reduce(_ unionAll _).orderBy("rule", idCol)
  }

  /** k-anonymity report over quasi-identifier columns (Sweeney 2002)
    * — the re-identification risk screen a dataset passes before
    * leaving the curation pipeline: a row is at risk when its
    * quasi-identifier combination is shared by fewer than k rows.
    * One grouped count + one scalar fold, all exact integers.
    *
    * @return one row (n_rows, n_groups, n_violating_groups,
    *         n_risk_rows, min_group).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 k: Long): DataFrame = {
    val g = df.groupBy(quasiCols.map(col): _*).agg(count(lit(1)).as("n"))
    g.agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_groups"),
      sum(when(col("n") < k, 1L).otherwise(0L)).as("n_violating_groups"),
      sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_risk_rows"),
      min(col("n")).as("min_group"))
  }

  /** l-diversity report (Machanavajjhala et al. 2007) — the
    * [[kAnonymity]] companion: a quasi-identifier group is safe only
    * when its SENSITIVE attribute takes at least l distinct values
    * (k-anonymous groups with one sensitive value still leak). One
    * grouped distinct-count + scalar fold, exact integers.
    *
    * @return one row (n_groups, n_violating_groups, n_risk_rows,
    *         min_diversity).
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    val g = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("d"))
    g.agg(count(lit(1)).as("n_groups"),
      sum(when(col("d") < l, 1L).otherwise(0L)).as("n_violating_groups"),
      sum(when(col("d") < l, col("n")).otherwise(0L)).as("n_risk_rows"),
      min(col("d")).as("min_diversity"))
  }

  /** t-closeness report (Li, Li & Venkatasubramanian 2007) — the
    * [[lDiversity]] companion that closes the skew attack: a
    * quasi-identifier group leaks when its SENSITIVE-value
    * distribution sits far from the table-wide one (l distinct values
    * all drawn from the rare tail still identify). Distance is total
    * variation, computed EXACTLY: per (group, value) the term
    * `|ngv·n − nv·ng|` is an exact BIGINT (counts cross-multiplied
    * onto one denominator), values absent from a group contribute
    * `nv·ng` via one complement correction `(n − Σ_{v∈g} nv)·ng`, and
    * the group's TVD is ONE floored division
    * `⌊1e6·Σ/(2·ng·n)⌋` — the modularity-term convention, so every
    * fold is order-free and the oracle replays it.
    *
    * Shape: two keyed folds (group×value, then group) + a broadcast
    * value-marginal join + a 1-row total — no windows, nothing
    * all-pairs.
    *
    * @return one row (n_groups, n_violating_groups, n_risk_rows,
    *         max_tvd_micros) at threshold `t`.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, t: Double): DataFrame = {
    val tMicros = math.round(t * 1e6)
    val qs = quasiCols.map(col)
    val gv = df.groupBy(qs :+ col(sensitiveCol).as("_v"): _*)
      .agg(count(lit(1)).as("ngv"))
    val grp = gv.groupBy(qs: _*).agg(sum(col("ngv")).as("ng"))
    val global = df.groupBy(col(sensitiveCol).as("_v"))
      .agg(count(lit(1)).as("nv"))
    val tot = df.agg(count(lit(1)).as("n"))
    val per = gv.join(broadcast(global), Seq("_v"))
      .join(grp, quasiCols)
      .crossJoin(broadcast(tot))
      .groupBy(qs: _*)
      .agg(max(col("ng")).as("ng"), max(col("n")).as("n"),
        sum(abs(col("ngv") * col("n") - col("nv") * col("ng")))
          .as("present_num"),
        sum(col("nv")).as("nv_present"))
      .select(col("ng"),
        floor(lit(1e6) * (col("present_num")
            + (col("n") - col("nv_present")) * col("ng"))
          / (lit(2L) * col("ng") * col("n"))).cast("long").as("tvd_micros"))
    per.agg(count(lit(1)).as("n_groups"),
      sum(when(col("tvd_micros") > tMicros, 1L).otherwise(0L))
        .as("n_violating_groups"),
      sum(when(col("tvd_micros") > tMicros, col("ng")).otherwise(0L))
        .as("n_risk_rows"),
      max(col("tvd_micros")).as("max_tvd_micros"))
  }

  def checkConstraints(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    def report(c: Check, metric: Column): Column =
      struct(lit(c.name).as("constraint"), lit(c.column).as("column"),
        metric.as("metric_micros"),
        lit(c.thresholdMicros).as("threshold_micros"),
        (metric >= lit(c.thresholdMicros)).as("passed"))
    val (unique, folded) = checks.partition(_.isInstanceOf[Uniqueness])
    val foldFrame = if (folded.isEmpty) None else Some {
      val n = count(lit(1))
      val aggs = folded.zipWithIndex.map { case (c, i) =>
        val num = c match {
          case Completeness(cl, _)    => count(col(cl)).cast("long")
          case Distinctness(cl, _)    => countDistinct(col(cl)).cast("long")
          case Compliance(_, _, p, _) =>
            sum(when(p, 1L).otherwise(0L)).cast("long")
          case u: Uniqueness          =>
            throw new IllegalStateException(s"unpartitioned $u")
        }
        when(n === 0L, lit(0L))
          .otherwise(floor(lit(1e6) * num / n)).cast("long").as(s"_m$i")
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      val rows = folded.zipWithIndex.map { case (c, i) =>
        report(c, col(s"_m$i"))
      }
      one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
    }
    val uniqueFrames = unique.map { c =>
      df.groupBy(col(c.column)).agg(count(lit(1)).as("_c"))
        .agg(
          coalesce(sum(when(col("_c") === 1L, 1L).otherwise(0L)), lit(0L))
            .as("_ones"),
          coalesce(sum(col("_c")), lit(0L)).as("_tot"))
        .select(when(col("_tot") === 0L, lit(0L))
          .otherwise(floor(lit(1e6) * col("_ones") / col("_tot")))
          .cast("long").as("_m"))
        .select(report(c, col("_m")).as("p")).select(col("p.*"))
    }
    (foldFrame.toSeq ++ uniqueFrames)
      .reduce(_.unionAll(_))
      .orderBy(col("constraint"))
  }
}
