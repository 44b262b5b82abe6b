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
  /** `count(DISTINCT column) / count(*)` ≥ `minFrac` (1.0 = key). */
  final case class Uniqueness(column: String, minFrac: Double)
      extends Check { val name = s"uniqueness($column)" }
  /** Fraction of rows satisfying `predicate` ≥ `minFrac` (NULL
    * predicate counts as a violation). Covers bounds / set-membership
    * / regex checks — the predicate is any Column expression. */
  final case class Compliance(name: String, column: String,
                              predicate: Column, minFrac: Double)
      extends Check

  /** Validate a declarative constraint suite in ONE aggregation pass
    * — the admission gate a pipeline runs on every new ingest batch
    * before letting it into the corpus. All metrics fold in a single
    * scan+reduce (the [[summarize]] shape; `Uniqueness` adds
    * `count(DISTINCT)` which Spark plans as one expand+shuffle); the
    * report is |checks| rows, never a second scan.
    *
    * Determinism: metrics are `floor(1e6·num/den)` over integer
    * counts — engine-exact, full-SQL-oracle-able (qX_constraints).
    *
    * @return one row per check, ordered by constraint name:
    *         (constraint, column, metric_micros, threshold_micros,
    *         passed).
    */
  def checkConstraints(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val n = count(lit(1))
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      val num = c match {
        case Completeness(cl, _)     => count(col(cl)).cast("long")
        case Uniqueness(cl, _)       => countDistinct(col(cl)).cast("long")
        case Compliance(_, _, p, _)  =>
          sum(when(p, 1L).otherwise(0L)).cast("long")
      }
      floor(lit(1e6) * num / n).cast("long").as(s"_m$i")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("constraint"), lit(c.column).as("column"),
        col(s"_m$i").as("metric_micros"),
        lit(c.thresholdMicros).as("threshold_micros"),
        (col(s"_m$i") >= lit(c.thresholdMicros)).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
      .orderBy(col("constraint"))
  }
}
