package graft.operators

import org.apache.spark.sql.DataFrame
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
}
