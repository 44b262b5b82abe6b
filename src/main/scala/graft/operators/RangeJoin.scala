package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Range (interval) joins without the cartesian blowup.
  *
  * Spark has no native range-join strategy: `a.pt BETWEEN b.lo AND
  * b.hi` plans as BroadcastNestedLoopJoin (every point × every
  * interval) — fine for a broadcast-sized interval table, fatal when
  * both sides are large. The classic distributed fix (Databricks'
  * range-join binning, interval trees in Sedona/Flink temporal joins)
  * is to discretize the axis into fixed-width BINS and turn the range
  * predicate into an equi-join on bin id:
  *
  *  - each point lands in exactly ONE bin (`floor(axis / binWidth)`);
  *  - each interval is exploded to every bin it touches
  *    (`sequence(floor(lo/w), floor(hi/w))` — `len/w + 1` rows);
  *  - bin-equi-join (hash shuffle both sides on the bin id — or a
  *    plain broadcast if the exploded interval side is small), then
  *    the exact predicate filters survivors.
  *
  * A (point, interval) match pairs exactly once — the point's bin is
  * unique, and the interval appears once per bin — so no dedup pass is
  * needed for [[pointInInterval]]. The overlap join ([[intervalOverlap]])
  * explodes BOTH sides, so a pair can meet in every shared bin; it is
  * deduped arithmetically by keeping the pair only in the FIRST bin
  * both touch (`floor(max(lo1, lo2) / w)`) — no distinct, no shuffle
  * beyond the join's own.
  *
  * 100 TB shape: one hash shuffle per side keyed on `_bin` (AQE
  * broadcast-swaps the small side automatically). The explosion factor
  * — and the worst skew a giant interval can cause — is bounded by
  * `maxIntervalLen / binWidth + 1`; pick `binWidth` near the median
  * interval length so typical intervals explode to ~2 rows and a
  * hot bin holds ~(points/bin + intervals overlapping it). Axis
  * comparisons run on exact integer units (days for dates, micros for
  * timestamps — the [[AsOfJoin]] axis rule), never on doubles.
  *
  * NULL semantics follow the range predicate: a NULL point or NULL
  * endpoint compares UNKNOWN in SQL and matches nothing — such rows
  * are dropped up front (inner-join semantics; reference behavior:
  * the recommender's windows always carry both endpoints).
  */
object RangeJoin {

  /** Exact integer axis for bin arithmetic (the [[AsOfJoin]] rule):
    * days for dates, micros for timestamps, long cast otherwise. */
  private def axisOf(df: DataFrame, c: String): Column => Column =
    df.schema(c).dataType match {
      case TimestampType => unix_micros
      case DateType      => unix_date
      case _             => (x: Column) => x.cast("long")
    }

  /** Exact floor-division on a long axis: `x - pmod(x, w)` is a
    * multiple of w (pmod is non-negative, so this floors toward −∞ for
    * pre-epoch axes too), and the double division of two exact
    * multiples below 2^53 rounds to the exact quotient — micros axes
    * stay exact until year ~2255. */
  private def floorDiv(x: Column, w: Long): Column =
    ((x - pmod(x, lit(w))) / lit(w)).cast("long")

  /** Join each point row to every interval row whose
    * `[startCol, endCol]` contains `ptCol` (inclusive both ends —
    * BETWEEN semantics). Returns all point columns plus the
    * intervals' `valueCols` (names must not collide with point
    * columns). Intervals with `start > end` are empty and dropped.
    *
    * `binWidth` is in axis units (days for date axes, MICROS for
    * timestamp axes).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      ptCol: String, startCol: String, endCol: String,
                      valueCols: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pAxis = axisOf(points, ptCol)
    val sAxis = axisOf(intervals, startCol)
    val eAxis = axisOf(intervals, endCol)
    val p = points
      .withColumn("_a", pAxis(col(ptCol)))
      .filter(col("_a").isNotNull)
      .withColumn("_bin", floorDiv(col("_a"), binWidth))
    val iv = intervals
      .select((valueCols.map(col) :+ sAxis(col(startCol)).as("_s")
        :+ eAxis(col(endCol)).as("_e")): _*)
      .filter(col("_s").isNotNull && col("_e").isNotNull
        && col("_s") <= col("_e"))
      .withColumn("_bin",
        explode(sequence(floorDiv(col("_s"), binWidth),
          floorDiv(col("_e"), binWidth))))
    p.join(iv, Seq("_bin"))
      .filter(col("_a") >= col("_s") && col("_a") <= col("_e"))
      .drop("_bin", "_a", "_s", "_e")
  }

  /** All (left, right) interval pairs that overlap:
    * `l.start <= r.end AND r.start <= l.end` (closed intervals —
    * touching endpoints overlap). Plain join semantics: a self-join
    * yields both orientations and the self-pair; filter
    * `(lId, rId)` ordering downstream for unordered pairs, exactly as
    * the equivalent SQL would. Returns `leftCols ++ rightCols`
    * (caller aliases to avoid collisions). Each side's empty
    * (`start > end`) and NULL-endpoint rows are dropped.
    *
    * Dedup is arithmetic: a pair shares `min(l.end, r.end) −
    * max(l.start, r.start)` consecutive bins and is kept only in the
    * first (`floor(max(l.start, r.start) / w)`), so the join emits no
    * duplicates and needs no distinct.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lStart: String, lEnd: String, lCols: Seq[String],
                      rStart: String, rEnd: String, rCols: Seq[String],
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def side(df: DataFrame, s: String, e: String, keep: Seq[String],
             sOut: String, eOut: String): DataFrame = {
      val (sa, ea) = (axisOf(df, s), axisOf(df, e))
      df.select((keep.map(col) :+ sa(col(s)).as(sOut) :+ ea(col(e)).as(eOut)): _*)
        .filter(col(sOut).isNotNull && col(eOut).isNotNull
          && col(sOut) <= col(eOut))
        .withColumn("_bin",
          explode(sequence(floorDiv(col(sOut), binWidth),
            floorDiv(col(eOut), binWidth))))
    }
    val l = side(left, lStart, lEnd, lCols, "_ls", "_le")
    val r = side(right, rStart, rEnd, rCols, "_rs", "_re")
    l.join(r, Seq("_bin"))
      .filter(col("_ls") <= col("_re") && col("_rs") <= col("_le"))
      .filter(col("_bin") ===
        floorDiv(greatest(col("_ls"), col("_rs")), binWidth))
      .drop("_bin", "_ls", "_le", "_rs", "_re")
  }
}
