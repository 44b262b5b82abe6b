package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shaping: build a slowly-changing-dimension
  * (SCD type 2) version history from an append-only change stream.
  *
  * The reference keeps only the LATEST state per key everywhere it
  * stores anything (DynamoDB status upsert,
  * trigger_text_extract_from_s3_image.py:58-84; ES doc upsert,
  * upsert_bizcard_to_es.py:77-90) — last-write-wins, history
  * discarded. A training-data warehouse needs the opposite: the full
  * validity timeline per key, so any point-in-time snapshot can be
  * reconstructed (and joined as-of, [[AsOfJoin]]) without replaying
  * the raw stream.
  */
object Cdc {

  /** SCD2 history: per key (ordered by `tsCol`, ties broken by
    * `tieCols` — make them unique or versions are nondeterministic),
    * consecutive rows whose `trackCols` are unchanged collapse into
    * one version; each version carries `valid_from` (its first change
    * ts), `valid_to` (the next version's `valid_from`, NULL while
    * current), `is_current`, and `n_rows` (changes absorbed).
    * Null-safe change detection (`<=>`): NULL → value and
    * value → NULL both open a new version, first row always does.
    *
    * Same-timestamp versions: when consecutive DISTINCT versions share
    * one `tsCol` value (tie-broken only by `tieCols`), every version
    * but the run's last gets `valid_from == valid_to` — a zero-width
    * interval that [[snapshotAt]] (half-open `from <= at < to`) can
    * never return for ANY instant. This is deliberate: timestamps are
    * the only time axis the snapshot API exposes, so states that never
    * existed for a measurable instant are invisible to point-in-time
    * reads, while the full history (including the zero-width
    * versions, in deterministic `tieCols` order) remains queryable
    * here for audit. Callers that need every intermediate state
    * addressable should make `tsCol` unique upstream (e.g. compose a
    * sub-ordinal into the timestamp) rather than rely on tie order.
    *
    * Scale shape: everything is keyed by `keyCols` — the two windows
    * and the per-(key, version) collapse all hash-cluster on the key
    * (a subset grouping satisfies ClusteredDistribution), so the whole
    * history build is ONE shuffle of the change stream, reused across
    * the three steps. No driver materialization; versions-per-key is
    * bounded by changes-per-key, so skew follows the stream's own key
    * skew (salt upstream if one key dominates).
    *
    * @return keyCols ++ (version, trackCols…, valid_from, valid_to,
    *         is_current, n_rows), one row per version.
    */
  /** Snapshot diff — the audit between two versions of a keyed
    * dataset (the question every pipeline rerun raises: what did this
    * version CHANGE?): full-outer on the key, per-row status by
    * null-safe column comparison (`added` / `removed` / `changed`,
    * unchanged rows suppressed — at 100 TB they are almost
    * everything, and the diff must stay |Δ|-sized).
    *
    * No hashing: `changed` is a disjunction of `IS DISTINCT FROM`
    * over the compared columns — exact, null-correct, oracle-trivial.
    * One keyed full-outer join; output is Δ rows + keyCols.
    *
    * @return (keyCols…, status) for non-identical rows, ordered.
    */
  def snapshotDiff(base: DataFrame, curr: DataFrame, keyCols: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val b = base.select((keyCols ++ compareCols).map(c =>
      col(c).as(s"b_$c")): _*).withColumn("_b", lit(1))
    val c = curr.select((keyCols ++ compareCols).map(cc =>
      col(cc).as(s"c_$cc")): _*).withColumn("_c", lit(1))
    val cond = keyCols.map(k => col(s"b_$k") === col(s"c_$k"))
      .reduce(_ && _)
    val changed = compareCols.map(cc =>
      !(col(s"b_$cc") <=> col(s"c_$cc"))).reduce(_ || _)
    val status = when(col("_b").isNull, lit("added"))
      .when(col("_c").isNull, lit("removed"))
      .when(changed, lit("changed"))
    val keyOut = keyCols.map(k =>
      coalesce(col(s"b_$k"), col(s"c_$k")).as(k))
    b.join(c, cond, "full_outer")
      .select((keyOut :+ status.as("status")): _*)
      .filter(col("status").isNotNull)
      .orderBy((keyCols.map(col) :+ col("status")): _*)
  }

  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           tieCols: Seq[String], trackCols: Seq[String]): DataFrame = {
    val key = keyCols.map(col)
    val ord = (tsCol +: tieCols).map(c => col(c).asc)
    val w = Window.partitionBy(key: _*).orderBy(ord: _*)
    val tracked = struct(trackCols.map(col): _*)
    val versioned = changes
      .withColumn("_chg",
        when(lag(tracked, 1).over(w) <=> tracked, 0).otherwise(1))
      .withColumn("version",
        sum(col("_chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    // constant within a run — min() is the deterministic pick
    val aggs = min(col(tsCol)).as("valid_from") +:
      count(lit(1)).as("n_rows") +:
      trackCols.map(c => min(col(c)).as(c))
    val runs = versioned
      .groupBy((key :+ col("version")): _*)
      .agg(aggs.head, aggs.tail: _*)
    val wKey = Window.partitionBy(key: _*).orderBy(col("version").asc)
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wKey))
      .withColumn("is_current", col("valid_to").isNull)
      .select((key :+ col("version")) ++ trackCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"),
          col("n_rows")): _*)
  }

  /** Point-in-time snapshot of an SCD2 history: the row version valid
    * at `at` per key — `valid_from <= at < valid_to` (open-ended for
    * the current version). A partition-pruned filter, no join. */
  def snapshotAt(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
