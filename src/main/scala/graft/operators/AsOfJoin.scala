package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — an operator Spark lacks natively and
  * the reference never needed (its `created_at` is processing time),
  * but a training-data pipeline joining fact streams to slowly-updated
  * context tables needs constantly (SURVEY §2 extension surface).
  *
  * Semantics: for every left row, attach the matched right row within
  * the same `keyCol` — `direction = "backward"` (default): the latest
  * right row with ts <= left ts (DuckDB's/Pandas' default ASOF);
  * `"forward"`: the earliest right row with ts >= left ts;
  * `"nearest"`: whichever of the two is closer by |Δts| (exact
  * integer microseconds; equidistant resolves backward). Inclusive
  * match on equal timestamps in every direction. Left rows with no
  * match in the chosen direction keep NULL attached columns
  * (left-outer as-of).
  *
  * Scale shape: the naive formulation is a range join
  * (`l.ts >= r.ts` → O(|L|·|R|) pair enumeration per key before the
  * per-row max — a BroadcastNestedLoop at best). This implementation is
  * the union-and-carry-forward plan instead: tag both sides, sort each
  * key's rows once by (ts, side), and carry the last-seen right values
  * forward with `last(_, ignoreNulls)` over a running window. One
  * shuffle on `keyCol`, O((|L|+|R|) log) per partition, no pair
  * blow-up — survives 100 TB where the range join dies. Skewed keys are
  * bounded by per-key cardinality, not by the cross product.
  *
  * Contract: right must be unique per (keyCol, tsCol) — pre-aggregate
  * otherwise (ties inside one key+timestamp would make "the latest row"
  * ill-defined in any engine).
  */
object AsOfJoin {

  /** As-of join `left` to `right` on `keyCol`, time axis `tsCol`;
    * `valueCols` are the right-side columns to attach, each emitted as
    * `asof_<name>`. All left columns are preserved.
    *
    * NULL semantics (the ASOF contract, not last-non-null-per-column):
    * the carried payload is ONE struct per right row — so all attached
    * columns come from the same (latest) matched row, and a NULL value
    * inside that row is attached as NULL rather than skipped in favor
    * of an older non-null value. Right rows with NULL `tsCol` are
    * dropped up front (ASOF's `l.ts >= NULL` matches nothing); left
    * rows with NULL `tsCol` sort before every timed right row in their
    * key and therefore match nothing (NULL attached), matching the
    * same comparison rule.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           valueCols: Seq[String], direction: String = "backward",
           tolerance: Long = -1L): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown as-of direction $direction")
    // right rows sort BEFORE left rows at equal ts (side 0 < 1) in the
    // scan direction so the running last() sees them — the
    // inclusive-match contract on both time arrows
    val l = left.withColumn("_side", lit(1))
    val r = right
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol),
        struct((col(tsCol).as("_rts") +: valueCols.map(col)): _*).as("_rv"))
      .withColumn("_side", lit(0))
    // unionByName fills the left side's missing _rv with NULL — the
    // struct itself is non-null for every right row, so
    // last(ignoreNulls) selects the latest right ROW, atomically
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // NULL placement must be "scan head" on BOTH arrows: asc is
    // NULLS FIRST natively, but desc is NULLS LAST — which would park a
    // NULL-ts left row AFTER every right row in the forward scan and
    // wrongly attach the minimum-ts right row. desc_nulls_first keeps
    // the left-outer contract (right NULL ts is already filtered, so
    // only left NULL-ts rows move to the head, where nothing has been
    // carried yet -> NULL attached).
    def w(asc: Boolean) = Window.partitionBy(col(keyCol))
      .orderBy(
        if (asc) col(tsCol).asc_nulls_first else col(tsCol).desc_nulls_first,
        col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ascending scan carries the latest right row at-or-BEFORE each left
    // row; descending carries the earliest at-or-AFTER. Both windows
    // share the key partitioning — "nearest" costs one shuffle and two
    // in-partition sorts, never a second exchange.
    // exact integer time axis, shared by "nearest" and the tolerance
    // bound. Timestamps compare in integer micros (double-second casts
    // lose sub-microsecond ties); date/numeric axes on their own exact
    // integers (date->bigint casts are forbidden by ANSI analysis —
    // days since epoch is the exact integer axis for dates).
    import org.apache.spark.sql.types.{DateType, TimestampType}
    val axis: Column => Column = unioned.schema(tsCol).dataType match {
      case TimestampType => unix_micros
      case DateType      => unix_date
      case _             => (c: Column) => c.cast("long")
    }
    val carried = direction match {
      case "backward" =>
        unioned.withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w(true)))
      case "forward" =>
        unioned.withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w(false)))
      case "nearest" =>
        // closer of the two matches by |Δts|; equidistant → backward,
        // the ASOF convention
        val b = last(col("_rv"), ignoreNulls = true).over(w(true))
        val f = last(col("_rv"), ignoreNulls = true).over(w(false))
        unioned
          .withColumn("_b", b).withColumn("_f", f)
          .withColumn("_asof",
            when(col("_b").isNull, col("_f"))
              .when(col("_f").isNull, col("_b"))
              .when(axis(col(tsCol)) - axis(col("_b._rts")) <=
                axis(col("_f._rts")) - axis(col(tsCol)),
                col("_b"))
              .otherwise(col("_f")))
    }
    // staleness bound (pandas merge_asof `tolerance`, the feature-store
    // max-staleness rule): a carried match farther than `tolerance`
    // axis units (micros / days / raw) is nulled out — left-outer
    // semantics otherwise unchanged. Negative = unbounded. `when`
    // without otherwise yields NULL, and a NULL left ts propagates
    // NULL through the axis arithmetic, so NULL-ts rows stay unmatched.
    val bounded =
      if (tolerance < 0) carried
      else carried.withColumn("_asof",
        when(abs(axis(col(tsCol)) - axis(col("_asof._rts"))) <=
          lit(tolerance), col("_asof")))
    bounded.filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
