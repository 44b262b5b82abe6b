package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join — an operator Spark lacks natively and
  * the reference never needed (its `created_at` is processing time),
  * but a training-data pipeline joining fact streams to slowly-updated
  * context tables needs constantly (SURVEY §2 extension surface).
  *
  * Semantics: for every left row, attach the latest right row whose
  * `tsCol` is <= the left row's `tsCol`, within the same `keyCol`
  * (inclusive match on equal timestamps — the same contract as
  * DuckDB's/Pandas' ASOF JOIN, which is what the oracle checks). Left
  * rows with no prior right row keep NULL attached columns (left-outer
  * as-of).
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
           valueCols: Seq[String]): DataFrame = {
    // right rows sort BEFORE left rows at equal ts (side 0 < 1) so the
    // running last() sees them — the inclusive-match contract
    val l = left.withColumn("_side", lit(1))
    val r = right
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol),
        struct(valueCols.map(col): _*).as("_rv"))
      .withColumn("_side", lit(0))
    // unionByName fills the left side's missing _rv with NULL — the
    // struct itself is non-null for every right row, so
    // last(ignoreNulls) selects the latest right ROW, atomically
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w))
    carried.filter(col("_side") === 1)
      .select(left.columns.map(col) ++
        valueCols.map(c => col(s"_asof.$c").as(s"asof_$c")): _*)
  }
}
