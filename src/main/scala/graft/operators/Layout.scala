package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical file-layout operators — the write-side half of scan
  * performance at 100 TB: what order rows land in decides how tight
  * each file's min/max column statistics are, and therefore how many
  * files a selective query can SKIP without opening them.
  *
  * Z-ordering (Morton interleave) maps two sort dimensions onto one
  * key such that rows close in EITHER dimension cluster into the same
  * files — the standard layout for two-column selective workloads
  * (single-column workloads should just sort by that column). All bit
  * math is built-in Catalyst expressions (codegen'd, and recomputable
  * by any SQL engine — the qX_zorder oracle recomputes it in DuckDB).
  */
object Layout {

  private val SpreadSteps: Seq[(Int, Long)] = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 32 bits of `x` so bit i lands at position 2i (the
    * magic-mask Morton spread, 5 shift/or/and steps). */
  def spreadBits(x: Column): Column =
    SpreadSteps.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) {
      case (acc, (s, m)) =>
        acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
    }

  /** 64-bit Morton (Z-order) key of two non-negative 32-bit values:
    * `a`'s bits at even positions, `b`'s at odd. Monotone in each
    * argument with the other fixed; interleaving gives the recursive-Z
    * locality that makes range predicates on EITHER column touch few
    * key ranges. */
  def zorderKey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Hilbert curve key of two non-negative values over a
    * 2^bits × 2^bits grid — the locality UPGRADE over [[zorderKey]]:
    * consecutive Hilbert keys are always grid neighbors (the Z-order
    * curve jumps across the grid at every power-of-two boundary), so
    * range predicates on either column touch measurably fewer file
    * boundaries at the same file count. Native codegen expression
    * ([[graft.functions.expr.HilbertKeyExpr]] — the per-row bit loop
    * is a JVM while-loop, not a 2^bits-deep Catalyst tree), replayed
    * level-by-level by the unrolled qX_hilbert oracle.
    */
  def hilbertKey(a: Column, b: Column, bits: Int = 10): Column =
    graft.functions.expr.VectorExprs.hilbert_key(
      a.cast("long"), b.cast("long"), bits)

  /** [[zorderWrite]] with the Hilbert key — same range-partition +
    * in-partition sort write shape. */
  def hilbertWrite(df: DataFrame, c1: String, c2: String, path: String,
                   numFiles: Int, bits: Int = 10): Unit =
    df.withColumn("_h", hilbertKey(col(c1), col(c2), bits))
      .repartitionByRange(numFiles, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
      .write.mode("overwrite").parquet(path)

  /** Per-file column statistics manifest: (file, n_rows, min, max per
    * stat column) — the data-skipping decision table. Reading it costs
    * one scan; a query planner (or a human) then prunes files whose
    * [min, max] misses the predicate without opening them. Pairs with
    * [[zorderWrite]], which is what makes these ranges TIGHT. */
  def fileStats(df: DataFrame, statCols: Seq[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("n_rows")) ++ statCols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    df.withColumn("_file", input_file_name())
      .groupBy("_file")
      .agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("_file", "file")
  }

  /** Small-file compaction: rewrite a parquet directory into
    * `ceil(bytes / targetBytes)` files via the crash-safe directory
    * swap. The 100 TB hygiene operation — streaming sinks accrete
    * KB-sized files whose per-file open/footer cost eventually
    * dominates scans; compaction restores scan efficiency without
    * changing a row. NOT for tables whose layout IS the contract
    * (bucketed tables, [[zorderWrite]] output — recompact those by
    * re-running their writer). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Unit = {
    graft.streaming.CardStream.recoverSwap(spark, path) // writer path
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(path)).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path).coalesce(nFiles)
    graft.streaming.CardStream.swapInto(spark, df, path)
  }

  /** Write `df` Z-ordered on two integer-domain columns: range
    * partition by the Morton key into `numFiles` output files, sort
    * within each, write parquet. Every file then covers a compact Z
    * region — its parquet min/max stats on BOTH columns are tight, so
    * a reader with a predicate on either column prunes most files from
    * the listing alone (no data read). Doubles/strings must be rank- or
    * bucket-normalized into [0, 2^32) first (caller's contract — the
    * key math is only meaningful on bounded non-negative ints). */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
                  numFiles: Int): Unit =
    df.withColumn("_z", zorderKey(col(c1), col(c2)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
