package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assign every document a (bin, offset) slot in a
  * stream of fixed-size token windows (the training-batch layout step
  * of an LLM data pipeline: concatenate the corpus in a deterministic
  * order, then slice into `budget`-token context windows; documents may
  * straddle window boundaries, GPT-style).
  *
  * The assignment is a pure function of the exclusive running token
  * count: `start = Σ tokens(preceding docs)`, `bin = start / budget`,
  * `offset = start mod budget` — deterministic given the declared doc
  * order, re-runnable, and auditable by any engine with a window
  * cumulative sum (the gate oracle recomputes it in DuckDB).
  *
  * Scale shape: a global-order cumulative sum is the textbook
  * distributed prefix-scan, NOT a single-partition window. [[pack]]
  * keeps the naive `Window.orderBy` form as the executable spec (Spark
  * funnels it through one task — correct, unusable at 100 TB);
  * [[packScalable]] is the real operator: range-partition by id, local
  * cumsum per partition, then one tiny driver-side pass over the
  * per-partition totals (one row each — 10k partitions ⇒ 10k longs)
  * whose exclusive prefix sums are broadcast back as partition offsets.
  * Equality of the two forms is pinned in ScaleOpsSpec.
  */
object Packing {

  /** Length-bucketed batch assembly — the other batching strategy next
    * to [[pack]]: instead of concatenating documents into fixed token
    * budgets, group SIMILAR-length documents so a batch pads to its
    * own bucket's max, not the corpus max (the standard seq-len
    * bucketing that cuts padding waste for non-packed training).
    * Buckets are equal-frequency (`ntile` over the total order
    * (tokenCol, idCol) — fully deterministic, ties broken by id, same
    * semantics in any SQL engine, so the gate is a full-row oracle).
    *
    * Scale note: ntile is a single global window over the (id, tokens)
    * projection — one task sorts the whole corpus's projection. This
    * form is the executable spec; [[lengthBucketsScalable]] is the real
    * operator (exact same output, distributed).
    *
    * @return one row per document: (idCol, tokens, bucket), bucket in
    *         1..buckets.
    */
  def lengthBuckets(df: DataFrame, idCol: String, tokenCol: String,
                    buckets: Int): DataFrame = {
    val w = Window.orderBy(col(tokenCol).asc, col(idCol).asc)
    df.select(col(idCol), col(tokenCol))
      .withColumn("bucket", ntile(buckets).over(w))
  }

  /** Exact 1-based GLOBAL RANK under the total order `sortCols` — the
    * distributed-rank primitive shared by [[lengthBucketsScalable]]
    * and rank-window data pruning ([[NgramLm.pruneByPerplexity]]):
    * range-partition on the sort key (RangePartitioner puts ascending
    * key ranges in ascending partition ids), local `row_number` per
    * partition, lift to a global rank with the exclusive prefix sum of
    * per-partition counts (one long per partition to the driver). One
    * shuffle, no global window. Appends `_grank` and returns the total
    * row count alongside.
    *
    * The ranked frame is localCheckpointed before the counts job:
    * collecting the per-partition counts and materializing the
    * returned frame are two separate actions, and without the lineage
    * cut an expensive upstream (pruneByPerplexity feeds LM train +
    * score through here) would execute twice.
    */
  def globalRank(df: DataFrame, sortCols: Seq[String],
                 partitions: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(nParts, sortCols.map(col(_).asc): _*)
      .withColumn("_pid", spark_partition_id())
    val lw = Window.partitionBy(col("_pid"))
      .orderBy(sortCols.map(col(_).asc): _*)
    val local = ranged.withColumn("_lrn", row_number().over(lw))
      .localCheckpoint(true)
    // one row per partition — the only driver-side data is O(#partitions)
    val counts = local.groupBy(col("_pid"))
      .agg(count(lit(1)).as("_pcnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_poff")
    (local.join(broadcast(offDf), Seq("_pid"))
      .withColumn("_grank", col("_poff") + col("_lrn"))
      .drop("_pid", "_lrn", "_poff"), n)
  }

  /** Exact GLOBAL inclusive prefix sum of `valueCol` under the total
    * order `sortCols` — [[globalRank]]'s sibling primitive (counts →
    * sums): range-partition on the sort key, local windowed cumsum per
    * partition, lift with the exclusive prefix of per-partition TOTALS
    * (one long per partition to the driver, broadcast back). One
    * shuffle, no global window; exact for integer value columns
    * (Long folds are order-independent). Appends `_gcum`. */
  def globalCumSum(df: DataFrame, sortCols: Seq[String], valueCol: String,
                   partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val ranged = df
      .repartitionByRange(nParts, sortCols.map(col(_).asc): _*)
      .withColumn("_pid", spark_partition_id())
    val lw = Window.partitionBy(col("_pid"))
      .orderBy(sortCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = ranged.withColumn("_lcum", sum(col(valueCol)).over(lw))
      .localCheckpoint(true)
    val sums = local.groupBy(col("_pid"))
      .agg(sum(col(valueCol)).cast("long").as("_psum"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = sums.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s)
    }.init.zip(sums).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_poff")
    local.join(broadcast(offDf), Seq("_pid"))
      .withColumn("_gcum", col("_poff") + col("_lcum"))
      .drop("_pid", "_lcum", "_poff")
  }

  /** Distributed form of [[lengthBuckets]] — bit-identical output, no
    * global window, for any data including heavy token-count ties.
    *
    * ntile is a pure function of the GLOBAL RANK under the total order
    * (tokens, id): with n rows and b buckets, q = n div b, r = n mod b,
    * the first r buckets hold q+1 rows and the rest q. So instead of
    * approximating boundaries with a quantile sketch (equal-frequency
    * only up to sketch error, and ill-defined under ties), rank
    * exactly with [[globalRank]] and assign buckets arithmetically.
    */
  def lengthBucketsScalable(df: DataFrame, idCol: String, tokenCol: String,
                            buckets: Int, partitions: Int = 0): DataFrame = {
    val (ranked, n) = globalRank(
      df.select(col(idCol), col(tokenCol)), Seq(tokenCol, idCol), partitions)
    val q = n / buckets; val r = n % buckets
    val g = col("_grank") // 1-based global rank
    // ntile(b) of rank g: ranks 1..r*(q+1) fall in the q+1-sized
    // buckets, the rest in q-sized ones. CaseWhen evaluates lazily per
    // row, so the q=0 division (n < buckets — every rank its own
    // bucket, first branch always taken) is never reached.
    val bucket =
      when(g <= lit(r * (q + 1)),
        ((g - 1) / lit(q + 1)).cast("long") + 1)
        .otherwise(lit(r) + ((g - lit(r * (q + 1)) - 1) / lit(q.max(1L)))
          .cast("long") + 1)
    ranked.select(col(idCol), col(tokenCol), bucket.cast("int").as("bucket"))
  }

  /** Naive global-window form — the executable spec. One partition,
    * driver-order semantics; use [[packScalable]] beyond toy scale. */
  def pack(df: DataFrame, idCol: String, tokenCol: String,
           budget: Long): DataFrame = {
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    slots(df.withColumn("_start",
      sum(col(tokenCol).cast("long")).over(w) - col(tokenCol)),
      idCol, tokenCol, budget)
  }

  /** Distributed prefix-scan form: identical output, no global window.
    *
    * Correctness does not depend on where the range boundaries fall —
    * `start = partition_offset + local_cumsum − tokens` is exact for
    * any split of the id order into contiguous ranges.
    */
  def packScalable(df: DataFrame, idCol: String, tokenCol: String,
                   budget: Long, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nParts =
      if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    // RangePartitioner puts ascending id ranges in ascending partition
    // ids, so spark_partition_id() is a valid window partition key and
    // partition order == id order
    val ranged = df.repartitionByRange(nParts, col(idCol))
      .withColumn("_pid", spark_partition_id())
    val lw = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("_lcum",
      sum(col(tokenCol).cast("long")).over(lw))
    // one row per partition: the only driver-side data is O(#partitions)
    val totals = local.groupBy(col("_pid"))
      .agg(max(col("_lcum")).as("_ptotal"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) =>
      (pid, acc + t)
    }.init.zip(totals).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("_pid", "_poff")
    slots(local.join(broadcast(offDf), Seq("_pid"))
        .withColumn("_start", col("_poff") + col("_lcum") - col(tokenCol)),
      idCol, tokenCol, budget)
  }

  private def slots(withStart: DataFrame, idCol: String, tokenCol: String,
                    budget: Long): DataFrame =
    withStart.select(col(idCol), col(tokenCol),
      floor(col("_start") / lit(budget.toDouble)).as("bin"),
      pmod(col("_start"), lit(budget)).as("offset"))
}
