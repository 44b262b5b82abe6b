package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys (the hub-vertex / heavy-hitter
  * problem at 100 TB).
  *
  * First resort is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it needs no
  * code. These helpers cover the cases AQE can't re-plan:
  * deterministic salting for aggregations with heavy keys, and the
  * replicate-and-salt join for when one side's hot keys are known to
  * dwarf a partition.
  */
object Skew {

  /** Two-stage salted aggregation: count per (key, salt) — spreading a
    * hot key over `buckets` partitions — then re-aggregate per key.
    * Equivalent to `groupBy(key).count` for any additive aggregate;
    * the salt is derived from a second column (deterministic, no RNG —
    * reproducible plans).
    */
  def saltedCount(df: DataFrame, key: Column, saltSource: Column,
                  buckets: Int): DataFrame =
    df.select(key.as("key"), pmod(xxhash64(saltSource), lit(buckets)).as("_salt"))
      .groupBy("key", "_salt").agg(count(lit(1)).as("_partial"))
      .groupBy("key").agg(sum("_partial").as("cnt"))

  /** Salted inner equi-join: the skewed left side gets a deterministic
    * salt in [0, buckets); the small-ish right side is replicated
    * `buckets` times (explode), so each hot left key spreads over
    * `buckets` reducers. Right-side replication costs |right|·buckets —
    * use only when right ≪ left but is too big to broadcast outright.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keyCol: String,
                      saltSource: Column, buckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(buckets)).cast("int"))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, Seq(keyCol, "_salt")).drop("_salt")
  }

  /** Bloom-pruned semi join: build a bloom filter over the small
    * side's keys (one aggregation → a few-hundred-KB binary on the
    * driver, the same scalar-subquery shape as Spark's own AQE
    * runtime filters), prune the LARGE side with the codegen'd
    * `might_contain` predicate BEFORE its shuffle, then close with a
    * real semi join that removes the false positives.
    *
    * This is the explicit form of the big-join optimization that
    * matters most at 100 TB: when selectivity is low (most large-side
    * rows have no partner), the bloom predicate drops them at the scan
    * — the shuffle carries only candidate rows, fpp·|large| false
    * positives of overhead instead of |large| rows. Exactness is
    * independent of the filter's fpp (locked in ScaleOpsSpec with a
    * deliberately saturated filter). Keys are xxhash64-folded so any
    * key type rides through the LONG-typed bloom.
    */
  def bloomPrunedSemiJoin(large: DataFrame, largeKey: String,
                          small: DataFrame, smallKey: String,
                          expectedItems: Long = 1000000L,
                          numBits: Long = 8L * 1024 * 1024): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.GraftTopKBridge
    val bf = small
      .agg(GraftTopKBridge.bloomAgg(xxhash64(col(smallKey)),
        expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    val pruned = large.filter(
      GraftTopKBridge.mightContain(lit(bf), xxhash64(col(largeKey))))
    pruned.join(small.select(col(smallKey).as(largeKey)).distinct(),
      Seq(largeKey), "left_semi")
  }
}
