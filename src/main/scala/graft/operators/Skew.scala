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
}
