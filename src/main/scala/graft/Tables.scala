package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the harness parquet tables (TESTDATA.md).
  *
  * All queries receive a scale-factor directory and read tables through
  * here so that scan options stay in one place. Filters/projections are
  * applied by callers *after* load — Catalyst pushes them into the
  * parquet scan (PushedFilters / ReadSchema), so there is no need for
  * manual pruning here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`:
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 otherwise
    * refuses outright (PARQUET_TYPE_ILLEGAL). With the flag it surfaces
    * as a nanos LONG, which we normalize back to a micros TimestampType
    * here (integer division — no double round-trip, no precision loss).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
