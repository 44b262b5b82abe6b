package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** `events.ts` has shipped as two physical parquet types across harness
    * testdata generations; both are normalized to a micros `TimestampType`
    * here so every downstream query sees one type:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses it outright (PARQUET_TYPE_ILLEGAL)
    *    unless sessions set `spark.sql.legacy.parquet.nanosAsLong=true`, in
    *    which case it surfaces as a nanos LONG → integer-divide to micros
    *    (no double round-trip, no precision loss).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): surfaces as TIMESTAMP_NTZ
    *    → cast to TimestampType. Sessions pin the session timezone to UTC,
    *    so the wall-clock reinterpretation is lossless.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    handleCache.computeIfAbsent((spark, dir, name), { _ =>
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") df.schema("ts").dataType match {
        case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
        case _                => df
      } else df
    })

  /** DataFrame HANDLE cache (plans, not data): building
    * `spark.read.parquet` re-lists the directory and re-reads a footer
    * for schema on every call — ~40-50 ms per table per gate, ~20 s
    * across a 377-gate harness run. DataFrames are immutable, so one
    * handle per (session, dir, table) is safe to share; keying on the
    * session keeps cloned sessions' conf isolation intact, and nothing
    * is persisted — executions stay independent. Bounded: sessions ×
    * dirs × 10 tables. */
  private val handleCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
}
