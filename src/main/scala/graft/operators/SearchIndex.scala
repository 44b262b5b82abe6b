package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokenize

/** Materialized inverted index — the scale path for the search surface
  * (§2.G): tokenize the corpus ONCE into a postings table, precompute
  * document frequencies, then serve every query by probing postings.
  *
  * At 100 TB the difference is structural: [[Search.search]] re-scans
  * and re-tokenizes the corpus per query; an index build is one pass,
  * after which a query touches only `|terms|` postings partitions —
  * write the postings bucketed/partitioned by term and the probe is a
  * partition-pruned scan, no full-corpus I/O. idf comes from the stats
  * table (tiny, broadcast).
  *
  * The scoring formula is identical to [[Search]] (same TF-IDF, §7.3),
  * asserted equal in tests and by the DuckDB oracle.
  */
object SearchIndex {

  /** Bucket count of the on-disk postings layout — ONE constant shared
    * by [[writeIndex]] and [[queryStored]]: a writer/prober mismatch
    * would silently prune away valid postings. */
  val IndexBuckets = 256

  /** Driver-side twin of `pmod(xxhash64(term), buckets)` (same seed 42
    * as the SQL function) for partition-pruned probes. */
  def bucketOf(term: String, buckets: Int): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L)
    ((h % buckets) + buckets) % buckets
  }

  /** One-pass index build over multiple fields.
    * @return (postings(field, term, doc, tf), stats(field, term, df), n)
    */
  def build(docs: DataFrame, idCol: String,
            fields: Seq[String]): (DataFrame, DataFrame, Long) = {
    val perField = fields.map { f =>
      docs.select(lit(f).as("field"), col(idCol).as("doc"),
          explode(tokenize(col(f))).as("term"))
    }
    val postings = perField.reduce(_ unionAll _)
      .groupBy("field", "term", "doc")
      .agg(count(lit(1)).as("tf"))
    val stats = postings.groupBy("field", "term")
      .agg(count(lit(1)).as("df")) // one posting row per (term, doc)
    (postings, stats, docs.count())
  }

  /** Persist the index partitioned by term-prefix bucket so query-time
    * probes prune to |terms| buckets (the partition-pruned layout named
    * above; IndexBuckets keeps directory fan-out sane at any corpus
    * size). */
  def writeIndex(postings: DataFrame, stats: DataFrame, dir: String): Unit = {
    postings
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(IndexBuckets)))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    stats.write.mode("overwrite").parquet(s"$dir/stats")
  }

  /** Query the index: probe postings for the query terms, join the
    * broadcast idf table, weighted-sum per doc. */
  def query(postings: DataFrame, stats: DataFrame, n: Long,
            boosts: Seq[(String, Double)], queryText: String,
            limit: Int): DataFrame = {
    val terms = queryText.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "empty query")
    val boostMap = boosts.toMap
    val boostCol = boosts.foldLeft(lit(1.0)) { case (acc, (f, b)) =>
      when(col("field") === f, lit(b)).otherwise(acc) }
    val idf = stats.filter(col("term").isin(terms: _*))
      .select(col("field"), col("term"),
        log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          .as("idf"))
    postings
      .filter(col("term").isin(terms: _*) &&
        col("field").isin(boostMap.keys.toSeq: _*))
      .join(broadcast(idf), Seq("field", "term"))
      .groupBy(col("doc"))
      .agg(sum(col("tf") * col("idf") * boostCol).as("_score"))
      .orderBy(desc("_score"), asc("doc"))
      .limit(limit)
  }

  /** Probe a bucketed on-disk index (written by [[writeIndex]]) —
    * partition pruning on the term bucket keeps I/O at |terms| buckets. */
  def queryStored(spark: SparkSession, dir: String, n: Long,
                  boosts: Seq[(String, Double)], queryText: String,
                  limit: Int): DataFrame = {
    val terms = queryText.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val postings = spark.read.parquet(s"$dir/postings")
      .filter(col("bucket").isin(terms.map(bucketOf(_, IndexBuckets)): _*))
    val stats = spark.read.parquet(s"$dir/stats")
    query(postings, stats, n, boosts, queryText, limit)
  }
}
