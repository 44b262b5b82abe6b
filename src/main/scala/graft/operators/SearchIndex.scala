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
    * size). The corpus size `n` is stored alongside (meta) so probes
    * don't re-count the corpus per query. */
  def writeIndex(postings: DataFrame, stats: DataFrame, n: Long,
                 dir: String): Unit = {
    postings
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(IndexBuckets)))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/postings")
    stats.write.mode("overwrite").parquet(s"$dir/stats")
    stats.sparkSession.range(1).select(lit(n).as("n"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  /** Read a stored index back into the [[build]] shape (bucket column
    * stripped from postings; n from meta). */
  def readIndex(spark: SparkSession, dir: String): (DataFrame, DataFrame, Long) = {
    val postings = spark.read.parquet(s"$dir/postings").drop("bucket")
    val stats = spark.read.parquet(s"$dir/stats")
    val n = spark.read.parquet(s"$dir/meta").head().getLong(0)
    (postings, stats, n)
  }

  /** Incremental index maintenance — fold a new batch's index into an
    * existing one without rebuilding (the reference's ES upsert is
    * incremental, upsert_bizcard_to_es.py:77-90; at 100 TB a
    * per-batch full postings rebuild is not an option).
    *
    * `merge(build(b1), build(b2)) == build(b1 ∪ b2)` exactly, PROVIDED
    * the batches carry disjoint doc ids — the upsert-key contract
    * (route replayed/updated docs through the LWW merge upstream, or
    * delete their postings first). tf rows from disjoint docs never
    * collide, so the postings fold is a pure union; df counts add.
    * Each fold is one keyed shuffle; since both sides are written
    * bucketed by term hash, at cluster scale this becomes a per-bucket
    * merge touching only buckets the delta actually hits.
    */
  def merge(postings: DataFrame, stats: DataFrame, n: Long,
            deltaPostings: DataFrame, deltaStats: DataFrame,
            deltaN: Long): (DataFrame, DataFrame, Long) = {
    val p = postings.unionByName(deltaPostings)
      .groupBy("field", "term", "doc").agg(sum("tf").as("tf"))
    val s = stats.unionByName(deltaStats)
      .groupBy("field", "term").agg(sum("df").as("df"))
    (p, s, n + deltaN)
  }

  /** Incremental maintenance of a STORED index: build the delta batch's
    * postings, fold them into the on-disk index, and cut over with ONE
    * parent-directory swap (postings + stats + meta staged together,
    * then `dir`→`dir__old`, `dir__stage`→`dir`). A per-table swap
    * could crash between tables and leave postings and stats from
    * different index versions — and a checkpoint replay would then
    * double-merge the batch into the half-updated postings; the single
    * parent swap keeps the whole index one consistent version, so
    * replay always starts from either the old or the new index.
    * Returns the new corpus size. */
  def mergeStored(spark: SparkSession, dir: String, newDocs: DataFrame,
                  idCol: String, fields: Seq[String]): Long = {
    import org.apache.hadoop.fs.Path
    graft.streaming.CardStream.recoverSwap(spark, dir) // single-writer path
    val (dp, ds, dn) = build(newDocs, idCol, fields)
    val (p, s, n) = readIndex(spark, dir)
    val (mp, ms, mn) = merge(p, s, n, dp, ds, dn)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = s"${dir}__stage"
    fs.delete(new Path(stage), true)
    // stage writes execute while the live index is still readable
    mp.withColumn("bucket", pmod(xxhash64(col("term")), lit(IndexBuckets)))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$stage/postings")
    ms.write.mode("overwrite").parquet(s"$stage/stats")
    spark.range(1).select(lit(mn).as("n"))
      .write.mode("overwrite").parquet(s"$stage/meta")
    val old = new Path(s"${dir}__old")
    if (fs.exists(old) && !fs.delete(old, true))
      throw new java.io.IOException(s"mergeStored: cannot clear stale $old")
    def rename(src: Path, dst: Path): Unit =
      if (!fs.rename(src, dst))
        throw new java.io.IOException(s"mergeStored: rename $src -> $dst failed")
    if (fs.exists(new Path(dir))) rename(new Path(dir), old)
    rename(new Path(stage), new Path(dir))
    fs.delete(old, true)
    mn
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

  /** [[queryStored]] with the corpus size served from the stored meta
    * table — no per-query counting pass over the corpus. */
  def queryStored(spark: SparkSession, dir: String,
                  boosts: Seq[(String, Double)], queryText: String,
                  limit: Int): DataFrame = {
    val n = spark.read.parquet(s"$dir/meta").head().getLong(0)
    queryStored(spark, dir, n, boosts, queryText, limit)
  }
}
