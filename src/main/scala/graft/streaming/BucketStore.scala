package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-merged multi-table store — the fold machinery that makes a
  * growing streaming store O(touched buckets) per micro-batch instead
  * of O(corpus): [[graft.streaming.CardStream.nearDupSuppress]] and
  * [[graft.streaming.CardStream.ivfMerge]] previously rewrote their
  * whole accumulated history every trigger (union + staged swap of the
  * full table); at 100 TB that is a 100 TB write per batch. Here a fold
  * writes NEW-GENERATION files for exactly the buckets the batch
  * touches and cuts over with ONE atomic manifest swap — files of
  * untouched buckets are byte-identical across a fold (gate-checked in
  * StreamingSpec).
  *
  * Layout under `dir`:
  * {{{
  *   manifest/                   (table, bucket, gen, last_batch) rows
  *   files/<table>/g=<gen>/p=<bucket>/   parquet data of one bucket
  * }}}
  * The manifest is the single source of truth: a (table, bucket) row
  * points at the generation directory holding that bucket's current
  * rows. A fold
  *   1. writes each updated table's touched-bucket content under a
  *      fresh generation (strictly greater than every live gen, so the
  *      write can never clobber live files — a crashed fold leaves only
  *      orphan dirs that the next fold's overwrite + GC clean up);
  *   2. swaps in a new manifest re-pointing ONLY the touched buckets
  *      (the shared [[CardStream.swapInto]] rename protocol — one
  *      atomic cutover for all tables of the store, same crash-safety
  *      argument as [[graft.operators.SearchIndex.mergeStored]]'s
  *      single parent swap);
  *   3. best-effort deletes unreferenced generation leaves.
  * Readers resolve the manifest (with the non-mutating `__old`
  * fallback of [[CardStream.tableOrEmpty]]) and read exactly the
  * bucket paths they need — manifest-driven pruning, no full-store
  * scan, no partition-discovery listing of the whole store.
  *
  * Replay fencing is the caller's policy: the manifest carries the
  * folding batch id on every row; [[lastBatch]] exposes it.
  */
object BucketStore {

  /** Bucket count for hash-bucketed tables (a (band,key) or id hash);
    * tables bucketed by a natural key (IVF cells) ignore it. One
    * constant so writer and prober can never disagree — the
    * [[graft.operators.SearchIndex.IndexBuckets]] rule. */
  val StoreBuckets = 64

  /** Sentinel manifest row's table name — keeps the manifest non-empty
    * (an all-buckets-empty store would otherwise write a zero-row
    * parquet dir that cannot be re-read) and carries `last_batch` even
    * when every data bucket is gone. Never matches a real table. */
  private val MetaTable = "_meta"

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestFallback(spark: SparkSession): DataFrame =
    spark.range(0).select(lit("").as("table"), lit(0L).as("bucket"),
      lit(0L).as("gen"), lit(-1L).as("last_batch"))

  private def manifest(spark: SparkSession, dir: String): DataFrame =
    CardStream.tableOrEmpty(spark, s"$dir/manifest", manifestFallback(spark))

  /** The whole manifest, resolved ONCE into driver memory (it is
    * O(tables × buckets) pointer rows by construction). A fold that
    * probes + merges several tables otherwise re-reads the manifest
    * parquet 4-6 times per micro-batch — each read a whole Spark job,
    * and on a tiny-batch stream those fixed jobs ARE the trigger cost.
    * Single-writer contract: the snapshot is valid for the duration of
    * one fold because only the folding caller writes the store. */
  final case class Manifest(rows: Seq[(String, Long, Long)], lastBatch: Long)

  def loadManifest(spark: SparkSession, dir: String): Manifest = {
    val rs = manifest(spark, dir)
      .select(col("table"), col("bucket"), col("gen"), col("last_batch"))
      .collect()
    val rows = rs.iterator.filter(_.getString(0) != MetaTable)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val lb = if (rs.isEmpty) -1L else rs.map(_.getLong(3)).max
    Manifest(rows, lb)
  }

  /** The batch id of the last committed fold, -1 on a fresh store —
    * the caller's replay fence reads this. */
  def lastBatch(spark: SparkSession, dir: String): Long =
    loadManifest(spark, dir).lastBatch

  /** Read `table`, restricted to `buckets` when given (manifest-driven
    * path pruning — I/O is |buckets| leaf dirs, never the store).
    * Returns `fallbackSchema.limit(0)` when nothing is stored. Pass a
    * pre-loaded [[Manifest]] to resolve pointers without re-reading
    * the manifest parquet (one Spark job saved per call). */
  def read(spark: SparkSession, dir: String, table: String,
           buckets: Option[Seq[Long]], fallbackSchema: DataFrame,
           man: Option[Manifest] = None): DataFrame = {
    if (buckets.exists(_.isEmpty)) return fallbackSchema.limit(0)
    val refs: Array[(Long, Long)] = man match {
      case Some(m) =>
        val keep = buckets.map(_.toSet)
        m.rows.iterator
          .filter { case (t, b, _) => t == table && keep.forall(_(b)) }
          .map { case (_, b, g) => (b, g) }.toArray
      case None =>
        val mdf = manifest(spark, dir).filter(col("table") === table)
        buckets.fold(mdf)(bs => mdf.filter(col("bucket").isin(bs: _*)))
          .select(col("bucket"), col("gen"))
          .collect() // O(#buckets) pointers — the manifest IS driver-small
          .map(r => (r.getLong(0), r.getLong(1)))
    }
    if (refs.isEmpty) return fallbackSchema.limit(0)
    val paths = refs.map { case (b, g) => s"$dir/files/$table/g=$g/p=$b" }
    spark.read.parquet(paths.toIndexedSeq: _*)
  }

  /** One atomic fold. Each update is (table, content, bucketCol,
    * touchedBuckets): `content` must hold the COMPLETE new rows of
    * exactly the touched buckets (merge semantics are the caller's —
    * append, LWW, delete all express as "new content of the bucket");
    * a touched bucket absent from `content` becomes empty. Untouched
    * buckets keep their manifest pointer and their files. */
  def commit(spark: SparkSession, dir: String,
             updates: Seq[(String, DataFrame, String, Seq[Long])],
             batchId: Long, manIn: Option[Manifest] = None): Unit = {
    require(updates.map(_._1).distinct.size == updates.size,
      "one update per table")
    val hfs = fs(spark, dir)
    val man = manIn.map(_.rows.toArray).getOrElse(
      manifest(spark, dir)
        .filter(col("table") =!= MetaTable)
        .select(col("table"), col("bucket"), col("gen"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))))
    val newGen = if (man.isEmpty) 0L else man.map(_._3).max + 1L
    val written = updates.map { case (table, content, bucketCol, touched) =>
      val genDir = s"$dir/files/$table/g=$newGen"
      // sorted projection: one canonical on-disk column order per table
      // regardless of how the caller assembled the merge
      val cols = content.columns.sorted
      content.select(cols.map(col): _*)
        .withColumn("p", col(bucketCol))
        .repartition(col("p")) // ~one task per bucket dir, not tasks×buckets files
        .write.mode("overwrite").partitionBy("p").parquet(genDir)
      // a touched bucket that merged to zero rows writes no dir — it
      // must drop OUT of the manifest, so list what actually landed
      val actual = hfs.listStatus(new Path(genDir))
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("p="))
        .map(_.getPath.getName.stripPrefix("p=").toLong).toSeq
      (table, touched.toSet, actual)
    }
    val keep = man.filterNot { case (t, b, _) =>
      written.exists { case (wt, touched, _) => wt == t && touched(b) } }
    val rows = keep.map { case (t, b, g) => (t, b, g) } ++
      written.flatMap { case (t, _, actual) => actual.map(b => (t, b, newGen)) } ++
      Seq((MetaTable, -1L, newGen))
    import spark.implicits._
    val newMan = rows.toSeq.toDF("table", "bucket", "gen")
      .withColumn("last_batch", lit(batchId))
    CardStream.swapInto(spark, newMan, s"$dir/manifest")
    gcUnreferenced(hfs, dir, rows.map { case (t, b, g) => (t, b, g) }.toSet)
  }

  /** Drop generation leaves no manifest row references (stale gens of
    * re-pointed buckets, orphans of crashed folds). Best-effort: a
    * failed delete costs disk, never correctness. */
  private def gcUnreferenced(hfs: FileSystem, dir: String,
                             referenced: Set[(String, Long, Long)]): Unit =
    try {
      val root = new Path(s"$dir/files")
      if (!hfs.exists(root)) return
      for (t <- hfs.listStatus(root) if t.isDirectory) {
        val table = t.getPath.getName
        for (g <- hfs.listStatus(t.getPath)
             if g.isDirectory && g.getPath.getName.startsWith("g=")) {
          val gen = g.getPath.getName.stripPrefix("g=").toLong
          for (p <- hfs.listStatus(g.getPath)
               if p.isDirectory && p.getPath.getName.startsWith("p=")) {
            val bucket = p.getPath.getName.stripPrefix("p=").toLong
            if (!referenced((table, bucket, gen))) hfs.delete(p.getPath, true)
          }
          if (hfs.listStatus(g.getPath).isEmpty) hfs.delete(g.getPath, true)
        }
      }
    } catch { case _: java.io.IOException => () }
}
