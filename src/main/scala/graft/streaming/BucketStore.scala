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
  *   manifest/manifest.tsv       driver-written pointer table (see below)
  *   files/<table>/g=<gen>/p=<bucket>/   parquet data of one bucket
  * }}}
  * The manifest is the single source of truth: a (table, bucket) row
  * points at the generation directory holding that bucket's current
  * rows. It is O(tables × buckets) pointer rows BY CONSTRUCTION, so it
  * is written and read driver-side as one small TSV file (not a Spark
  * parquet write/read — that costs a whole Spark job per touch, and on
  * a tiny-batch stream those fixed jobs ARE the trigger cost), cut
  * over by the same staged-rename swap as the data
  * ([[CardStream.swapStaged]], with the non-mutating `__old` reader
  * fallback of [[CardStream.tableOrEmpty]]). A fold
  *   1. writes each updated table's touched-bucket content under a
  *      fresh generation (strictly greater than every live gen, so the
  *      write can never clobber live files — a crashed fold leaves only
  *      orphan dirs that the next fold's overwrite + GC clean up);
  *   2. swaps in a new manifest re-pointing ONLY the touched buckets —
  *      one atomic cutover for all tables of the store, same
  *      crash-safety argument as
  *      [[graft.operators.SearchIndex.mergeStored]]'s single parent
  *      swap;
  *   3. best-effort deletes unreferenced generation leaves.
  * Readers resolve the manifest and read exactly the bucket paths they
  * need — manifest-driven pruning, no full-store scan, no
  * partition-discovery listing of the whole store.
  *
  * Replay fencing is the caller's policy: the manifest carries the
  * folding batch id; [[lastBatch]] exposes it.
  */
object BucketStore {

  /** Default bucket count for hash-bucketed tables (a (band,key) or id
    * hash); tables bucketed by a natural key (IVF cells) ignore it.
    * Callers may size a store differently (more buckets for a 100 TB
    * corpus, fewer for a small one) but a store MUST keep one bucket
    * count for its lifetime — writer and prober hash with the same
    * modulus, the [[graft.operators.SearchIndex.IndexBuckets]] rule. */
  val StoreBuckets = 64

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The whole manifest, resolved ONCE into driver memory. Single-
    * writer contract: the snapshot is valid for the duration of one
    * fold because only the folding caller writes the store.
    * `buckets` is the store's recorded hash-bucket modulus (-1 =
    * unrecorded: a fresh store, a pre-v2 store, or a natural-key
    * store like IVF cells) — [[commit]] refuses a fold whose declared
    * modulus disagrees, because writer and prober hashing with
    * different moduli silently splits a key's rows across buckets. */
  final case class Manifest(rows: Seq[(String, Long, Long)], lastBatch: Long,
                            maxGen: Long = -1L, buckets: Long = -1L)

  private val ManifestFile = "manifest.tsv"
  private val ManifestHeader = "graft-bucketstore-v2"

  /** Read the manifest TSV driver-side, with the crash-safe `__old`
    * fallback (a swap that died between its two renames leaves the
    * complete pre-swap manifest at `manifest__old`; the writer restores
    * it on its next swap — reading must NOT mutate, same argument as
    * [[CardStream.tableOrEmpty]]). */
  def loadManifest(spark: SparkSession, dir: String): Manifest = {
    val hfs = fs(spark, dir)
    val live = new Path(s"$dir/manifest/$ManifestFile")
    val old = new Path(s"$dir/manifest__old/$ManifestFile")
    val src = if (hfs.exists(live)) Some(live)
              else if (hfs.exists(old)) Some(old)
              else None
    src match {
      // a manifest DIRECTORY without the TSV is a store written by the
      // pre-TSV layout (parquet manifest rows incl. the _meta sentinel):
      // reading it as empty would silently orphan every accumulated
      // bucket, so fall back to one Spark read — the next commit writes
      // the TSV and the fallback never runs again for this store
      case None if hfs.exists(new Path(s"$dir/manifest")) ||
                   hfs.exists(new Path(s"$dir/manifest__old")) =>
        val mdf = CardStream.tableOrEmpty(spark, s"$dir/manifest",
          spark.range(0).select(lit("").as("table"), lit(0L).as("bucket"),
            lit(0L).as("gen"), lit(-1L).as("last_batch")))
        val rs = mdf.select(col("table"), col("bucket"), col("gen"),
          col("last_batch")).collect()
        val rows = rs.iterator.filter(_.getString(0) != "_meta")
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        val lb = if (rs.isEmpty) -1L else rs.map(_.getLong(3)).max
        val mg = if (rs.isEmpty) -1L else rs.map(_.getLong(2)).max
        Manifest(rows, lb, mg)
      case None => Manifest(Nil, -1L)
      case Some(p) =>
        val in = hfs.open(p)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toArray finally in.close()
        require(lines.nonEmpty && lines.head.startsWith(ManifestHeader),
          s"unrecognized BucketStore manifest at $p")
        val head = lines.head.split('\t')
        val rows = lines.iterator.drop(1).filter(_.nonEmpty).map { l =>
          val f = l.split('\t')
          (f(0), f(1).toLong, f(2).toLong)
        }.toSeq
        // header carries (lastBatch, maxGen[, buckets]): generation
        // numbering must stay monotone even when a fold empties every
        // bucket, or a later fold could reuse a gen that straggler
        // files still hold; buckets (absent in early-v2 headers) pins
        // the store's hash modulus
        Manifest(rows, head(1).toLong, head(2).toLong,
          if (head.length > 3) head(3).toLong else -1L)
    }
  }

  /** Atomically replace the manifest: stage dir + file write + the
    * shared two-rename cutover. One driver-side file op, no Spark job. */
  private def writeManifest(spark: SparkSession, dir: String,
                            rows: Seq[(String, Long, Long)],
                            batchId: Long, maxGen: Long,
                            buckets: Long): Unit = {
    val hfs = fs(spark, dir)
    val stage = new Path(s"$dir/manifest__stage")
    if (hfs.exists(stage) && !hfs.delete(stage, true))
      throw new java.io.IOException(s"cannot clear stale $stage")
    hfs.mkdirs(stage)
    val out = hfs.create(new Path(stage, ManifestFile), true)
    try {
      val sb = new StringBuilder
      sb.append(ManifestHeader).append('\t').append(batchId)
        .append('\t').append(maxGen).append('\t').append(buckets)
        .append('\n')
      rows.foreach { case (t, b, g) =>
        sb.append(t).append('\t').append(b).append('\t').append(g).append('\n')
      }
      out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    CardStream.swapStaged(spark, s"$dir/manifest")
  }

  /** The batch id of the last committed fold, -1 on a fresh store —
    * the caller's replay fence reads this. */
  def lastBatch(spark: SparkSession, dir: String): Long =
    loadManifest(spark, dir).lastBatch

  /** Read `table`, restricted to `buckets` when given (manifest-driven
    * path pruning — I/O is |buckets| leaf dirs, never the store).
    * Returns `fallbackSchema.limit(0)` when nothing is stored. Pass a
    * pre-loaded [[Manifest]] to resolve pointers without re-reading
    * the manifest file. */
  def read(spark: SparkSession, dir: String, table: String,
           buckets: Option[Seq[Long]], fallbackSchema: DataFrame,
           man: Option[Manifest] = None): DataFrame = {
    if (buckets.exists(_.isEmpty)) return fallbackSchema.limit(0)
    val m = man.getOrElse(loadManifest(spark, dir))
    val keep = buckets.map(_.toSet)
    val refs = m.rows.iterator
      .filter { case (t, b, _) => t == table && keep.forall(_(b)) }
      .map { case (_, b, g) => (b, g) }.toArray
    if (refs.isEmpty) return fallbackSchema.limit(0)
    val paths = refs.map { case (b, g) => s"$dir/files/$table/g=$g/p=$b" }
    val raw = spark.read.parquet(paths.toIndexedSeq: _*)
    // prune to the caller's schema: generations written by the fused
    // multi-table staging job (r16, see commit) physically carry the
    // OTHER tables' columns as nulls — invisible to every reader by
    // this projection. Single-table generations are unaffected (their
    // columns ARE the fallback set).
    val want = fallbackSchema.columns
    if (want.nonEmpty && want.forall(raw.columns.contains))
      raw.select(want.map(col).toIndexedSeq: _*)
    else raw
  }

  /** One atomic fold. Each update is (table, content, bucketCol,
    * touchedBuckets): `content` must hold the COMPLETE new rows of
    * exactly the touched buckets (merge semantics are the caller's —
    * append, LWW, delete all express as "new content of the bucket");
    * a touched bucket absent from `content` becomes empty. Untouched
    * buckets keep their manifest pointer and their files. */
  def commit(spark: SparkSession, dir: String,
             updates: Seq[(String, DataFrame, String, Seq[Long])],
             batchId: Long, manIn: Option[Manifest] = None,
             buckets: Long = -1L): Unit = {
    require(updates.map(_._1).distinct.size == updates.size,
      "one update per table")
    val hfs = fs(spark, dir)
    val m0 = manIn.getOrElse(loadManifest(spark, dir))
    // a declared modulus must match the store's recorded one: hashing
    // the same key with two moduli splits its rows across buckets and
    // the touched-bucket read silently misses half the history
    require(buckets < 0 || m0.buckets < 0 || buckets == m0.buckets,
      s"store $dir was bucketed with ${m0.buckets} buckets; fold declares $buckets")
    val recordBuckets = if (buckets >= 0) buckets else m0.buckets
    val man = m0.rows.toArray
    val newGen = (m0.maxGen +: man.map(_._3)).max + 1L
    // Multi-table folds stage EVERYTHING in ONE write job (r16): the
    // per-table write jobs are dominated by fixed cost (job submit,
    // committer setup/commitJob, writer init — measured ~250 ms per
    // write job on a micro-batch fold, half the wall of the streaming
    // gates), so the tables union under a `_t` tag + a two-level
    // partitionBy("_t", "p"), and the driver RENAMES each `_t=<table>`
    // subtree into that table's generation dir — the final on-disk
    // layout is unchanged. Tables with differently-typed shared column
    // names cannot union — those (and single-table folds) take the
    // per-table path below.
    def unifiable: Boolean = {
      val seen = scala.collection.mutable.HashMap[String, org.apache.spark.sql.types.DataType]()
      updates.forall { case (_, content, _, _) =>
        !content.columns.contains("_t") && !content.columns.contains("p") &&
          content.schema.forall(f => seen.put(f.name, f.dataType)
            .forall(_ == f.dataType))
      }
    }
    def writtenFused(): Seq[(String, Set[Long], Seq[Long])] = {
      val stage = new Path(s"$dir/files__stage")
      if (hfs.exists(stage) && !hfs.delete(stage, true))
        throw new java.io.IOException(s"cannot clear stale $stage")
      val tagged = updates.map { case (table, content, bucketCol, _) =>
        // sorted projection: one canonical on-disk column order per
        // table regardless of how the caller assembled the merge
        val cols = content.columns.sorted
        content.select(cols.map(col): _*)
          .withColumn("p", col(bucketCol))
          .withColumn("_t", lit(table))
      }
      val union = tagged.reduce((a, b) =>
        a.unionByName(b, allowMissingColumns = true))
      union.repartition(col("_t"), col("p")) // ~one file per leaf dir
        .write.mode("overwrite").partitionBy("_t", "p")
        .parquet(stage.toString)
      val out = updates.map { case (table, _, _, touched) =>
        val src = new Path(stage, s"_t=$table")
        val dest = new Path(s"$dir/files/$table/g=$newGen")
        // a crashed earlier fold can leave an orphan dir at this gen —
        // clear it, same argument as the overwrite mode below
        if (hfs.exists(dest) && !hfs.delete(dest, true))
          throw new java.io.IOException(s"cannot clear orphan $dest")
        val actual: Seq[Long] =
          if (hfs.exists(src)) {
            hfs.mkdirs(new Path(s"$dir/files/$table"))
            if (!hfs.rename(src, dest))
              throw new java.io.IOException(s"cannot move $src to $dest")
            // a touched bucket that merged to zero rows writes no dir —
            // it must drop OUT of the manifest, so list what landed
            hfs.listStatus(dest)
              .filter(s => s.isDirectory && s.getPath.getName.startsWith("p="))
              .map(_.getPath.getName.stripPrefix("p=").toLong).toSeq
          } else Seq.empty // every touched bucket of this table emptied
        (table, touched.toSet, actual)
      }
      hfs.delete(stage, true)
      out
    }
    // Single-table (or type-conflicting) folds: independent per-table
    // write jobs submitted from concurrent driver threads so the
    // second write's tasks back-fill cores the first's tail leaves
    // idle. The manifest swap happens strictly after every write.
    def writtenPerTable(): Seq[(String, Set[Long], Seq[Long])] = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      Await.result(
        Future.sequence(updates.map { case (table, content, bucketCol, touched) =>
          Future {
            val genDir = s"$dir/files/$table/g=$newGen"
            val cols = content.columns.sorted
            content.select(cols.map(col): _*)
              .withColumn("p", col(bucketCol))
              .repartition(col("p")) // ~one task per bucket dir, not tasks×buckets files
              .write.mode("overwrite").partitionBy("p").parquet(genDir)
            val actual = hfs.listStatus(new Path(genDir))
              .filter(s => s.isDirectory && s.getPath.getName.startsWith("p="))
              .map(_.getPath.getName.stripPrefix("p=").toLong).toSeq
            (table, touched.toSet, actual)
          }
        }), Duration.Inf)
    }
    val written =
      if (updates.size > 1 && unifiable) writtenFused() else writtenPerTable()
    val keep = man.filterNot { case (t, b, _) =>
      written.exists { case (wt, touched, _) => wt == t && touched(b) } }
    val rows = keep.map { case (t, b, g) => (t, b, g) } ++
      written.flatMap { case (t, _, actual) => actual.map(b => (t, b, newGen)) }
    writeManifest(spark, dir, rows.toSeq, batchId, newGen, recordBuckets)
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
