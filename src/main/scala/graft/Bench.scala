package graft

import org.apache.spark.sql.SparkSession

/** BENCH harness: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"value":…,"queries":{…}}.
  *
  * Each query is executed twice: a warmup pass (JIT + codegen + file
  * listing + parquet footer caches) and a timed pass — the steady-state
  * number is what a resident engine would serve, and what is comparable
  * across rounds. Queries run under AQE with shuffle partitions sized
  * to the local core count (not the 200 default).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.ui.retainedExecutions", "10")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS) — see Tables.load
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // shuffle/spill to tmpfs: the bench box has 128 GiB RAM and a
      // throttled virtual disk — shuffle I/O wait otherwise dominates
      // and adds 2-5x run-to-run variance
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS",
          if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
          else System.getProperty("java.io.tmpdir")))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warmup pass: JIT, codegen cache, FS listing — not representative
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // drop DataFrames persisted inside operators (e.g. the LSH shingle
    // cache): Spark's cache manager matches by plan equality, so the
    // timed pass would otherwise read the warmup's cache — and leaked
    // storage from earlier queries would squeeze later ones' execution
    // memory.
    spark.catalog.clearCache()
    // best of two timed passes: the box's virtual disk/CPU sees
    // transient co-tenant load spikes; min-of-2 reports steady-state
    // rather than whichever pass a spike landed on. Expensive or
    // unstable queries (min > 2 s, or the two passes disagree > 3×)
    // get a third pass: those are exactly the ones where one co-tenant
    // spike would otherwise stand as the round's committed number.
    def timedPass(name: String): Double = {
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // a throwing pass must not win the min with its fast failure
      if (ok) dt else Double.MaxValue
    }
    val results = names.map { name =>
      val two = (1 to 2).map(_ => timedPass(name))
      val dts = if (two.min != Double.MaxValue &&
          (two.min > 2.0 || two.max > 3.0 * two.min)) two :+ timedPass(name)
        else two
      // all passes failed → report -1 (visible in the JSON, excluded
      // from a sane total downstream) rather than a bogus latency
      name -> (if (dts.min == Double.MaxValue) -1.0 else dts.min)
    }
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    // -1 failure sentinels stay visible per-query but must not shrink
    // the headline total; surface them as an explicit count instead
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    def line(qs: String, extra: String): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$failed,"nqueries":${results.size},$extra"queries":$qs,"sf":"$sfDir"}"""
    // The full per-query map goes to a file: the harness builds the BENCH
    // artifact from a ~2 KB log tail, and at 155 queries the full line is
    // ~4.5 KB — its head (and the "{"metric" anchor) is ALWAYS cut off, so
    // r7/r8 recorded parsed:null. The file is the lossless committed copy.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_queries.json")
    val full = line(qJson(results), "")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), full + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}") }
    // stdout gets ONE line that FITS the tail capture: headline totals +
    // the slowest queries (the informative subset), truncated so the whole
    // line stays under ~1900 chars with the full map's location declared.
    val slowest = results.sortBy(-_._2)
    var k = slowest.size
    def compact(n: Int): String = line(qJson(slowest.take(n).sortBy(_._1)),
      s""""queries_shown":$n,"queries_file":"$outPath",""")
    while (k > 1 && compact(k).length > 1900) k -= 1
    println(compact(k))
    spark.stop()
  }
}
