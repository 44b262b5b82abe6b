package graft.tmp

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

object Proto {
  def rulesOld(baskets: DataFrame, basketCol: String, itemCol: String,
               minSupport: Long, topN: Int): DataFrame = {
    val sets = baskets
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("items"))
    val n = sets.agg(count(lit(1)).as("n"))
    val itemCnt = sets.select(explode(col("items")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("ci"))
    val pairs = sets
      .select(explode(graft.functions.expr.TextExprs
        .array_combos(col("items"))).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(count(lit(1)).as("nab"))
      .filter(col("nab") >= minSupport)
    pairs
      .join(itemCnt.select(col("i"), col("ci").as("ca")), "i")
      .join(itemCnt.select(col("i").as("j"), col("ci").as("cb")), "j")
      .crossJoin(broadcast(n))
      .select(explode(array(
        struct(col("i").as("a"), col("j").as("b"), col("nab"),
          col("ca").as("c_a"), col("cb").as("c_b"), col("n")),
        struct(col("j").as("a"), col("i").as("b"), col("nab"),
          col("cb").as("c_a"), col("ca").as("c_b"), col("n"))))
        .as("r"))
      .select(col("r.a").as("a"), col("r.b").as("b"),
        col("r.nab").as("n_ab"),
        floor(lit(1000000L) * col("r.nab") / col("r.n")).cast("long")
          .as("support_micros"),
        floor(lit(1000000L) * col("r.nab") / col("r.c_a")).cast("long")
          .as("conf_micros"),
        floor(lit(1000000L) * (col("r.nab") * col("r.n")) /
          (col("r.c_a") * col("r.c_b"))).cast("long").as("lift_micros"))
      .orderBy(desc("lift_micros"), col("a"), col("b"))
      .limit(topN)
  }


  def rulesLazy(baskets: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long, topN: Int): DataFrame = {
    val sets = baskets
      .select(col(basketCol).as("b"), col(itemCol).as("i"))
      .groupBy(col("b"))
      .agg(sort_array(collect_set(col("i"))).as("items"))
    val counts = sets
      .select(explode(graft.functions.expr.TextExprs
        .array_combos_tagged(col("items"))).as("p"))
      .groupBy(col("p.i").as("i"), col("p.j").as("j"))
      .agg(count(lit(1)).as("c"))
    val n = counts.filter(col("i").isNull && col("j").isNull)
      .select(col("c").as("n"))
    val itemCnt = counts.filter(col("i").isNotNull && col("j").isNull)
      .select(col("i"), col("c").as("ci"))
    val pairs = counts.filter(col("j").isNotNull)
      .select(col("i"), col("j"), col("c").as("nab"))
      .filter(col("nab") >= minSupport)
    pairs
      .join(itemCnt.select(col("i"), col("ci").as("ca")), "i")
      .join(itemCnt.select(col("i").as("j"), col("ci").as("cb")), "j")
      .crossJoin(broadcast(n))
      .select(explode(array(
        struct(col("i").as("a"), col("j").as("b"), col("nab"),
          col("ca").as("c_a"), col("cb").as("c_b"), col("n")),
        struct(col("j").as("a"), col("i").as("b"), col("nab"),
          col("cb").as("c_a"), col("ca").as("c_b"), col("n"))))
        .as("r"))
      .select(col("r.a").as("a"), col("r.b").as("b"),
        col("r.nab").as("n_ab"),
        floor(lit(1000000L) * col("r.nab") / col("r.n")).cast("long")
          .as("support_micros"),
        floor(lit(1000000L) * col("r.nab") / col("r.c_a")).cast("long")
          .as("conf_micros"),
        floor(lit(1000000L) * (col("r.nab") * col("r.n")) /
          (col("r.c_a") * col("r.c_b"))).cast("long").as("lift_micros"))
      .orderBy(desc("lift_micros"), col("a"), col("b"))
      .limit(topN)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.codegen.cache.maxEntries","5000")
      .config("spark.sql.files.maxPartitionBytes","16m")
      .config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.local.dir","/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def li = graft.Tables.load(spark, dir, "lineitem")
    def rel(): Unit = { spark.catalog.clearCache(); spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false)) }
    def chk(tag: String, a: DataFrame, b: DataFrame): Unit = {
      val x = a.collect().map(_.toString); val y = b.collect().map(_.toString)
      println(s"EQUAL $tag = ${x.sameElements(y)} n=${x.length}"); rel()
    }
    chk("assoc", rulesOld(li, "l_orderkey", "l_partkey", 2L, 20),
      graft.operators.Assoc.rules(li, "l_orderkey", "l_partkey", 2L, 20))
    chk("assocLazy", rulesOld(li, "l_orderkey", "l_partkey", 2L, 20),
      rulesLazy(li, "l_orderkey", "l_partkey", 2L, 20))
    val times = Array.fill(3)(List.empty[Double])
    for (r <- 1 to 5) {
      var t0 = System.nanoTime(); rulesOld(li, "l_orderkey", "l_partkey", 2L, 20).count()
      times(0) = (System.nanoTime()-t0)/1e9 :: times(0); rel()
      t0 = System.nanoTime(); graft.operators.Assoc.rules(li, "l_orderkey", "l_partkey", 2L, 20).count()
      times(1) = (System.nanoTime()-t0)/1e9 :: times(1); rel()
      t0 = System.nanoTime(); rulesLazy(li, "l_orderkey", "l_partkey", 2L, 20).count()
      times(2) = (System.nanoTime()-t0)/1e9 :: times(2); rel()
    }
    println(f"AB assoc_old  min=${times(0).min}%.3f passes=${times(0).reverse.map(t=>f"$t%.2f").mkString(",")}")
    println(f"AB assoc_ckpt min=${times(1).min}%.3f passes=${times(1).reverse.map(t=>f"$t%.2f").mkString(",")}")
    println(f"AB assoc_lazy min=${times(2).min}%.3f passes=${times(2).reverse.map(t=>f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
