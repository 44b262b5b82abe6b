package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: `runMain graft.Explain <queryName> [sfDir]`
  * prints the formatted physical plan — the iterate-until-it's-the-
  * plan-you-want loop for every operator. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, dir).explain("formatted")
    spark.stop()
  }
}
