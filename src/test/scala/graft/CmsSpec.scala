package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

/** Count-Min contracts: the one-sided error guarantee under forced
  * collisions, exactness when the sketch is wide enough, and
  * cell-for-cell merge additivity. The qX_cms gates recompute the md5
  * sketch in DuckDB end-to-end.
  */
class CmsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def skewed = (0 until 300).map(i => Tuple1((i % 17).toLong))
    .toDF("k") // key j appears ~300/17 times

  test("estimates never under-count, even with heavy forced collisions") {
    // width 4 << 17 keys: every cell aliases several keys — est must
    // still be >= exact for each (the CMS hard guarantee)
    val sk = Sketches.cmsBuild(skewed, "k", width = 4, depth = 3)
    val keys = (0 until 17).map(i => Tuple1(i.toLong)).toDF("k")
    val got = Sketches.cmsEstimate(keys, "k", sk, width = 4, depth = 3)
      .join(skewed.groupBy("k").agg(count(lit(1)).as("exact")), "k")
      .select(col("est"), col("exact")).as[(Long, Long)].collect()
    assert(got.length == 17 && got.forall { case (e, x) => e >= x })
  }

  test("a wide sketch is exact for few keys; unseen keys can only read collisions") {
    val sk = Sketches.cmsBuild(skewed, "k", width = 1024, depth = 4)
    val keys = (0 until 17).map(i => Tuple1(i.toLong)).toDF("k")
    val got = Sketches.cmsEstimate(keys, "k", sk, width = 1024, depth = 4)
      .join(skewed.groupBy("k").agg(count(lit(1)).as("exact")), "k")
      .select(col("est"), col("exact")).as[(Long, Long)].collect()
    // 17 keys × 4 independent rows of 1024 cells: min across depths is
    // collision-free here (any alias would need to collide in ALL rows)
    assert(got.forall { case (e, x) => e == x })
    val absent = Sketches.cmsEstimate(Seq(Tuple1(9999L)).toDF("k"), "k",
        sk, width = 1024, depth = 4)
      .select(col("est")).head.getLong(0)
    assert(absent >= 0 && absent <= 300)
  }

  test("cmsJoinSize: exact on a wide sketch, never under-counts, 0-overlap reads near 0") {
    // single shared key: |a ⋈ b| = 3·4 = 12; two side-only keys can
    // only inflate a depth row they collide in — min picks a clean row
    val a = (0 until 3).map(_ => Tuple1(7L)).toDF("k")
      .unionAll(Seq(Tuple1(1L)).toDF("k"))
    val b = (0 until 4).map(_ => Tuple1(7L)).toDF("k")
      .unionAll(Seq(Tuple1(2L)).toDF("k"))
    val est = Sketches.cmsJoinSize(a, "k", b, "k", width = 2048, depth = 4)
      .select(col("est_join_size")).head.getLong(0)
    assert(est === 12L)
    // the one-sided guarantee under forced collisions: est >= exact
    val sk = skewed
    val exact = sk.as("x").join(sk.as("y"), col("x.k") === col("y.k")).count()
    val estSkew = Sketches.cmsJoinSize(sk, "k", sk, "k", width = 4, depth = 3)
      .select(col("est_join_size")).head.getLong(0)
    assert(estSkew >= exact)
    // disjoint key sets: only collision mass remains
    val d1 = (0 until 5).map(i => Tuple1(i.toLong)).toDF("k")
    val d2 = (100 until 105).map(i => Tuple1(i.toLong)).toDF("k")
    val estDisj = Sketches.cmsJoinSize(d1, "k", d2, "k",
        width = 2048, depth = 4)
      .select(col("est_join_size")).head.getLong(0)
    assert(estDisj === 0L)
    // both inputs empty: the one-row contract still holds, est = 0
    val e = Seq.empty[Tuple1[Long]].toDF("k")
    val estEmpty = Sketches.cmsJoinSize(e, "k", e, "k",
        width = 64, depth = 2).collect()
    assert(estEmpty.length === 1)
    assert(estEmpty.head.getAs[Long]("est_join_size") === 0L)
  }

  test("slice-merged sketch equals the one-pass sketch cell-for-cell") {
    val df = skewed.withColumn("slice", (col("k") % 3).cast("string"))
    val r = Sketches.cmsContract(df, "k", col("slice"), width = 8, depth = 3)
      .select(col("n_cells"), col("n_agree")).head
    assert(r.getLong(0) > 0 && r.getLong(0) == r.getLong(1))
  }
}
