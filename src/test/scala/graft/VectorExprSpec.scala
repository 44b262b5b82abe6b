package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.functions.expr.VectorExprs

/** Equivalence of the native cosine expression with the HOF fold it
  * replaces (same sequential double accumulation → bit-equal), plus
  * null contract and codegen participation.
  */
class VectorExprSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("cosine_sim equals the HOF fold on all sf0.001 embedding pairs (bit-exact)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"))
    val pairs = a.join(b, col("id1") < col("id2")).limit(20000)
    val bad = pairs.select(
        GraftFunctions.cosineHof(col("v1"), col("v2")).as("h"),
        VectorExprs.cosine_sim(col("v1"), col("v2")).as("e"))
      .filter(not(col("h") <=> col("e")))
    assert(bad.count() == 0)
  }

  test("null contract: null input, null element, unequal lengths → null") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f, 2.0f))),   // ok
      (None, Some(Seq(1.0f, 2.0f))),                    // null array
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f)))          // unequal length
    ).toDF("a", "b")
    val r = df.select(VectorExprs.cosine_sim(col("a"), col("b"))).collect()
    assert(!r(0).isNullAt(0) && math.abs(r(0).getDouble(0) - 1.0) < 1e-12)
    assert(r(1).isNullAt(0))
    assert(r(2).isNullAt(0))
    // null element inside the array (HOF poisons the fold → null)
    val withNullElem = spark.sql(
      "SELECT cast(array(1.0, NULL) AS array<double>) a, cast(array(1.0, 2.0) AS array<double>) b")
    val r2 = withNullElem.select(VectorExprs.cosine_sim(col("a"), col("b"))).collect()
    assert(r2(0).isNullAt(0))
  }

  test("sign_pack equals the HOF packing on embeddings + odd dims") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val bad = emb.select(
        Similarity.signPackHof(col("embedding").cast("array<double>")).as("h"),
        VectorExprs.sign_pack(col("embedding")).as("e"))
      .filter(not(col("h") <=> col("e")))
    assert(bad.count() == 0)
    // 70 dims → 2 words, upper bits zero; negative-zero packs as set
    val odd = Seq((Seq.tabulate(70)(i => if (i % 3 == 0) -1.0 else 1.0),
      1)).toDF("v", "id")
    val bad2 = odd.select(
        Similarity.signPackHof(col("v")).as("h"),
        VectorExprs.sign_pack(col("v")).as("e"))
      .filter(not(col("h") <=> col("e")))
    assert(bad2.count() == 0)
  }

  test("hamming_dist equals the HOF popcount fold; packed codes round-trip") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = emb.select(col("vec_id").as("id1"),
      VectorExprs.sign_pack(col("embedding")).as("c1"),
      col("embedding").as("v1"))
    val b = emb.select(col("vec_id").as("id2"),
      VectorExprs.sign_pack(col("embedding")).as("c2"),
      col("embedding").as("v2"))
    val pairs = a.join(b, col("id1") < col("id2")).limit(5000)
    val bad = pairs.select(
        Similarity.hammingHof(col("c1"), col("c2")).as("h"),
        VectorExprs.hamming_dist(col("c1"), col("c2")).as("e"),
        // ground truth: count of sign-differing dims
        aggregate(zip_with(col("v1"), col("v2"), (x, y) =>
            when((x >= 0) =!= (y >= 0), 1L).otherwise(0L)),
          lit(0L), _ + _).as("g"))
      .filter(not(col("h") <=> col("e")) || not(col("e") <=> col("g")))
    assert(bad.count() == 0)
  }

  test("bqTopK: identical vector reranks to sim 1.0 at the top") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") === 7)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val top = Similarity.bqTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", shortlist = 20, k = 3)
      .collect()
    assert(top.head.getLong(1) == 7L &&
      math.abs(top.head.getDouble(2) - 1.0) < 1e-9)
  }

  test("sign_lsh equals the HOF hyperplane formulation on all embeddings") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    for (m <- Seq(10, 12)) {
      val bad = emb.select(
          Similarity.randomHyperplaneLshHof(col("embedding"), m).as("h"),
          graft.functions.expr.VectorExprs.sign_lsh(col("embedding"), m).as("e"))
        .filter(not(col("h") <=> col("e")))
      assert(bad.count() == 0, s"m=$m")
    }
  }

  test("type checks: mixed float/double and non-fp arrays rejected at analysis") {
    val df = spark.sql(
      "SELECT cast(array(1.0, 2.0) AS array<float>) f, " +
        "cast(array(1.0, 2.0) AS array<double>) d, array(1, 2) i")
    for ((a, b) <- Seq(("f", "d"), ("f", "i"), ("i", "i"))) {
      val ex = intercept[Exception] {
        df.select(VectorExprs.cosine_sim(col(a), col(b))).collect()
      }
      assert(ex.getMessage.contains("cosine_sim") ||
        ex.getMessage.contains("DATATYPE_MISMATCH"), s"$a/$b: ${ex.getMessage}")
    }
    val ex2 = intercept[Exception] {
      df.select(VectorExprs.sign_lsh(col("i"), 8)).collect()
    }
    assert(ex2.getMessage.contains("sign_lsh") ||
      ex2.getMessage.contains("DATATYPE_MISMATCH"), ex2.getMessage)
  }

  test("cosine_sim participates in WholeStageCodegen") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = emb.select(VectorExprs.cosine_sim(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  test("hilbertIndex: bijective, unit-step adjacent, first-order golden values") {
    import graft.functions.expr.VectorExprUtil.hilbertIndex
    // first-order curve (bits = 1): the four quadrants in U order
    assert(hilbertIndex(0, 0, 1) == 0L)
    assert(hilbertIndex(0, 1, 1) == 1L)
    assert(hilbertIndex(1, 1, 1) == 2L)
    assert(hilbertIndex(1, 0, 1) == 3L)
    // bits = 5 (32x32): a bijection onto [0, 1024), and consecutive
    // indices are ALWAYS grid neighbors — the locality property
    // Z-order lacks (the defining Hilbert invariant)
    val cells = for (x <- 0 until 32; y <- 0 until 32)
      yield (x, y, hilbertIndex(x, y, 5))
    val byD = cells.map { case (x, y, d) => d -> (x, y) }.toMap
    assert(byD.keySet == (0L until 1024L).toSet, "not a bijection")
    for (d <- 0L until 1023L) {
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
    // the column form computes the same values through codegen
    val got = cells.take(100).map { case (x, y, _) => (x.toLong, y.toLong) }
      .toDF("x", "y")
      .select(col("x"), col("y"),
        VectorExprs.hilbert_key(col("x"), col("y"), 5).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    cells.take(100).foreach { case (x, y, d) =>
      assert(got((x.toLong, y.toLong)) == d)
    }
  }
}
