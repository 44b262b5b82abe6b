package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca

/** Distributed PCA: Jacobi eigensolve on hand-checkable matrices,
  * planted-anisotropy recovery through the full moments→fit→project
  * pipeline, and bit-equality of the native mat-vec kernel with its
  * HOF twin.
  */
class PcaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("jacobiEig solves a hand-checkable symmetric matrix") {
    // [[2,1],[1,2]] -> eigenvalues 3, 1; eigenvectors (1,1)/√2, (1,-1)/√2
    val (evals, evecs) = Pca.jacobiEig(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(evals(0) - 3.0) < 1e-12 &&
      math.abs(evals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(evecs(0)(0) - r) < 1e-12 &&
      math.abs(evecs(0)(1) - r) < 1e-12)
    // sign convention: largest-|component| positive
    assert(evecs(1)(0) * evecs(1)(1) < 0)
    assert(math.abs(math.abs(evecs(1)(0)) - r) < 1e-12)
  }

  test("pcaFit recovers planted anisotropic axes in variance order") {
    // variance 9 on axis 2, 4 on axis 0, ~0 elsewhere; mean offset 5
    val rnd = new scala.util.Random(3)
    val rows = (1 to 400).map { i =>
      val a = rnd.nextGaussian() * 3.0
      val b = rnd.nextGaussian() * 2.0
      (i.toLong, Array(5.0f + b.toFloat, 0.1f * a.toFloat,
        5.0f + a.toFloat, 0.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val (basis, evar, mean) = Pca.pcaFit(df, "embedding", 2)
    // explained variance sorted desc and near the planted magnitudes
    assert(evar(0) > evar(1) && evar(0) > 6.0 && evar(1) > 2.0)
    // first component points (mostly) along axis 2, second along axis 0
    assert(math.abs(basis(0)(2)) > 0.9, basis(0).toSeq.toString)
    assert(math.abs(basis(1)(0)) > 0.9, basis(1).toSeq.toString)
    // orthonormal rows
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(basis(0), basis(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(basis(0), basis(1))) < 1e-9)
    // mean recovered
    assert(math.abs(mean(0) - 5.0) < 0.5 && math.abs(mean(2) - 5.0) < 0.5)
    // projecting the corpus onto the basis decorrelates: component 0
    // variance ≈ evar(0)
    val proj = Pca.project(df, "embedding", "y", basis, mean)
      .select(col("y")(0).as("y0")).agg(variance(col("y0"))).head.getDouble(0)
    assert(math.abs(proj - evar(0)) < 0.5)
  }

  test("native mat-vec project is bit-equal to the HOF twin") {
    val rnd = new scala.util.Random(11)
    val df = (1 to 50).map(i =>
        (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val basis = Array.tabulate(5, 16)((r, i) =>
      (((r * 16 + i).toLong * 2654435761L) % 1000L).toDouble / 1000.0 - 0.5)
    val mean = Array.tabulate(16)(i => i * 0.01)
    val nat = Pca.project(df, "embedding", "y", basis, mean)
      .select(col("vec_id"), col("y")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val hof = Pca.projectHof(df, "embedding", "y", basis, mean)
      .select(col("vec_id"), col("y")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(nat == hof) // exact ==, not tolerance: same fold order
  }

  test("mat-vec null contract: width mismatch poisons the row") {
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val basis = Array(Array(1.0, 0.0)); val mean = Array(0.0, 0.0)
    val out = Pca.project(df, "embedding", "y", basis, mean)
      .select(col("vec_id"), col("y")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty)
  }

  test("moments emits exactly d first-moment and d(d+1)/2 cells") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f, 3.0f)),
      Tuple1(Array(4.0f, 5.0f, 6.0f))).toDF("v")
    val cells = Pca.moments(df, "v").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(cells.size == 3 + 6)
    assert(cells((0, -1)) == (5000000L, 2L))   // 1+4 micros
    assert(cells((1, 2)) == (36000000L, 2L))   // 2*3 + 5*6 micros
    assert(cells((2, 2)) == (45000000L, 2L))   // 9 + 36 micros
  }

  test("randomProject: ~1/3 sparsity, determinism, JL distance distortion bound") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 40L).map(id =>
      (id, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("id", "v")
    val out = Pca.randomProject(df, "id", "v", 16, 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out.size == 40 * 16)
    // determinism: repartitioned input gives identical micros
    val out2 = Pca.randomProject(df.repartition(7), "id", "v", 16, 64)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out == out2)
    // the hash matrix really is ~2/3 zeros (1/6 each ±1)
    val nz = (0 until 16).map { j =>
      (0 until 64).count { i =>
        graft.functions.expr.PortableHash.md5_32(s"rp:$j:$i") % 6 >= 2 }
    }.sum
    assert(nz > 16 * 64 * 0.55 && nz < 16 * 64 * 0.78, s"zeros=$nz")
    // JL: rescaled pairwise distances within 60% of the originals
    // (k=16 is a loose regime — the bound just pins the scaling form)
    def vecOf(id: Long) = (0 until 16).map(j =>
      out((id, j)) / 1e6 * math.sqrt(3.0 / 16.0)).toArray
    val orig = rows.map { case (id, v) => id -> v.map(_.toDouble) }.toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for (i <- 1L to 10L; j <- (i + 1) to 10L) yield
      d2(vecOf(i), vecOf(j)) / d2(orig(i), orig(j))
    assert(ratios.forall(r => r > 0.3 && r < 2.2),
      s"distortion out of band: ${ratios.min} .. ${ratios.max}")
  }
}
