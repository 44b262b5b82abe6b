package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-
  * reduction / whitening step of an embedding pipeline (index smaller
  * vectors, decorrelate before SemDeDup-style clustering). Classic
  * two-stage shape: the CLUSTER reduces the corpus to its O(d²)
  * sufficient statistics in one scan, the DRIVER eigendecomposes the
  * d×d covariance (d is the embedding width — 64 here, a few hundred
  * in production; the d×d matrix is driver-trivial at any corpus
  * size), and projection back on the cluster is a pure narrow scan.
  *
  * Scale shape: [[moments]] explodes each row into its d first-moment
  * and d(d+1)/2 upper-triangle second-moment terms, then hash-
  * aggregates — map-side partial aggregation bounds the shuffle to
  * #tasks · d² cells, NOT rows · d² (the explode never leaves its
  * task). Terms are INTEGER MICROS (`round(x·1e6) as long`, the
  * repo-wide order-independence rule), so the statistic is exact,
  * engine-reproducible, and oracle-checkable. Eigendecomposition is
  * deterministic cyclic Jacobi (fixed sweep order, no RNG);
  * [[project]] is codegen'd `zip_with`/`aggregate` dot products
  * against a broadcast-literal basis — no shuffle, no UDF.
  */
object Pca {

  /** Corpus sufficient statistics as a table: one row per moment cell.
    * `j = -1` rows carry first moments `s = Σ trunc(xᵢ·1e6)`; `j >= i`
    * rows carry raw (uncentered) second moments
    * `s = Σ trunc(xᵢ·xⱼ·1e6)`. `n` rides every row (count is the third
    * sufficient statistic; keeping it per-row makes the table
    * self-contained and the oracle a single query).
    *
    * Two measured ±1-micro traps (91-94/2083 cells each at sf0.01):
    * (1) Spark float·float stays FLOAT — the product must be computed
    * in double on both sides, so cast BEFORE multiplying; (2) those
    * exact 48-bit dyadic products can land exactly on .5 micros,
    * where Spark's decimal-string HALF_UP round and DuckDB's round
    * disagree — so quantize by TRUNCATION (`cast(double as long)`,
    * identical in every engine), whose ≤1-micro bias is irrelevant to
    * a sufficient statistic.
    */
  def moments(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val firsts = transform(v, (x, i) =>
      struct(i.as("i"), lit(-1).as("j"),
        (x * lit(1e6)).cast("long").as("t")))
    // cast BEFORE multiplying: Spark float·float stays FLOAT (24-bit
    // product), while every oracle engine multiplies doubles — the
    // ±1-micro disagreement that truncation alone can't fix
    val seconds = flatten(transform(v, (xi, i) =>
      transform(slice(v, i + lit(1), size(v) - i), (xj, k) =>
        struct(i.as("i"), (i + k).as("j"),
          (xi.cast("double") * xj.cast("double") * lit(1e6))
            .cast("long").as("t")))))
    df.select(explode(concat(firsts, seconds)).as("m"))
      .groupBy(col("m.i").as("i"), col("m.j").as("j"))
      .agg(sum(col("m.t")).as("s"), count(lit(1)).as("n"))
  }

  /** Deterministic cyclic Jacobi eigendecomposition of a symmetric
    * d×d matrix (Golub & Van Loan §8.5): fixed (p,q) sweep order,
    * fixed sweep count, no RNG — the same matrix always yields the
    * same (eigenvalues, eigenvectors). Returns pairs sorted by
    * eigenvalue DESC, each eigenvector sign-normalized so its
    * largest-magnitude component is positive (Jacobi's sign is
    * otherwise arbitrary, which would make the fitted basis
    * run-dependent across BLAS-free reorderings).
    */
  def jacobiEig(m: Array[Array[Double]],
                sweeps: Int = 24): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps; p <- 0 until d - 1; q <- (p + 1) until d) {
      val apq = a(p)(q)
      if (math.abs(apq) > 1e-14) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val sign = if (theta >= 0) 1.0 else -1.0
        val t = sign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
    }
    val pairs = (0 until d).map { c0 =>
      val vec = Array.tabulate(d)(r => v(r)(c0))
      val iMax = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      val fixed = if (vec(iMax) < 0) vec.map(-_) else vec
      (a(c0)(c0), fixed)
    }.sortBy { case (ev, _) => -ev }
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  /** Fit a k-component PCA basis: one [[moments]] scan, then
    * driver-side covariance assembly (SAMPLE covariance, n−1) and
    * [[jacobiEig]]. Returns (basis rows k×d, explained variance per
    * component, mean vector) — feed the basis to [[project]].
    */
  def pcaFit(df: DataFrame, vecCol: String, k: Int):
      (Array[Array[Double]], Array[Double], Array[Double]) = {
    val cells = moments(df, vecCol).collect()
    require(cells.nonEmpty, "pcaFit on an empty corpus")
    // every cell must have seen the same row count — a mixed-width or
    // null-element corpus skews per-cell counts, and silently using
    // whichever cell collect() returned first would corrupt the basis
    // nondeterministically; fail loudly instead
    val ns = cells.map(_.getLong(3)).distinct
    require(ns.length == 1,
      s"pcaFit: ragged vector widths or null elements (cell row counts ${ns.sorted.mkString(",")})")
    val n = ns.head
    require(n > 1, s"pcaFit needs n > 1 rows, got $n")
    val d = cells.map(_.getInt(0)).max + 1
    val mean = new Array[Double](d)
    val raw = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val (i, j, s) = (r.getInt(0), r.getInt(1), r.getLong(2))
      if (j < 0) mean(i) = s / 1e6 / n
      else { raw(i)(j) = s / 1e6; raw(j)(i) = s / 1e6 }
    }
    val cov = Array.tabulate(d, d)((i, j) =>
      (raw(i)(j) - n * mean(i) * mean(j)) / (n - 1.0))
    val (evals, evecs) = jacobiEig(cov)
    (evecs.take(k), evals.take(k), mean)
  }

  /** Project (mean-centered) vectors onto `basis` — one narrow scan
    * through the native codegen mat-vec kernel
    * ([[graft.functions.expr.MatVecExpr]]): the basis rides to
    * executors once via `addReferenceObj`, each row costs one
    * primitive k·d loop. No shuffle, no UDF. [[projectHof]] is the
    * interpreted twin kept as the executable spec (bit-equality
    * locked in PcaSpec — same left-to-right accumulation).
    */
  def project(df: DataFrame, vecCol: String, outCol: String,
              basis: Array[Array[Double]],
              mean: Array[Double]): DataFrame =
    df.withColumn(outCol,
      graft.functions.expr.VectorExprs.mat_vec(col(vecCol), basis, mean))

  /** Higher-order-function twin of [[project]]: per component a
    * `zip_with` product + `aggregate` sum against the literal basis
    * row. CodegenFallback (interpreted lambdas) — the spec form, not
    * the hot path. */
  def projectHof(df: DataFrame, vecCol: String, outCol: String,
                 basis: Array[Array[Double]],
                 mean: Array[Double]): DataFrame = {
    val centered = zip_with(col(vecCol), array(mean.map(lit): _*),
      (x, m) => x - m)
    val comps = basis.map { row =>
      aggregate(
        zip_with(centered, array(row.map(lit): _*), (x, p) => x * p),
        lit(0.0), (acc, t) => acc + t)
    }
    df.withColumn(outCol, array(comps.toIndexedSeq: _*))
  }

  /** Oracle-exact projection variant: per-term integer micros
    * (`trunc(pᵢ·xᵢ·1e6)` summed as long — truncation for the same
    * dyadic-boundary reason as [[moments]]) against an arbitrary FIXED
    * basis, no centering — the engine-reproducible gate form of
    * [[project]] (float dot products sum order-dependently; micros
    * don't). Output long rows (id, component, y_micro).
    */
  def projectMicro(df: DataFrame, idCol: String, vecCol: String,
                   basis: Array[Array[Double]]): DataFrame = {
    val comps = basis.zipWithIndex.map { case (row, r) =>
      struct(lit(r).as("component"),
        aggregate(
          zip_with(col(vecCol), array(row.map(lit): _*),
            (x, p) => (x * p * lit(1e6)).cast("long")),
          lit(0L), (acc, t) => acc + t).as("y_micro"))
    }
    df.select(col(idCol), explode(array(comps.toIndexedSeq: _*)).as("c"))
      .select(col(idCol), col("c.component").as("component"),
        col("c.y_micro").as("y_micro"))
  }

  /** Sparse random projection (Achlioptas 2003): the DATA-FREE
    * dimensionality reduction next to PCA — entries
    * `R_ji ∈ {+1, −1, 0}` with probabilities {1/6, 1/6, 2/3} drawn
    * from `md5("rp:j:i") mod 6`, so the matrix needs no training
    * pass, no storage (it regenerates from the dims alone), and the
    * Johnson–Lindenstrauss distance guarantee holds with 2/3 of the
    * multiplies skipped. The √(3/outDim) scale constant is left to
    * the caller (distance COMPARISONS are scale-invariant; the spec
    * pins the JL distortion bound on the rescaled form).
    *
    * Projection itself is [[projectMicro]] — per-term truncated
    * integer micros, fold-order-free, fully oracle-replayable (the
    * hash matrix regenerates in SQL).
    *
    * @return (id, component, y_micro) — outDim rows per input row.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    outDim: Int, inDim: Int): DataFrame = {
    val basis: Array[Array[Double]] = Array.tabulate(outDim) { j =>
      Array.tabulate(inDim) { i =>
        graft.functions.expr.PortableHash.md5_32(s"rp:$j:$i") % 6 match {
          case 0 => 1.0
          case 1 => -1.0
          case _ => 0.0
        }
      }
    }
    projectMicro(df, idCol, vecCol, basis)
  }
}
