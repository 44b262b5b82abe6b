package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.cosine

/** Product quantization for embedding search (Jégou, Douze, Schmid,
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011) —
  * the memory-scale path for ANN at 100 TB.
  *
  * The corpus embedding column (`array<float>`, d dims = 4d bytes) is
  * compressed to `m` small integers (one per contiguous subspace, each
  * the id of the nearest sub-centroid): 64 float dims at m=8 become
  * 8 code bytes — a 32× smaller index, the difference between "the
  * index fits in executor memory" and "it doesn't". Queries never
  * decompress the corpus: asymmetric distance computation (ADC) scores
  * a candidate from a per-query lookup table of
  * `dot(query_subvector, sub_centroid)` — m array probes + m adds per
  * candidate, no float-vector math on the corpus side at all.
  *
  * Three operators, composing with the rest of the ANN family:
  *  - [[pqTrain]] — fit per-subspace codebooks. ONE corpus scan + one
  *    keyed shuffle per Lloyd round trains ALL m codebooks jointly
  *    (the subspace id rides the aggregation key) — not m sequential
  *    k-means fits.
  *  - [[pqEncode]] — codes + reconstruction norm in one NARROW scan
  *    (codebooks live in the plan as literals; no shuffle, no join).
  *  - [[pqTopK]] — ADC top-k: queries (the small side, per the probe
  *    shape of [[Similarity.bruteForceTopK]]) broadcast with their
  *    lookup tables; candidates fold through a bounded-heap top-k
  *    ([[TopK.grouped]]), so the only shuffle carries ≤ k·mappers rows
  *    per query.
  *
  * Composition: [[ivfPqEncode]] / [[ivfPqTopK]] stack the coarse
  * quantizer ([[Similarity.ivfAssign]] cells) under the codes →
  * IVF-PQ: nprobe cell pruning bounds the candidates, ADC bounds the
  * per-candidate cost, and the scanned index is bytes, not vectors —
  * the FAISS IVFPQ architecture as two DataFrame passes.
  *
  * Determinism mirrors [[Similarity.kmeansFit]]: hash-sampled seed
  * pool + farthest-first init (no RNG), first-min argmin on distances
  * rounded to 6 decimals (the [[Similarity.ivfAssign]] cross-engine
  * tie contract), so with a FIXED codebook the whole encode+ADC path
  * is SQL-expressible and oracle-checked (qX_pq), while the trained
  * path is gated by a planted-twin recall contract (qX_pq_recall).
  *
  * Sub-quantizer metric is L2 on subvectors (the PQ objective —
  * codebooks minimize reconstruction error, unlike the spherical
  * [[Similarity.kmeansFit]] whose cells are directional); the final
  * ADC score is cosine against the reconstruction, matching the
  * `sim` contract of the other ANN paths.
  */
object Pq {

  /** (sub → cid → sub-centroid); jagged ksub allowed (a subspace with
    * fewer distinct subvectors than ksub trains fewer centroids). */
  type Codebook = IndexedSeq[IndexedSeq[Array[Float]]]

  // ---- column helpers (all fold in double; float inputs upcast) ----

  /** Pq.Codebook → the float[][][] the native PQ expressions ship via
    * addReferenceObj (see [[graft.functions.expr.PqExprUtil]]). */
  private def cbArr(cb: Codebook): Array[Array[Array[Float]]] =
    cb.map(_.toArray).toArray

  // ---- HOF twins (executable specs of the native PQ expressions;
  // equivalence locked in PqSpec — do not delete) ----

  /** Σ (a_i − c_i)² against a literal sub-centroid. */
  private[graft] def dist2(v: Column, c: Array[Float]): Column =
    aggregate(
      zip_with(v, typedLit(c.toSeq), (a, b) => {
        val d = a.cast("double") - b.cast("double"); d * d
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Σ a_i · c_i against a literal sub-centroid. */
  private[graft] def dotLit(v: Column, c: Array[Float]): Column =
    aggregate(
      zip_with(v, typedLit(c.toSeq),
        (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** First-min argmin over a subspace's centroids, distances rounded
    * to 6 decimals — the cross-engine tie contract of
    * [[Similarity.ivfAssign]] (ties → lowest cid). */
  private[graft] def nearestCode(sv: Column, cents: IndexedSeq[Array[Float]]): Column = {
    val dists = array(cents.map(c => round(dist2(sv, c), 6)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  private[graft] def subSlice(vec: Column, sub: Int, subDim: Int): Column =
    slice(vec, sub * subDim + 1, subDim)

  /** Driver-side L2² (init runs over the seed pool only). */
  private def d2(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
    s
  }

  /** Codebook DataFrame (sub, cid, cvec) → driver structure, cids
    * densified in (sub, cid) order. O(m·ksub·subDim) floats — the same
    * driver footprint as the k-means centroid fold, annotated as such. */
  private def collectCodebook(codebook: DataFrame): Codebook = {
    val rows = codebook.select(col("sub").cast("int"), col("cid").cast("int"),
        col("cvec").cast("array<float>"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
    require(rows.nonEmpty, "empty codebook")
    rows.groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map { case (_, cs) => cs.sortBy(_._2).map(_._3).toIndexedSeq }
  }

  /** Fit per-subspace codebooks: m contiguous subspaces of dim/m dims
    * (FAISS's divisibility convention: dim % m == 0 — pad upstream for
    * odd dims), ksub centroids each, `iters` Lloyd rounds.
    *
    * Init is ONE hash-spread TakeOrdered scan (smallest
    * (xxhash64(id), id) — the [[Sampling]] convention) pulling
    * `seedPool` full vectors, then per-subspace farthest-first
    * (Gonzalez 1985, maximize min L2 to the chosen set, ties → lowest
    * pool index) driver-side over the pool slices; a zero-distance
    * candidate stops a subspace's traversal (fewer distinct
    * subvectors than ksub → fewer centroids, never duplicates).
    *
    * Each Lloyd round: one scan assigns every (row, subspace) to its
    * nearest sub-centroid (codebooks are plan literals — broadcast by
    * construction), then ONE keyed shuffle on (sub, cluster, pos) with
    * map-side partial sums returns m·ksub·subDim aggregated means to
    * the driver — all m codebooks advance together per round. Empty
    * clusters keep their previous centroid.
    *
    * @return codebook (sub, cid, cvec) ready for [[pqEncode]]/[[pqTopK]]
    */
  /** @param trainCap 0 = train the Lloyd rounds on every vector (the
    *   oracle-replayable gate form). At 100 TB pass a bound (the FAISS
    *   practice is ~100k-1M): training reads only the `trainCap` rows
    *   with the lowest (xxhash64(id), id) — the same hash-spread,
    *   rerun-stable rule as the seed pool, which stays a PREFIX of the
    *   sample — while encoding remains full-corpus. k-means means are
    *   statistics, not per-row state: a uniform sample's codebook
    *   converges to the full-corpus one, and trainCap ≥ n is exactly
    *   the full computation (PqSpec pins it). */
  def pqTrain(points: DataFrame, idCol: String, vecCol: String,
              m: Int, ksub: Int, iters: Int = 3,
              seedPool: Int = 256, trainCap: Int = 0): DataFrame = {
    require(m >= 1 && ksub >= 1, "need m >= 1 and ksub >= 1")
    val spark = points.sparkSession
    val ptsAll = points.select(col(idCol).as("id"),
        col(vecCol).cast("array<float>").as("vec"))
      .filter(col("vec").isNotNull)
    val pts = (if (trainCap > 0)
        ptsAll.orderBy(xxhash64(col("id")), col("id")).limit(trainCap)
      else ptsAll)
      .localCheckpoint(true) // scanned once for init + once per round
    // O(1) dim probe (first row), mirrors the schema-dynamic contract
    val dim = pts.select(size(col("vec"))).head.getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m (pad upstream)")
    val subDim = dim / m

    // ---- init: one scan, farthest-first per subspace over the pool ----
    val pool = pts
      .orderBy(xxhash64(col("id")), col("id"))
      .limit(math.max(seedPool, ksub))
      .orderBy(asc("id"))
      .collect().map(_.getSeq[Float](1).toArray)
    require(pool.nonEmpty, "PQ training needs at least one vector")
    var cb: Codebook = (0 until m).map { s =>
      val slices = pool.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
      val chosen = scala.collection.mutable.ArrayBuffer(slices.head)
      var exhausted = false
      while (chosen.size < ksub && !exhausted) {
        // maximize the min distance to the chosen set; maxBy is
        // first-wins, and the pool is id-sorted → ties pick lowest id
        val (cand, best) = slices.iterator
          .map(p => (p, chosen.iterator.map(c => d2(p, c)).min))
          .maxBy(_._2)
        if (best == 0.0) exhausted = true else chosen += cand
      }
      chosen.toIndexedSeq
    }

    // ---- Lloyd rounds: all m subspaces in one shuffle per round ----
    val subs = pts.select(col("id"),
      posexplode(array((0 until m).map(s =>
        subSlice(col("vec"), s, subDim)): _*)).as(Seq("sub", "sv")))
    for (_ <- 1 to iters) {
      // native assignment kernel: one plan node per round instead of
      // an m-way when-chain of ksub-literal HOF argmins (identical
      // semantics — the when-chain stays above as nearestCode's spec)
      val codeBySub = graft.functions.expr.VectorExprs
        .pq_nearest_by_sub(col("sub"), col("sv"), cbArr(cb))
      val stats = subs.withColumn("cluster", codeBySub)
        .select(col("sub"), col("cluster"), posexplode(col("sv")))
        .groupBy(col("sub"), col("cluster"), col("pos"))
        .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect() // m·ksub·subDim aggregated means — driver O(codebook)
      val bySub = stats.groupBy(_.getInt(0))
      cb = cb.indices.map { s =>
        val byCluster = bySub.getOrElse(s, Array.empty[org.apache.spark.sql.Row])
          .groupBy(_.getInt(1))
        cb(s).indices.map { j =>
          byCluster.get(j).map { rows =>
            rows.sortBy(_.getInt(2))
              .map(r => (r.getDouble(3) / r.getLong(4)).toFloat).toArray
          }.getOrElse(cb(s)(j)) // empty cluster keeps its previous mean
        }
      }
    }
    import spark.implicits._
    cb.zipWithIndex.flatMap { case (cents, s) =>
      cents.zipWithIndex.map { case (c, j) => (s, j, c.toSeq) }
    }.toDF("sub", "cid", "cvec")
      .select(col("sub"), col("cid"), col("cvec").cast("array<float>").as("cvec"))
  }

  /** Compress every vector to its m nearest-sub-centroid codes plus
    * the reconstruction's squared norm (`cnorm2` — query-independent,
    * so it is paid ONCE here, not per query). One narrow scan: the
    * codebook is embedded as plan literals, no join, no shuffle; the
    * output (id, codes, cnorm2) is the entire ANN index — m small ints
    * per vector instead of the float array.
    */
  def pqEncode(points: DataFrame, codebook: DataFrame,
               idCol: String, vecCol: String): DataFrame =
    appendCodes(points.select(col(idCol).as("id"),
      col(vecCol).cast("array<float>").as("vec")), collectCodebook(codebook))

  /** Append (codes, cnorm2) to a frame with a `vec` column and drop
    * the vector — the narrow-scan encode core shared by [[pqEncode]]
    * and [[ivfPqEncode]]. Codebook lives in the plan as literals. */
  private def appendCodes(withVec: DataFrame, cb: Codebook): DataFrame =
    withVec
      .withColumn("_enc",
        graft.functions.expr.VectorExprs.pq_encode(col("vec"), cbArr(cb)))
      .withColumn("codes", col("_enc.codes"))
      .withColumn("cnorm2", col("_enc.cnorm2"))
      .drop("_enc", "vec")

  /** HOF twin of the [[appendCodes]] encode (PqSpec equivalence). */
  private[graft] def appendCodesHof(withVec: DataFrame, cb: Codebook): DataFrame = {
    val subDim = cb.head.head.length
    val codes = array(cb.indices.map(s =>
      nearestCode(subSlice(col("vec"), s, subDim), cb(s))): _*)
    val norms = cb.map(_.map(c => c.map(x => x.toDouble * x).sum))
    val cnorm2 = cb.indices.map(s =>
      element_at(typedLit(norms(s)), element_at(col("codes"), s + 1) + 1))
      .reduce(_ + _)
    withVec
      .withColumn("codes", codes)
      .withColumn("cnorm2", cnorm2)
      .drop("vec")
  }

  /** ADC top-k: for each query, a lookup table
    * `lut[s][j] = dot(q_s, codebook[s][j])` is computed once in the
    * broadcast projection (m·ksub dots per QUERY — queries are the
    * small probe side); each encoded candidate then scores as
    * `Σ_s lut[s][codes_s] / (‖q‖·√cnorm2)` — m array probes, zero
    * vector math against the corpus. Final ranking is the shared
    * bounded-heap top-k, (sim desc, id asc), sim rounded to 4 like
    * every ANN path.
    */
  def pqTopK(queries: DataFrame, encoded: DataFrame, codebook: DataFrame,
             qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val cb = collectCodebook(codebook)
    val q = withLut(queries.select(col(qidCol).as("qid"),
        col(qvecCol).cast("array<float>").as("qvec")), cb)
      .drop("qvec")
    val scored = broadcast(q).join(encoded, col("qid") =!= col("id"))
      .withColumn("sim", adcSim(cb))
    rankTopK(scored, k)
  }

  /** Per-query ADC lookup tables + query norm appended to a (qid,
    * qvec) projection — the broadcast probe side shared by [[pqTopK]]
    * and [[ivfPqTopK]]. m·ksub dots per QUERY, computed once. */
  /** HOF twin of the [[withLut]] table (PqSpec equivalence). */
  private[graft] def lutHof(qvec: Column, cb: Codebook): Column = {
    val subDim = cb.head.head.length
    array(cb.indices.map(s =>
      array(cb(s).map(c =>
        dotLit(subSlice(qvec, s, subDim), c)): _*)): _*)
  }

  private def withLut(q: DataFrame, cb: Codebook): DataFrame = {
    val lut = graft.functions.expr.VectorExprs.pq_lut(col("qvec"), cbArr(cb))
    q.withColumn("lut", lut)
      .withColumn("qnorm",
        sqrt(aggregate(transform(col("qvec"),
          x => x.cast("double") * x.cast("double")), lit(0.0), (a, x) => a + x)))
  }

  /** ADC cosine against the reconstruction: m lut probes summed, over
    * ‖q‖·√cnorm2; zero norms → −1 (the shared ANN NaN rule), rounded
    * to 4 like every ANN `sim`. */
  private def adcSim(cb: Codebook): Column = {
    val adc = cb.indices.map(s =>
      element_at(element_at(col("lut"), s + 1),
        element_at(col("codes"), s + 1) + 1)).reduce(_ + _)
    round(nanvl(adc / (col("qnorm") * sqrt(col("cnorm2"))), lit(-1.0)), 4)
  }

  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    TopK.grouped(scored, Seq("qid"),
        struct((-col("sim")).as("ns"), col("id").as("i")), k)
      .select(col("qid"), col("best.i").as("id"), (-col("best.ns")).as("sim"))
      .orderBy(col("qid"), desc("sim"), col("id"))

  /** IVF-PQ index build: assign every vector to its nearest coarse
    * centroid cell ([[Similarity.ivfAssign]] — broadcast centroids,
    * narrow scan), then PQ-encode in the same pass. The output
    * (id, cell, codes, cnorm2) is the full two-level index: cells
    * bound WHICH rows a query scans (nprobe pruning), codes bound the
    * per-row COST (m probes) and the index SIZE (bytes). Write it
    * partitioned by `cell` and a probe reads only nprobe partitions
    * of a byte-sized table — the FAISS IVFPQ layout re-expressed as a
    * parquet table.
    *
    * Codes quantize the RAW vector, not the cell residual (FAISS's
    * default residual encoding halves quantization error but puts the
    * coarse centroid inside the code semantics; raw codes keep the
    * encode narrow, cell-independent, and SQL-expressible — the
    * documented precision/simplicity trade).
    */
  def ivfPqEncode(points: DataFrame, centroids: DataFrame, codebook: DataFrame,
                  idCol: String, vecCol: String): DataFrame = {
    val assigned = Similarity.ivfAssign(
        points.select(col(idCol).as("id"),
          col(vecCol).cast("array<float>").as("vec")),
        centroids, "id", "vec")
      .select(col("id"), col("vec"), col("cid").as("cell"))
    appendCodes(assigned, collectCodebook(codebook))
  }

  /** IVF-PQ probe: each query ranks the coarse centroids (broadcast,
    * rounded-cosine ties → lowest cid, the [[Similarity.ivfTopK]]
    * contract), keeps its `nprobe` best cells, and ADC-scores only the
    * encoded rows of those cells — candidates bounded by cells, cost
    * per candidate bounded by m lut probes, and the scan side is the
    * byte-code index, never the float corpus. The probes side
    * (queries × nprobe, carrying the luts) broadcasts; the only
    * shuffle is the bounded-heap top-k fold.
    */
  def ivfPqTopK(queries: DataFrame, encoded: DataFrame, codebook: DataFrame,
                centroids: DataFrame, qidCol: String, qvecCol: String,
                k: Int, nprobe: Int): DataFrame = {
    val cb = collectCodebook(codebook)
    val q = withLut(queries.select(col(qidCol).as("qid"),
      col(qvecCol).cast("array<float>").as("qvec")), cb)
    val wProbe = Window.partitionBy(col("qid")).orderBy(desc("qcsim"), asc("cid"))
    val probes = q.join(broadcast(centroids.select(col("cid"), col("cvec"))))
      .withColumn("qcsim", round(cosine(col("qvec"), col("cvec")), 6))
      .withColumn("_rn", row_number().over(wProbe))
      .filter(col("_rn") <= nprobe)
      .select(col("qid"), col("lut"), col("qnorm"), col("cid").as("cell"))
    val scored = broadcast(probes).join(encoded, Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .withColumn("sim", adcSim(cb))
    rankTopK(scored, k)
  }

  /** Greedy balanced assignment of eigen-dimensions to `m` subspaces
    * (Ge 2013 §4.1, the OPQ-P allocation): dims arrive in descending-
    * eigenvalue order; each goes to the not-yet-full subspace with the
    * smallest running log-variance sum, so every codebook quantizes a
    * comparable share of the total variance. Returns the dims of each
    * subspace in assignment order. */
  private[graft] def balancedAssign(logVars: Array[Double], m: Int,
                                        subDim: Int): Array[Array[Int]] = {
    val load = Array.fill(m)(0.0)
    val dims = Array.fill(m)(scala.collection.mutable.ArrayBuffer[Int]())
    for (i <- logVars.indices) {
      val b = (0 until m).filter(dims(_).size < subDim)
        .minBy(b => (load(b), b))
      dims(b) += i
      load(b) += logVars(i)
    }
    dims.map(_.toArray)
  }

  /** Parametric OPQ rotation (Ge 2013 "Optimized Product
    * Quantization", OPQ-P — the FAISS `OPQMatrix` pre-transform):
    * plain PQ's quantization error depends on how variance lands
    * across the m raw-dimension slices — correlated data starves some
    * codebooks and overloads others. OPQ-P learns ONE orthogonal
    * rotation: PCA-decorrelate ([[Pca.pcaFit]] — one moment scan +
    * driver Jacobi, no RNG), then permute the rotated dimensions with
    * [[balancedAssign]] so each subspace receives a balanced variance
    * share. A rotation preserves norms and dot products exactly, so
    * rotated-space ADC cosines equal original-space cosines up to
    * quantization error — which the rotation just reduced.
    *
    * @return the d×d rotation (permuted eigenbasis rows); feed to
    *         [[opqRotate]] for corpus AND queries, then run the plain
    *         [[pqTrain]]/[[pqEncode]]/[[pqTopK]] path unchanged.
    */
  def opqFit(points: DataFrame, vecCol: String, m: Int): Array[Array[Double]] = {
    val d = points.select(size(col(vecCol)).as("d")).head().getInt(0)
    require(m > 0 && d % m == 0, s"dim $d not divisible by m=$m")
    val (basis, evar, _) = Pca.pcaFit(points, vecCol, d)
    val logs = evar.map(v => math.log(math.max(v, 1e-12)))
    balancedAssign(logs, m, d / m).flatten.map(basis)
  }

  /** Apply an OPQ rotation to a vector column — one narrow codegen
    * mat-vec scan ([[Pca.project]] with a zero mean: rotation WITHOUT
    * centering keeps the dot-product geometry exact). Replaces
    * `vecCol` in place (as array<double>; the PQ path upcasts floats
    * to double anyway, so precision only improves). */
  def opqRotate(points: DataFrame, vecCol: String,
                rotation: Array[Array[Double]]): DataFrame =
    Pca.project(points, vecCol, "_rot", rotation,
        Array.fill(rotation(0).length)(0.0))
      .drop(vecCol).withColumnRenamed("_rot", vecCol)
}
