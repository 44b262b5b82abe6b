package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pq

/** Product quantization contracts: deterministic encode, exact ADC on
  * zero-error reconstructions, training recovery of planted subspace
  * structure, duplicate-centroid exhaustion, and the divisibility
  * precondition. The gate queries (qX_pq full SQL oracle, qX_pq_recall
  * trained-codebook twin recall) cover the end-to-end paths; these pin
  * the operator-level semantics.
  */
class PqSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // 4-dim vectors, m=2 subspaces of 2 dims; two distinct subvector
  // "atoms" per subspace → 4 possible exact reconstructions
  private val a0 = Seq(1.0f, 0.0f); private val a1 = Seq(0.0f, 1.0f)
  private val b0 = Seq(1.0f, 1.0f); private val b1 = Seq(2.0f, 0.0f)

  private def cbDF = Seq(
    (0, 0, a0), (0, 1, a1), (1, 0, b0), (1, 1, b1)
  ).toDF("sub", "cid", "cvec")
    .select(col("sub"), col("cid"), col("cvec").cast("array<float>").as("cvec"))

  test("encode: identical vectors get identical codes; codes index the nearest atom") {
    val pts = Seq(
      (1L, a0 ++ b0), (2L, a0 ++ b0),       // identical pair
      (3L, a1 ++ b1),
      (4L, Seq(0.9f, 0.1f) ++ Seq(1.9f, 0.1f)) // near (a0, b1)
    ).toDF("id", "vec").select(col("id"), col("vec").cast("array<float>").as("vec"))
    val enc = Pq.pqEncode(pts, cbDF, "id", "vec")
      .select(col("id"), col("codes")).as[(Long, Seq[Int])].collect().toMap
    assert(enc(1L) == Seq(0, 0) && enc(2L) == Seq(0, 0))
    assert(enc(3L) == Seq(1, 1))
    assert(enc(4L) == Seq(0, 1))
  }

  test("cnorm2 is the reconstruction's squared norm") {
    val pts = Seq((1L, a0 ++ b1)).toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val r = Pq.pqEncode(pts, cbDF, "id", "vec").select(col("cnorm2")).head
    // ||(1,0)||² + ||(2,0)||² = 1 + 4
    assert(math.abs(r.getDouble(0) - 5.0) < 1e-9)
  }

  test("ADC is exact cosine when the corpus has zero reconstruction error") {
    // corpus = exact atom concatenations; a query equal to a corpus row
    // must score sim 1.0 against it via the lookup table alone
    val corpus = Seq((1L, a0 ++ b0), (2L, a0 ++ b1), (3L, a1 ++ b0))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<float>").as("vec"))
    val enc = Pq.pqEncode(corpus, cbDF, "id", "vec")
    val q = Seq((100L, a0 ++ b1)).toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val top = Pq.pqTopK(q, enc, cbDF, "id", "vec", 1)
      .select(col("id"), col("sim")).head
    assert(top.getLong(0) == 2L && top.getDouble(1) == 1.0)
  }

  test("training recovers planted atoms when ksub matches the distinct subvectors") {
    // 40 rows drawn from the 4 exact combinations: with ksub=2 the
    // per-subspace Lloyd fixpoint is the atom set itself, so encode has
    // zero reconstruction error and every self-query ADC sim is 1.0
    val combos = Vector(a0 ++ b0, a0 ++ b1, a1 ++ b0, a1 ++ b1)
    val pts = (0 until 40).map(i => (i.toLong, combos(i % 4)))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<float>").as("vec"))
    val cb = Pq.pqTrain(pts, "id", "vec", m = 2, ksub = 2, iters = 3, seedPool = 16)
    val enc = Pq.pqEncode(pts, cb, "id", "vec")
    val q = pts.filter(col("id") < 4)
      .select((col("id") + 1000).as("id"), col("vec"))
    val res = Pq.pqTopK(q, enc, cb, "id", "vec", 5)
    // each query's twin family (same combo, ids ≡ qid-1000 mod 4) tops
    // the ranking at exactly 1.0
    val top = res.filter(col("sim") === 1.0)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
    for (qid <- 0L until 4L)
      assert(top.filter(_._1 == qid + 1000).forall(t => t._2 % 4 == qid),
        s"query $qid matched a foreign combo at 1.0")
    assert(top.length == 4 * 5, "all top-5 slots must be same-combo at sim 1.0")
  }

  test("trainCap >= n is the identity; a capped sample still recovers the atoms") {
    val combos = Vector(a0 ++ b0, a0 ++ b1, a1 ++ b0, a1 ++ b1)
    val pts = (0 until 40).map(i => (i.toLong, combos(i % 4)))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<float>").as("vec"))
    val full = Pq.pqTrain(pts, "id", "vec", m = 2, ksub = 2, iters = 3,
      seedPool = 16).orderBy("sub", "cid").collect().toSeq
    val capped = Pq.pqTrain(pts, "id", "vec", m = 2, ksub = 2, iters = 3,
      seedPool = 16, trainCap = 1000).orderBy("sub", "cid").collect().toSeq
    assert(capped == full, "trainCap >= n must be the exact computation")
    // a 12-row hash-spread sample of 40 rows drawn from 4 exact atoms
    // still has every atom with overwhelming probability, so the Lloyd
    // fixpoint is the same atom set and self-query ADC sim is 1.0
    val cb = Pq.pqTrain(pts, "id", "vec", m = 2, ksub = 2, iters = 3,
      seedPool = 16, trainCap = 12)
    val enc = Pq.pqEncode(pts, cb, "id", "vec")
    val q = pts.filter(col("id") < 4)
      .select((col("id") + 1000).as("id"), col("vec"))
    val perfect = Pq.pqTopK(q, enc, cb, "id", "vec", 1)
      .filter(col("sim") === 1.0).count()
    assert(perfect == 4L, "sampled-training codebook must still be lossless here")
  }

  test("fewer distinct subvectors than ksub yields fewer centroids, never duplicates") {
    val pts = (0 until 10).map(i => (i.toLong, if (i % 2 == 0) a0 ++ b0 else a1 ++ b0))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<float>").as("vec"))
    val cb = Pq.pqTrain(pts, "id", "vec", m = 2, ksub = 4, iters = 2, seedPool = 8)
    val sizes = cb.groupBy("sub").agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect().toMap
    assert(sizes(0) == 2, s"subspace 0 has 2 distinct atoms, got ${sizes(0)}")
    assert(sizes(1) == 1, s"subspace 1 has 1 distinct atom, got ${sizes(1)}")
    // jagged codebook still encodes (codes within each subspace's range)
    val enc = Pq.pqEncode(pts, cb, "id", "vec")
      .select(col("codes")).as[Seq[Int]].collect()
    assert(enc.forall(c => c(0) < 2 && c(1) == 0))
  }

  test("ivf-pq: nprobe = all cells is exactly pqTopK; nprobe=1 scans only the probed cell") {
    val combos = Vector(a0 ++ b0, a0 ++ b1, a1 ++ b0, a1 ++ b1)
    val pts = (0 until 40).map(i => (i.toLong, combos(i % 4)))
      .toDF("id", "vec").select(col("id"), col("vec").cast("array<float>").as("vec"))
    // two coarse cells along the first subspace's atom axis
    val cents = Seq((0, a0 ++ b0), (1, a1 ++ b0)).toDF("cid", "cvec")
      .select(col("cid"), col("cvec").cast("array<float>").as("cvec"))
    val enc = Pq.ivfPqEncode(pts, cents, cbDF, "id", "vec")
    val q = pts.filter(col("id") < 4)
      .select((col("id") + 1000).as("id"), col("vec"))
    // exhaustive probe ≡ flat PQ: identical candidate set, identical ranking
    val full = Pq.ivfPqTopK(q, enc, cbDF, cents, "id", "vec", 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val flat = Pq.pqTopK(q, enc.drop("cell"), cbDF, "id", "vec", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(full.sameElements(flat))
    // nprobe=1: every hit must come from the query's own best cell
    val cellOf = enc.select(col("id"), col("cell")).as[(Long, Int)].collect().toMap
    val pruned = Pq.ivfPqTopK(q, enc, cbDF, cents, "id", "vec", 5, nprobe = 1)
      .select(col("qid"), col("id")).as[(Long, Long)].collect()
    for ((qid, id) <- pruned)
      assert(cellOf(id) == cellOf(qid - 1000),
        s"query $qid got candidate $id from an unprobed cell")
  }

  test("opq: balanced assignment interleaves eigen-dims across subspaces") {
    // eigenvalues 4,3,2,1 (logs), m=2, subDim=2: greedy gives
    // subspace0 = {dim0, dim3}, subspace1 = {dim1, dim2} — variance
    // products 4·1 and 3·2, far more balanced than the naive 4·3 / 2·1
    val logs = Array(4.0, 3.0, 2.0, 1.0).map(math.log)
    val got = Pq.balancedAssign(logs, 2, 2)
    assert(got(0).toSeq == Seq(0, 3) && got(1).toSeq == Seq(1, 2))
  }

  test("opq: rotation is orthogonal (norms preserved) and balances subspace variance") {
    val rnd = new scala.util.Random(13)
    // anisotropic + correlated: first 4 raw dims carry nearly all the
    // variance, so a raw 2-subspace split is maximally unbalanced
    val rows = (1 to 300).map { i =>
      val big = Array.fill(4)(rnd.nextGaussian().toFloat * 10f)
      val small = Array.fill(4)(rnd.nextGaussian().toFloat * 0.1f)
      (i.toLong, big ++ small)
    }
    val df = rows.toDF("vec_id", "embedding")
    val rot = Pq.opqFit(df, "embedding", 2)
    val rdf = Pq.opqRotate(df, "embedding", rot)
    val both = df.select(col("vec_id"), col("embedding"))
      .join(rdf.select(col("vec_id"), col("embedding").as("remb")), "vec_id")
      .collect()
    def norm(a: Seq[Double]) = math.sqrt(a.map(x => x * x).sum)
    both.foreach { r =>
      val o = norm(r.getSeq[Float](1).map(_.toDouble))
      val n = norm(r.getSeq[Double](2))
      assert(math.abs(o - n) < 1e-3, s"norm changed: $o vs $n")
    }
    // subspace variance balance: rotated split ratio beats raw split
    def subVar(vecs: Seq[Seq[Double]]): Seq[Double] =
      (0 until 2).map { s =>
        (s * 4 until s * 4 + 4).map { d =>
          val xs = vecs.map(_(d)); val mu = xs.sum / xs.size
          xs.map(x => (x - mu) * (x - mu)).sum / xs.size
        }.sum
      }
    val rawV = subVar(both.map(_.getSeq[Float](1).map(_.toDouble).toSeq))
    val rotV = subVar(both.map(_.getSeq[Double](2).toSeq))
    val rawRatio = rawV.max / rawV.min
    val rotRatio = rotV.max / rotV.min
    assert(rotRatio < rawRatio / 10,
      s"rotation should balance variance: raw $rawRatio rot $rotRatio")
  }

  test("dim not divisible by m is rejected") {
    val pts = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val e = intercept[IllegalArgumentException] {
      Pq.pqTrain(pts, "id", "vec", m = 2, ksub = 2)
    }
    assert(e.getMessage.contains("divisible"))
  }

  // ---- native PQ expression vs HOF-twin equivalence (the r15
  // native-kernel rewrite must be value-identical, nulls included) ----

  // deterministic "awkward" vectors: near-ties, exact ties, values
  // that exercise the round-to-6 boundary, plus a short vector and a
  // null element (the zip_with null-poisoning contract)
  private def awkward = {
    val rows = (0L until 40L).map { i =>
      val v = Seq.tabulate(4) { d =>
        (((i * 7 + d * 13) % 11).toFloat / 7.0f) - 0.5f +
          (if ((i + d) % 3 == 0) 1e-7f else 0.0f)
      }
      (i, v)
    } :+ (100L, Seq(1.0f, 2.0f)) // short: second subspace slice empty
    rows.toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
      .unionByName(
        // a null element inside the FIRST subspace slice
        spark.range(1).select(lit(101L).as("id"),
          array(lit(null).cast("float"), lit(1.0f), lit(2.0f), lit(3.0f))
            .as("vec")))
  }

  private def cbBig = {
    // 2 subspaces x 3 centroids incl. an exact duplicate pair (tie →
    // lowest cid must win in both forms)
    Seq(
      (0, 0, Seq(0.25f, -0.25f)), (0, 1, Seq(0.25f, -0.25f)),
      (0, 2, Seq(-0.5f, 0.5f)),
      (1, 0, Seq(0.0f, 0.0f)), (1, 1, Seq(1.0f, -1.0f)),
      (1, 2, Seq(0.1f, 0.1f))
    ).toDF("sub", "cid", "cvec")
      .select(col("sub"), col("cid"), col("cvec").cast("array<float>").as("cvec"))
  }

  test("pq_encode (native) equals the HOF-twin encode, nulls and ties included") {
    val native = Pq.pqEncode(awkward, cbBig, "id", "vec")
      .select(col("id"), col("codes"), col("cnorm2"))
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    // HOF twin path: same codebook, same frame
    val cb = cbBig.select(col("sub").cast("int"), col("cid").cast("int"),
        col("cvec")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map { case (_, cs) => cs.sortBy(_._2).map(_._3).toIndexedSeq }
    val hof = Pq.appendCodesHof(
        awkward.select(col("id"), col("vec")), cb)
      .select(col("id"), col("codes"), col("cnorm2"))
      .collect().map(r => r.getLong(0) -> ((r.get(1), r.get(2)))).toMap
    assert(native.keySet == hof.keySet)
    native.keySet.foreach { id =>
      // codes must agree everywhere, poisoned rows included
      assert(native(id)._1 == hof(id)._1,
        s"id=$id native=${native(id)} hof=${hof(id)}")
      // cnorm2 must agree on every WELL-FORMED vector; on poisoned
      // rows (null code) the HOF form's value is an optimizer accident
      // (element_at over a null index constant-folds to an arbitrary
      // element — measured 0.0 here, 0.5 in an isolated probe), so the
      // native expression pins the sane contract instead: NULL.
      if (id < 100L)
        assert(native(id)._2 == hof(id)._2,
          s"id=$id native=${native(id)} hof=${hof(id)}")
    }
    assert(native(100L)._2 == null && native(101L)._2 == null)
  }

  test("pq_lut (native) equals the HOF-twin lookup table") {
    val cb = cbBig.select(col("sub").cast("int"), col("cid").cast("int"),
        col("cvec")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map { case (_, cs) => cs.sortBy(_._2).map(_._3).toIndexedSeq }
    val cbArr = cb.map(_.toArray).toArray
    val q = awkward.select(col("id"), col("vec").as("qvec"))
    val native = q.select(col("id"),
        graft.functions.expr.VectorExprs.pq_lut(col("qvec"), cbArr).as("lut"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    val hof = q.select(col("id"), Pq.lutHof(col("qvec"), cb).as("lut"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    native.keySet.foreach { id =>
      assert(native(id) == hof(id), s"id=$id native=${native(id)} hof=${hof(id)}")
    }
  }

  test("pq_nearest_by_sub (native) equals the when-chain of nearestCode") {
    val cb = cbBig.select(col("sub").cast("int"), col("cid").cast("int"),
        col("cvec")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1).toIndexedSeq.sortBy(_._1)
      .map { case (_, cs) => cs.sortBy(_._2).map(_._3).toIndexedSeq }
    val cbArr = cb.map(_.toArray).toArray
    val subs = awkward.select(col("id"),
      posexplode(array(
        Pq.subSlice(col("vec"), 0, 2), Pq.subSlice(col("vec"), 1, 2)))
        .as(Seq("sub", "sv")))
    val native = subs.select(col("id"), col("sub"),
        graft.functions.expr.VectorExprs
          .pq_nearest_by_sub(col("sub"), col("sv"), cbArr).as("c"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.get(2))).toMap
    val chain = (1 until 2).foldLeft(
      when(col("sub") === 0, Pq.nearestCode(col("sv"), cb(0)))) {
      (acc, s) => acc.when(col("sub") === s, Pq.nearestCode(col("sv"), cb(s)))
    }
    val hof = subs.select(col("id"), col("sub"), chain.as("c"))
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.get(2))).toMap
    assert(native.keySet == hof.keySet)
    native.keySet.foreach { k =>
      assert(native(k) == hof(k), s"key=$k native=${native(k)} hof=${hof(k)}")
    }
  }
}
