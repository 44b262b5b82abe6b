package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QualityLr

/** Quality-classifier contracts: feature normalization, the zero-init
  * first GD round (hand-computed), weight symmetry on a balanced
  * corpus, score direction, determinism, empty-doc exclusion. The
  * qX_lr_* gates pin the full training loop against DuckDB. */
class QualityLrSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("features: L1-normalized micros per doc, empty doc absent") {
    val docs = Seq((1L, "a b a"), (2L, "z"), (3L, "")).toDF("doc_id", "text")
    val f = QualityLr.features(docs, "doc_id", "text", 4096)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // "a b a" → features a,b,a,"a b","b a": 5 instances; a has 2 → 400000
    val d1 = f.filter(_._1 == 1L)
    assert(d1.map(_._3).sorted.toSeq == Seq(200000L, 200000L, 200000L, 400000L))
    assert(d1.map(_._3).sum == 1000000L)
    assert(f.filter(_._1 == 2L).map(_._3).toSeq == Seq(1000000L))
    assert(!f.exists(_._1 == 3L), "featureless doc contributes nothing")
  }

  test("features: codegen expression ≡ exploded md5-groupBy-window formulation") {
    // the executable spec the single-scan expression replaced — same
    // rows bit-for-bit on real documents (the oracle replays this form)
    import graft.functions.expr.TextExprs.word_ngrams
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val buckets = 64
    val spec = docs
      .select(col("doc_id"), explode(concat(word_ngrams(col("text"), 1),
        word_ngrams(col("text"), 2))).as("_f"))
      .select(col("doc_id"),
        pmod(graft.operators.Sampling.md5Bucket(col("_f")), lit(buckets))
          .as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("n_feats",
        sum(col("cnt")).over(Window.partitionBy(col("doc_id"))))
      .select(col("doc_id"), col("bucket"),
        round(col("cnt") * lit(1e6) / col("n_feats")).cast("long")
          .as("x_micros"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    val fast = QualityLr.features(docs, "doc_id", "text", buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(fast.length == spec.length && fast.sameElements(spec),
      s"expression/spec divergence: ${fast.length} vs ${spec.length} rows")
  }

  test("hashed_margin kernel ≡ typedLit-map aggregate HOF on real docs") {
    // the reference-object fold the r16 GD loop uses, pinned to the
    // exact HOF form the r15 loop evaluated (QualityLr.marginHofSpec)
    // on real documents under several weight vectors incl. negatives
    import graft.functions.expr.TextExprs
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val buckets = 64
    val fs = docs.select(
      TextExprs.hashed_ngram_features(col("text"), buckets).as("fs"))
      .filter(size(col("fs")) > 0)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val w = (0 until buckets).flatMap { b =>
        if (rnd.nextBoolean()) Some(b.toLong -> (rnd.nextInt(2000001) - 1000000L))
        else None
      }.toMap
      val wArr = new Array[Long](buckets)
      w.foreach { case (b, g) => wArr(b.toInt) = g }
      val both = fs.select(
        QualityLr.marginHofSpec(w).as("spec"),
        TextExprs.hashed_margin(col("fs"), wArr).as("fast"))
      assert(both.filter(col("spec") =!= col("fast")).isEmpty,
        s"kernel/spec divergence under w=$w")
    }
  }

  test("train: hand-computed symmetric weights on a 2-doc corpus") {
    // one target doc {a}, one raw doc {b}, no bucket collision (checked):
    // round 1: m=0 → p=500000 → r=∓500000 → w=±250000;
    // round 2: m=±250000 → p(0.25)=562177 → r_t=-437823 →
    //   w_a = 250000 + round(437823/2) = 468912 (and w_b = -w_a)
    val docs = Seq((1L, "a", 1), (2L, "b", 0)).toDF("doc_id", "text", "y")
    val fb = QualityLr.features(docs, "doc_id", "text", 1024)
      .select("bucket").as[Long].collect()
    assert(fb.distinct.length == 2, "test premise: a and b must not collide")
    val w1 = QualityLr.train(docs, "doc_id", "text", "y", 1024, 1, 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1.values.toSeq.sorted == Seq(-250000L, 250000L))
    val w2 = QualityLr.train(docs, "doc_id", "text", "y", 1024, 2, 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w2.values.toSeq.sorted == Seq(-468912L, 468912L))
  }

  test("paretoSelect: p=1 always kept, p=0 kept only on a >1e6 Pareto draw, replays") {
    val certain = (0L until 200L).map((_, 5L, 1000000L))
      .toDF("doc_id", "n_buckets", "p_micros")
    assert(QualityLr.paretoSelect(certain, "doc_id").count() == 200,
      "p=1 ⇒ 1−p=0 < every Pareto draw ⇒ always kept")
    val hopeless = (0L until 2000L).map((_, 5L, 0L))
      .toDF("doc_id", "n_buckets", "p_micros")
    val kept = QualityLr.paretoSelect(hopeless, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // survival needs pareto > 1e6: P = 2^-9, so ~4 of 2000 — long
    // tail present but rare, and every survivor's draw proves it
    assert(kept.forall(_._2 > 1000000L))
    assert(kept.nonEmpty && kept.length < 40,
      s"α=9 tail keep-rate must be ≈ 1/512, got ${kept.length}/2000")
    val again = QualityLr.paretoSelect(hopeless, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(kept.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("score: separates target-like from raw-like, unseen buckets weigh 0") {
    val train = ((0 until 20).map(i => (i.toLong, "the cat sat on the mat", 1))
      ++ (20 until 40).map(i => (i.toLong, "xz qq vv kk ww yy", 0)))
      .toDF("doc_id", "text", "y")
    val model = QualityLr.train(train, "doc_id", "text", "y", 256, 3, 1.0)
    val probe = Seq((100L, "the cat sat"), (101L, "xz qq vv"),
      (102L, "neverseen tokens only"), (103L, "")).toDF("doc_id", "text")
    val p = QualityLr.score(probe, "doc_id", "text", model, 256)
      .select(col("doc_id"), col("p_micros")).as[(Long, Long)].collect().toMap
    assert(p(100L) > 500000L, s"target-like must score > 0.5, got ${p(100L)}")
    assert(p(101L) < 500000L, s"raw-like must score < 0.5, got ${p(101L)}")
    assert(p(102L) == 500000L, "all-unseen buckets ⇒ zero margin ⇒ p = 0.5")
    assert(!p.contains(103L), "featureless doc absent from scores")
    // determinism: the fitted model replays exactly
    val again = QualityLr.train(train, "doc_id", "text", "y", 256, 3, 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(model.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == again)
  }

  test("plattFit: hand-computed first round, separable margins steepen A") {
    import graft.operators.QualityLr
    // m = ±2e6, y = 1/0: p = σ(±2) → resid ∓119203 → gA = −476812,
    // gB = 0 → A += trunc(0.3·476812/2) = 71521
    val m = Seq((2000000L, 1), (-2000000L, 0)).toDF("m_micros", "y")
    val r1 = QualityLr.plattFit(m, "m_micros", "y", iters = 1).head()
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2)) ==
      ((2L, 1071521L, 0L)))
    // more rounds keep steepening on separable data; B stays 0 by
    // symmetry
    val r3 = QualityLr.plattFit(m, "m_micros", "y", iters = 3).head()
    assert(r3.getLong(1) > 1071521L && r3.getLong(2) == 0L)
    // apply: calibrated p is monotone in the margin
    val p = QualityLr.plattApply(
        Seq((1L, 2000000L), (2L, -2000000L)).toDF("id", "m_micros"),
        "id", "m_micros", r3.getLong(1), r3.getLong(2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p(1L) > 500000L && p(2L) < 500000L && p(1L) + p(2L) == 1000000L)
  }

  test("naiveBayes: hand-computed add-1 grid, OOV drop, tie-to-0 pred") {
    import graft.operators.NaiveBayes
    // class 1: "spam spam ham" (tok1=3); class 0: "ham eggs" (tok0=2);
    // vocab = 3 → e.g. ll1(spam) = ln(3/6), ll0(spam) = ln(1/5)
    val train = Seq((1L, "spam spam ham", 1), (2L, "ham eggs", 0))
      .toDF("doc_id", "text", "y")
    val model = NaiveBayes.train(train, "doc_id", "text", "y")
    val m = model.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m == Map(
      "spam" -> (-1609438L, -693147L),
      "ham" -> (-916291L, -1098612L),
      "eggs" -> (-916291L, -1791759L)))
    val pri = NaiveBayes.priors(train, "doc_id", "text", "y")
    val pr = pri.collect().head
    assert((pr.getLong(2), pr.getLong(3), pr.getLong(4)) == ((2L, 3L, 3L)))
    assert((pr.getLong(5), pr.getLong(6)) == ((-693147L, -693147L)))
    // probe: "spam eggs unknownword" → OOV dropped; spam pulls to 1,
    // eggs pulls to 0, spam wins: s1 = -693147-1791759 beats
    // s0 = -1609438-916291; all-OOV doc absent entirely
    val probe = Seq((3L, "spam eggs unknownword"), (4L, "zzz"))
      .toDF("doc_id", "text")
    val sc = NaiveBayes.score(probe, "doc_id", "text", model, pri)
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(sc(3L) == ((-3218876L, -3178053L, 1L)))
    assert(!sc.contains(4L), "doc with no in-vocab token is absent")
  }
}
