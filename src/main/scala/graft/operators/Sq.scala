package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — the third vector-compression family next
  * to [[Pq]] (PQ / IVF-PQ): each dimension is affinely mapped to one
  * byte, `code = round(255·(x−mn)/(mx−mn))` clamped to [0, 255], so a
  * d-dim float vector becomes d bytes (4× smaller than float32, no
  * codebook to train beyond per-dim ranges). FAISS's
  * `ScalarQuantizer(QT_8bit)`; the precision/size middle ground —
  * PQ compresses harder, SQ8 reconstructs closer.
  *
  * Everything is SQL-expressible (the ranges are two 64-key folds,
  * the codes a per-element affine), so unlike LSH/MinHash the WHOLE
  * index — codes included — gets a full DuckDB oracle, not just a
  * recall twin. Arithmetic parity rules: vectors cast to double
  * first, dots are IN-ORDER left folds (list_inner_product order),
  * sims `round(…, 4)` with the shared zero-norm → −1 rule.
  *
  * 100 TB shape: train = one narrow posexplode + a d-key fold (d
  * rows to the driver, O(d) like PQ's codebook); encode = one narrow
  * scan appending (codes, rnorm2); probe = broadcast queries × codes
  * scan with a bounded-heap top-k — the scan reads d BYTES per row
  * plus one precomputed norm, the 4× I/O win that is the point of
  * SQ8. Degenerate dims (mx = mn) code to 0 and reconstruct mn.
  */
object Sq {

  /** Per-dimension ranges: (dim, mn, mx), dim 1-based (SQL subscript
    * convention). One posexplode + one d-key fold. */
  def sq8Train(points: DataFrame, vecCol: String): DataFrame =
    points.select(posexplode(col(vecCol).cast("array<double>")))
      .select((col("pos") + 1).as("dim"), col("col").as("x"))
      .groupBy(col("dim")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))

  /** O(d) driver collect of the range table — the PQ
    * collectCodebook convention. */
  private def collectRanges(ranges: DataFrame): (Seq[Double], Seq[Double]) = {
    val rows = ranges.select(col("dim").cast("long"), col("mn"), col("mx"))
      .collect().sortBy(_.getLong(0))
    (rows.map(_.getDouble(1)).toSeq, rows.map(_.getDouble(2)).toSeq)
  }

  private def reconstruct(codes: Column, mns: Column, mxs: Column): Column =
    zip_with(codes, zip_with(mns, mxs, (a, b) => struct(a.as("mn"), b.as("mx"))),
      (c, r) => r.getField("mn")
        + c * (r.getField("mx") - r.getField("mn")) / lit(255.0))

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  /** Encode vectors under a [[sq8Train]]ed range table:
    * (idCol, codes: array<long> of d bytes, rnorm2: ‖reconstruction‖²
    * precomputed so probes never rebuild it). Narrow scan. */
  def sq8Encode(points: DataFrame, ranges: DataFrame, idCol: String,
                vecCol: String): DataFrame = {
    val (mns, mxs) = collectRanges(ranges)
    val mnsL = typedlit(mns); val mxsL = typedlit(mxs)
    val codes = zip_with(col(vecCol).cast("array<double>"),
      zip_with(mnsL, mxsL, (a, b) => struct(a.as("mn"), b.as("mx"))),
      (x, r) => when(r.getField("mx") > r.getField("mn"),
        least(greatest(
          round(lit(255.0) * (x - r.getField("mn"))
            / (r.getField("mx") - r.getField("mn"))).cast("long"), lit(0L)),
          lit(255L)))
        .otherwise(lit(0L)))
    points.select(col(idCol).as("id"), codes.as("codes"))
      .withColumn("rnorm2", dot(reconstruct(col("codes"), mnsL, mxsL),
        reconstruct(col("codes"), mnsL, mxsL)))
  }

  /** Cosine top-k of float queries against the SQ8 index: reconstruct
    * from codes in-flight (the index stores BYTES; the scan cost is
    * the point), broadcast queries, bounded-heap top-k per query.
    * Self-matches excluded (the shared ANN contract). */
  def sq8TopK(queries: DataFrame, encoded: DataFrame, ranges: DataFrame,
              qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val (mns, mxs) = collectRanges(ranges)
    val mnsL = typedlit(mns); val mxsL = typedlit(mxs)
    val q = queries.select(col(qidCol).as("qid"),
        col(qvecCol).cast("array<double>").as("qv"))
      .withColumn("qn", sqrt(dot(col("qv"), col("qv"))))
    val scored = broadcast(q).join(encoded, col("qid") =!= col("id"))
      .withColumn("rv", reconstruct(col("codes"), mnsL, mxsL))
      .withColumn("sim", round(nanvl(
        dot(col("qv"), col("rv")) / (col("qn") * sqrt(col("rnorm2"))),
        lit(-1.0)), 4))
    TopK.grouped(scored, Seq("qid"),
        struct((-col("sim")).as("ns"), col("id").as("i")), k)
      .select(col("qid"), col("best.i").as("id"), (-col("best.ns")).as("sim"))
      .orderBy(col("qid"), desc("sim"), col("id"))
  }
}
