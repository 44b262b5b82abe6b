package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting — the third leg of a training-data
  * pipeline next to dedup and filtering (SURVEY §2 extension surface):
  * train/val/test splits, corpus subsampling, and per-source caps, all
  * reproducible by construction.
  *
  * Why hash-based rather than `rand()`: at 100 TB a sample must be
  *  - stable across reruns and task retries (a lost executor must not
  *    change the sample — `rand()` draws differ per attempt),
  *  - independent of partitioning (repartition ⇒ same membership),
  *  - auditable by other engines (the md5 bucket below is recomputable
  *    in any SQL dialect; the gate oracles recompute it in DuckDB).
  * Membership is a pure function of the row id, so a doc keeps its
  * split assignment forever — the property that stops train/test
  * leakage when the corpus is re-ingested or extended.
  */
object Sampling {

  /** 32-bit md5 bucket of an id — the deterministic randomness source:
    * uniform over [0, 2^32), engine-portable (DuckDB:
    * `CAST(('0x' || substr(md5(id), 1, 8)) AS BIGINT)`). */
  def md5Bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  val BucketSpace = 4294967296.0 // 2^32

  /** Assign each row a split label by cumulative fraction over the id's
    * hash bucket: `splits = Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1)`. Labels are disjoint and exhaustive (the last
    * label absorbs rounding); narrow projection, no shuffle. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bucket = md5Bucket(col(idCol))
    val cum = splits.scanLeft(0.0) { case (a, (_, f)) => a + f }.tail
    val labeled = splits.map(_._1).zip(cum)
    val expr = labeled.init.reverse.foldLeft(lit(labeled.last._1): Column) {
      case (acc, (name, c)) =>
        when(bucket < lit(c * BucketSpace), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Stratified k-fold assignment for cross-validation:
    * `fold = md5Bucket(id) mod k`. Deterministic, engine-auditable
    * (the oracle replays the md5 arithmetic), and uniform WITHIN every
    * stratum because the hash is independent of any stratum column —
    * per-stratum fold sizes balance without a stratum-aware pass.
    * Narrow projection, no shuffle; compose with
    * [[leakageSafeSplit]]'s cluster-key indirection when folds must
    * not split near-duplicate clusters. */
  def kFold(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2, "k-fold needs k >= 2")
    df.withColumn("fold", md5Bucket(col(idCol)) % k)
  }

  /** Leakage-safe train/test split: assign splits by the hash of the
    * near-dup CLUSTER id, not the document id — two near-duplicates
    * must never straddle train and eval (splitting by doc id leaks:
    * the eval set contains paraphrases of training docs and the
    * benchmark is contaminated; the reason dedup-then-split is the
    * canonical order in LLM curation). `clusters` is
    * [[Dedup.clusters]] output (id → cluster); docs without a cluster
    * row (below the dedup threshold universe) fall back to their own
    * id — a singleton cluster.
    *
    * Shape: one keyed left join (doc→cluster) + the narrow
    * [[hashSplit]] projection on the cluster key. By construction
    * every member of a cluster hashes identically, so the
    * no-straddle invariant holds exactly (SamplingSpec pins it, and
    * the qX_leakage_split oracle replays assignment end-to-end).
    *
    * @return input columns + (cluster, split).
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
                       splits: Seq[(String, Double)]): DataFrame = {
    val cl = clusters.select(col(idCol), col("cluster").as("_cl"))
    val joined = df.join(cl, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("_cl"), col(idCol)))
      .drop("_cl")
    hashSplit(joined, "cluster", splits)
  }

  /** Systematic (every k-th) sample under the exact global (sortCols)
    * order — the eval-subset sampler whose coverage is GUARANTEED
    * uniform across the sort dimension (hash sampling is uniform in
    * expectation only; a systematic sweep over a time- or id-sorted
    * corpus cannot miss a region): keep ranks ≡ 1 (mod k) from
    * [[Packing.globalRank]] — no global window, one shuffle.
    *
    * @return the kept rows plus their `_grank`.
    */
  def systematicSample(df: DataFrame, sortCols: Seq[String],
                       k: Int): DataFrame = {
    require(k >= 1, s"systematic step must be >= 1, got $k")
    val (ranked, _) = Packing.globalRank(df, sortCols)
    ranked.filter(pmod(col("_grank") - 1, lit(k.toLong)) === 0)
  }

  /** Purged temporal split (the time-series cousin of
    * [[leakageSafeSplit]]; López de Prado 2018's purged CV boundary):
    * train = strictly before `cutover − embargo`, test = at/after
    * `cutover`, and the embargo band in between is DROPPED — rows
    * whose features/labels straddle the boundary (trailing windows,
    * delayed labels) would otherwise leak future information into
    * train. One narrow projection + filter; `split` is NULL-free by
    * construction so a downstream groupBy can't silently keep band
    * rows.
    *
    * @param cutoverUs epoch-micros test boundary.
    * @param embargoUs width of the dropped band before the boundary.
    * @return input columns + `split` ('train' | 'test'); band rows
    *         absent.
    */
  def purgedTimeSplit(df: DataFrame, tsCol: String, cutoverUs: Long,
                      embargoUs: Long): DataFrame = {
    val ts = unix_micros(col(tsCol))
    df.withColumn("split",
        when(ts < lit(cutoverUs - embargoUs), lit("train"))
          .when(ts >= lit(cutoverUs), lit("test")))
      .filter(col("split").isNotNull)
  }

  /** Deterministic `fraction` sample: keep rows whose hash bucket falls
    * below the fraction boundary. Subset-monotone: the 10% sample is a
    * subset of the 20% sample of the same data — the property that lets
    * a pipeline scale experiments up without resampling. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(md5Bucket(col(idCol)) < lit(fraction * BucketSpace))

  /** Per-key cap: keep at most `n` rows per key, preferring the lowest
    * `orderCols` (ties must be broken by a total order for determinism).
    * The per-domain / per-source document cap of LLM data curation.
    * Runs on the bounded-heap grouped top-k ([[TopK.grouped]]): O(n)
    * state per key and map-side partial heaps, so a source with a
    * billion rows costs its reducer n rows, not a sorted billion —
    * the full row rides the sort struct as a trailing payload field
    * (participates only in final tie-break, after the total order). */
  def perKeyCap(df: DataFrame, keyCol: String, orderCols: Seq[String],
                n: Int): DataFrame = {
    val rowStruct = struct(df.columns.map(col).toSeq: _*).as("_row")
    val sortKey = struct(orderCols.map(col) :+ rowStruct: _*)
    TopK.grouped(df, Seq(keyCol), sortKey, n)
      .select(col("best._row.*"))
  }

  /** Weighted deterministic k-sample per key — A-Res reservoir
    * sampling (Efraimidis-Spirakis) with the hash bucket as the
    * randomness source: each row draws u ∈ (0,1) from its id's md5
    * bucket and scores ln(u)/w (the log of u^(1/w) — monotone, so the
    * top-k by score IS the weighted sample); higher-weight rows
    * survive proportionally more often, and membership stays
    * partition- and rerun-stable. The quality-weighted corpus
    * subsample of data curation. Score rounded to 6 decimals before
    * ranking with an id tie-break, so the order is reproducible across
    * engines (ln differs in the last ulp between libms; the documented
    * same-fixed-precision contract as IVF's cell assignment).
    * Bounded-heap top-k per key like its uniform sibling. */
  def perKeyWeightedSample(df: DataFrame, keyCol: String, idCol: String,
                           weightCol: String, k: Int): DataFrame = {
    // A-Res is defined only for strictly positive weights: w = 0 scores
    // -Infinity/NULL and a NEGATIVE weight flips ln(u)/w positive, so
    // negative-weight rows would silently always win the heap. Rows
    // with w <= 0 (or NULL) carry no sampling mass by definition —
    // filter them out rather than corrupt the order.
    val positive = df.filter(col(weightCol) > 0)
    val u = (md5Bucket(col(idCol)).cast("double") + 0.5) / BucketSpace
    val score = round(log(u) / col(weightCol), 6)
    val rowStruct = struct(df.columns.map(col).toSeq: _*).as("_row")
    // largest score first ⇒ negate for the smallest-first heap
    val sortKey = struct((-score).as("_ns"), col(idCol).as("_i"), rowStruct)
    TopK.grouped(positive, Seq(keyCol), sortKey, k)
      .select(col("best._row.*"))
  }

  /** Uniform deterministic k-sample per key — per-source "show me k
    * random-but-reproducible documents" (the reservoir-sample shape
    * with the hash bucket as the randomness source, so membership is
    * partition- and rerun-stable like [[hashSample]]). Lowest k by
    * (md5 bucket, id); same bounded-heap scale shape as [[perKeyCap]]. */
  def perKeyUniformSample(df: DataFrame, keyCol: String, idCol: String,
                          k: Int): DataFrame = {
    val rowStruct = struct(df.columns.map(col).toSeq: _*).as("_row")
    val sortKey = struct(md5Bucket(col(idCol)).as("_b"),
      col(idCol).as("_i"), rowStruct)
    TopK.grouped(df, Seq(keyCol), sortKey, k)
      .select(col("best._row.*"))
  }

  /** Domain-mixture sampling — draw a corpus whose group proportions
    * approximate a declared target mixture (the data-mixing step of
    * LLM pretraining: "30% code, 50% web, 20% books" regardless of the
    * raw corpus skew). Each group `g` is hash-sampled at rate
    * `min(1, weight_g · targetN / |g|)`: proportional groups thin
    * toward their quota, under-represented groups are taken whole
    * (rate capped at 1 — a mixture can't mint rows). Groups without a
    * declared weight are dropped.
    *
    * Determinism: membership is [[hashSample]]'s pure id-hash
    * predicate, so the drawn mixture is rerun/partition-stable and the
    * quota arithmetic is reproducible by the oracle. Scale shape: one
    * narrow count-by-group pass (map-side partial agg), rates
    * broadcast back — the corpus itself is never shuffled, just
    * filtered in place.
    */
  def mixtureSample(df: DataFrame, keyCol: String, idCol: String,
                    weights: Seq[(String, Double)],
                    targetN: Long): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "mixture weights must be positive")
    val wmap = map(weights.flatMap { case (k, v) =>
      Seq(lit(k), lit(v)) }: _*)
    val rates = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"))
      // try_element_at: ANSI mode makes plain element_at THROW on a
      // key absent from the map — absent weight must mean "drop group"
      .withColumn("_w", try_element_at(wmap, col(keyCol)))
      .filter(col("_w").isNotNull)
      .select(col(keyCol),
        least(lit(1.0), col("_w") * targetN / col("_n")).as("_rate"))
    df.join(broadcast(rates), Seq(keyCol))
      .filter(md5Bucket(col(idCol)) < col("_rate") * BucketSpace)
      .drop("_rate")
  }

  /** Temperature-based mixture sampling — [[mixtureSample]] with the
    * target shares DERIVED from the data instead of caller-declared:
    * group k keeps share p_k = n_k^α / Σ n_j^α (the multilingual-LLM
    * upsampling rule: α = 1 is proportional, α → 0 is uniform; 0.3-0.7
    * flattens head domains and lifts the tail). Same plan as
    * [[mixtureSample]]: one count aggregation, share arithmetic on the
    * K-row table, broadcast rate join, deterministic md5-bucket keep.
    * Rates round to 9 decimals before the bucket compare so the keep
    * set is engine-reproducible (pow's last ulp may differ across
    * libms — the IVF same-fixed-precision contract).
    */
  def temperatureSample(df: DataFrame, keyCol: String, idCol: String,
                        alpha: Double, targetN: Long): DataFrame = {
    require(alpha > 0, s"temperature alpha must be > 0, got $alpha")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
    val total = counts.agg(
      sum(pow(col("_n").cast("double"), lit(alpha))).as("_z"))
    val rates = counts.crossJoin(broadcast(total))
      .select(col(keyCol),
        round(least(lit(1.0),
          pow(col("_n").cast("double"), lit(alpha)) / col("_z")
            * targetN / col("_n")), 9).as("_rate"))
    df.join(broadcast(rates), Seq(keyCol))
      .filter(md5Bucket(col(idCol)) < col("_rate") * BucketSpace)
      .drop("_rate")
  }

  /** Neyman optimal allocation for stratified sampling (Neyman
    * 1934) — how many of `totalN` sample slots each stratum deserves:
    * `n_h ∝ N_h·σ_h`, so high-variance strata get oversampled and a
    * uniform-value stratum costs almost nothing. Values quantize to
    * integer millis; per stratum (n, Σv, Σv²) are exact folds, the
    * per-stratum weight `t_h = ⌊N_h·σ_h⌋` quantizes to a long BEFORE
    * the cross-strata fold (order-free — sqrt is IEEE
    * correctly-rounded, engine-exact), and
    * `alloc_h = ⌊totalN·t_h/T⌋` is one fixed expression. Floors may
    * leave ≤ #strata slots unallocated (reported, caller tops up).
    * Single-row strata (σ undefined) get weight 0.
    *
    * Shape: one stratum fold (k rows) + one 1-row broadcast fold.
    *
    * @return (stratum…, n_h, t_units, alloc) ordered by stratum.
    */
  def neymanAllocation(df: DataFrame, strataCols: Seq[String],
                       valueCol: String, totalN: Long): DataFrame = {
    val q = df.select(strataCols.map(col) :+
      floor(col(valueCol) * lit(1000)).cast("long").as("v"): _*)
    val per = q.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_h"), sum(col("v")).as("s"),
        sum(col("v") * col("v")).as("qq"))
    val varHat = (col("qq").cast("double") -
      col("s").cast("double") * col("s") / col("n_h")) /
      (col("n_h") - 1)
    val t = per.withColumn("t_units",
      when(col("n_h") < 2, lit(0L))
        .otherwise(floor(col("n_h") * sqrt(greatest(varHat, lit(0.0))))
          .cast("long")))
    val tot = t.agg(sum(col("t_units")).as("tt"))
    t.crossJoin(broadcast(tot))
      .select(strataCols.map(col) ++ Seq(col("n_h"), col("t_units"),
        when(col("tt") === 0, lit(0L))
          .otherwise(floor(lit(totalN) * col("t_units") / col("tt"))
            .cast("long")).as("alloc")): _*)
      .orderBy(strataCols.map(col): _*)
  }
}
