package graft

/** Shared gate-routing policy for [[Bench]] and [[QTime]].
  *
  * The small 4-partition child session exists for SCHEDULING-bound
  * gates — many tiny stages, sub-0.1 s of actual work. A few gates
  * have a trivial DuckDB oracle (planted-recall contracts replay a
  * count) but HEAVY Spark-side compute (Lloyd rounds over the
  * embedding corpus, 150k-candidate exact-verify intersections): the
  * duck-time router would misread them as tiny and strand their
  * compute on 4 reduce partitions. They are listed here by name —
  * an auditable opt-out, not a second heuristic that could flap. */
private[graft] object Routing {

  /** Gates that must keep the full-parallelism session regardless of
    * their (trivial) oracle time. */
  val ComputeDense: Set[String] = Set(
    "qX_dedup_minhash_recall", // 148k-pair exact-verify intersections
    "qX_fuzzy_join_recall",    // banded cross-corpus verify, same shape
    "qX_opq",                  // rotation fit + PQ Lloyd + encode + ADC
    "qX_pq_recall",            // PQ train + full encode + ADC rerank
  )
}
