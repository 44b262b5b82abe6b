package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.tokenize
import graft.functions.expr.BpeExprs

/** Byte-pair-encoding tokenizer: distributed merge learning + native
  * encode/decode — the subword tokenizer a training-data pipeline
  * runs after corpus cleaning (the reference stops at whitespace
  * tokens, ES-analyzer style; BPE is the step its corpus would feed
  * next). Algorithm per Sennrich et al. 2016 ("Neural Machine
  * Translation of Rare Words with Subword Units"), the separate
  * end-of-word-symbol variant: a word starts as its code-point
  * symbols plus a trailing [[EOW]] marker, and each round fuses the
  * globally most frequent adjacent symbol pair.
  *
  * Scale shape of [[train]]: the corpus collapses to the WORD
  * FREQUENCY table first (one shuffle over the corpus — the standard
  * trick: pair counts are identical on (word, freq) and ~vocab-sized,
  * not corpus-sized). Each round is then one pair-explode +
  * sum-by-pair shuffle over that small table with map-side partials,
  * and ONLY the argmax row is collected (O(1) driver traffic per
  * round); the merge application is a narrow codegen scan
  * ([[graft.functions.expr.BpeApplyMergeExpr]]), and the table is
  * eagerly localCheckpoint-ed every [[CheckpointCadence]] rounds (the
  * pageRank cadence discipline — between checkpoints the lineage is
  * only a few stacked narrow projections over a vocab-sized table, so
  * recomputation is cheaper than a per-round materialization pass).
  *
  * [[encode]] is a single narrow codegen scan with the learned merge
  * table as a reference object; merges apply in learned order — the
  * deterministic fold encoder. [[decode]] inverts exactly:
  * concatenate pieces, EOW → space. `decode(encode(x))` equals the
  * canonical whitespace token stream of x for EVERY input (gated on
  * the full documents table, qX_bpe_roundtrip).
  */
object Bpe {

  /** End-of-word marker symbol (kept as its own symbol, not fused
    * into the last character — the variant choice; merges can learn
    * to fuse it, e.g. ("est", "</w>") → "est</w>"). */
  val EOW = "</w>"

  /** Rounds between eager localCheckpoints of the symbol table during
    * [[train]] — flat-lineage cadence without paying a
    * materialization action every round. */
  val CheckpointCadence = 8

  /** A word as its BPE start symbols: per-code-point strings plus the
    * trailing [[EOW]]. */
  def wordSyms(word: Column): Column =
    concat(
      transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
      array(lit(EOW)))

  /** HOF executable spec of one merge pass (state machine fold:
    * carry the previous symbol; on (prev==a, x==b) emit the fused
    * symbol and clear). The native twin is
    * [[graft.functions.expr.BpeExprs.bpe_apply_merge]] —
    * equality-locked in BpeSpec. */
  def applyMergeHof(syms: Column, a: String, b: String): Column = {
    val empty = array().cast("array<string>")
    def flush(acc: Column): Column =
      when(acc.getField("prev") === lit(""), acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("prev"))))
    aggregate(syms,
      struct(empty.as("out"), lit("").as("prev")),
      (acc, x) =>
        when(acc.getField("prev") === lit(a) && x === lit(b),
          struct(concat(acc.getField("out"), array(lit(a + b))).as("out"),
            lit("").as("prev")))
        .otherwise(struct(flush(acc).as("out"), x.as("prev"))),
      acc => flush(acc))
  }

  /** Learn up to `numMerges` merges from a corpus (stops early when no
    * adjacent pair occurs at least twice — fusing a count-1 pair can
    * never help a subword vocabulary). Ties on the pair count break
    * lexicographically on (left, right), so the merge table is
    * deterministic across engines and runs.
    * @return the ordered merge table — row r is the r-th learned pair.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    require(numMerges >= 0, s"need numMerges >= 0, got $numMerges")
    var words = docs
      .select(explode(tokenize(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .select(col("freq"), wordSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < numMerges && !done) {
      // adjacent-pair counts weighted by word frequency; only the
      // argmax row travels to the driver
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(
            transform(sequence(lit(0), size(col("syms")) - 2),
              i => struct(try_element_at(col("syms"), i + 1).as("a"),
                try_element_at(col("syms"), i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < 2) done = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        val next = words.select(col("freq"),
          BpeExprs.bpe_apply_merge(col("syms"), a, b).as("syms"))
        words = if (merges.length % CheckpointCadence == 0)
          next.localCheckpoint(true) else next
      }
    }
    merges.toSeq
  }

  /** Encode a text column into BPE pieces under a learned merge table
    * — one narrow codegen scan. */
  def encode(text: Column, merges: Seq[(String, String)]): Column =
    BpeExprs.bpe_encode(text, merges)

  /** Exact inverse of [[encode]] back to the canonical token stream:
    * concatenate pieces, EOW → single space, trim the trailing one. */
  def decode(pieces: Column): Column =
    trim(replace(array_join(pieces, ""), lit(EOW), lit(" ")))
}
