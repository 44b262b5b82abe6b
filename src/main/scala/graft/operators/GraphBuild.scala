package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Batch graph construction from card events (SURVEY §2.H).
  *
  * Reference write path (UpsertBizcardToGraphDB/upsert_bizcard_to_graph_db.py):
  *  - person vertex id = md5-8 of the email local part (:146); vertex
  *    upsert = get-by-id else addV, then overwrite 6 props + `_name`
  *    (single-cardinality overwrite, :89-94) — i.e. LAST WRITE WINS.
  *  - owner vertex id = md5-8 of the owner user id (:96); directed
  *    `knows` edge owner→person with weight 1.0, created only if absent
  *    (:104-109); self-loops skipped (`from != to`, :100-103).
  *
  * The reference's one-record-at-a-time OLTP upserts become set
  * operations here: dedup-by-key with a deterministic priority, which is
  * replay-idempotent by construction (SURVEY §2.J1) and — unlike the
  * reference, which silently drops edges when the owner's own card
  * arrives late (README.md:711-713) — order-independent.
  *
  * Scale posture: both merges are single key-partitioned shuffles
  * (window by id / dropDuplicates by (src,dst)); no driver collection.
  */
object GraphBuild {

  /** Build (vertices, edges) from enriched card events.
    *
    * @param cards DataFrame with owner, name, email, phone_number,
    *              company, job_title, addr, created_at (output of
    *              Parse.enrich or the fixture envelope flattened).
    */
  def buildGraph(cards: DataFrame): (DataFrame, DataFrame) = {
    val withIds = cards
      .withColumn("person_id", personId(col("email")))
      .withColumn("owner_id", md5_8(col("owner")))

    // H1 vertex upsert: last-write-wins per id, ordered by created_at
    // (tie → arbitrary in the reference's sequential replay; we fix the
    //  deterministic tiebreak max created_at, then max name).
    val w = Window.partitionBy("id")
      .orderBy(desc("created_at"), desc("name"))
    val vertices = withIds
      .select(
        col("person_id").as("id"),
        lit("person").as("label"),
        col("name"),
        lower(col("name")).as("_name"), // B11 shadow prop for ci lookup
        col("email"), col("phone_number"), col("company"), col("job_title"),
        col("created_at"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "created_at")

    // H2 edge upsert: distinct (src,dst), self-loops dropped, weight 1.0
    // (weight is written but never read by PYMK — kept for fidelity).
    val edges = withIds
      .filter(col("owner_id") =!= col("person_id"))
      .select(
        col("owner_id").as("src"),
        col("person_id").as("dst"),
        lit("knows").as("label"),
        lit(1.0).as("weight"))
      .dropDuplicates("src", "dst")

    (vertices, edges)
  }

  /** Incremental merge used by the streaming path: union the delta with
    * the existing tables and re-apply the same last-write-wins /
    * distinct rules — idempotent under replay (J1).
    */
  def mergeGraph(vertices: DataFrame, edges: DataFrame,
                 deltaV: DataFrame, deltaE: DataFrame): (DataFrame, DataFrame) = {
    val w = Window.partitionBy("id").orderBy(desc("_pri"))
    val mergedV = vertices.withColumn("_pri", lit(0))
      .unionByName(deltaV.withColumn("_pri", lit(1)))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_pri")
    val mergedE = edges.unionByName(deltaE).dropDuplicates("src", "dst")
    (mergedV, mergedE)
  }
}
