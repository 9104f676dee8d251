package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity resolution / record linkage — the blocked fuzzy join.
  *
  * Scale design: the naive formulation is an O(n²) cross join with an
  * edit-distance predicate — a non-starter at 100 TB. The standard fix
  * is BLOCKING: a cheap deterministic key (here the brand) partitions
  * the comparison space, the fuzzy predicate runs only within blocks,
  * and the join becomes an equi-join on the block key that Catalyst
  * executes as a plain shuffled hash join — candidate pairs are
  * Σ|block|², not n². At 100 TB the refinement is multi-pass blocking
  * (several cheap keys, union of candidates) + a size cap per block
  * (skew guard: one degenerate block otherwise recreates n²); both are
  * composition, not new machinery. `levenshtein` is a codegen'd
  * Catalyst expression, so the within-block filter stays inside
  * whole-stage codegen.
  */
object Entity {

  /** Generic blocked fuzzy self-join: pairs of records sharing
    * `blockKey` whose `nameCol` edit distance is ≤ `maxDist`, each pair
    * once (`idCol` low < high).
    *
    * `broadcastBuild` pins the build-side broadcast and is ONLY valid
    * for dimension-sized inputs (the q5c `part` table) — it ships the
    * whole record set to every executor, so a fact-scale input would
    * blow the broadcast/driver budget. Pass `broadcastBuild = false`
    * for large inputs: the same block equi-join runs as a plain
    * shuffled join (both sides hashed on the block key, Σ|block|² work
    * spread across shuffle partitions), identical output. */
  def blockedFuzzyPairs(records: DataFrame, idCol: String, blockKey: String,
      nameCol: String, maxDist: Int,
      broadcastBuild: Boolean = true): DataFrame = {
    // The probe side must be spread BEFORE the join: a dimension-sized
    // input arrives in 1-2 parquet partitions, and a broadcast join
    // preserves the streamed side's partitioning — without this the
    // Σ|block|² levenshtein evaluations all run in one task (observed
    // 28 s → ~3 s at sf0.1). Round-robin is fine: broadcast joins need
    // no co-partitioning.
    val a = records.select(col(idCol).as("a_id"), col(blockKey).as("block"),
      col(nameCol).as("a_name"))
      .repartition(records.sparkSession.sessionState.conf.numShufflePartitions)
    val b = records.select(col(idCol).as("b_id"), col(blockKey).as("b_block"),
      col(nameCol).as("b_name"))
    // broadcast(b) is PINNED, not left to stats: both sides derive from
    // the same table with equal size estimates, and if the planner's
    // tie-break ever flipped the build side, the repartitioned side
    // would become the build and the 1-partition scan the probe —
    // reverting the single-task regression with no result change for
    // any test to catch. (Dimension-sized inputs only — see scaladoc.)
    val build = if (broadcastBuild) broadcast(b) else b
    a.join(build,
        col("block") === col("b_block") && col("a_id") < col("b_id") &&
        // length band: |len(a)−len(b)| > d ⇒ edit distance > d. A
        // codegen'd integer check that prunes most pairs before the
        // O(len²) levenshtein runs — evaluated inside the join, so
        // pruned pairs are never materialized.
        abs(length(col("a_name")) - length(col("b_name"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .where(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("block"), col("a_name"),
        col("b_name"), col("dist"))
  }

  /** q5c: entity resolution over `part` — brand-blocked candidate pairs
    * with name edit distance ≤ 2, i.e. "same product, noisy name". The
    * oracle replays the identical blocked join with DuckDB's
    * `levenshtein`. */
  def partDuplicates(spark: SparkSession, dir: String): DataFrame =
    blockedFuzzyPairs(Tables.part(spark, dir),
      idCol = "p_partkey", blockKey = "p_brand", nameCol = "p_name", maxDist = 2)
      .orderBy("a_id", "b_id")

  def partDuplicatesOracle: String = """
    SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
           a.p_brand AS block, a.p_name AS a_name, b.p_name AS b_name,
           levenshtein(a.p_name, b.p_name) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    ORDER BY a_id, b_id"""
}
