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

  /** qav: UNBLOCKED edit-distance similarity self-join via rarest-q-gram
    * PREFIX FILTERING (Xiao et al. 2008 ED-Join / Chaudhuri et al. 2006
    * SSJoin) — the hard sibling of q5c: there, an external key (brand)
    * bounds the comparison space; here NO natural blocking key exists
    * and the blocking structure is derived from the strings themselves.
    *
    * Guarantee chain (q-gram size q, distance d):
    *  1. count filter — ED ≤ d destroys at most q·d of the longer
    *     string's positional q-grams, so the gram BAGS (duplicates
    *     occurrence-indexed) overlap in ≥ max(|G₁|,|G₂|) − q·d
    *     elements;
    *  2. prefix filter — order every bag element by GLOBAL rarity
    *     (document frequency, ties by value): two bags overlapping that
    *     much must share an element among each one's q·d + 1 RAREST
    *     (capped at the whole bag for short strings);
    *  3. verify — `levenshtein` (codegen'd) on the surviving pairs only.
    * Strings so short the overlap bound collapses (len ≤ q·d + q − 1)
    * pair among themselves in a separate length-banded branch — a
    * finite, alphabet-bounded set at any corpus scale.
    *
    * Scale shape: the candidate join is an equi-join on (gram, occ)
    * restricted to prefix rows — each name contributes q·d + 1 rows,
    * and rarest-first ordering keeps the per-gram blocks small (a gram
    * enters prefixes only for names where it is among the rarest, so
    * stopword-grams never form the n² hot block that naive gram
    * inverted indexes produce; the q4k df-cap doctrine achieved by
    * construction instead of by cap). Join runs on DISTINCT names with
    * multiplicities re-expanded arithmetically at the end — at 100 TB
    * the distinct-name table is orders of magnitude smaller than the
    * corpus and the whole pipeline shuffles only it. */
  def prefixEditJoin(names: DataFrame, q: Int = 2, d: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val prefixLen = q * d + 1
    val tinyLen = q * d + q - 1 // below this, the overlap bound can hit 0
    val grams = names.filter(length(col("name")) >= q)
      .select(col("name"),
        posexplode(expr(
          s"transform(sequence(0, length(name) - $q)," +
            s" i -> substring(name, i + 1, $q))")))
      .withColumnsRenamed(Map("col" -> "gram"))
      .withColumn("occ",
        row_number().over(Window.partitionBy("name", "gram").orderBy("pos")))
      .withColumn("df",
        count(lit(1)).over(Window.partitionBy("gram", "occ")))
    val prefix = grams
      .withColumn("rk", row_number().over(
        Window.partitionBy("name").orderBy(col("df"), col("gram"), col("occ"))))
      .filter(col("rk") <= prefixLen)
      .select(col("name"), col("gram"), col("occ"))
    val mainCand = prefix.join(
        prefix.select(col("name").as("b_name"), col("gram"), col("occ")),
        Seq("gram", "occ"))
      .where(col("name") < col("b_name") &&
        abs(length(col("name")) - length(col("b_name"))) <= d)
      .select(col("name").as("a_name"), col("b_name"))
    val tiny = names.filter(length(col("name")) <= tinyLen)
      .select(col("name").as("a_name"))
    val tinyCand = tiny.join(
        tiny.select(col("a_name").as("b_name")),
        col("a_name") < col("b_name") &&
          abs(length(col("a_name")) - length(col("b_name"))) <= d)
    val verified = mainCand.union(tinyCand).distinct()
      .withColumn("ed", levenshtein(col("a_name"), col("b_name")))
      .where(col("ed") <= d)
    val cnts = names.select(col("name"), col("cnt"))
    verified
      .join(cnts.withColumnsRenamed(Map("name" -> "a_name", "cnt" -> "a_cnt")),
        Seq("a_name"))
      .join(cnts.withColumnsRenamed(Map("name" -> "b_name", "cnt" -> "b_cnt")),
        Seq("b_name"))
      .groupBy(col("ed"))
      .agg(count(lit(1)).as("n_name_pairs"),
        sum(col("a_cnt") * col("b_cnt")).as("n_row_pairs"))
      .orderBy("ed")
  }

  /** qav over `part`: distinct p_name values within edit distance 2,
    * q = 2 grams, pair counts re-expanded by name multiplicity. The
    * oracle is a genuinely INDEPENDENT algorithm — exhaustive all-pairs
    * levenshtein over distinct names — so a prefix-filter false negative
    * fails the hash, not just a spec. */
  def partEditJoin(spark: SparkSession, dir: String): DataFrame =
    prefixEditJoin(
      Tables.part(spark, dir).groupBy(col("p_name").as("name"))
        .agg(count(lit(1)).as("cnt")))

  def partEditJoinOracle: String = """
    WITH names AS (
      SELECT p_name AS name, CAST(count(1) AS BIGINT) AS cnt
      FROM part GROUP BY 1),
    p AS (
      SELECT levenshtein(a.name, b.name) AS ed, a.cnt * b.cnt AS w
      FROM names a JOIN names b ON a.name < b.name
      WHERE abs(length(a.name) - length(b.name)) <= 2
        AND levenshtein(a.name, b.name) <= 2)
    SELECT CAST(ed AS INTEGER) AS ed,
           CAST(count(1) AS BIGINT) AS n_name_pairs,
           CAST(sum(w) AS BIGINT) AS n_row_pairs
    FROM p GROUP BY 1 ORDER BY ed"""

  /** qbn: FELLEGI–SUNTER PROBABILISTIC LINKAGE — the decision-theoretic
    * layer on top of q5c's blocked candidate generation. Each candidate
    * pair gets an agreement vector over the non-blocking fields (name,
    * balance-in-cents), each field contributes a PINNED log₂ m/u weight
    * (agree: the field matches given a true link / given a random pair;
    * disagree: the complements), and the summed score lands each pair
    * in match / review / non-match by the two FS thresholds. Weights
    * and thresholds are design-time priors — integer e6 literals here,
    * so the whole procedure is exactly replayable (no EM, no RNG; the
    * oracle re-links and must agree row-for-row, hash included).
    *
    * The linkage corpus is `customer` against a DETERMINISTICALLY
    * CORRUPTED copy of itself (the qbl planting doctrine): name mangled
    * at custkey%3, balance shifted at %5, segment rotated at %7, nation
    * shifted at %11 — the last two break the BLOCKING key itself, so
    * the operator also measures what production linkage must always
    * report: recall lost to blocking, separately from recall lost to
    * scoring. Scale shape: one equi-join on (nation, segment) — block
    * sizes ~n/125 — then narrow codegen'd comparisons; no cross join
    * anywhere. */
  def fellegiSunter(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir)
    val b = a.select(
      (col("c_custkey") + 1000000L).as("b_key"),
      when(col("c_custkey") % 3 === 0, concat(col("c_name"), lit("~")))
        .otherwise(col("c_name")).as("b_name"),
      when(col("c_custkey") % 11 === 0, (col("c_nationkey") + 1) % 25)
        .otherwise(col("c_nationkey")).as("b_nation"),
      when(col("c_custkey") % 5 === 0, col("c_acctbal") + 11.11)
        .otherwise(col("c_acctbal")).as("b_bal"),
      when(col("c_custkey") % 7 === 0, concat(lit("X"), col("c_mktsegment")))
        .otherwise(col("c_mktsegment")).as("b_seg"))
    val cand = a.join(b,
      col("c_nationkey") === col("b_nation") &&
        col("c_mktsegment") === col("b_seg"))
    val scored = cand
      .withColumn("name_agree", col("c_name") === col("b_name"))
      .withColumn("bal_agree",
        round(col("c_acctbal") * 100) === round(col("b_bal") * 100))
      // pinned log2(m/u)-style weights, e6: name +16/−1.585, bal +6/−2
      .withColumn("score_e6",
        when(col("name_agree"), 16000000L).otherwise(-1585000L) +
          when(col("bal_agree"), 6000000L).otherwise(-2000000L))
      .withColumn("decision",
        when(col("score_e6") >= 14000000L, "match")
          .when(col("score_e6") >= 4000000L, "review")
          .otherwise("non_match"))
      .withColumn("is_true", col("b_key") === col("c_custkey") + 1000000L)
    val totals = a.agg(count(lit(1)).as("n_records"))
    scored.groupBy("decision")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("is_true"), 1L).otherwise(0L)).as("n_true"))
      .crossJoin(broadcast(totals))
      .select(col("decision"), col("n_pairs"), col("n_true"),
        col("n_records"),
        // scoring recall: true pairs that survived blocking AND scored
        // as match, over all true pairs that survived blocking — vs
        // blocking recall: candidates over all n_records true pairs
        expr("n_true * 1000000 div n_pairs").as("purity_ppm"))
      .orderBy("decision")
  }

  /** DuckDB re-link of [[fellegiSunter]] — same corruption, same
    * blocking, same pinned weights and thresholds. */
  val fellegiSunterOracle: String = """
    WITH b AS (
      SELECT c_custkey + 1000000 AS b_key,
             CASE WHEN c_custkey % 3 = 0 THEN c_name || '~'
                  ELSE c_name END AS b_name,
             CASE WHEN c_custkey % 11 = 0 THEN (c_nationkey + 1) % 25
                  ELSE c_nationkey END AS b_nation,
             CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 11.11
                  ELSE c_acctbal END AS b_bal,
             CASE WHEN c_custkey % 7 = 0 THEN 'X' || c_mktsegment
                  ELSE c_mktsegment END AS b_seg
      FROM customer),
    cand AS (
      SELECT a.c_custkey, a.c_name, a.c_acctbal, b.*
      FROM customer a JOIN b
        ON a.c_nationkey = b.b_nation AND a.c_mktsegment = b.b_seg),
    scored AS (
      SELECT *,
             (CASE WHEN c_name = b_name THEN 16000000 ELSE -1585000 END +
              CASE WHEN round(c_acctbal * 100) = round(b_bal * 100)
                   THEN 6000000 ELSE -2000000 END) AS score_e6,
             b_key = c_custkey + 1000000 AS is_true
      FROM cand),
    dec AS (
      SELECT CASE WHEN score_e6 >= 14000000 THEN 'match'
                  WHEN score_e6 >= 4000000 THEN 'review'
                  ELSE 'non_match' END AS decision,
             is_true
      FROM scored),
    tot AS (SELECT CAST(count(1) AS BIGINT) AS n_records FROM customer)
    SELECT decision, CAST(count(1) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true,
           tot.n_records,
           CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) * 1000000
             // count(1) AS BIGINT) AS purity_ppm
    FROM dec CROSS JOIN tot
    GROUP BY decision, tot.n_records ORDER BY decision"""
}
