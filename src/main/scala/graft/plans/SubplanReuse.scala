package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** qbc: SUBPLAN-REUSE ADVISOR — workload-level shared-work detection:
  * given two queries, find the logical subplans they compute IN COMMON,
  * using Catalyst's own semantic equality (`sameResult`, which
  * canonicalizes expression ids, ordering-insensitive commutative
  * children, etc.) rather than text matching. Shared subplans are
  * exactly the materialization candidates a warehouse's MV/cache
  * advisor surfaces: compute once, serve both queries — and the SIZE
  * of the largest shared subtree separates "they read the same table"
  * (1-node relation) from "they share a whole normalization pipeline"
  * (multi-node subtree worth caching).
  *
  * The graded rows run the detector over pinned workload pairs and are
  * checked against a pinned truth table (the qbb pattern): the shared
  * structure is a property of the ENGINE's plans, so a Catalyst or
  * operator change that silently forks previously-shared lineage — or
  * fuses previously-distinct scans — fails the hash.
  *
  * Scale note: walks plans (dozens of nodes each), never data; cost is
  * |subplans(a)| × |subplans(b)| semantic comparisons per pair. */
object SubplanReuse {

  /** (shared-subplan count deduped by semantic equality, node count of
    * the largest shared subtree, its root node name). */
  def shared(a: DataFrame, b: DataFrame): (Long, Long, String) = {
    val subA = a.queryExecution.analyzed.collect { case n => n }
    val subB = b.queryExecution.analyzed.collect { case n => n }
    val dedupA = subA.foldLeft(List.empty[LogicalPlan])((acc, p) =>
      if (acc.exists(_.sameResult(p))) acc else p :: acc)
    val sharedPlans = dedupA.filter(p => subB.exists(_.sameResult(p)))
    def nNodes(p: LogicalPlan): Long = p.collect { case _ => 1 }.sum.toLong
    val largest = sharedPlans.sortBy(p => (-nNodes(p), p.nodeName)).headOption
    (sharedPlans.length.toLong,
      largest.map(nNodes).getOrElse(0L),
      largest.map(_.nodeName).getOrElse("(none)"))
  }

  /** qbc: the detector over pinned workload pairs. q30/q31 share the
    * whole events-normalization subtree (the TIMESTAMP(NANOS) rebuild
    * projection over the scan — a genuine cache candidate); q03/q04
    * share only the two base relations; q01/q12 share nothing (different
    * tables). */
  def workloadAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Seq(("q03_join_revenue_topk", "q04_join_left"),
      ("q30_events_hourly", "q31_events_sliding"),
      ("q01_pricing_summary", "q12_window_lag"))
    pairs.map { case (qa, qb) =>
      val (n, maxNodes, root) = shared(
        graft.SparkEntry.queries(qa)(spark, dir),
        graft.SparkEntry.queries(qb)(spark, dir))
      (s"$qa|$qb", n, maxNodes, root)
    }.toDF("pair", "n_shared", "max_shared_nodes", "max_shared_root")
      .orderBy("pair")
  }

  /** Pinned truth for the workload pairs (the qbb pattern). */
  def workloadAuditOracle: String = """
    SELECT * FROM (VALUES
      ('q01_pricing_summary|q12_window_lag',
        CAST(0 AS BIGINT), CAST(0 AS BIGINT), '(none)'),
      ('q03_join_revenue_topk|q04_join_left',
        CAST(2 AS BIGINT), CAST(1 AS BIGINT), 'LogicalRelation'),
      ('q30_events_hourly|q31_events_sliding',
        CAST(2 AS BIGINT), CAST(2 AS BIGINT), 'Project'))
      AS t(pair, n_shared, max_shared_nodes, max_shared_root)
    ORDER BY pair"""
}
