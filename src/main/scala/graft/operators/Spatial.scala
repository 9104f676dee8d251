package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial operators — the 2D member of the engine's bounded-candidate
  * family (MinHash bands for sets, IVF lists for vectors, grid cells
  * for points): radius search never compares all pairs; it equi-joins
  * on QUANTIZED CELL keys and refines exactly inside the candidate
  * set. Coordinates are integer micro-units derived deterministically
  * from the fixture keys (two Lehmer-style multipliers), so every
  * distance is exact Long arithmetic and the whole surface rides a
  * hash oracle — no floating-point geometry anywhere. */
object Spatial {

  private val Span = 2000001L // coordinate range: [-1e6, 1e6] micro-units
  private def coord(key: org.apache.spark.sql.Column, mult: Long) =
    (key * mult) % Span - 1000000L

  /** The fixture point set shared by the whole family: customers at
    * Lehmer-derived integer micro-coordinates. One definition — a
    * change to the scheme (Span, multipliers, table) changes every
    * spatial query and its spec together. */
  private def customerPts(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey").as("pt_id"),
      coord(col("c_custkey"), 48271L).as("px"),
      coord(col("c_custkey"), 16807L).as("py"))

  /** Shared candidate generator: (probe_id, pt_id, sqdist) for every
    * point within radius r of each probe, via the 3×3 cell cover +
    * exact refine (every point within r of a probe provably lives in
    * one of the probe's 9 neighbor cells: |dx| ≤ r bounds the cell
    * offset to ±1). The aggregate panel ([[gridJoin]]), the ranked
    * top-k ([[knnJoin]]), and the DBSCAN eps-graph
    * ([[dbscanFrames]]) are each one operator away from this.
    * `broadcastProbes` picks the physical join: a bounded probe set
    * broadcasts; a self-join (probes = the point set, DBSCAN) must
    * shuffle both sides by cell key instead. */
  private def radiusCandidates(pts: DataFrame, probes: DataFrame,
      r: Long, broadcastProbes: Boolean = true): DataFrame = {
    val sq = (col("px") - col("qx")) * (col("px") - col("qx")) +
      (col("py") - col("qy")) * (col("py") - col("qy"))
    val keyed = pts
      .withColumn("cx", floor(col("px") / r).cast("long"))
      .withColumn("cy", floor(col("py") / r).cast("long"))
    val cells = probes
      .withColumn("dxc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dyc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("cx", floor(col("qx") / r).cast("long") + col("dxc"))
      .withColumn("cy", floor(col("qy") / r).cast("long") + col("dyc"))
    (if (broadcastProbes) broadcast(cells) else cells)
      .join(keyed, Seq("cx", "cy"))
      .where(sq <= r * r)
      .select(col("probe_id"), col("pt_id"), sq.as("sqdist"))
  }

  /** Frame-level core: pts(pt_id, px, py) × probes(probe_id, qx, qy)
    * → per-probe radius-R panel. Package-visible so SpatialSpec can
    * plant exact cell-boundary geometries against it. */
  private[graft] def gridJoin(pts: DataFrame, probes: DataFrame,
      r: Long): DataFrame = {
    val hits = radiusCandidates(pts, probes, r)
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_within"),
        sum("pt_id").as("id_checksum"),
        min("sqdist").as("min_sqdist"))
    probes.select("probe_id").join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_within"), lit(0L)).as("n_within"),
        coalesce(col("id_checksum"), lit(0L)).as("id_checksum"),
        coalesce(col("min_sqdist"), lit(-1L)).as("min_sqdist"))
      .orderBy("probe_id")
  }

  /** qch: GRID-BUCKETED RADIUS JOIN — for each probe (sampled
    * suppliers), count and checksum the customer points within radius
    * R. Cost per probe is the 9-cell candidate population
    * (≈9·density), independent of n — at 100 TB the cell join keys by
    * cell and never forms a cross product. Probes with no neighbors
    * stay in the panel (left join from the probe side), because
    * "nothing nearby" is an answer a radius search must return, not
    * drop. Oracle: the naive all-pairs distance filter over the same
    * integer coordinates — equality certifies the 3×3 cover is
    * complete. */
  def gridRadiusJoin(spark: SparkSession, dir: String): DataFrame = {
    val pts = customerPts(spark, dir)
    val probes = Tables.supplier(spark, dir)
      .where(col("s_suppkey") % 20 === 0)
      .select(col("s_suppkey").as("probe_id"),
        coord(col("s_suppkey"), 69621L).as("qx"),
        coord(col("s_suppkey"), 40692L).as("qy"))
    gridJoin(pts, probes, 50000L)
  }

  /** Naive all-pairs replay of [[gridRadiusJoin]] — the completeness
    * certificate for the 3×3 cell cover. */
  val gridRadiusJoinOracle: String = """
    WITH pts AS (
      SELECT c_custkey AS pt_id,
             (c_custkey * 48271) % 2000001 - 1000000 AS px,
             (c_custkey * 16807) % 2000001 - 1000000 AS py
      FROM customer),
    probes AS (
      SELECT s_suppkey AS probe_id,
             (s_suppkey * 69621) % 2000001 - 1000000 AS qx,
             (s_suppkey * 40692) % 2000001 - 1000000 AS qy
      FROM supplier WHERE s_suppkey % 20 = 0),
    hits AS (
      SELECT probe_id,
             CAST(count(1) AS BIGINT) AS n_within,
             CAST(sum(pt_id) AS BIGINT) AS id_checksum,
             CAST(min((px - qx) * (px - qx) + (py - qy) * (py - qy))
               AS BIGINT) AS min_sqdist
      FROM probes JOIN pts
        ON (px - qx) * (px - qx) + (py - qy) * (py - qy)
           <= CAST(50000 AS BIGINT) * 50000
      GROUP BY probe_id)
    SELECT p.probe_id,
           coalesce(h.n_within, 0) AS n_within,
           coalesce(h.id_checksum, 0) AS id_checksum,
           coalesce(h.min_sqdist, -1) AS min_sqdist
    FROM probes p LEFT JOIN hits h USING (probe_id)
    ORDER BY p.probe_id"""

  /** qci: CONTAINMENT (RANGE-COVER) JOIN — count the points inside
    * each of many variable-sized rectangles. The radius join's ±1
    * trick doesn't apply when ranges have different extents; the
    * general pattern is a FIXED grid pitch G chosen ≥ the max
    * half-extent, each rectangle exploded to the cells its bounding
    * box overlaps (≤⌈2·wmax/G+1⌉² = 9 here, bounded by
    * construction), points keyed to their single home cell, equi-join
    * on the cell, exact BETWEEN refine. No pair is produced twice —
    * a point has one home cell and a rectangle covers each cell at
    * most once — so no post-join distinct is needed. Per-rectangle
    * cost is the covered cells' population, never a cross product.
    * `broadcastProbes` picks the physical join (the
    * [[radiusCandidates]] convention): the graded query's subsampled
    * rectangle set broadcasts, but the rectangle side scales with its
    * source table, so at 100 TB callers pass false and BOTH sides
    * shuffle by cell key — the hint is never hardcoded past the point
    * where it could OOM. Empty rectangles stay in the panel via the
    * left join. Oracle: naive all-pairs BETWEEN. */
  private[graft] def containJoin(pts: DataFrame, rects: DataFrame,
      g: Long, broadcastProbes: Boolean = true): DataFrame = {
    val keyed = pts
      .withColumn("cx", floor(col("px") / g).cast("long"))
      .withColumn("cy", floor(col("py") / g).cast("long"))
    val cover = rects
      .withColumn("cx", explode(sequence(
        floor((col("sx") - col("wx")) / g).cast("long"),
        floor((col("sx") + col("wx")) / g).cast("long"))))
      .withColumn("cy", explode(sequence(
        floor((col("sy") - col("wy")) / g).cast("long"),
        floor((col("sy") + col("wy")) / g).cast("long"))))
    val inside = col("px").between(col("sx") - col("wx"),
        col("sx") + col("wx")) &&
      col("py").between(col("sy") - col("wy"), col("sy") + col("wy"))
    val hits = (if (broadcastProbes) broadcast(cover) else cover)
      .join(keyed, Seq("cx", "cy"))
      .where(inside)
      .groupBy("rect_id")
      .agg(count(lit(1)).as("n_inside"),
        sum("pt_id").as("id_checksum"))
    rects.select("rect_id").join(hits, Seq("rect_id"), "left")
      .select(col("rect_id"),
        coalesce(col("n_inside"), lit(0L)).as("n_inside"),
        coalesce(col("id_checksum"), lit(0L)).as("id_checksum"))
      .orderBy("rect_id")
  }

  def containmentJoin(spark: SparkSession, dir: String): DataFrame = {
    val pts = customerPts(spark, dir)
    // variable-extent rectangles: centers from two more Lehmer
    // multipliers, half-extents in [20k, 100k) — pitch G=100k covers
    // any rectangle with ≤3 cells per axis
    val rects = Tables.supplier(spark, dir)
      .where(col("s_suppkey") % 15 === 0)
      .select(col("s_suppkey").as("rect_id"),
        coord(col("s_suppkey"), 69621L).as("sx"),
        coord(col("s_suppkey"), 40692L).as("sy"),
        (col("s_suppkey") * 7919L % 80000L + 20000L).as("wx"),
        (col("s_suppkey") * 104729L % 80000L + 20000L).as("wy"))
    containJoin(pts, rects, 100000L)
  }

  /** Naive all-pairs BETWEEN replay of [[containmentJoin]] — the
    * completeness certificate for the grid cover. */
  val containmentJoinOracle: String = """
    WITH pts AS (
      SELECT c_custkey AS pt_id,
             (c_custkey * 48271) % 2000001 - 1000000 AS px,
             (c_custkey * 16807) % 2000001 - 1000000 AS py
      FROM customer),
    rects AS (
      SELECT s_suppkey AS rect_id,
             (s_suppkey * 69621) % 2000001 - 1000000 AS sx,
             (s_suppkey * 40692) % 2000001 - 1000000 AS sy,
             (s_suppkey * 7919) % 80000 + 20000 AS wx,
             (s_suppkey * 104729) % 80000 + 20000 AS wy
      FROM supplier WHERE s_suppkey % 15 = 0),
    hits AS (
      SELECT rect_id,
             CAST(count(1) AS BIGINT) AS n_inside,
             CAST(sum(pt_id) AS BIGINT) AS id_checksum
      FROM rects JOIN pts
        ON px BETWEEN sx - wx AND sx + wx
       AND py BETWEEN sy - wy AND sy + wy
      GROUP BY rect_id)
    SELECT r.rect_id,
           coalesce(h.n_inside, 0) AS n_inside,
           coalesce(h.id_checksum, 0) AS id_checksum
    FROM rects r LEFT JOIN hits h USING (rect_id)
    ORDER BY r.rect_id"""

  /** qcj: k-NEAREST-WITHIN-RADIUS JOIN — the ranked member of the
    * spatial family: for each probe, the k closest points among those
    * within radius R, exactly, ties broken by pt_id. Unbounded kNN
    * cannot be certified from one grid ring (the k-th neighbor may
    * live arbitrarily far away); the radius-bounded variant is the
    * form that stays a bounded cell join — which is why production
    * spatial engines expose exactly this shape. The plan is
    * [[radiusCandidates]] (3×3 cover + exact refine) followed by a
    * rank-≤-k filter that Spark executes as WindowGroupLimit: each
    * shuffle partition keeps only its local top-k per probe BEFORE the
    * final sort, so the post-join volume is k·probes, not the full
    * candidate set. Probes with no in-radius neighbor have no rows —
    * a ranked result's empty set, unlike the count panel's zero row.
    * Oracle: row_number over the naive all-pairs filter. */
  private[graft] def knnJoinFrames(pts: DataFrame, probes: DataFrame,
      r: Long, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("sqdist"), col("pt_id"))
    radiusCandidates(pts, probes, r)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"),
        col("pt_id"), col("sqdist"))
      .orderBy("probe_id", "rank")
  }

  def knnJoin(spark: SparkSession, dir: String): DataFrame = {
    val pts = customerPts(spark, dir)
    val probes = Tables.supplier(spark, dir)
      .where(col("s_suppkey") % 10 === 0)
      .select(col("s_suppkey").as("probe_id"),
        coord(col("s_suppkey"), 69621L).as("qx"),
        coord(col("s_suppkey"), 40692L).as("qy"))
    knnJoinFrames(pts, probes, 200000L, 5)
  }

  /** Naive all-pairs row_number replay of [[knnJoin]]. */
  val knnJoinOracle: String = """
    WITH pts AS (
      SELECT c_custkey AS pt_id,
             (c_custkey * 48271) % 2000001 - 1000000 AS px,
             (c_custkey * 16807) % 2000001 - 1000000 AS py
      FROM customer),
    probes AS (
      SELECT s_suppkey AS probe_id,
             (s_suppkey * 69621) % 2000001 - 1000000 AS qx,
             (s_suppkey * 40692) % 2000001 - 1000000 AS qy
      FROM supplier WHERE s_suppkey % 10 = 0),
    cand AS (
      SELECT probe_id, pt_id,
             (px - qx) * (px - qx) + (py - qy) * (py - qy) AS sqdist
      FROM probes JOIN pts
        ON (px - qx) * (px - qx) + (py - qy) * (py - qy)
           <= CAST(200000 AS BIGINT) * 200000),
    ranked AS (
      SELECT probe_id,
             CAST(row_number() OVER (PARTITION BY probe_id
               ORDER BY sqdist, pt_id) AS BIGINT) AS rank,
             pt_id, CAST(sqdist AS BIGINT) AS sqdist
      FROM cand)
    SELECT probe_id, rank, pt_id, sqdist
    FROM ranked WHERE rank <= 5
    ORDER BY probe_id, rank"""

  /** qcl: GRID DBSCAN — exact density clustering (Ester et al., KDD'96)
    * as a relational plan: no grid approximation in the RESULT, only in
    * the candidate generation. Stages, each a bounded shuffle:
    *   1. eps-neighborhood self-join via the cell cover — the one
    *      structural difference from [[radiusCandidates]] is that the
    *      probe side IS the point set, so the cell join shuffles both
    *      sides by cell key instead of broadcasting (n probes don't
    *      broadcast). The self-pair (dist 0) is kept: DBSCAN's minPts
    *      counts the point itself.
    *   2. core points: |N_eps(p)| ≥ minPts — a hash aggregate.
    *   3. clusters: connected components over CORE-CORE edges, reusing
    *      the dedup engine's pointer-jumping fixpoint
    *      ([[Dedup.connectedComponents]], O(log diameter) rounds);
    *      cluster id = min core id, deterministic.
    *   4. border points attach to the min cluster among their core
    *      neighbors; non-core points NEVER chain through each other
    *      (the spec plants that trap). Everything else is noise,
    *      reported as the cluster_id = -1 row.
    * Pair volume is n·(eps²·density) — fixed eps on a growing corpus
    * densifies the graph by contract (flagged as such in SCALING.md),
    * exactly like a fixed LSH band width; at 100 TB you shrink eps or
    * pre-coarsen, the plan is unchanged. Oracle: naive all-pairs +
    * recursive-CTE min-label fixpoint — a different algorithm meeting
    * the same answer. */
  private[graft] def dbscanFrames(pts: DataFrame, eps: Long,
      minPts: Int): DataFrame = {
    val probes = pts.select(col("pt_id").as("probe_id"),
      col("px").as("qx"), col("py").as("qy"))
    val pairs = radiusCandidates(pts, probes, eps, broadcastProbes = false)
      .select(col("probe_id").as("src"), col("pt_id").as("dst"))
      .cache() // consumed 3×: degree, core edges, border attach
    val core = pairs.groupBy("src").agg(count(lit(1)).as("n_eps"))
      .where(col("n_eps") >= minPts)
      .select(col("src").as("id")).cache()
    val coreEdges = pairs
      .join(core.select(col("id").as("src")), Seq("src"))
      .join(core.select(col("id").as("dst")), Seq("dst"))
      .select("src", "dst")
    val comp = Dedup.connectedComponents(core, coreEdges)
    // materialize the last pairs consumer eagerly (CC already ran its
    // own actions), then release the two caches — otherwise the
    // n·avg-degree pair table stays pinned in executor storage for the
    // rest of the session
    val borderAssign = pairs
      .join(core, pairs("src") === core("id"), "left_anti")
      .join(comp.select(col("id").as("dst"), col("rep")), Seq("dst"))
      .groupBy(col("src").as("id")).agg(min("rep").as("rep"))
      .localCheckpoint(true)
    pairs.unpersist()
    core.unpersist()
    val assign = comp.select(col("id"), col("rep"), lit(true).as("is_core"))
      .unionByName(borderAssign.withColumn("is_core", lit(false)))
    val noise = pts.select(col("pt_id").as("id"))
      .join(assign.select("id"), Seq("id"), "left_anti")
      .select(col("id"), lit(-1L).as("rep"), lit(false).as("is_core"))
    assign.unionByName(noise)
      .groupBy(col("rep").as("cluster_id"))
      .agg(count(lit(1)).as("n_points"),
        sum(when(col("is_core"), 1L).otherwise(0L)).as("n_core"),
        sum("id").as("id_checksum"))
      .orderBy("cluster_id")
  }

  def gridDbscan(spark: SparkSession, dir: String): DataFrame = {
    val pts = customerPts(spark, dir)
    dbscanFrames(pts, 80000L, 6)
  }

  /** All-pairs + recursive-CTE min-label replay of [[gridDbscan]]. */
  val gridDbscanOracle: String = """
    WITH RECURSIVE pts AS (
      SELECT c_custkey AS pt_id,
             (c_custkey * 48271) % 2000001 - 1000000 AS px,
             (c_custkey * 16807) % 2000001 - 1000000 AS py
      FROM customer),
    pairs AS (
      SELECT a.pt_id AS src, b.pt_id AS dst
      FROM pts a JOIN pts b
        ON (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)
           <= CAST(80000 AS BIGINT) * 80000),
    core AS (
      SELECT src AS id FROM pairs GROUP BY src HAVING count(1) >= 6),
    cedges AS (
      SELECT p.src, p.dst FROM pairs p
      JOIN core c1 ON p.src = c1.id
      JOIN core c2 ON p.dst = c2.id),
    lbl(node, label) AS (
      SELECT id, id FROM core
      UNION
      SELECT e.dst, l.label FROM lbl l JOIN cedges e ON e.src = l.node),
    comp AS (SELECT node AS id, min(label) AS rep FROM lbl GROUP BY node),
    border AS (
      SELECT p.src AS id, min(c.rep) AS rep
      FROM pairs p JOIN comp c ON p.dst = c.id
      WHERE p.src NOT IN (SELECT id FROM core)
      GROUP BY p.src),
    assign AS (
      SELECT id, rep, true AS is_core FROM comp
      UNION ALL
      SELECT id, rep, false FROM border),
    labeled AS (
      SELECT id, rep, is_core FROM assign
      UNION ALL
      SELECT pt_id, -1, false FROM pts
      WHERE pt_id NOT IN (SELECT id FROM assign))
    SELECT rep AS cluster_id,
           CAST(count(1) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN is_core THEN 1 ELSE 0 END) AS BIGINT)
             AS n_core,
           CAST(sum(id) AS BIGINT) AS id_checksum
    FROM labeled GROUP BY rep ORDER BY rep"""

  /** qcm: GRID HOTSPOTS — a STENCIL over an aggregated grid: a cell is
    * a hotspot when its point count strictly exceeds every one of its
    * 8 neighbors (absent neighbor = 0). This is the relational form of
    * a convolution/stencil pass, the pattern behind heatmap peaks,
    * local-maxima NMS, and neighborhood smoothing: aggregate once to
    * the grid (tiny vs the point set), then EXPLODE each cell's count
    * TO its 8 neighbor positions and re-aggregate max by target cell —
    * two shuffles over data that is |cells|, not |points|, and the
    * stencil radius only changes the explode factor. The dense
    * alternative (self-join on |Δcx|≤1 ∧ |Δcy|≤1) needs an inequality
    * join; re-keying by (cx+dx, cy+dy) keeps it a plain hash
    * equi-join. Strictness makes the answer tie-free and
    * deterministic: two adjacent equal peaks are BOTH rejected.
    * Oracle: the inequality self-join, certifying the re-key stencil
    * against the direct neighborhood definition. */
  private[graft] def hotspotFrames(pts: DataFrame, g: Long): DataFrame = {
    val cells = pts
      .groupBy(floor(col("px") / g).cast("long").as("cx"),
        floor(col("py") / g).cast("long").as("cy"))
      .agg(count(lit(1)).as("n"))
    val nbrMax = cells
      .withColumn("dxc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dyc", explode(sequence(lit(-1L), lit(1L))))
      .where(col("dxc") =!= 0L || col("dyc") =!= 0L)
      .groupBy((col("cx") + col("dxc")).as("cx"),
        (col("cy") + col("dyc")).as("cy"))
      .agg(max("n").as("nbr_max"))
    cells.join(nbrMax, Seq("cx", "cy"), "left")
      .select(col("cx"), col("cy"), col("n"),
        coalesce(col("nbr_max"), lit(0L)).as("nbr_max"))
      .where(col("n") > col("nbr_max"))
      .orderBy("cx", "cy")
  }

  def gridHotspots(spark: SparkSession, dir: String): DataFrame = {
    val pts = customerPts(spark, dir)
    hotspotFrames(pts, 100000L)
  }

  /** qcn: TRAJECTORY TOP-K BY HAUSDORFF DISTANCE — similarity search
    * where the objects are POINT SEQUENCES (orders as trajectories,
    * lineitems as ordered waypoints), the 2D analogue of document
    * near-dup search: for each probe trajectory, the k most similar
    * others under the exact (squared) Hausdorff metric
    * H(A,B) = max(max_a min_b d², max_b min_a d²), radius-bounded at
    * R. The load-bearing identity: radius-bounding makes the
    * point-level grid hits sufficient for the EXACT answer —
    * H ≤ R ⟺ every waypoint on both sides is covered by an R-hit,
    * and for covered waypoints the true nearest counterpart is
    * among the hits — so the whole metric reduces to one cell-cover
    * join plus minimax/coverage aggregates, never a per-pair
    * waypoint cross product. Top-k per probe ranks by (H, candidate
    * key) through WindowGroupLimit like qcj. The oracle computes
    * ALL pairs naively and filters H ≤ R² — equality certifies both
    * the cover and the sufficiency argument. Hausdorff is the
    * order-free trajectory metric (and lower-bounds Fréchet); all
    * Long arithmetic, hashable. */
  private[graft] def trajHausdorffFrames(tp: DataFrame,
      probeKeys: DataFrame, r: Long, kTop: Int,
      broadcastProbes: Boolean = true): DataFrame = {
    // broadcastProbes: the graded probe set is a bounded key subsample,
    // but probe waypoints scale with the trajectory corpus — at 100 TB
    // pass false so the hit join shuffles both sides by cell key
    // instead of broadcasting a corpus-sized build side.
    // The point-level R-hits are SUFFICIENT for the exact answer — no
    // per-pair waypoint cross product anywhere:
    //   h_ab ≤ R ⟺ every probe waypoint has an R-hit on that
    //   candidate (coverage count = trajectory length), and for such
    //   pairs each waypoint's true nearest candidate point IS among
    //   its hits (its min distance ≤ R), so max-of-min over the hits
    //   is the exact h_ab; symmetrically for h_ba over candidate
    //   waypoints. A pair the hit set never links has H > R by the
    //   same equivalence — the "prune" is the predicate itself.
    // distinct waypoints: the fixture carries duplicate (k, ln) rows,
    // and a duplicated ln is the SAME waypoint (identical derived
    // coordinates) — Hausdorff is a set metric, so coverage counts
    // must compare against the distinct-waypoint cardinality
    val lens = tp.groupBy("k").agg(countDistinct("ln").as("len"))
    val keyed = tp
      .select(col("k").as("ck"), col("ln").as("cln"),
        col("x").as("px"), col("y").as("py"))
      .withColumn("cx", floor(col("px") / r).cast("long"))
      .withColumn("cy", floor(col("py") / r).cast("long"))
    val probePts = tp.join(probeKeys, Seq("k"))
      .select(col("k").as("pk"), col("ln").as("pln"),
        col("x").as("qx"), col("y").as("qy"))
      .withColumn("dxc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dyc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("cx", floor(col("qx") / r).cast("long") + col("dxc"))
      .withColumn("cy", floor(col("qy") / r).cast("long") + col("dyc"))
    val sq = (col("px") - col("qx")) * (col("px") - col("qx")) +
      (col("py") - col("qy")) * (col("py") - col("qy"))
    val hits = (if (broadcastProbes) broadcast(probePts) else probePts)
      .join(keyed, Seq("cx", "cy"))
      .where(sq <= r * r && col("pk") =!= col("ck"))
      .select(col("pk"), col("ck"), col("pln"), col("cln"), sq.as("d2"))
    val hab = hits.groupBy("pk", "ck", "pln").agg(min("d2").as("mind"))
      .groupBy("pk", "ck")
      .agg(count(lit(1)).as("np"), max("mind").as("h_ab"))
    val hba = hits.groupBy("pk", "ck", "cln").agg(min("d2").as("mind"))
      .groupBy("pk", "ck")
      .agg(count(lit(1)).as("nc"), max("mind").as("h_ba"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pk").orderBy(col("hausdorff_sq"), col("ck"))
    hab.join(hba, Seq("pk", "ck"))
      .join(lens.select(col("k").as("pk"), col("len").as("plen")), Seq("pk"))
      .join(lens.select(col("k").as("ck"), col("len").as("clen")), Seq("ck"))
      .where(col("np") === col("plen") && col("nc") === col("clen"))
      .select(col("pk"), col("ck"),
        greatest(col("h_ab"), col("h_ba")).as("hausdorff_sq"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= kTop)
      .select(col("pk").as("probe_ord"), col("rank").cast("long").as("rank"),
        col("ck").as("match_ord"), col("hausdorff_sq"))
      .orderBy("probe_ord", "rank")
  }

  def trajectoryHausdorff(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val seed = col("l_orderkey") * 7L + col("l_linenumber")
    val tp = li.select(col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"),
      (seed * 48271L % Span - 1000000L).as("x"),
      (seed * 16807L % Span - 1000000L).as("y"))
    val probeKeys = li.select(col("l_orderkey").as("k")).distinct()
      .where(col("k") % 997 === 0)
    trajHausdorffFrames(tp, probeKeys, 100000L, 3)
  }

  /** All-pairs exact-Hausdorff replay of [[trajectoryHausdorff]] —
    * the completeness certificate for the point-level prune. */
  val trajectoryHausdorffOracle: String = """
    WITH tp AS (
      SELECT l_orderkey AS k, l_linenumber AS ln,
             ((l_orderkey * 7 + l_linenumber) * 48271) % 2000001
               - 1000000 AS x,
             ((l_orderkey * 7 + l_linenumber) * 16807) % 2000001
               - 1000000 AS y
      FROM lineitem),
    probes AS (SELECT * FROM tp WHERE k % 997 = 0),
    d AS (
      SELECT p.k AS pk, c.k AS ck, p.ln AS pln, c.ln AS cln,
             (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y) AS d2
      FROM probes p JOIN tp c ON c.k <> p.k),
    hab AS (
      SELECT pk, ck, max(mind) AS h_ab FROM (
        SELECT pk, ck, pln, min(d2) AS mind
        FROM d GROUP BY pk, ck, pln)
      GROUP BY pk, ck),
    hba AS (
      SELECT pk, ck, max(mind) AS h_ba FROM (
        SELECT pk, ck, cln, min(d2) AS mind
        FROM d GROUP BY pk, ck, cln)
      GROUP BY pk, ck),
    h AS (
      SELECT pk, ck,
             CAST(greatest(h_ab, h_ba) AS BIGINT) AS hausdorff_sq
      FROM hab JOIN hba USING (pk, ck)
      WHERE greatest(h_ab, h_ba)
            <= CAST(100000 AS BIGINT) * 100000),
    ranked AS (
      SELECT pk, ck, hausdorff_sq,
             CAST(row_number() OVER (PARTITION BY pk
               ORDER BY hausdorff_sq, ck) AS BIGINT) AS rank
      FROM h)
    SELECT pk AS probe_ord, rank, ck AS match_ord, hausdorff_sq
    FROM ranked WHERE rank <= 3
    ORDER BY probe_ord, rank"""

  /** qco: FRÉCHET RERANK — the ORDER-AWARE trajectory metric over the
    * qcn shortlist: discrete Fréchet distance (squared), the minimax
    * leash over monotone traversals, dF(i,j) = max(d²(i,j),
    * min(dF(i-1,j), dF(i-1,j-1), dF(i,j-1))). Hausdorff ignores
    * sequence order; Fréchet is the metric trajectory work actually
    * ranks by — but it costs a DP per pair, so the scale doctrine is
    * the q6g rerank shape: shortlist by the cheap bound (qcn's
    * radius-bounded Hausdorff, which LOWER-bounds Fréchet), then pay
    * the exact DP only on k·probes pairs. The DP runs INSIDE the
    * engine's expression layer — nested aggregate() higher-order
    * functions carrying the DP row as the accumulator (the qcg
    * in-array-DP doctrine), all Long arithmetic, whole-stage
    * codegen'd, no UDF. Waypoints are de-duplicated and ln-ordered
    * (set-of-positions in sequence order; duplicate (k, ln) fixture
    * rows are the same waypoint). Oracle: a completely different
    * algorithm — Fréchet ≤ t iff a monotone path exists through DP
    * cells with d² ≤ t, so a recursive-CTE reachability per candidate
    * threshold takes min t; equality certifies the HOF DP. The spec
    * additionally pins the metric law hausdorff_sq ≤ frechet_sq. */
  private val frechetDp: String = """
    aggregate(
      pw,
      cast(null as array<bigint>),
      (prev, p) -> aggregate(
        cw,
        cast(array() as array<bigint>),
        (acc, c) -> array_append(acc,
          greatest(
            (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y),
            CASE
              WHEN prev IS NULL AND size(acc) = 0 THEN cast(0 as bigint)
              WHEN prev IS NULL THEN element_at(acc, size(acc))
              WHEN size(acc) = 0 THEN element_at(prev, 1)
              ELSE least(element_at(prev, size(acc) + 1),
                         element_at(prev, size(acc)),
                         element_at(acc, size(acc)))
            END))),
      r -> element_at(r, size(cw)))"""

  private[graft] def frechetRerankFrames(tp: DataFrame,
      probeKeys: DataFrame, r: Long, kTop: Int): DataFrame = {
    val topk = trajHausdorffFrames(tp, probeKeys, r, kTop)
      .withColumnRenamed("rank", "rank_h")
    val trajArr = tp.groupBy("k").agg(array_sort(array_distinct(
      collect_list(struct(col("ln"), col("x"), col("y"))))).as("w"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_ord").orderBy(col("frechet_sq"), col("match_ord"))
    topk
      .join(trajArr.select(col("k").as("probe_ord"), col("w").as("pw")),
        Seq("probe_ord"))
      .join(trajArr.select(col("k").as("match_ord"), col("w").as("cw")),
        Seq("match_ord"))
      .withColumn("frechet_sq", expr(frechetDp))
      .withColumn("rank_f", row_number().over(w).cast("long"))
      .select(col("probe_ord"), col("rank_h"), col("match_ord"),
        col("hausdorff_sq"), col("frechet_sq"), col("rank_f"))
      .orderBy("probe_ord", "rank_h")
  }

  def trajectoryFrechet(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val seed = col("l_orderkey") * 7L + col("l_linenumber")
    val tp = li.select(col("l_orderkey").as("k"),
      col("l_linenumber").as("ln"),
      (seed * 48271L % Span - 1000000L).as("x"),
      (seed * 16807L % Span - 1000000L).as("y"))
    val probeKeys = li.select(col("l_orderkey").as("k")).distinct()
      .where(col("k") % 997 === 0)
    frechetRerankFrames(tp, probeKeys, 100000L, 3)
  }

  /** Threshold-reachability replay of [[trajectoryFrechet]]: Fréchet ≤
    * t iff (m,n) is reachable from (1,1) through cells with d² ≤ t by
    * monotone steps — min over candidate thresholds (cell values). */
  val trajectoryFrechetOracle: String = """
    WITH RECURSIVE tp AS (
      SELECT l_orderkey AS k, l_linenumber AS ln,
             ((l_orderkey * 7 + l_linenumber) * 48271) % 2000001
               - 1000000 AS x,
             ((l_orderkey * 7 + l_linenumber) * 16807) % 2000001
               - 1000000 AS y
      FROM lineitem),
    probes AS (SELECT * FROM tp WHERE k % 997 = 0),
    d AS (
      SELECT p.k AS pk, c.k AS ck, p.ln AS pln, c.ln AS cln,
             (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y) AS d2
      FROM probes p JOIN tp c ON c.k <> p.k),
    hab AS (
      SELECT pk, ck, max(mind) AS h_ab FROM (
        SELECT pk, ck, pln, min(d2) AS mind FROM d GROUP BY pk, ck, pln)
      GROUP BY pk, ck),
    hba AS (
      SELECT pk, ck, max(mind) AS h_ba FROM (
        SELECT pk, ck, cln, min(d2) AS mind FROM d GROUP BY pk, ck, cln)
      GROUP BY pk, ck),
    h AS (
      SELECT pk, ck, CAST(greatest(h_ab, h_ba) AS BIGINT) AS hausdorff_sq
      FROM hab JOIN hba USING (pk, ck)
      WHERE greatest(h_ab, h_ba) <= CAST(100000 AS BIGINT) * 100000),
    topk AS (
      SELECT pk, ck, hausdorff_sq,
             CAST(row_number() OVER (PARTITION BY pk
               ORDER BY hausdorff_sq, ck) AS BIGINT) AS rank_h
      FROM h QUALIFY rank_h <= 3),
    pos AS (
      SELECT k, x, y,
             row_number() OVER (PARTITION BY k ORDER BY ln) AS i,
             count(*) OVER (PARTITION BY k) AS m
      FROM (SELECT DISTINCT k, ln, x, y FROM tp)),
    cells AS (
      SELECT t.pk, t.ck, a.i AS pi, b.i AS ci,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2,
             a.m AS pm, b.m AS cm
      FROM topk t
      JOIN pos a ON a.k = t.pk
      JOIN pos b ON b.k = t.ck),
    ths AS (SELECT DISTINCT pk, ck, d2 AS t FROM cells),
    reach(pk, ck, t, pi, ci) AS (
      SELECT c.pk, c.ck, h2.t, c.pi, c.ci
      FROM cells c JOIN ths h2 ON h2.pk = c.pk AND h2.ck = c.ck
      WHERE c.pi = 1 AND c.ci = 1 AND c.d2 <= h2.t
      UNION
      SELECT c.pk, c.ck, r.t, c.pi, c.ci
      FROM reach r JOIN cells c
        ON c.pk = r.pk AND c.ck = r.ck
       AND c.pi BETWEEN r.pi AND r.pi + 1
       AND c.ci BETWEEN r.ci AND r.ci + 1
       AND NOT (c.pi = r.pi AND c.ci = r.ci)
      WHERE c.d2 <= r.t),
    fr AS (
      SELECT r.pk, r.ck, CAST(min(r.t) AS BIGINT) AS frechet_sq
      FROM reach r
      JOIN (SELECT DISTINCT pk, ck, pm, cm FROM cells) mm
        ON mm.pk = r.pk AND mm.ck = r.ck
      WHERE r.pi = mm.pm AND r.ci = mm.cm
      GROUP BY r.pk, r.ck)
    SELECT t.pk AS probe_ord, t.rank_h, t.ck AS match_ord,
           t.hausdorff_sq, f.frechet_sq,
           CAST(row_number() OVER (PARTITION BY t.pk
             ORDER BY f.frechet_sq, t.ck) AS BIGINT) AS rank_f
    FROM topk t JOIN fr f ON f.pk = t.pk AND f.ck = t.ck
    ORDER BY probe_ord, rank_h"""

  /** qcp: CELL-PARTITIONED SPATIAL LAYOUT — the storage leg of the
    * family: at 100 TB a radius query must not SCAN the planet, it
    * must read only the partitions its 3×3 cover touches. The points
    * are laid down `partitionBy(lcx, lcy)` after a `repartition` on
    * the same keys (one file per non-empty cell, deterministic), and
    * the radius read joins the probes' exploded cover cells against
    * the partition COLUMNS — Spark's dynamic partition pruning turns
    * the broadcast probe side into a partition filter, so the scan
    * touches only covered cells (plan-asserted: `dynamicpruning`
    * subquery on the stored scan). The graded row folds the layout
    * evidence in: `n_cells_read` counts distinct `_metadata.file_path`
    * among the joined rows — exactly the non-empty cells of the
    * probe's cover, which the oracle recomputes from the points
    * themselves. R ≤ the layout pitch keeps the 3×3 cover complete,
    * so n_within/id_checksum replay the plain radius semantics. */
  private[graft] def spatialLayoutFrames(pts: DataFrame,
      probes: DataFrame, g: Long, r: Long, path: String,
      broadcastProbes: Boolean = true): DataFrame = {
    require(r <= g, "radius must not exceed the layout pitch (3x3 cover)")
    // broadcastProbes: the broadcast is ALSO what feeds dynamic
    // partition pruning here (the DPP subquery reuses the broadcast
    // exchange), so the default stays true for bounded probe sets; a
    // corpus-sized probe side passes false and accepts a full-layout
    // shuffled cell join in exchange for not OOMing the build side.
    pts
      .withColumn("lcx", floor(col("px") / g).cast("long"))
      .withColumn("lcy", floor(col("py") / g).cast("long"))
      .repartition(col("lcx"), col("lcy"))
      .write.partitionBy("lcx", "lcy").mode("overwrite").parquet(path)
    val spark = pts.sparkSession
    val stored = spark.read.parquet(path)
      .select(col("pt_id"), col("px"), col("py"),
        col("lcx"), col("lcy"), col("_metadata.file_path").as("fp"))
    val cover = probes
      .withColumn("dxc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dyc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("lcx", floor(col("qx") / g).cast("long") + col("dxc"))
      .withColumn("lcy", floor(col("qy") / g).cast("long") + col("dyc"))
    val sq = (col("px") - col("qx")) * (col("px") - col("qx")) +
      (col("py") - col("qy")) * (col("py") - col("qy"))
    val agg = (if (broadcastProbes) broadcast(cover) else cover)
      .join(stored, Seq("lcx", "lcy"))
      .groupBy("probe_id")
      .agg(
        sum(when(sq <= r * r, 1L).otherwise(0L)).as("n_within"),
        sum(when(sq <= r * r, col("pt_id")).otherwise(0L)).as("id_checksum"),
        countDistinct(col("fp")).as("n_cells_read"))
    probes.select("probe_id").join(agg, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_within"), lit(0L)).as("n_within"),
        coalesce(col("id_checksum"), lit(0L)).as("id_checksum"),
        coalesce(col("n_cells_read"), lit(0L)).as("n_cells_read"))
      .orderBy("probe_id")
  }

  def spatialLayout(spark: SparkSession, dir: String): DataFrame = {
    val probes = Tables.supplier(spark, dir)
      .where(col("s_suppkey") % 25 === 0)
      .select(col("s_suppkey").as("probe_id"),
        coord(col("s_suppkey"), 69621L).as("qx"),
        coord(col("s_suppkey"), 40692L).as("qy"))
    spatialLayoutFrames(customerPts(spark, dir), probes, 200000L, 150000L,
      graft.Fs.scratch("graft_spatial_layout"))
  }

  /** Point-level replay of [[spatialLayout]]: the radius panel from
    * all pairs; n_cells_read from the cover cells' occupancy. */
  val spatialLayoutOracle: String = """
    WITH pts AS (
      SELECT c_custkey AS pt_id,
             (c_custkey * 48271) % 2000001 - 1000000 AS px,
             (c_custkey * 16807) % 2000001 - 1000000 AS py
      FROM customer),
    probes AS (
      SELECT s_suppkey AS probe_id,
             (s_suppkey * 69621) % 2000001 - 1000000 AS qx,
             (s_suppkey * 40692) % 2000001 - 1000000 AS qy
      FROM supplier WHERE s_suppkey % 25 = 0),
    cover AS (
      SELECT probe_id, qx, qy,
             CAST(floor(qx / 200000.0) AS BIGINT) + d1.d AS lcx,
             CAST(floor(qy / 200000.0) AS BIGINT) + d2.d AS lcy
      FROM probes, (VALUES (-1), (0), (1)) d1(d),
                   (VALUES (-1), (0), (1)) d2(d)),
    cand AS (
      SELECT c.probe_id, c.qx, c.qy, p.pt_id, p.px, p.py,
             CAST(floor(p.px / 200000.0) AS BIGINT) AS lcx,
             CAST(floor(p.py / 200000.0) AS BIGINT) AS lcy
      FROM cover c JOIN pts p
        ON CAST(floor(p.px / 200000.0) AS BIGINT) = c.lcx
       AND CAST(floor(p.py / 200000.0) AS BIGINT) = c.lcy),
    agg AS (
      SELECT probe_id,
             CAST(sum(CASE WHEN (px - qx) * (px - qx)
                    + (py - qy) * (py - qy)
                    <= CAST(150000 AS BIGINT) * 150000
               THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
             CAST(sum(CASE WHEN (px - qx) * (px - qx)
                    + (py - qy) * (py - qy)
                    <= CAST(150000 AS BIGINT) * 150000
               THEN pt_id ELSE 0 END) AS BIGINT) AS id_checksum,
             CAST(count(DISTINCT (lcx, lcy)) AS BIGINT) AS n_cells_read
      FROM cand GROUP BY probe_id)
    SELECT p.probe_id,
           coalesce(a.n_within, 0) AS n_within,
           coalesce(a.id_checksum, 0) AS id_checksum,
           coalesce(a.n_cells_read, 0) AS n_cells_read
    FROM probes p LEFT JOIN agg a USING (probe_id)
    ORDER BY p.probe_id"""

  /** qcq: KERNEL-WEIGHTED SPATIAL INTERPOLATION — estimate a field
    * value at probe locations from in-radius neighbors, IDW-style but
    * with the LINEAR kernel w = R² − d² so every weight is an exact
    * integer (true inverse-distance weights are rationals and d→0
    * diverges; the linear kernel is bounded, integer, and keeps the
    * whole estimate one `div` away from hashable): interp_e2 =
    * Σ v_e2·(R²−d²) div Σ(R²−d²). The plan is [[radiusCandidates]]
    * carrying the neighbor's value — candidate generation is the
    * family's bounded cell join; the kernel is a projection; the
    * estimate is one hash aggregate. Probes with no neighbors stay in
    * the panel with n_neighbors = 0. Magnitude: |v_e2| ≤ 1e6 cents ×
    * w ≤ 2.5e9 × ≤hundreds of neighbors ≪ BIGINT. */
  def spatialInterpolation(spark: SparkSession, dir: String,
      broadcastProbes: Boolean = true): DataFrame = {
    // broadcastProbes: graded probe set is the %20 supplier subsample
    // (bounded at these SFs); a corpus-scale probe side passes false
    // and the cell join shuffles both sides instead of broadcasting.
    val r = 50000L
    val pts = Tables.customer(spark, dir).select(
      col("c_custkey").as("pt_id"),
      coord(col("c_custkey"), 48271L).as("px"),
      coord(col("c_custkey"), 16807L).as("py"),
      round(col("c_acctbal") * 100).cast("long").as("v_e2"))
    val probes = Tables.supplier(spark, dir)
      .where(col("s_suppkey") % 20 === 0)
      .select(col("s_suppkey").as("probe_id"),
        coord(col("s_suppkey"), 69621L).as("qx"),
        coord(col("s_suppkey"), 40692L).as("qy"))
    val sq = (col("px") - col("qx")) * (col("px") - col("qx")) +
      (col("py") - col("qy")) * (col("py") - col("qy"))
    val keyed = pts
      .withColumn("cx", floor(col("px") / r).cast("long"))
      .withColumn("cy", floor(col("py") / r).cast("long"))
    val cells = probes
      .withColumn("dxc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dyc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("cx", floor(col("qx") / r).cast("long") + col("dxc"))
      .withColumn("cy", floor(col("qy") / r).cast("long") + col("dyc"))
    val w = lit(r * r) - sq
    val est = (if (broadcastProbes) broadcast(cells) else cells)
      .join(keyed, Seq("cx", "cy"))
      .where(sq <= r * r)
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_neighbors"),
        sum(w).as("w_sum"),
        sum(col("v_e2") * w).as("vw_sum"))
      .select(col("probe_id"), col("n_neighbors"), col("w_sum"),
        expr("vw_sum div w_sum").as("interp_e2"))
    probes.select("probe_id").join(est, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        coalesce(col("w_sum"), lit(0L)).as("w_sum"),
        coalesce(col("interp_e2"), lit(0L)).as("interp_e2"))
      .orderBy("probe_id")
  }

  /** Naive all-pairs replay of [[spatialInterpolation]]. */
  val spatialInterpolationOracle: String = """
    WITH pts AS (
      SELECT c_custkey AS pt_id,
             (c_custkey * 48271) % 2000001 - 1000000 AS px,
             (c_custkey * 16807) % 2000001 - 1000000 AS py,
             CAST(round(c_acctbal * 100) AS BIGINT) AS v_e2
      FROM customer),
    probes AS (
      SELECT s_suppkey AS probe_id,
             (s_suppkey * 69621) % 2000001 - 1000000 AS qx,
             (s_suppkey * 40692) % 2000001 - 1000000 AS qy
      FROM supplier WHERE s_suppkey % 20 = 0),
    est AS (
      SELECT probe_id,
             CAST(count(1) AS BIGINT) AS n_neighbors,
             CAST(sum(CAST(50000 AS BIGINT) * 50000
               - ((px - qx) * (px - qx) + (py - qy) * (py - qy)))
               AS BIGINT) AS w_sum,
             CAST(sum(v_e2 * (CAST(50000 AS BIGINT) * 50000
               - ((px - qx) * (px - qx) + (py - qy) * (py - qy))))
               AS BIGINT) AS vw_sum
      FROM probes JOIN pts
        ON (px - qx) * (px - qx) + (py - qy) * (py - qy)
           <= CAST(50000 AS BIGINT) * 50000
      GROUP BY probe_id)
    SELECT p.probe_id,
           coalesce(e.n_neighbors, 0) AS n_neighbors,
           coalesce(e.w_sum, 0) AS w_sum,
           coalesce(CAST(e.vw_sum // e.w_sum AS BIGINT), 0) AS interp_e2
    FROM probes p LEFT JOIN est e USING (probe_id)
    ORDER BY p.probe_id"""

  /** qcr: RECTANGLE OVERLAP JOIN WITH REFERENCE-POINT DEDUP — the
    * canonical spatial join (PBSM, Patel & DeWitt SIGMOD'96): both
    * rectangle sets are exploded to the fixed-pitch cells their boxes
    * overlap, the cell key equi-joins them, the exact overlap
    * predicate (|Δcenter| ≤ sum-of-extents per axis, closed) refines —
    * and because an overlapping pair can share SEVERAL cells, the
    * REFERENCE POINT rule keeps exactly one copy: each intersection
    * region's min-corner lies in exactly one cell, and only the join
    * task holding THAT cell emits the pair. No post-join distinct —
    * the dedup is a projection-level predicate, which at 100 TB is
    * the difference between a shuffle over the duplicated pairs and
    * none. Empty panel rows are kept (a rectangle overlapping nothing
    * is an answer). Oracle: naive all-pairs overlap filter. */
  private[graft] def rectOverlapJoin(rectsA: DataFrame, rectsB: DataFrame,
      g: Long): DataFrame = {
    def cover(df: DataFrame, tag: String): DataFrame = df
      .withColumn("cx", explode(sequence(
        floor((col(s"${tag}x") - col(s"${tag}wx")) / g).cast("long"),
        floor((col(s"${tag}x") + col(s"${tag}wx")) / g).cast("long"))))
      .withColumn("cy", explode(sequence(
        floor((col(s"${tag}y") - col(s"${tag}wy")) / g).cast("long"),
        floor((col(s"${tag}y") + col(s"${tag}wy")) / g).cast("long"))))
    val overlap =
      abs(col("ax") - col("bx")) <= col("awx") + col("bwx") &&
      abs(col("ay") - col("by")) <= col("awy") + col("bwy")
    val refX = greatest(col("ax") - col("awx"), col("bx") - col("bwx"))
    val refY = greatest(col("ay") - col("awy"), col("by") - col("bwy"))
    val refHere = floor(refX / g).cast("long") === col("cx") &&
      floor(refY / g).cast("long") === col("cy")
    val hits = cover(rectsA, "a").join(cover(rectsB, "b"), Seq("cx", "cy"))
      .where(overlap && refHere)
      .groupBy("a_id")
      .agg(count(lit(1)).as("n_overlaps"), sum("b_id").as("id_checksum"))
    rectsA.select("a_id").join(hits, Seq("a_id"), "left")
      .select(col("a_id"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"),
        coalesce(col("id_checksum"), lit(0L)).as("id_checksum"))
      .orderBy("a_id")
  }

  def rectangleOverlaps(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.supplier(spark, dir)
      .where(col("s_suppkey") % 7 === 0)
      .select(col("s_suppkey").as("a_id"),
        coord(col("s_suppkey"), 69621L).as("ax"),
        coord(col("s_suppkey"), 40692L).as("ay"),
        (col("s_suppkey") * 7919L % 80000L + 20000L).as("awx"),
        (col("s_suppkey") * 104729L % 80000L + 20000L).as("awy"))
    val b = Tables.part(spark, dir)
      .where(col("p_partkey") % 11 === 0)
      .select(col("p_partkey").as("b_id"),
        coord(col("p_partkey"), 48271L).as("bx"),
        coord(col("p_partkey"), 16807L).as("by"),
        (col("p_partkey") * 7919L % 80000L + 20000L).as("bwx"),
        (col("p_partkey") * 104729L % 80000L + 20000L).as("bwy"))
    rectOverlapJoin(a, b, 200000L)
  }

  /** Naive all-pairs replay of [[rectangleOverlaps]] — equality
    * certifies both the cover and the reference-point dedup. */
  val rectangleOverlapsOracle: String = """
    WITH a AS (
      SELECT s_suppkey AS a_id,
             (s_suppkey * 69621) % 2000001 - 1000000 AS ax,
             (s_suppkey * 40692) % 2000001 - 1000000 AS ay,
             (s_suppkey * 7919) % 80000 + 20000 AS awx,
             (s_suppkey * 104729) % 80000 + 20000 AS awy
      FROM supplier WHERE s_suppkey % 7 = 0),
    b AS (
      SELECT p_partkey AS b_id,
             (p_partkey * 48271) % 2000001 - 1000000 AS bx,
             (p_partkey * 16807) % 2000001 - 1000000 AS by,
             (p_partkey * 7919) % 80000 + 20000 AS bwx,
             (p_partkey * 104729) % 80000 + 20000 AS bwy
      FROM part WHERE p_partkey % 11 = 0),
    hits AS (
      SELECT a_id,
             CAST(count(1) AS BIGINT) AS n_overlaps,
             CAST(sum(b_id) AS BIGINT) AS id_checksum
      FROM a JOIN b
        ON abs(ax - bx) <= awx + bwx
       AND abs(ay - by) <= awy + bwy
      GROUP BY a_id)
    SELECT a.a_id,
           coalesce(h.n_overlaps, 0) AS n_overlaps,
           coalesce(h.id_checksum, 0) AS id_checksum
    FROM a LEFT JOIN hits h USING (a_id)
    ORDER BY a.a_id"""

  /** qcs: MORAN'S I SPATIAL AUTOCORRELATION — the canonical "is the
    * field clustered in space" statistic: I = (n/W)·Σ_{ij∈nbrs}
    * z_i z_j / Σ z_i², binary weights w_ij = 1 for pairs within R.
    * Exactness trick: with z_i = n·v_i − Σv (an INTEGER — the n²
    * scale factor appears in numerator and denominator and cancels),
    * every term is exact; the cross-products exceed BIGINT
    * (|z| ~ n·v ≈ 1e10 → z² ≈ 1e20), so the two z-sums ride
    * DECIMAL(38,0) — the q1q/q1z doctrine — and are EMITTED AS
    * STRINGS (the oracle type lint forbids HUGEINT columns; the
    * decimal's digits are the portable form). The ppm headline is
    * one truncated integer division at the end. Neighbor pairs come
    * from the family's cell-cover self-join (shuffled, not broadcast
    * — the probe side IS the point set); the global moments ride a
    * broadcast 1-row aggregate (bounded BNLJ, whitelisted). */
  def moranAutocorrelation(spark: SparkSession, dir: String): DataFrame = {
    val r = 60000L
    val pts = Tables.customer(spark, dir).select(
      col("c_custkey").as("pt_id"),
      coord(col("c_custkey"), 48271L).as("px"),
      coord(col("c_custkey"), 16807L).as("py"),
      round(col("c_acctbal") * 100).cast("long").as("v_e2"))
    val moments = pts.agg(count(lit(1)).as("n"), sum("v_e2").as("s"))
    val z = pts.crossJoin(broadcast(moments))
      .select(col("pt_id"), col("px"), col("py"),
        (col("n") * col("v_e2") - col("s")).cast("decimal(38,0)").as("z"))
    val probes = z.select(col("pt_id").as("probe_id"),
      col("px").as("qx"), col("py").as("qy"), col("z").as("zq"))
    val pairZZ = radiusCandidatesKeep(z, probes, r)
      .where(col("probe_id") =!= col("pt_id"))
      .agg(count(lit(1)).as("w_pairs"),
        sum((col("zq") * col("z")).cast("decimal(38,0)")).as("zz_pair"))
    val selfZZ = z.agg(count(lit(1)).as("n"),
      sum((col("z") * col("z")).cast("decimal(38,0)")).as("zz_self"))
    selfZZ.crossJoin(broadcast(pairZZ))
      .select(col("n"), col("w_pairs"),
        col("zz_pair").cast("string").as("zz_pair"),
        col("zz_self").cast("string").as("zz_self"),
        expr("""CAST((CAST(1000000 AS DECIMAL(38,0)) * n * zz_pair)
          div (CAST(w_pairs AS DECIMAL(38,0)) * zz_self) AS BIGINT)""")
          .as("moran_ppm"))
  }

  /** Variant of [[radiusCandidates]] that carries the point-side and
    * probe-side payload columns through the cell join (z values for
    * Moran), shuffled on the cell key (self-join shape). */
  private def radiusCandidatesKeep(pts: DataFrame, probes: DataFrame,
      r: Long): DataFrame = {
    val sq = (col("px") - col("qx")) * (col("px") - col("qx")) +
      (col("py") - col("qy")) * (col("py") - col("qy"))
    val keyed = pts
      .withColumn("cx", floor(col("px") / r).cast("long"))
      .withColumn("cy", floor(col("py") / r).cast("long"))
    val cells = probes
      .withColumn("dxc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dyc", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("cx", floor(col("qx") / r).cast("long") + col("dxc"))
      .withColumn("cy", floor(col("qy") / r).cast("long") + col("dyc"))
    cells.join(keyed, Seq("cx", "cy")).where(sq <= r * r)
  }

  /** All-pairs HUGEINT replay of [[moranAutocorrelation]]. */
  val moranAutocorrelationOracle: String = """
    WITH pts AS (
      SELECT c_custkey AS pt_id,
             (c_custkey * 48271) % 2000001 - 1000000 AS px,
             (c_custkey * 16807) % 2000001 - 1000000 AS py,
             CAST(round(c_acctbal * 100) AS BIGINT) AS v_e2
      FROM customer),
    m AS (SELECT CAST(count(1) AS BIGINT) AS n,
                 CAST(sum(v_e2) AS BIGINT) AS s FROM pts),
    z AS (SELECT pt_id, px, py,
                 CAST(m.n * v_e2 - m.s AS HUGEINT) AS z
          FROM pts, m),
    pair AS (
      SELECT CAST(count(1) AS BIGINT) AS w_pairs,
             sum(a.z * b.z) AS zz_pair
      FROM z a JOIN z b
        ON a.pt_id <> b.pt_id
       AND (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py)
           <= CAST(60000 AS BIGINT) * 60000),
    slf AS (SELECT CAST(count(1) AS BIGINT) AS n,
                   sum(z * z) AS zz_self FROM z)
    SELECT slf.n, pair.w_pairs,
           CAST(pair.zz_pair AS VARCHAR) AS zz_pair,
           CAST(slf.zz_self AS VARCHAR) AS zz_self,
           CAST((CAST(1000000 AS HUGEINT) * slf.n * pair.zz_pair)
             // (CAST(pair.w_pairs AS HUGEINT) * slf.zz_self)
             AS BIGINT) AS moran_ppm
    FROM slf, pair"""

  /** Inequality-self-join replay of [[gridHotspots]] — the direct
    * neighborhood definition the re-key stencil must reproduce. */
  val gridHotspotsOracle: String = """
    WITH pts AS (
      SELECT (c_custkey * 48271) % 2000001 - 1000000 AS px,
             (c_custkey * 16807) % 2000001 - 1000000 AS py
      FROM customer),
    cells AS (
      SELECT CAST(floor(px / 100000.0) AS BIGINT) AS cx,
             CAST(floor(py / 100000.0) AS BIGINT) AS cy,
             CAST(count(1) AS BIGINT) AS n
      FROM pts GROUP BY 1, 2),
    nbr AS (
      SELECT a.cx, a.cy, max(b.n) AS nbr_max
      FROM cells a JOIN cells b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
       AND NOT (a.cx = b.cx AND a.cy = b.cy)
      GROUP BY a.cx, a.cy)
    SELECT c.cx, c.cy, c.n,
           coalesce(nbr.nbr_max, 0) AS nbr_max
    FROM cells c LEFT JOIN nbr ON c.cx = nbr.cx AND c.cy = nbr.cy
    WHERE c.n > coalesce(nbr.nbr_max, 0)
    ORDER BY c.cx, c.cy"""
}
