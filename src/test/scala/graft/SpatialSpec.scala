package graft

import org.apache.spark.sql.functions._
import graft.operators.Spatial

class SpatialSpec extends SparkSpec {

  test("qch grid radius join: equals naive all-pairs on the fixture; zero-hit probes stay in the panel") {
    val rows = Spatial.gridRadiusJoin(spark, sfDir).collect()
      .map(r => r.getAs[Long]("probe_id") -> r).toMap
    // naive truth in plain Scala
    val pts = Tables.customer(spark, sfDir).select("c_custkey").collect()
      .map(_.getLong(0)).map(k =>
        (k, k * 48271 % 2000001 - 1000000, k * 16807 % 2000001 - 1000000))
    val probes = Tables.supplier(spark, sfDir).select("s_suppkey")
      .collect().map(_.getLong(0)).filter(_ % 20 == 0)
      .map(k =>
        (k, k * 69621 % 2000001 - 1000000, k * 40692 % 2000001 - 1000000))
    val r2 = 50000L * 50000L
    assert(rows.keySet == probes.map(_._1).toSet && rows.nonEmpty)
    probes.foreach { case (pid, qx, qy) =>
      val within = pts.filter { case (_, px, py) =>
        (px - qx) * (px - qx) + (py - qy) * (py - qy) <= r2
      }
      val row = rows(pid)
      assert(row.getAs[Long]("n_within") == within.length.toLong, s"p$pid")
      assert(row.getAs[Long]("id_checksum") == within.map(_._1).sum, s"p$pid")
      val expMin = if (within.isEmpty) -1L
        else within.map { case (_, px, py) =>
          (px - qx) * (px - qx) + (py - qy) * (py - qy) }.min
      assert(row.getAs[Long]("min_sqdist") == expMin, s"p$pid")
    }
  }

  test("qch cell cover completeness: planted boundary geometry (dist exactly R, cell edges, negative coords)") {
    import spark.implicits._
    val r = 100L
    // probe at a cell corner; points planted at exact radius, just
    // outside, across cell boundaries, and in negative-coordinate
    // space (floor-division cells, not truncation)
    val probes = Seq((1L, 0L, 0L), (2L, -250L, -250L))
      .toDF("probe_id", "qx", "qy")
    val pts = Seq(
      (10L, 100L, 0L),    // exactly R right of probe 1 -> IN
      (11L, 0L, -100L),   // exactly R below, different cell -> IN
      (12L, 71L, 71L),    // sqrt(71^2+71^2) > 100 -> OUT (10082 > 10000)
      (13L, 70L, 70L),    // 9800 <= 10000 -> IN
      (14L, 101L, 0L),    // just outside -> OUT
      (15L, -250L, -151L), // probe 2: dy=99 -> IN (crosses cell edge)
      (16L, -250L, -351L), // probe 2: dy=101 -> OUT
      (17L, -150L, -250L)  // probe 2: dx=100 exactly -> IN
    ).toDF("pt_id", "px", "py")
    val out = Spatial.gridJoin(pts, probes, r).collect()
      .map(x => x.getAs[Long]("probe_id") -> x).toMap
    assert(out(1L).getAs[Long]("n_within") == 3L)
    assert(out(1L).getAs[Long]("id_checksum") == 10L + 11L + 13L)
    assert(out(1L).getAs[Long]("min_sqdist") == 9800L)
    assert(out(2L).getAs[Long]("n_within") == 2L)
    assert(out(2L).getAs[Long]("id_checksum") == 15L + 17L)
    assert(out(2L).getAs[Long]("min_sqdist") == 99L * 99L)
    // a probe with nothing nearby stays in the panel with zeros
    val lonely = Seq((9L, 900L, 900L)).toDF("probe_id", "qx", "qy")
    val alone = Spatial.gridJoin(pts, lonely, r).collect()
    assert(alone.length == 1 &&
      alone(0).getAs[Long]("n_within") == 0L &&
      alone(0).getAs[Long]("min_sqdist") == -1L)
  }

  test("qci containment join: equals naive all-pairs BETWEEN on the fixture") {
    val rows = Spatial.containmentJoin(spark, sfDir).collect()
      .map(r => r.getAs[Long]("rect_id") -> r).toMap
    val pts = Tables.customer(spark, sfDir).select("c_custkey").collect()
      .map(_.getLong(0)).map(k =>
        (k, k * 48271 % 2000001 - 1000000, k * 16807 % 2000001 - 1000000))
    val rects = Tables.supplier(spark, sfDir).select("s_suppkey")
      .collect().map(_.getLong(0)).filter(_ % 15 == 0)
      .map(k => (k,
        k * 69621 % 2000001 - 1000000, k * 40692 % 2000001 - 1000000,
        k * 7919 % 80000 + 20000, k * 104729 % 80000 + 20000))
    assert(rows.keySet == rects.map(_._1).toSet && rows.nonEmpty)
    rects.foreach { case (rid, sx, sy, wx, wy) =>
      val inside = pts.filter { case (_, px, py) =>
        px >= sx - wx && px <= sx + wx && py >= sy - wy && py <= sy + wy
      }
      assert(rows(rid).getAs[Long]("n_inside") == inside.length.toLong, s"r$rid")
      assert(rows(rid).getAs[Long]("id_checksum") == inside.map(_._1).sum, s"r$rid")
    }
  }

  test("qci cover completeness: planted rectangles spanning cell boundaries, inclusive edges, empty panel row") {
    import spark.implicits._
    val g = 100L
    val pts = Seq(
      (1L, 0L, 0L), (2L, 99L, 99L), (3L, 100L, 100L),
      (4L, -100L, -100L), (5L, 250L, 0L), (6L, -251L, 0L)
    ).toDF("pt_id", "px", "py")
    // rect A: center (0,0) extent 100 -> inclusive edges catch 3,4;
    // spans cells [-1..1]^2 even though g == extent
    // rect B: center (200,0) extent 50 -> only pt 5 (250 is inclusive)
    // rect C: center (-500,-500) extent 10 -> empty, stays in panel
    val rects = Seq(
      (100L, 0L, 0L, 100L, 100L),
      (200L, 200L, 0L, 50L, 50L),
      (300L, -500L, -500L, 10L, 10L)
    ).toDF("rect_id", "sx", "sy", "wx", "wy")
    val out = Spatial.containJoin(pts, rects, g).collect()
      .map(x => x.getAs[Long]("rect_id") -> x).toMap
    assert(out(100L).getAs[Long]("n_inside") == 4L)
    assert(out(100L).getAs[Long]("id_checksum") == 1L + 2L + 3L + 4L)
    assert(out(200L).getAs[Long]("n_inside") == 1L)
    assert(out(200L).getAs[Long]("id_checksum") == 5L)
    assert(out(300L).getAs[Long]("n_inside") == 0L)
    assert(out(300L).getAs[Long]("id_checksum") == 0L)
  }

  test("qcj knn-within-radius: equals naive ranked all-pairs on the fixture") {
    val got = Spatial.knnJoin(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("pt_id"), r.getAs[Long]("sqdist")))
    val pts = Tables.customer(spark, sfDir).select("c_custkey").collect()
      .map(_.getLong(0)).map(k =>
        (k, k * 48271 % 2000001 - 1000000, k * 16807 % 2000001 - 1000000))
    val probes = Tables.supplier(spark, sfDir).select("s_suppkey")
      .collect().map(_.getLong(0)).filter(_ % 10 == 0)
      .map(k =>
        (k, k * 69621 % 2000001 - 1000000, k * 40692 % 2000001 - 1000000))
    val r2 = 200000L * 200000L
    val want = probes.flatMap { case (pid, qx, qy) =>
      pts.map { case (id, px, py) =>
        (id, (px - qx) * (px - qx) + (py - qy) * (py - qy)) }
        .filter(_._2 <= r2)
        .sortBy { case (id, d) => (d, id) }
        .take(5).zipWithIndex
        .map { case ((id, d), i) => (pid, i + 1L, id, d) }
    }.sortBy(t => (t._1, t._2))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("qcj exact ties break by pt_id; rank filter runs as WindowGroupLimit; point scan is pruned") {
    import spark.implicits._
    // two points at the SAME distance from the probe -> pt_id order
    val probes = Seq((1L, 0L, 0L)).toDF("probe_id", "qx", "qy")
    val pts = Seq(
      (30L, 3L, 4L), (20L, 4L, 3L), // both sqdist 25 -> 20 before 30
      (10L, 0L, 1L), (40L, 6L, 8L)  // 1, then 100
    ).toDF("pt_id", "px", "py")
    val out = Spatial.knnJoinFrames(pts, probes, 100L, 3).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("pt_id")))
    assert(out.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // plan facts on the registered query
    val plan = Spatial.knnJoin(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank<=k must push as WindowGroupLimit, not filter-after-full-sort")
    assert(!plan.contains("c_name") && !plan.contains("c_acctbal"),
      "point-side parquet scan must prune to the key column")
  }

  test("qcl grid dbscan: planted two clusters, border attach, border-border NON-chaining, noise row") {
    import spark.implicits._
    // eps=100, minPts=4 (self included)
    val pts = Seq(
      // cluster A: 4 mutually-close cores (every pair within 100) -> rep 1
      (1L, 0L, 0L), (2L, 50L, 0L), (3L, 0L, 50L), (4L, 50L, 50L),
      // border of A: N = {self, core 2 at 90, point 6 at 90} = 3 < 4
      (5L, 140L, 0L),
      // the DBSCAN trap: 90 from BORDER 5 but 180 from any core ->
      // NOISE (border points don't chain), not cluster A
      (6L, 230L, 0L),
      // cluster B: 4 mutual cores far away -> rep = 7
      (7L, 1000L, 1000L), (8L, 1000L, 1060L),
      (9L, 1060L, 1000L), (10L, 1060L, 1060L),
      // isolated noise
      (11L, 5000L, 5000L)
    ).toDF("pt_id", "px", "py")
    val out = Spatial.dbscanFrames(pts, 100L, 4).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("n_core"),
          r.getAs[Long]("id_checksum"))).toMap
    assert(out.keySet == Set(-1L, 1L, 7L))
    assert(out(1L) == ((5L, 4L, 1L + 2L + 3L + 4L + 5L)), "cluster A = cores 1-4 + border 5")
    assert(out(7L) == ((4L, 4L, 7L + 8L + 9L + 10L)), "cluster B = cores 7-10")
    assert(out(-1L) == ((2L, 0L, 6L + 11L)), "6 must NOT chain through border 5")
  }

  test("qcl grid dbscan: equals a naive all-pairs + union-find replay on the fixture") {
    val rows = Spatial.gridDbscan(spark, sfDir).collect()
      .map(r => r.getAs[Long]("cluster_id") ->
        (r.getAs[Long]("n_points"), r.getAs[Long]("n_core"),
          r.getAs[Long]("id_checksum"))).toMap
    val ids = Tables.customer(spark, sfDir).select("c_custkey").collect().map(_.getLong(0))
    val xy = ids.map(k =>
      (k, k * 48271 % 2000001 - 1000000, k * 16807 % 2000001 - 1000000)).sortBy(_._1)
    val eps2 = 80000L * 80000L
    def close(a: (Long, Long, Long), b: (Long, Long, Long)) =
      (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3) <= eps2
    val neigh = xy.map(p => p._1 -> xy.filter(q => close(p, q)).map(_._1)).toMap
    val coreSet = neigh.collect { case (id, ns) if ns.length >= 6 => id }.toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(coreSet.toSeq.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    for (c <- coreSet; n <- neigh(c) if coreSet(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val rep = coreSet.map(c => c -> find(c)).toMap
    val assign = scala.collection.mutable.Map[Long, (Long, Boolean)]()
    coreSet.foreach(c => assign(c) = (rep(c), true))
    xy.map(_._1).filterNot(coreSet).foreach { id =>
      val coreNbrs = neigh(id).filter(coreSet)
      if (coreNbrs.nonEmpty) assign(id) = (coreNbrs.map(rep).min, false)
    }
    val want = xy.map(_._1)
      .map(id => assign.get(id).map { case (r, c) => (r, id, c) }
        .getOrElse((-1L, id, false)))
      .groupBy(_._1)
      .map { case (cid, g) =>
        cid -> (g.length.toLong, g.count(_._3).toLong, g.map(_._2).sum) }
    assert(rows == want, s"got=$rows want=$want")
    assert(rows.nonEmpty)
  }

  test("qcm grid hotspots: planted stencil — strict peaks only, adjacent equal peaks both rejected, isolated cell wins") {
    import spark.implicits._
    val g = 100L
    // cell (0,0): 3 points; its neighbor (1,0): 2 points -> (0,0) is a
    // strict peak. cells (5,5) and (6,5): 2 points EACH, adjacent ->
    // neither is strict. cell (20,20): 1 point, isolated -> peak.
    // negative space: (-3,-3) with 2 pts beats (-2,-3) with 1 -> peak.
    val pts = Seq(
      (1L, 10L, 10L), (2L, 20L, 20L), (3L, 30L, 30L),     // (0,0) x3
      (4L, 110L, 10L), (5L, 120L, 20L),                   // (1,0) x2
      (6L, 550L, 550L), (7L, 560L, 560L),                 // (5,5) x2
      (8L, 650L, 550L), (9L, 660L, 560L),                 // (6,5) x2
      (10L, 2050L, 2050L),                                // (20,20) x1
      (11L, -250L, -250L), (12L, -260L, -260L),           // (-3,-3) x2
      (13L, -150L, -250L)                                 // (-2,-3) x1
    ).toDF("pt_id", "px", "py")
    val out = Spatial.hotspotFrames(pts, g).collect()
      .map(r => (r.getAs[Long]("cx"), r.getAs[Long]("cy")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("nbr_max"))).toMap
    assert(out.keySet == Set((0L, 0L), (20L, 20L), (-3L, -3L)))
    assert(out((0L, 0L)) == ((3L, 2L)))
    assert(out((20L, 20L)) == ((1L, 0L)), "isolated cell: nbr_max 0")
    assert(out((-3L, -3L)) == ((2L, 1L)), "floor cells in negative space")
  }

  test("qcm grid hotspots: equals the naive neighborhood definition on the fixture") {
    val rows = Spatial.gridHotspots(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("cx"), r.getAs[Long]("cy")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("nbr_max"))).toMap
    val ids = Tables.customer(spark, sfDir).select("c_custkey").collect().map(_.getLong(0))
    val cells = ids.map { k =>
      val px = k * 48271 % 2000001 - 1000000
      val py = k * 16807 % 2000001 - 1000000
      (math.floor(px / 100000.0).toLong, math.floor(py / 100000.0).toLong)
    }.groupBy(identity).map { case (c, g2) => c -> g2.length.toLong }
    val want = cells.flatMap { case ((cx, cy), n) =>
      val nbrMax = cells.collect { case ((bx, by), m)
        if math.abs(bx - cx) <= 1 && math.abs(by - cy) <= 1 &&
          (bx, by) != ((cx, cy)) => m }
        .foldLeft(0L)(math.max)
      if (n > nbrMax) Some((cx, cy) -> (n, nbrMax)) else None
    }
    assert(rows == want && rows.nonEmpty)
  }

  test("qcn trajectory hausdorff: planted geometry — exact H, symmetric max, coverage bound, tie by key") {
    import spark.implicits._
    // probe 1: [(0,0),(100,0)]
    // cand 2: shifted by 10 in y -> H = 100 (both directions)
    // cand 3: matches probe exactly plus a straggler at (140,0) ->
    //   h_ab = 0, h_ba = 40^2 = 1600 -> H = 1600 (asymmetry matters)
    // cand 4: same H as 2 via a -10 shift -> tie broken by key (2 < 4)
    // cand 5: one waypoint at (0,5), other at (900,0): waypoint
    //   uncovered at R=100 -> excluded even though h_ab would be 25
    val tp = Seq(
      (1L, 1L, 0L, 0L), (1L, 2L, 100L, 0L),
      (2L, 1L, 0L, 10L), (2L, 2L, 100L, 10L),
      (3L, 1L, 0L, 0L), (3L, 2L, 100L, 0L), (3L, 3L, 140L, 0L),
      (4L, 1L, 0L, -10L), (4L, 2L, 100L, -10L),
      (5L, 1L, 0L, 5L), (5L, 2L, 900L, 0L)
    ).toDF("k", "ln", "x", "y")
    val probes = Seq(Tuple1(1L)).toDF("k")
    val out = Spatial.trajHausdorffFrames(tp, probes, 100L, 3).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("match_ord"),
        r.getAs[Long]("hausdorff_sq")))
    assert(out.toSeq == Seq((1L, 2L, 100L), (2L, 4L, 100L), (3L, 3L, 1600L)))
  }

  test("qcn trajectory hausdorff: equals the naive all-pairs replay on the fixture") {
    val got = Spatial.trajectoryHausdorff(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_ord"), r.getAs[Long]("rank"),
        r.getAs[Long]("match_ord"), r.getAs[Long]("hausdorff_sq"))).toSeq
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue))
    val traj = li.groupBy(_._1).map { case (k, g) =>
      k -> g.map { case (ok, ln) =>
        val s = ok * 7 + ln
        (s * 48271 % 2000001 - 1000000, s * 16807 % 2000001 - 1000000)
      }
    }
    val r2 = 100000L * 100000L
    def h(a: Array[(Long, Long)], b: Array[(Long, Long)]): Long =
      a.map(p => b.map(q =>
        (p._1 - q._1) * (p._1 - q._1) + (p._2 - q._2) * (p._2 - q._2)).min).max
    val want = traj.keys.filter(_ % 997 == 0).toSeq.sorted.flatMap { pk =>
      traj.keys.filter(_ != pk)
        .map(ck => (ck, math.max(h(traj(pk).toArray, traj(ck).toArray),
          h(traj(ck).toArray, traj(pk).toArray))))
        .filter(_._2 <= r2).toSeq
        .sortBy { case (ck, hh) => (hh, ck) }.take(3).zipWithIndex
        .map { case ((ck, hh), i) => (pk, i + 1L, ck, hh) }
    }
    assert(got == want && got.nonEmpty)
  }

  test("qco frechet rerank: planted reversal — Hausdorff 0 but Frechet pays the full leash; rerank flips the order") {
    import spark.implicits._
    // probe 1: [(0,0),(100,0)]; cand 2 identical; cand 3 REVERSED
    // (same point set -> Hausdorff 0, but order-aware Frechet = 100^2);
    // cand 4 shifted by 10 -> both metrics 100
    val tp = Seq(
      (1L, 1L, 0L, 0L), (1L, 2L, 100L, 0L),
      (2L, 1L, 0L, 0L), (2L, 2L, 100L, 0L),
      (3L, 1L, 100L, 0L), (3L, 2L, 0L, 0L),
      (4L, 1L, 0L, 10L), (4L, 2L, 100L, 10L)
    ).toDF("k", "ln", "x", "y")
    val probes = Seq(Tuple1(1L)).toDF("k")
    val out = Spatial.frechetRerankFrames(tp, probes, 150L, 3).collect()
      .map(r => r.getAs[Long]("match_ord") ->
        (r.getAs[Long]("hausdorff_sq"), r.getAs[Long]("frechet_sq"),
          r.getAs[Long]("rank_h"), r.getAs[Long]("rank_f"))).toMap
    assert(out(2L) == ((0L, 0L, 1L, 1L)), "identical: both metrics 0")
    assert(out(3L) == ((0L, 10000L, 2L, 3L)),
      "reversed: Hausdorff blind (0), Frechet pays 100^2, rerank demotes")
    assert(out(4L) == ((100L, 100L, 3L, 2L)), "shifted: both 100")
  }

  test("qco frechet rerank: equals a naive DP replay over the fixture shortlist; hausdorff lower-bounds frechet") {
    val got = Spatial.trajectoryFrechet(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("probe_ord"), r.getAs[Long]("rank_h"),
        r.getAs[Long]("match_ord"), r.getAs[Long]("hausdorff_sq"),
        r.getAs[Long]("frechet_sq"), r.getAs[Long]("rank_f"))).toSeq
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, h, f, _) =>
      assert(h <= f, "hausdorff must lower-bound frechet") }
    // naive DP over distinct ln-ordered waypoints
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber").collect()
      .map(r => (r.getLong(0), r.getAs[Number](1).longValue)).distinct
    val traj = li.groupBy(_._1).map { case (k, g) =>
      k -> g.sortBy(_._2).map { case (ok, ln) =>
        val s = ok * 7 + ln
        (s * 48271 % 2000001 - 1000000, s * 16807 % 2000001 - 1000000)
      }
    }
    def frechet(a: Array[(Long, Long)], b: Array[(Long, Long)]): Long = {
      val dp = Array.ofDim[Long](a.length, b.length)
      for (i <- a.indices; j <- b.indices) {
        val d = (a(i)._1 - b(j)._1) * (a(i)._1 - b(j)._1) +
          (a(i)._2 - b(j)._2) * (a(i)._2 - b(j)._2)
        val m =
          if (i == 0 && j == 0) 0L
          else if (i == 0) dp(0)(j - 1)
          else if (j == 0) dp(i - 1)(0)
          else math.min(dp(i - 1)(j), math.min(dp(i - 1)(j - 1), dp(i)(j - 1)))
        dp(i)(j) = math.max(d, m)
      }
      dp(a.length - 1)(b.length - 1)
    }
    got.foreach { case (pk, _, ck, _, f, _) =>
      assert(f == frechet(traj(pk).toArray, traj(ck).toArray),
        s"frechet mismatch for ($pk,$ck)")
    }
  }

  test("qcp spatial layout: pruned read equals naive radius panel; files read = cover-cell occupancy; DPP in plan") {
    val out = graft.operators.Spatial.spatialLayout(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      "partition-column join must carry a dynamic partition pruning filter on the stored scan")
    val rows = out.collect()
      .map(r => r.getAs[Long]("probe_id") ->
        (r.getAs[Long]("n_within"), r.getAs[Long]("id_checksum"),
          r.getAs[Long]("n_cells_read"))).toMap
    val pts = Tables.customer(spark, sfDir).select("c_custkey").collect()
      .map(_.getLong(0)).map(k =>
        (k, k * 48271 % 2000001 - 1000000, k * 16807 % 2000001 - 1000000))
    val probes = Tables.supplier(spark, sfDir).select("s_suppkey")
      .collect().map(_.getLong(0)).filter(_ % 25 == 0)
      .map(k =>
        (k, k * 69621 % 2000001 - 1000000, k * 40692 % 2000001 - 1000000))
    assert(rows.keySet == probes.map(_._1).toSet && rows.nonEmpty)
    val g = 200000L; val r2 = 150000L * 150000L
    def cell(v: Long) = math.floor(v / g.toDouble).toLong
    probes.foreach { case (pid, qx, qy) =>
      val coverCells = (for (dx <- -1L to 1L; dy <- -1L to 1L)
        yield (cell(qx) + dx, cell(qy) + dy)).toSet
      val cand = pts.filter { case (_, px, py) =>
        coverCells((cell(px), cell(py))) }
      val within = cand.filter { case (_, px, py) =>
        (px - qx) * (px - qx) + (py - qy) * (py - qy) <= r2 }
      assert(rows(pid)._1 == within.length.toLong, s"p$pid n_within")
      assert(rows(pid)._2 == within.map(_._1).sum, s"p$pid checksum")
      assert(rows(pid)._3 ==
        cand.map { case (_, px, py) => (cell(px), cell(py)) }.distinct.length.toLong,
        s"p$pid n_cells_read must equal the cover's occupied-cell count")
    }
  }

  test("qcq spatial interpolation: equals the naive kernel-weighted estimate on the fixture") {
    val rows = graft.operators.Spatial.spatialInterpolation(spark, sfDir)
      .collect().map(r => r.getAs[Long]("probe_id") ->
        (r.getAs[Long]("n_neighbors"), r.getAs[Long]("w_sum"),
          r.getAs[Long]("interp_e2"))).toMap
    val pts = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .map { case (k, bal) =>
        (k, k * 48271 % 2000001 - 1000000, k * 16807 % 2000001 - 1000000,
          math.round(bal * 100)) }
    val probes = Tables.supplier(spark, sfDir).select("s_suppkey")
      .collect().map(_.getLong(0)).filter(_ % 20 == 0)
      .map(k =>
        (k, k * 69621 % 2000001 - 1000000, k * 40692 % 2000001 - 1000000))
    val r2 = 50000L * 50000L
    assert(rows.keySet == probes.map(_._1).toSet && rows.nonEmpty)
    probes.foreach { case (pid, qx, qy) =>
      val near = pts.flatMap { case (id, px, py, v) =>
        val d = (px - qx) * (px - qx) + (py - qy) * (py - qy)
        if (d <= r2) Some((id, v, r2 - d)) else None
      }
      if (near.isEmpty) assert(rows(pid) == ((0L, 0L, 0L)), s"p$pid empty")
      else {
        val wsum = near.map(_._3).sum
        val vw = near.map(n => n._2 * n._3).sum
        assert(rows(pid) == ((near.length.toLong, wsum, vw / wsum)), s"p$pid")
      }
    }
  }

  test("qcr rect overlaps: planted multi-cell intersection counted ONCE; touching edges inclusive; empty row kept") {
    import spark.implicits._
    val g = 100L
    // A1 is a wide rectangle spanning several cells; B1 overlaps it in
    // a region crossing a cell boundary (the naive cell join would
    // emit the pair 2x without the reference-point rule)
    val a = Seq(
      (1L, 100L, 0L, 150L, 30L),  // x in [-50, 250]
      (2L, 1000L, 1000L, 10L, 10L), // far away, overlaps nothing
      (3L, 500L, 0L, 50L, 50L)
    ).toDF("a_id", "ax", "ay", "awx", "awy")
    val b = Seq(
      (10L, 120L, 0L, 80L, 20L),   // x in [40, 200]: intersection [40,200] spans cells 0,1,2
      (11L, 300L, 0L, 50L, 30L),   // touches A1 exactly at x=250 (|300-100| = 150+50) -> IN
      (12L, 700L, 0L, 149L, 10L),  // touches A3 at x=550? |700-500|=200 > 50+149=199 -> OUT
      (13L, 600L, 0L, 50L, 40L)    // overlaps A3: |600-500|=100 <= 100 -> IN (touching)
    ).toDF("b_id", "bx", "by", "bwx", "bwy")
    val out = graft.operators.Spatial.rectOverlapJoin(a, b, g).collect()
      .map(r => r.getAs[Long]("a_id") ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("id_checksum"))).toMap
    assert(out(1L) == ((2L, 10L + 11L)), "multi-cell overlap counted once; edge-touch inclusive")
    assert(out(2L) == ((0L, 0L)), "empty panel row kept")
    assert(out(3L) == ((1L, 13L)), "149+50=199 < 200 excluded; 50+50=100 touch included")
  }

  test("qcr rect overlaps: equals naive all-pairs on the fixture") {
    val rows = graft.operators.Spatial.rectangleOverlaps(spark, sfDir)
      .collect().map(r => r.getAs[Long]("a_id") ->
        (r.getAs[Long]("n_overlaps"), r.getAs[Long]("id_checksum"))).toMap
    def rect(k: Long, mx: Long, my: Long) =
      (k, k * mx % 2000001 - 1000000, k * my % 2000001 - 1000000,
        k * 7919 % 80000 + 20000, k * 104729 % 80000 + 20000)
    val as = Tables.supplier(spark, sfDir).select("s_suppkey").collect()
      .map(_.getLong(0)).filter(_ % 7 == 0).map(k => rect(k, 69621, 40692))
    val bs = Tables.part(spark, sfDir).select("p_partkey").collect()
      .map(_.getLong(0)).filter(_ % 11 == 0).map(k => rect(k, 48271, 16807))
    assert(rows.keySet == as.map(_._1).toSet && rows.nonEmpty)
    as.foreach { case (aid, ax, ay, awx, awy) =>
      val hit = bs.filter { case (_, bx, by, bwx, bwy) =>
        math.abs(ax - bx) <= awx + bwx && math.abs(ay - by) <= awy + bwy }
      assert(rows(aid) == ((hit.length.toLong, hit.map(_._1).sum)), s"a$aid")
    }
  }

  test("qcs moran's I: equals a BigInt all-pairs replay on the fixture; scale factor cancels exactly") {
    val row = graft.operators.Spatial.moranAutocorrelation(spark, sfDir)
      .collect()
    assert(row.length == 1)
    val pts = Tables.customer(spark, sfDir)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .map { case (k, bal) =>
        (k, k * 48271 % 2000001 - 1000000, k * 16807 % 2000001 - 1000000,
          math.round(bal * 100)) }
    val n = pts.length.toLong
    val s = pts.map(_._4).sum
    val z = pts.map { case (id, px, py, v) =>
      (id, px, py, BigInt(n) * v - s) }
    val r2 = 60000L * 60000L
    var w = 0L; var zzPair = BigInt(0)
    for (a <- z; b <- z if a._1 != b._1) {
      val d = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if (d <= r2) { w += 1; zzPair += a._4 * b._4 }
    }
    val zzSelf = z.map(p => p._4 * p._4).sum
    assert(row(0).getAs[Long]("n") == n)
    assert(row(0).getAs[Long]("w_pairs") == w)
    assert(row(0).getAs[String]("zz_pair") == zzPair.toString)
    assert(row(0).getAs[String]("zz_self") == zzSelf.toString)
    val expPpm = (BigInt(1000000) * n * zzPair) / (BigInt(w) * zzSelf)
    // BigInt '/' truncates toward zero — the same semantics as Spark's
    // div and DuckDB's //
    assert(row(0).getAs[Long]("moran_ppm") == expPpm.toLong)
  }
}
