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
}
