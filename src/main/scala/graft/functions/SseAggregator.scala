package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed SSE aggregator — Σ‖x−μ‖² over (point, assigned-center) rows —
  * the reference's Python-lambda `compute_cost`
  * (MovieLensRecommender.py:33-37) as a spark.sql `Aggregator`.
  *
  * Exists alongside the untyped path (`sum(squared_l2(farr, center))`,
  * FixturePipelines.sseParity): the expression form stays inside
  * whole-stage codegen and is the hot-path choice; this typed form is
  * the pattern for aggregation logic too stateful for an expression —
  * partial aggregation (map-side combine) comes from reduce/merge. */
object SseAggregator extends Aggregator[(Seq[Double], Seq[Double]), Double, Double] {

  private def sq(point: Seq[Double], center: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(point.length, center.length)
    while (i < n) { val d = point(i) - center(i); s += d * d; i += 1 }
    s
  }

  override def zero: Double = 0.0
  override def reduce(acc: Double, row: (Seq[Double], Seq[Double])): Double =
    acc + sq(row._1, row._2)
  override def merge(a: Double, b: Double): Double = a + b
  override def finish(acc: Double): Double = acc
  override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
