package graft

import org.apache.spark.sql.functions._

/** Adaptive Query Execution skew-join evidence (SURVEY §4.1's runtime
  * counterpart to the explicit salted join in Relational.joinSkewSalted):
  * a deliberately skewed key — one value carrying ~90% of the fact rows —
  * is joined under AQE with test-scale skew thresholds, and the spec
  * asserts the optimizer actually SPLIT the hot partition (skew=true in
  * the final adaptive plan) and that the result is identical to the
  * non-adaptive join. At 100 TB this is the default defense against
  * unknown skew; salting remains the explicit form for known-skewed keys.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the skewed partition in a sort-merge join and preserves the result") {
    val overrides = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // test-scale thresholds: the hot partition (~20 MB of padded rows)
      // must exceed factor×median and the byte threshold to be split
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "131072",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      // force a sort-merge join — a broadcast join has no shuffle to skew
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap

    def skewedJoin() = {
      // 90% of fact rows share key 0; the rest spread over 96 keys.
      // pad = md5 hex (high entropy, compression-resistant) and it is
      // AGGREGATED so column pruning cannot drop it before the shuffle —
      // the hot partition must actually carry bytes to register as skew
      val fact = spark.range(300000).select(
        when(col("id") % 10 === 0, pmod(col("id"), lit(97))).otherwise(lit(0L)).as("k"),
        concat(md5(col("id").cast("string")), md5((col("id") + 1).cast("string"))).as("pad"))
      val dim = spark.range(97).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("name"))
      fact.join(dim, "k").groupBy("name")
        .agg(count(lit(1)).as("n"), max(length(col("pad"))).as("pad_len"))
    }

    try {
      overrides.foreach { case (k, v) => spark.conf.set(k, v) }
      val adaptive = skewedJoin()
      val rows = adaptive.collect()
      assert(rows.map(_.getAs[Long]("n")).sum == 300000L)
      val plan = adaptive.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkewJoin=true"),
        s"AQE did not mark the join as skew-handled:\n$plan")

      // correctness: identical to the same join with AQE off
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plainRows = skewedJoin().collect()
      assert(rows.map(_.toSeq).toSet == plainRows.map(_.toSeq).toSet)
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
