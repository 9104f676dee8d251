package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: under which configs does Spark inject a runtime bloom filter
  * (semi-join reduction) for a selective-dim shuffle join at fixture
  * scale? Prints the optimized + executed plans so the q0a operator can
  * assert the right shape. */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // fixture tables are far below the production defaults (10MB creation
    // side / 10GB application side) — drop the thresholds so the rewrite
    // fires at test scale
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // force the shuffle-join regime the filter is designed for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val sup = Tables.supplier(spark, dir).filter(col("s_acctbal") > 9000)
    val li = Tables.lineitem(spark, dir)
    val joined = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_items"))
    println("=== optimized ===")
    println(joined.queryExecution.optimizedPlan.toString.take(4000))
    println("=== executed ===")
    println(joined.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
