package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe: where does q58 spend its time? Times each candidate
  * exact-quantile implementation and the sketch separately, twice each
  * (cold + warm), in one JVM. */
object QuantileProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    def time(name: String)(f: => Unit): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("scan_count")(li.groupBy("g").count().collect())
    time("percentile_buffer")(
      li.groupBy("g").agg(percentile(col("v"),
        array(Seq(0.249, 0.25, 0.251, 0.499, 0.5, 0.501, 0.749, 0.75, 0.751)
          .map(lit(_)): _*))).collect())
    time("window_rank_sort")(
      li.withColumn("rk", row_number().over(Window.partitionBy("g").orderBy("v")))
        .groupBy("g").agg(max("rk")).collect())
    time("approx_sketch")(
      li.groupBy("g").agg(percentile_approx(col("v"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))).collect())
    time("approx_sketch_acc1000")(
      li.groupBy("g").agg(percentile_approx(col("v"),
        array(lit(0.25), lit(0.5), lit(0.75)), lit(1000))).collect())
    spark.stop()
  }
}
