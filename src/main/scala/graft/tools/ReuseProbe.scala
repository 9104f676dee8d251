package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: print q0g's FINAL adaptive plan to inspect the ReusedExchange
  * evidence (the operator's bounded collect() finalizes the stages; a
  * side count() would plan its own execution and show nothing). */
object ReuseProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = graft.operators.Relational.exchangeReuse(spark, dir)
    out.show(20, truncate = false)
    spark.stop()
  }
}
