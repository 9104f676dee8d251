package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: raw per-bucket empirical banded-MinHash catch rates behind
  * qbl — calibrates the in_band/knee_ok contract thresholds. */
object ScurveProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.operators.Dedup.scurveCorpus(
      graft.Tables.documents(spark, dir))
      .repartition(spark.sparkContext.defaultParallelism)
    graft.operators.Dedup.bandingScurveRaw(docs)
      .withColumn("emp_e6", expr("n_caught * 1000000 div n_pairs"))
      .show(20, truncate = false)
    spark.stop()
  }
}
