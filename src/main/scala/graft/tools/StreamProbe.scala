package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** One-off probe: where does the file-source streaming replay spend
  * its time (staging write vs stream start vs microbatch drain)? */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val staging = "/tmp/graft_probe_" + java.util.UUID.randomUUID.toString.take(8)
    t("staging write") {
      Tables.events(spark, dir)
        .select(col("ts"), col("user_id"), col("event_type"), col("value"))
        .repartitionByRange(8, col("ts"))
        .write.parquet(staging)
    }
    val schema = t("schema probe")(spark.read.parquet(staging).schema)
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staging)
    val agg = stream.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
    val q = t("start") {
      agg.writeStream.outputMode(OutputMode.Complete())
        .format("memory").queryName("probe_tbl").start()
    }
    t("drain")(q.processAllAvailable())
    q.recentProgress.foreach { p =>
      println(f"[probe] batch ${p.batchId} rows=${p.numInputRows} ms=${p.batchDuration}")
    }
    t("stop")(q.stop())
    t("read result")(println("rows=" + spark.table("probe_tbl").count()))
    spark.stop()
  }
}
