package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Dev probe for the append-mode watermark flush: replays the staged
  * hourly aggregation and prints per-batch progress (rows in, watermark)
  * so the emission lag is visible. */
object StreamFlushProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sink = graft.Fs.scratch("graft_probe_sink")
    val ckpt = graft.Fs.scratch("graft_probe_ckpt")
    Seq(sink, ckpt).foreach(graft.Fs.deleteRecursively)
    // reuse the canonical staging helper so the probe replays exactly
    // what the graded queries replay (an inline copy had already drifted)
    val staging = graft.streaming.Events.stageReplayFiles(spark, dir, nFiles = 4)
    val stream = spark.readStream
      .schema(spark.read.parquet(staging).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staging)
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("parquet").option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}")
    }
    println(s"[probe] sink rows = ${spark.read.parquet(sink).count()}")
    spark.stop()
  }
}
