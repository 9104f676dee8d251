package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Probe: what schema does Spark 4's `statestore` reader expose over a
  * streaming-aggregation checkpoint, and what do the value buffer
  * fields look like? Feeds the qbg design. */
object StateStoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val ckpt = graft.Fs.scratch("graft_ssprobe_ckpt")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val staging = graft.streaming.Events.stageReplayFiles(spark, dir, 4)
    val schema = spark.read.parquet(staging).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 2).parquet(staging)
    val agg = stream
      .select(col("event_type"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(); q.stop()
    val st = spark.read.format("statestore").load(ckpt)
    st.printSchema()
    st.show(10, truncate = false)
    println("count=" + st.count())
    spark.stop()
  }
}
