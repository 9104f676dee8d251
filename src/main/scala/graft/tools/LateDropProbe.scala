package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Probe for the q3y late-drop plant: prints each microbatch's input
  * rows, watermark, and numRowsDroppedByWatermark to diagnose why a
  * staged late slice was or wasn't dropped. */
object LateDropProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val staging = "/tmp/graft_late_probe_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val bounds = ev.agg(
      (min(unix_micros(date_trunc("hour", col("ts")))) + 3600000000L).as("h0"),
      max(unix_micros(col("ts"))).as("mx")).head()
    val (h0End, maxUs) = (bounds.getLong(0), bounds.getLong(1))
    println(s"h0End=$h0End maxUs=$maxUs wm=${maxUs - 3600000000L}")
    val midCut = maxUs - 86400000000L
    ev.where(unix_micros(col("ts")) >= h0End && unix_micros(col("ts")) < midCut)
      .coalesce(1).write.parquet(s"$staging/f0")
    ev.where(unix_micros(col("ts")) >= midCut).coalesce(1).write.parquet(s"$staging/f1")
    ev.where(unix_micros(col("ts")) < h0End).coalesce(1).write.parquet(s"$staging/f2")
    val dst = new java.io.File(staging)
    Seq("f0", "f1", "f2").zipWithIndex.foreach { case (sub, i) =>
      new java.io.File(s"$staging/$sub").listFiles()
        .filter(_.getName.startsWith("part-")).foreach { f =>
          val moved = new java.io.File(dst, s"replay-$i-${f.getName}")
          require(f.renameTo(moved), s"cannot stage $f")
          val mtime = 1700000000000L + i * 60000L
          require(moved.setLastModified(mtime) && moved.lastModified() == mtime)
        }
    }
    println("staged: " + dst.listFiles().filter(_.getName.startsWith("replay"))
      .sortBy(_.getName).map(f => s"${f.getName}@${f.lastModified()}").mkString(", "))
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(staging)
    val agg = stream.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val sink = s"$staging/sink"; val ckpt = s"$staging/ckpt"
    val useAvailableNow = args.length < 2 || args(1) == "availablenow"
    val w = agg.writeStream.outputMode(OutputMode.Append())
      .format("parquet").option("path", sink)
      .option("checkpointLocation", ckpt)
    val q = (if (useAvailableNow)
      w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    else w).start()
    try {
      if (useAvailableNow) q.awaitTermination() else q.processAllAvailable()
    } finally q.stop()
    q.recentProgress.foreach { p =>
      val drops = p.stateOperators.map(_.numRowsDroppedByWatermark).sum
      println(s"batch=${p.batchId} inputRows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} dropped=$drops")
    }
    val emitted = spark.read.parquet(sink)
      .select(unix_micros(col("win.start")).as("h"), col("n"))
      .where(col("h") < h0End).collect()
    println(s"first-hour rows in sink: ${emitted.length}")
    spark.stop()
  }
}
