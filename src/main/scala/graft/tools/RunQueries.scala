package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev harness: run a named subset of SparkEntry queries with timing
  * through the noop sink (same execution shape as Bench, none of the
  * 56-query wall-clock). Usage:
  *   tools/run_main.sh graft.tools.RunQueries <sfDir> q54 q55 ...
  * Prefix match is allowed (q5 runs every q5x query). */
object RunQueries {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val wanted = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Fs.scratch("graft_spark_warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // same warm-up as Bench so first-query numbers are comparable
    spark.range(1000000).selectExpr("sum(id) s", "avg(id) a")
      .write.format("noop").mode("overwrite").save()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.isEmpty || wanted.exists(name.startsWith)) {
        val t0 = System.nanoTime()
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          println(f"[run] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
        } catch { case e: Throwable =>
          println(f"[run] $name FAILED after ${(System.nanoTime() - t0) / 1e9}%.2fs: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
