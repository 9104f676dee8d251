package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Optimization-round measurement harness (guide §1): run named queries
  * with a SparkListener recording every job's wall time, stage count and
  * task count, so a query's cost decomposes into its actual Spark jobs
  * (staged commits, read-backs, stats passes, microbatches) instead of
  * one opaque number. Usage:
  *   tools/run_main.sh graft.tools.JobProfile <sfDir> qdi qek ...
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val wanted = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Fs.scratch("graft_spark_warehouse"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, desc: String, start: Long,
        var end: Long = 0L, var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs(e.jobId) = Job(e.jobId, desc, e.time)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute to the most recent unfinished job holding the stage
          jobs.values.lastOption.foreach { j =>
            j.stages += 1; j.tasks += e.stageInfo.numTasks
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    // warm-up outside the measured region (same as Bench)
    spark.range(1000000).selectExpr("sum(id) s", "avg(id) a")
      .write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$dir/lineitem.parquet").limit(1000)
      .write.format("noop").mode("overwrite").save()

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (wanted.isEmpty || wanted.exists(name.startsWith)) {
        jobs.synchronized(jobs.clear())
        val t0 = System.nanoTime()
        try {
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          val snap = jobs.synchronized(jobs.values.toSeq)
          val jobSum = snap.map(j => (j.end - j.start).max(0L)).sum / 1e3
          println(f"%n[profile] $name wall=$wall%.2fs jobs=${snap.size} " +
            f"jobTimeSum=$jobSum%.2fs gap=${wall - jobSum}%.2fs")
          snap.sortBy(j => -(j.end - j.start)).take(30).foreach { j =>
            println(f"  job ${j.id}%4d ${(j.end - j.start) / 1e3}%7.3fs " +
              f"stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.desc.take(110)}")
          }
        } catch { case e: Throwable =>
          println(s"[profile] $name FAILED: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
