package graft.tools

import org.apache.spark.sql.SparkSession

/** Margin measurement for qa9's probe-recall contract: sweep the
  * recall floor and report where the fold flips, per core count.
  * Usage: tools/run_main.sh graft.tools.ServingProbe [sfDir] */
object ServingProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq(10, 8, 6, 4, 3).foreach { floor =>
      val ok = graft.ml.Serving.alsServing(spark, dir,
          recallFloorX10 = floor).collect()
        .count(_.getAs[Boolean]("probe_recall_ok"))
      println(s"[probe] cpus=$cpus floorX10=$floor ok_users=$ok/8")
    }
    spark.stop()
  }
}
