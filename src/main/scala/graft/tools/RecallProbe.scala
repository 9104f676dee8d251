package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Dev probe: print the q62/q63 folded-recall rows plus the raw overlap
  * counts, so the contract floors can be set from measurements instead
  * of guesses. Usage: tools/run_main.sh graft.tools.RecallProbe <sfDir>
  * (set SPARK_GRAFT_CPUS to match the config under test). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val bf = Similarity.bruteForceTopK(spark, dir, queryId = 0, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val lsh = Similarity.annLshTopK(spark, dir, queryId = 0, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = Similarity.ivfTopK(spark, dir, queryId = 0, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    println(s"[recall] dir=$dir cpus=$cpus")
    println(s"[recall] lsh overlap = ${(bf intersect lsh).size}/10")
    println(s"[recall] ivf overlap = ${(bf intersect ivf).size}/10")
    Similarity.annLshRecall(spark, dir).show(false)
    Similarity.ivfRecall(spark, dir).show(false)
    spark.stop()
  }
}
