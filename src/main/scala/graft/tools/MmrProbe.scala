package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Dev probe: timing of the q8k MMR pipeline AS SHIPPED (cold and
  * warm), calling the production `Similarity.mmrRerank` so the probe
  * can never drift from the code it measures. The per-phase replica
  * that diagnosed the nested-plan blowup lived here temporarily; its
  * conclusion is recorded in mmrRerank's doc comment and
  * DedupSimilaritySpec replays the greedy independently.
  * Usage: tools/run_main.sh graft.tools.MmrProbe <sfDir> */
object MmrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mmr] $label%-16s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    timed("warmup")(graft.Tables.embeddings(spark, dir).count())
    timed("q8k cold")(Similarity.mmrRerank(spark, dir).collect().foreach(println))
    timed("q8k warm")(Similarity.mmrRerank(spark, dir).count())
    spark.stop()
  }
}
