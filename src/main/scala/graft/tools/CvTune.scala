package graft.tools

import graft.etl.MovieLens
import graft.ml.{FixturePipelines, Recommend}
import org.apache.spark.sql.SparkSession

/** CV-shape timing probe at sf0.1: parallelism sweep for the bench grid. */
object CvTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (train, _) = MovieLens.trainTestSplit(FixturePipelines.ratings(spark, dir))
    train.cache().count()
    for (par <- Seq(2, 4, 8)) {
      val t0 = System.nanoTime()
      Recommend.gridSearchCV(train,
        ranks = Seq(5, 10), maxIters = Seq(10), regParams = Seq(0.05, 0.1),
        numFolds = 2, parallelism = par)
      println(f"parallelism=$par: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
