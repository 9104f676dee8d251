package graft.tools

import graft.etl.MovieLens
import graft.eval.Metrics
import graft.ml.{Clustering, FixturePipelines}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: phase timing of the q70 kmeans-selection pipeline at
  * sf0.1 — which of featurize / split / cache / fit / cluster-avg RMSE
  * actually costs the 200+ bench seconds. */
object KmeansProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val (feats, _) = t("featurize build")(FixturePipelines.featurizedMovies(spark, dir))
    t("featurize materialize")(feats.cache().count())
    val (train, _) = t("split build")(
      MovieLens.trainTestSplit(FixturePipelines.ratings(spark, dir)))
    t("train materialize")(train.cache().count())
    val model = t("fit k=4")(Clustering.fit(feats, 4))
    val clusters = t("transform")(model.transform(feats)
      .select(col("movieId"), col("prediction").as("cluster")).cache())
    t("clusters materialize")(clusters.count())
    val preds = Clustering.clusterAvgPredictions(train, train, clusters)
    t("cluster-avg rmse")(println("rmse=" + Metrics.rmse(preds)))
    t("fit k=5 (second fit, warm)")(Clustering.fit(feats, 5))
    t("full selectK 2..6")(Clustering.selectK(spark, feats, train).collect())
    spark.stop()
  }
}
