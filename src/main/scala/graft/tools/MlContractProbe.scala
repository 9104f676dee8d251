package graft.tools

import graft.eval.Metrics
import graft.ml.{Clustering, FixturePipelines => FP, Recommend}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Raw-metric probe behind the q70-q74 contract bands: prints the
  * actual seeded SSE / RMSE / count values of the fixture ML pipelines
  * under the hash-gated split, at a chosen core count — run at
  * local[4]/local[8]/local[32] to measure how much the seeded metrics
  * move with partitioning before committing band constants and oracle
  * literals (the band must contain every environment the driver might
  * verify in).
  *
  * Usage: tools/run_main.sh graft.tools.MlContractProbe <sfDir> <cpus>
  */
object MlContractProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = if (args.length > 1) args(1) else "8"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"=== cpus=$cpus dir=$dir ===")

    val (train, test) = FP.hashTrainTest(spark, dir)
    train.cache(); test.cache()
    val (nTrain, nTest) = (train.count(), test.count())
    println(s"[split] n_train=$nTrain n_test=$nTest")

    val (feats, _) = FP.featurizedMovies(spark, dir)
    feats.cache()
    val sel = Clustering.selectK(spark, feats, train, ks = 2 to 6)
    sel.show(10, false)
    val k = Clustering.bestK(sel)
    println(s"[q70] best_k=$k")

    val model = Clustering.fit(feats, k)
    val clusters = model.transform(feats)
      .select(col("movieId"), col("prediction").as("cluster"))
    val testPreds = Clustering.clusterAvgPredictions(train, test, clusters)
    val row = testPreds.agg(
      sqrt(avg(pow(col("rating") - col("prediction"), 2))).as("test_rmse"),
      count(lit(1)).as("n_scored")).head()
    println(f"[q71] test_rmse=${row.getDouble(0)}%.4f n_scored=${row.getLong(1)} " +
      f"frac=${row.getLong(1).toDouble / nTest}%.4f")

    val als = Recommend.fitAls(train, rank = 10, maxIter = 10)
    val (preds, rmse) = Recommend.evaluate(als, test)
    val arow = preds.agg(count(lit(1)), countDistinct("userId")).head()
    println(f"[q72] als_rmse=$rmse%.4f n_scored=${arow.getLong(0)} " +
      s"n_users=${arow.getLong(1)} n_cold=${nTest - arow.getLong(0)}")

    val cv = Recommend.gridSearchCV(train,
      ranks = Seq(5, 10), maxIters = Seq(10), regParams = Seq(0.05, 0.1),
      numFolds = 2, parallelism = 4)
    Recommend.cvResults(spark, cv).show(10, false)

    val fit4 = Clustering.fit(feats, 4)
    println(s"[q74] trainingCost=${fit4.summary.trainingCost} " +
      s"n_points=${feats.count()}")
    spark.stop()
  }
}
