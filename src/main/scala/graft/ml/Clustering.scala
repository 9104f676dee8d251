package graft.ml

import graft.eval.Metrics
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** KMeans genre-clustering model selection (reference:
  * MovieLensRecommender.py:27-30, 72-83, 155-182).
  *
  * Deviations, by design:
  *  - SSE comes from `model.summary.trainingCost` — the exact same
  *    Σ‖x−μ_c‖² the reference computes row-by-row in a Python lambda
  *    (MovieLensRecommender.py:33-37,164) — zero extra jobs;
  *  - the k=2..10 fits run concurrently over one cached input (the
  *    reference refits the uncached scan 9 times, serially);
  *  - the SSE successive-difference and argmin (done in driver pandas
  *    there, MovieLensRecommender.py:47-51,182) are a lag window + sort
  *    on the 9-row result — native, R-22/R-23.
  */
object Clustering {

  case class KResult(k: Int, sse: Double, trainRmse: Double)

  /** R-20/R-21: one seeded fit + cluster assignment. */
  def fit(movies: DataFrame, k: Int, seed: Long = 823): KMeansModel =
    new KMeans().setK(k).setSeed(seed).setFeaturesCol("features").fit(movies)

  /** R-14..R-17: the cluster-average rating predictor —
    * prediction(u,m) = avg train rating of user u within cluster(m)
    * (reference: MovieLensRecommender.py:72-83). `clusters` is the small
    * (movieId → cluster) map and is broadcast into both joins. */
  def clusterAvgPredictions(ratingsTrain: DataFrame, ratingsEval: DataFrame,
      clusters: DataFrame): DataFrame = {
    val ucr = ratingsTrain
      .join(broadcast(clusters), "movieId")
      .groupBy("userId", "cluster")
      .agg(avg("rating").as("prediction"))
    ratingsEval
      .join(broadcast(clusters), "movieId")
      .join(ucr, Seq("userId", "cluster"))
  }

  /** R-20..R-23: the k-selection loop. Fits all k concurrently on a
    * cached input, computes SSE + train RMSE per k, then the SSE lag
    * diff; returns the 9-row results table ordered by k with the chosen
    * k flagged (most-negative SSE drop, README.md:35). */
  def selectK(spark: SparkSession, movies: DataFrame, ratingsTrain: DataFrame,
      ks: Seq[Int] = 2 to 10, seed: Long = 823,
      parallelism: Int = 4): DataFrame = {
    import spark.implicits._
    // materialize BOTH caches before fanning out: concurrent fits racing
    // to compute the same un-materialized InMemoryRelation duplicate the
    // featurization work under storage-lock contention (observed 10×
    // run-to-run variance on the k-selection query)
    movies.cache().count(); ratingsTrain.cache().count()
    // daemon pool, shut down on exit — a plain fixed pool would hold the
    // JVM open after main returns (observed as a Verify hang)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      parallelism,
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t })
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val results =
      try {
        val futs = ks.map { k => Future {
          val model = fit(movies, k, seed)
          val clusters = model.transform(movies)
            .select(col("movieId"), col("prediction").as("cluster"))
          val preds = clusterAvgPredictions(ratingsTrain, ratingsTrain, clusters)
          KResult(k, model.summary.trainingCost, Metrics.rmse(preds))
        }}
        Await.result(Future.sequence(futs), Duration.Inf)
      } finally pool.shutdown()
    val w = Window.orderBy("k")
    results.toDF()
      .withColumn("sse_diff", coalesce(col("sse") - lag("sse", 1).over(w), lit(0.0)))
      .withColumn("best",
        col("sse_diff") === min("sse_diff").over(Window.partitionBy()))
      .orderBy("k")
  }

  /** Best k = argmin of the SSE successive difference (R-23). */
  def bestK(selection: DataFrame): Int =
    selection.filter(col("best")).select("k").head().getInt(0)
}
