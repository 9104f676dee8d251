package graft.ml

import graft.{Tables => T}
import graft.etl.MovieLens
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ML workload re-targeted at the driver fixtures, so
  * the full pipeline (featurize → KMeans k-selection → cluster-average
  * predictor → ALS) runs, verifies and benches on `/root/testdata`
  * without MovieLens files: lineitem plays ratings (user=suppkey,
  * item=partkey, rating=quantity scaled to a 0.5–5 range), part plays
  * movies (genres = p_type tokens).
  *
  * Output is seeded (823 everywhere, like the reference) so each run is
  * reproducible on the same Spark version; the driver checks these
  * entries rows-only (seeded-stochastic ops are excluded from the
  * DuckDB hash oracle per SURVEY §5.2). */
object FixturePipelines {

  /** ratings-shaped view of lineitem: ~15 ratings per user at sf0.01. */
  def ratings(spark: SparkSession, dir: String): DataFrame =
    T.lineitem(spark, dir).select(
      col("l_suppkey").cast("int").as("userId"),
      col("l_partkey").cast("int").as("movieId"),
      (round(col("l_quantity") / 10.0) / 2.0 + 0.5).cast("float").as("rating"))

  /** movies-shaped view of part: pipe-joined p_type tokens as genres. */
  def movies(spark: SparkSession, dir: String): DataFrame =
    T.part(spark, dir).select(
      col("p_partkey").cast("int").as("movieId"),
      col("p_name").as("title"),
      concat_ws("|", split(col("p_type"), " ")).as("genres"))

  /** Featurized movies via the MovieLens one-hot path (R-03..R-08). */
  def featurizedMovies(spark: SparkSession, dir: String): (DataFrame, Seq[String]) = {
    val m = movies(spark, dir)
    val vocab = MovieLens.genreVocabulary(m)
    (MovieLens.assembleFeatures(MovieLens.oneHotGenres(m, vocab), vocab), vocab)
  }

  /** KMeans k-selection (R-20..R-23) over the featurized parts. */
  def kmeansSelection(spark: SparkSession, dir: String,
      ks: Seq[Int] = 2 to 6): DataFrame = {
    val (feats, _) = featurizedMovies(spark, dir)
    val (train, _) = MovieLens.trainTestSplit(ratings(spark, dir))
    Clustering.selectK(spark, feats, train, ks = ks)
      .select(col("k"), round(col("sse"), 2).as("sse"),
        round(col("sse_diff"), 2).as("sse_diff"),
        round(col("trainRmse"), 4).as("train_rmse"), col("best"))
  }

  /** End-to-end reference pipeline (§2.2 items 1-3 + 5): featurize,
    * pick k, fit, score test split with the cluster-average predictor;
    * one summary row. */
  def kmeansE2E(spark: SparkSession, dir: String): DataFrame = {
    val (feats, _) = featurizedMovies(spark, dir)
    val (train, test) = MovieLens.trainTestSplit(ratings(spark, dir))
    train.cache(); feats.cache()
    val selection = Clustering.selectK(spark, feats, train, ks = 2 to 6)
    val k = Clustering.bestK(selection)
    val model = Clustering.fit(feats, k)
    val clusters = model.transform(feats)
      .select(col("movieId"), col("prediction").as("cluster"))
    val testPreds = Clustering.clusterAvgPredictions(train, test, clusters)
    testPreds.agg(
      round(sqrt(avg(pow(col("rating") - col("prediction"), 2))), 4).as("test_rmse"),
      count(lit(1)).as("n_scored"))
      .withColumn("best_k", lit(k))
  }

  /** Single seeded ALS fit + test RMSE (R-24/R-25/R-19). */
  def alsE2E(spark: SparkSession, dir: String,
      rank: Int = 10, maxIter: Int = 10): DataFrame = {
    val (train, test) = MovieLens.trainTestSplit(ratings(spark, dir))
    val model = Recommend.fitAls(train.cache(), rank = rank, maxIter = maxIter)
    val (preds, rmse) = Recommend.evaluate(model, test)
    preds.agg(
      round(lit(rmse), 4).as("test_rmse"),
      count(lit(1)).as("n_scored"),
      countDistinct("userId").as("n_users"))
  }

  /** Small grid-searched CV (R-26..R-28): 2×2×2 grid, 2 folds,
    * parallelism 4 — the reference's 27×3 shape shrunk to keep verify
    * latency sane; CvSpec runs the introspection contract. Parallelism
    * is 4, not 8: the 8 fits share one local JVM, and 8 concurrent ALS
    * fits oversubscribed it (alternating 48 s / 200 s bench runs —
    * round-3 verdict); 4 keeps the fan-out win without the thrash. */
  def alsCvGrid(spark: SparkSession, dir: String): DataFrame = {
    val (train, _) = MovieLens.trainTestSplit(ratings(spark, dir))
    val cv = Recommend.gridSearchCV(train,
      ranks = Seq(5, 10), maxIters = Seq(10), regParams = Seq(0.05, 0.1),
      numFolds = 2, parallelism = 4)
    Recommend.cvResults(spark, cv)
      .select(col("rank"), col("maxIter"), col("regParam"),
        round(col("avg_rmse"), 4).as("avg_rmse"))
  }

  /** KMeans SSE parity check exposed as a query: trainingCost vs the
    * custom SquaredL2Distance expression over broadcast centers — the
    * reference's Python-lambda SSE (MovieLensRecommender.py:33-37)
    * as a codegen'd aggregate. */
  def sseParity(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val (feats, vocab) = featurizedMovies(spark, dir)
    val model = Clustering.fit(feats, k = 4)
    val assigned = model.transform(feats)
    val centers = model.clusterCenters.map(_.toArray.toSeq)
    val centerCol = typedLit(centers.toSeq)
    val sse = assigned
      .withColumn("farr", org.apache.spark.ml.functions.vector_to_array(col("features")))
      .withColumn("center", element_at(centerCol, col("prediction") + 1))
      .agg(sum(VectorFunctions.squaredL2(col("farr"), col("center"))).as("sse_expr"))
      .withColumn("sse_training_cost", lit(model.summary.trainingCost))
      .select(round(col("sse_expr"), 4).as("sse_expr"),
        round(col("sse_training_cost"), 4).as("sse_training_cost"))
    sse
  }
}
