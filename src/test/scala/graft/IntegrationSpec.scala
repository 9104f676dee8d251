package graft

import graft.etl.MovieLens
import graft.eval.Metrics
import graft.ml.{Clustering, Recommend}
import graft.report.Report
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Reference-native end-to-end run (FIXTURES.md §A contract): a seeded
  * synthetic MovieLens-format corpus — 60 movies / 40 users / ~1.4k
  * ratings in `::`-delimited .dat files — through the FULL pipeline the
  * reference runs (MovieLensRecommender.py:109-259): parse → featurize →
  * KMeans k-selection → cluster-average predictor → ALS → comparison
  * report. This is the "a reference user could switch" path: their data
  * arrives exactly like this. */
class IntegrationSpec extends SparkSpec {

  private val rng = new scala.util.Random(823)
  private val genrePool = Seq("Action", "Comedy", "Drama", "Horror", "Sci-Fi", "Romance")

  private val moviesLines = (1 to 60).map { m =>
    // 3 latent movie groups with distinct genre mixes → clusterable
    val base = m % 3
    val gs = (Seq(genrePool(base * 2)) ++
      (if (rng.nextBoolean()) Seq(genrePool(base * 2 + 1)) else Nil)).distinct
    s"$m::Movie $m (199${m % 10})::${gs.mkString("|")}"
  }

  private val ratingsLines = (for {
    u <- 1 to 40
    m <- 1 to 60 if rng.nextDouble() < 0.6
  } yield {
    // users prefer their own group: rating = 4±1 in-group, 2±1 out-group
    val affinity = if (m % 3 == u % 3) 4 else 2
    val r = math.max(1, math.min(5, affinity + rng.nextInt(3) - 1))
    s"$u::$m::$r::97830${u}${m}"
  })

  private def write(name: String, lines: Seq[String]): String = {
    val f = Files.createTempFile(s"graft_int_$name", ".dat")
    Files.write(f, String.join("\n", lines: _*).getBytes)
    f.toString
  }

  test("full reference pipeline over .dat input: featurize → KMeans → ALS → report") {
    val (movies, vocab) = MovieLens.featurizeMovies(spark, write("movies", moviesLines))
    assert(vocab.size == 6)
    assert(movies.count() == 60)

    val ratings = MovieLens.parseRatings(spark, write("ratings", ratingsLines))
    val (train, test) = MovieLens.trainTestSplit(ratings)
    train.cache(); test.cache(); movies.cache()

    // KMeans model selection (R-20..R-23)
    val selection = Clustering.selectK(spark, movies, train, ks = 2 to 5)
    val k = Clustering.bestK(selection)
    assert(k >= 2 && k <= 5)
    val model = Clustering.fit(movies, k)
    val clusters = model.transform(movies)
      .select(col("movieId"), col("prediction").as("cluster"))

    // cluster-average predictor on the held-out split (R-13..R-17, R-19)
    val kmeansPreds = Clustering.clusterAvgPredictions(train, test, clusters)
    val kmeansTestRmse = Metrics.rmse(kmeansPreds)
    val kmeansTrainRmse = Metrics.rmse(Clustering.clusterAvgPredictions(train, train, clusters))
    assert(kmeansTestRmse > 0 && kmeansTestRmse < 3,
      s"implausible kmeans rmse $kmeansTestRmse")

    // ALS with cold-start drop (R-24/R-25)
    val als = Recommend.fitAls(train, rank = 8, maxIter = 8, numBlocks = 4)
    val (alsPreds, alsTestRmse) = Recommend.evaluate(als, test)
    assert(alsPreds.count() <= test.count()) // cold-start rows dropped
    assert(alsTestRmse > 0 && alsTestRmse < 3)
    val alsTrainRmse = Metrics.rmse(als.transform(train))

    // structured preference data → ALS must beat the cluster-average
    // baseline on the training split it memorized
    assert(alsTrainRmse < kmeansTrainRmse,
      s"ALS train $alsTrainRmse should beat cluster-avg train $kmeansTrainRmse")

    // final comparison report (R-29)
    val report = Report.comparison(spark, Seq(
      Report.ModelResult("kmeans_cluster_avg", kmeansTrainRmse, kmeansTestRmse),
      Report.ModelResult("als", alsTrainRmse, alsTestRmse)))
    assert(report.count() == 2)
    assert(report.columns.toSeq == Seq("model", "train_rmse", "test_rmse"))
  }
}
