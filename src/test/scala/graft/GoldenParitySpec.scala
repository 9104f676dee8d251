package graft

import graft.etl.MovieLens
import graft.eval.Metrics
import graft.ml.{Clustering, Recommend}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Golden-parity run against the reference's PUBLISHED result structure
  * (/root/reference/README.md:109-137): best k = 3, KMeans test RMSE
  * 1.0331, ALS (rank 10, regParam 0.05) test RMSE 0.8642, ALS strictly
  * better than the cluster-average predictor on the held-out split.
  *
  * MovieLens 1M itself doesn't ship in this sandbox, so the corpus is a
  * seeded synthetic with the SAME SHAPE (6,000 users × 3,700 movies ×
  * 18 genres, ~1M `::`-delimited ratings) and RECOVERABLE structure
  * chosen to reproduce the reference's qualitative golden facts, not
  * just "it runs":
  *  - movies belong to 3 latent genre groups → the SSE-elbow selection
  *    must recover best k = 3 exactly (reference README.md:109);
  *  - ratings = group-affinity + a PER-MOVIE quality offset + noise.
  *    The cluster-average predictor pools away the per-movie offset
  *    (its error floor = offset variance + noise variance ≈ 1.08) while
  *    ALS's item factors capture it (floor ≈ noise ≈ 0.82) — the same
  *    reason ALS beats KMeans on the real corpus, with the same ~0.17
  *    RMSE gap (reference: 1.0331 vs 0.8642).
  *
  * Gated behind GRAFT_GOLDEN=1 (a ~1M-rating ALS fit; minutes):
  *   GRAFT_GOLDEN=1 sbt "testOnly graft.GoldenParitySpec"
  */
class GoldenParitySpec extends SparkSpec {

  private val nUsers = 6000
  private val nMovies = 3700
  private val genrePool: Seq[String] = Seq(
    "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
    "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western")

  // per-movie quality offset in {-1,-0.5,0,0.5,1} — the item-level
  // signal the cluster-average predictor cannot represent
  private def offset(m: Int): Double = ((m * 2654435761L >>> 16) % 5 - 2) / 2.0

  private def writeCorpus(): (String, String) = {
    val rng = new scala.util.Random(823)
    val movies = Files.createTempFile("graft_golden_movies", ".dat")
    val mw = Files.newBufferedWriter(movies)
    (1 to nMovies).foreach { m =>
      val g = m % 3 // 3 latent groups over disjoint 6-genre slices
      val slice = genrePool.slice(g * 6, g * 6 + 6)
      val gs = rng.shuffle(slice).take(1 + rng.nextInt(3)).sorted
      mw.write(s"$m::Movie $m (199${m % 10})::${gs.mkString("|")}\n")
    }
    mw.close()
    val ratings = Files.createTempFile("graft_golden_ratings", ".dat")
    val rw = Files.newBufferedWriter(ratings)
    var n = 0
    (1 to nUsers).foreach { u =>
      (1 to nMovies).foreach { m =>
        if (rng.nextDouble() < 0.045) { // ~1M ratings total
          val affinity = if (m % 3 == u % 3) 4.0 else 2.0
          val noise = rng.nextInt(3) - 1 // uniform {-1,0,1}, var 2/3
          val r = math.max(1L, math.min(5L, math.round(affinity + offset(m) + noise)))
          rw.write(s"$u::$m::$r::97830$u$m\n")
          n += 1
        }
      }
    }
    rw.close()
    info(s"synthetic corpus: $nMovies movies, $nUsers users, $n ratings")
    (movies.toString, ratings.toString)
  }

  test("reference golden facts: best k=3, ALS beats cluster-avg, RMSE bands hold") {
    assume(sys.env.get("GRAFT_GOLDEN").contains("1"),
      "set GRAFT_GOLDEN=1 to run the MovieLens-1M-shaped golden-parity pipeline")
    val (moviesPath, ratingsPath) = writeCorpus()
    val (movies, vocab) = MovieLens.featurizeMovies(spark, moviesPath)
    assert(vocab.size == 18, s"expected 18 genres, got ${vocab.size}")

    val ratings = MovieLens.parseRatings(spark, ratingsPath)
    val (train, test) = MovieLens.trainTestSplit(ratings)
    train.cache().count(); test.cache().count(); movies.cache().count()

    // golden fact 1: the SSE elbow recovers the planted k (reference: 3)
    val selection = Clustering.selectK(spark, movies, train, ks = 2 to 6)
    val k = Clustering.bestK(selection)
    assert(k == 3, s"best-k selection found $k, reference golden value is 3")

    val model = Clustering.fit(movies, k)
    val clusters = model.transform(movies)
      .select(col("movieId"), col("prediction").as("cluster"))
    val kmeansTestRmse = Metrics.rmse(
      Clustering.clusterAvgPredictions(train, test, clusters))

    val als = Recommend.fitAls(train, rank = 10, maxIter = 10, regParam = 0.05)
    val (_, alsTestRmse) = Recommend.evaluate(als, test)
    info(f"kmeans test RMSE $kmeansTestRmse%.4f (reference 1.0331), " +
      f"ALS test RMSE $alsTestRmse%.4f (reference 0.8642)")

    // golden fact 2: RMSE tolerance bands around the structural floors
    // (cluster-avg ≈ sqrt(var(offset)+var(noise)) ≈ 1.08 less clipping;
    // ALS ≈ sqrt(var(noise)) ≈ 0.82) — generous ±, but tight enough
    // that a broken featurizer/split/predictor lands outside
    assert(kmeansTestRmse > 0.85 && kmeansTestRmse < 1.30,
      s"kmeans test RMSE $kmeansTestRmse outside golden band [0.85, 1.30]")
    assert(alsTestRmse > 0.60 && alsTestRmse < 1.05,
      s"ALS test RMSE $alsTestRmse outside golden band [0.60, 1.05]")

    // golden fact 3: ALS strictly beats the cluster-average predictor
    // on the held-out split, with a real margin (reference gap: 0.17)
    assert(alsTestRmse < kmeansTestRmse - 0.03,
      s"ALS ($alsTestRmse) did not beat cluster-avg ($kmeansTestRmse) on test")

    train.unpersist(); test.unpersist(); movies.unpersist()
  }
}
