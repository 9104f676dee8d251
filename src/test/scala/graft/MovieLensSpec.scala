package graft

import graft.etl.MovieLens
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The reference's ETL semantics on a tiny synthetic movies/ratings.dat
  * (format from MovieLensRecommender.py:113-145): parse, one-hot pivot,
  * vector assembly, seeded split stability. */
class MovieLensSpec extends SparkSpec {

  private def writeTmp(name: String, lines: Seq[String]): String = {
    val f = Files.createTempFile(s"graft_$name", ".dat")
    Files.write(f, String.join("\n", lines: _*).getBytes)
    f.toString
  }

  private val moviesPath = writeTmp("movies", Seq(
    "1::Toy Story (1995)::Animation|Children's|Comedy",
    "2::Jumanji (1995)::Adventure|Children's|Fantasy",
    "3::Heat (1995)::Action|Crime|Thriller",
    "4::Sudden Death (1995)::Action"))

  private val ratingsPath = writeTmp("ratings", Seq(
    "1::1::5::978300760", "1::2::3::978302109", "2::1::4::978301968",
    "2::3::4::978300275", "3::4::2::978824291", "3::1::5::978302268"))

  test("parseMovies splits :: into typed columns") {
    val m = MovieLens.parseMovies(spark, moviesPath).orderBy("movieId").collect()
    assert(m.length == 4)
    assert(m.head.getAs[Int]("movieId") == 1)
    assert(m.head.getAs[String]("title") == "Toy Story (1995)")
    assert(m.head.getAs[String]("genres") == "Animation|Children's|Comedy")
  }

  test("parseRatings yields (int,int,float) and drops the timestamp") {
    val r = MovieLens.parseRatings(spark, ratingsPath)
    assert(r.columns.toSeq == Seq("userId", "movieId", "rating"))
    assert(r.count() == 6)
    assert(r.filter(col("userId") === 1 && col("movieId") === 1)
      .head().getAs[Float]("rating") == 5.0f)
  }

  test("genre vocabulary is the distinct exploded genre set") {
    val vocab = MovieLens.genreVocabulary(MovieLens.parseMovies(spark, moviesPath))
    assert(vocab == Seq("Action", "Adventure", "Animation", "Children's",
      "Comedy", "Crime", "Fantasy", "Thriller"))
  }

  test("one-hot pivot = explode identity on the genre multiset (SURVEY §5.2)") {
    val m = MovieLens.parseMovies(spark, moviesPath)
    val vocab = MovieLens.genreVocabulary(m)
    val oh = MovieLens.oneHotGenres(m, vocab)
    // row-wise: flags exactly reconstruct the genre list
    val back = oh.collect().map { r =>
      r.getAs[Int]("movieId") ->
        vocab.filter(g => r.getAs[Int](g) == 1).toSet
    }.toMap
    val expected = m.collect().map { r =>
      r.getAs[Int]("movieId") ->
        r.getAs[String]("genres").split("\\|").toSet
    }.toMap
    assert(back == expected)
  }

  test("assembleFeatures packs |vocab| flags into a Vector") {
    val m = MovieLens.parseMovies(spark, moviesPath)
    val vocab = MovieLens.genreVocabulary(m)
    val feats = MovieLens.assembleFeatures(MovieLens.oneHotGenres(m, vocab), vocab)
    val v = feats.filter(col("movieId") === 1).head()
      .getAs[org.apache.spark.ml.linalg.Vector]("features")
    assert(v.size == vocab.size)
    assert(v.toArray.sum == 3.0) // Toy Story has 3 genres
  }

  test("randomSplit(0.7/0.3, seed=823) is stable across invocations (R-12)") {
    val r = MovieLens.parseRatings(spark, ratingsPath)
    val (a1, b1) = MovieLens.trainTestSplit(r)
    val (a2, b2) = MovieLens.trainTestSplit(r)
    assert(a1.collect().toSet == a2.collect().toSet)
    assert(b1.collect().toSet == b2.collect().toSet)
    assert(a1.count() + b1.count() == 6)
  }
}
