package graft.etl

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MovieLens-format ETL — the reference's ingest path re-expressed as a
  * single Catalyst pipeline (reference: MovieLensRecommender.py:113-145).
  *
  * Differences from the reference, by design (SURVEY.md §3.1):
  *  - no `.rdd.toDF()` round-trip and no driver-side pandas: every step
  *    is a DataFrame transform, so column pruning/pushdown survive and
  *    the plan is one whole-stage-codegen pass;
  *  - the dynamic one-hot widening (MovieLensRecommender.py:13-24, done
  *    in pandas on collected data there) is `explode` + explicit-
  *    vocabulary `pivot` — distributed, and safe at 100 TB because the
  *    vocabulary (≤ `maxVocab`) is the only thing ever collected.
  */
object MovieLens {

  /** R-01/R-03: movies.dat (`movieId::title::g1|g2`) → typed columns. */
  def parseMovies(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "::").as("f"))
      .select(
        col("f").getItem(0).cast("int").as("movieId"),
        col("f").getItem(1).as("title"),
        col("f").getItem(2).as("genres"))

  /** R-02/R-09..R-11: ratings.dat (`userId::movieId::rating::ts`) →
    * (userId, movieId, rating); timestamp parsed then dropped, exactly
    * like MovieLensRecommender.py:134-140. */
  def parseRatings(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), "::").as("f"))
      .select(
        col("f").getItem(0).cast("int").as("userId"),
        col("f").getItem(1).cast("int").as("movieId"),
        col("f").getItem(2).cast("float").as("rating"))

  /** R-04/R-05: distributed distinct genre vocabulary. Collected to the
    * driver ONLY because pivot needs explicit values; capped so the op
    * stays 100 TB-safe by contract (SURVEY §7.4 #2). */
  def genreVocabulary(movies: DataFrame, maxVocab: Int = 1000): Seq[String] = {
    val vocab = movies
      .select(explode(split(col("genres"), "\\|")).as("genre"))
      .distinct()
      .orderBy("genre")
      .limit(maxVocab + 1)
      .collect().map(_.getString(0)).toSeq
    require(vocab.size <= maxVocab, s"genre vocabulary exceeds cap $maxVocab")
    vocab
  }

  /** R-07: one-hot widen via explode + explicit-vocabulary pivot. */
  def oneHotGenres(movies: DataFrame, vocab: Seq[String]): DataFrame =
    movies
      .select(col("movieId"), col("title"),
        explode(split(col("genres"), "\\|")).as("genre"))
      .groupBy("movieId", "title")
      .pivot("genre", vocab)
      .agg(first(lit(1)))
      .na.fill(0, vocab)

  /** R-08: pack the genre flag columns into an ml `Vector`. */
  def assembleFeatures(oneHot: DataFrame, vocab: Seq[String]): DataFrame =
    new VectorAssembler()
      .setInputCols(vocab.toArray)
      .setOutputCol("features")
      .transform(oneHot)

  /** Full movies featurization (R-01, R-03..R-08 pipeline). */
  def featurizeMovies(spark: SparkSession, path: String): (DataFrame, Seq[String]) = {
    val movies = parseMovies(spark, path)
    val vocab = genreVocabulary(movies)
    (assembleFeatures(oneHotGenres(movies, vocab), vocab), vocab)
  }

  /** R-12: seeded 70/30 Bernoulli split (reference seed 823,
    * MovieLensRecommender.py:145). Same-version Spark reproduces it. */
  def trainTestSplit(ratings: DataFrame, seed: Long = 823): (DataFrame, DataFrame) = {
    val Array(train, test) = ratings.randomSplit(Array(0.7, 0.3), seed)
    (train, test)
  }
}
