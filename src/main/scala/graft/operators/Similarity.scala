package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.3):
  * brute-force cosine top-k as the exact baseline, plus two
  * candidate-pruned variants for scale — spark.ml
  * BucketedRandomProjectionLSH and a deterministic IVF-style
  * coarse-quantizer partition.
  *
  * Scale notes: brute force against ONE query vector is a single narrow
  * scan (broadcast the query, codegen'd CosineSimilarity, TakeOrdered) —
  * that already scales linearly and is the right plan even at 100 TB
  * when queries are few. The LSH/IVF paths exist for the many-queries /
  * all-pairs regime where candidate pruning beats the linear scan.
  */
object Similarity {

  /** Exact top-k by cosine against the vector with id `queryId`. The
    * query row is a 1-row dimension — broadcast, never a shuffle.
    * Uses the higher-order-function cosine so the arithmetic is
    * reproducible in the DuckDB oracle; the codegen'd
    * `VectorFunctions.cosineSim` is the faster equivalent (used in the
    * LSH/IVF paths below and benchmarked in BenchSpec). */
  def bruteForceTopK(spark: SparkSession, dir: String,
      queryId: Long = 0L, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val query = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q"))
    emb.filter(col("vec_id") =!= queryId)
      .join(broadcast(query))
      .select(
        col("vec_id"),
        col("label"),
        round(cosineHof(col("embedding"), col("q")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** ANN via random-hyperplane LSH (spark.ml BucketedRandomProjectionLSH
    * on Euclidean distance — equivalent ordering to cosine for
    * normalized vectors). Returns approximate top-k for `queryId`. */
  def annLshTopK(spark: SparkSession, dir: String,
      queryId: Long = 0L, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
      .cache()
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setBucketLength(2.0).setNumHashTables(4).setSeed(823)
    val model = lsh.fit(emb)
    val queryVec = emb.filter(col("vec_id") === queryId)
      .select("features").head().getAs[org.apache.spark.ml.linalg.Vector](0)
    val res = model.approxNearestNeighbors(
        emb.filter(col("vec_id") =!= queryId), queryVec, k)
      .select(col("vec_id"), col("label"), round(col("distCol"), 4).as("l2_dist"))
      .orderBy(col("l2_dist"), col("vec_id"))
    res
  }

  /** IVF-style ANN with a REAL coarse quantizer: seeded spark.ml KMeans
    * learns the `nLists` centroids (the earlier placeholder used the
    * first `nLists` vectors, which is not a quantizer), every vector is
    * assigned to its nearest centroid by the fitted model (a broadcast
    * of the centers + one narrow pass — no shuffle), and a query probes
    * only its own list, touching ~1/nLists of the data. `assigned` is
    * cached because both the query-lookup side and the probe side
    * consume it — uncached, the full assignment pass would run twice. */
  def ivfTopK(spark: SparkSession, dir: String,
      queryId: Long = 0L, k: Int = 10, nLists: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(nLists).setSeed(823).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cent_id")
    val model = km.fit(emb)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("label"), col("embedding"), col("cent_id"))
      .cache()
    val queryList = assigned.filter(col("vec_id") === queryId)
      .select(col("cent_id").as("q_cent"), col("embedding").as("q"))
    assigned.filter(col("vec_id") =!= queryId)
      .join(broadcast(queryList), col("cent_id") === col("q_cent"))
      .select(col("vec_id"), col("label"),
        round(cosineSim(col("embedding"), col("q")), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** Per-vector L2 norms + dimensionality — the sanity/oracle query for
    * the embedding column plumbing. */
  def norms(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(
        col("vec_id"),
        col("label"),
        size(col("embedding")).cast("long").as("dim"),
        round(normHof(col("embedding")), 4).as("l2_norm"))
      .orderBy("vec_id")

  /** IVF bucket histogram (deterministic; oracle-checkable): nearest of
    * the first 4 vectors by cosine, counted per bucket. Unlike
    * `ivfTopK` (which fits a real KMeans quantizer), this keeps the
    * fixed first-N quantizer ON PURPOSE: the assignment is then pure
    * arithmetic DuckDB can replay, making the bucket histogram
    * hash-checkable by the oracle. */
  def ivfBucketCounts(spark: SparkSession, dir: String, nLists: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val cents = emb.filter(col("vec_id") < nLists)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    emb.join(broadcast(cents))
      .withColumn("cos_c", round(cosineHof(col("embedding"), col("cent")), 8))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("cos_c").desc, col("cent_id"))))
      .filter(col("rk") === 1)
      .groupBy("cent_id")
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy("cent_id")
  }
}
