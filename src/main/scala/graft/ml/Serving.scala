package graft.ml

import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** qa9: ALS SERVING LAYER — the deployment step the reference's
  * pipeline (train → evaluate) stops short of: turning the fitted
  * factor model into a low-latency top-k recommender. Exact scoring is
  * a dot-product scan of ALL item factors per request; at catalog
  * scale production serves from an ANN index over the item factors
  * instead, trading recall for a bounded candidate set. This operator
  * builds BOTH paths from one seeded fit — brute-force exact top-k
  * (the q6c broadcast-anchor shape) and an IVF index (q63's
  * fixed-coarse-quantizer construction: first-nLists factors as
  * centroids, nearest-centroid assignment, nProbe lists probed per
  * user) — and grades the relationship between them.
  *
  * Factors are seeded-stochastic (they shift with partitioning, like
  * q70–q74), so the graded row follows the ML contract-row doctrine:
  * deterministic columns the oracle replays integer-exactly (the probe
  * users — 8 smallest train userIds via the Lehmer gate; the train
  * catalog size), one THEOREM column (probing ALL lists is exhaustive:
  * the IVF assignment partitions the catalog, so all-list probing IS
  * brute force and its recall@k is exactly k — any other value is an
  * index-construction bug), and the tuning observation (nProbe=2
  * recall) as a documented in-band boolean.
  *
  * Floor measurement (tools/ServingProbe, sf0.01, local[4]/[8]/[32]):
  * per-user nProbe=2 recall spans 0.4-1.0 with min hits 4/10 at every
  * core count. The graded floor is 2/10 — two hits of slack under the
  * observed minimum, because the driver REGENERATES fixtures between
  * rounds and the factor geometry (hence per-user recall) moves with
  * the data; same doctrine as the q70-q74 RMSE bands, sized for
  * fixture churn rather than just core-count variance. */
object Serving {

  def alsServing(spark: SparkSession, dir: String, k: Int = 10,
      nLists: Int = 4, nProbe: Int = 2,
      recallFloorX10: Int = 2): DataFrame = {
    val (train, _) = FixturePipelines.hashTrainTest(spark, dir)
    val cached = train.cache()
    val model = Recommend.fitAls(cached)
    val items = model.itemFactors
      .select(col("id").as("item"), col("features").as("ivec")).cache()
    val nItems = items.count()
    val probeIds = cached.select(col("userId")).distinct()
      .orderBy("userId").limit(8)
    val users = model.userFactors
      .join(probeIds, col("id") === col("userId"))
      .select(col("userId"), col("features").as("uvec"))
    val byUser = Window.partitionBy("userId")
      .orderBy(col("score").desc, col("item"))
    def topK(pool: DataFrame): DataFrame = pool
      .withColumn("score", VectorFunctions.dotHof(col("uvec"), col("ivec")))
      .withColumn("r", row_number().over(byUser))
      .where(col("r") <= k)
      .select(col("userId"), col("item"))
    val exact = topK(items.crossJoin(broadcast(users))).cache()
    // IVF: deterministic-given-factors coarse quantizer (q63 pattern)
    val cents = items.orderBy("item").limit(nLists)
      .select(col("item").as("cseed"), col("ivec").as("cvec"))
      .withColumn("cid", row_number().over(Window.orderBy("cseed")))
      .drop("cseed")
    val assigned = items.crossJoin(broadcast(cents))
      .withColumn("d2", VectorFunctions.squaredL2(col("ivec"), col("cvec")))
      .withColumn("rc", row_number().over(
        Window.partitionBy("item").orderBy(col("d2"), col("cid"))))
      .where(col("rc") === 1)
      .select(col("item"), col("ivec"), col("cid")).cache()
    val probes = users.crossJoin(broadcast(cents))
      .withColumn("d2", VectorFunctions.squaredL2(col("uvec"), col("cvec")))
      .withColumn("rp", row_number().over(
        Window.partitionBy("userId").orderBy(col("d2"), col("cid"))))
      .cache()
    def annTopK(np: Int): DataFrame = topK(
      probes.where(col("rp") <= np)
        .select(col("userId"), col("uvec"), col("cid"))
        .join(assigned, "cid"))
    def overlap(ann: DataFrame, out: String): DataFrame = exact
      .join(ann, Seq("userId", "item"))
      .groupBy("userId").agg(count(lit(1)).as(out))
    val candCount = probes.where(col("rp") <= nProbe)
      .select(col("userId"), col("cid"))
      .join(assigned.select(col("cid")), "cid")
      .groupBy("userId").agg(count(lit(1)).as("n_cand"))
    users.select(col("userId"))
      .join(overlap(annTopK(nLists), "recall_exhaustive"), "userId")
      .join(overlap(annTopK(nProbe), "hits_probe"), Seq("userId"), "left")
      .join(candCount, "userId")
      .na.fill(0L, Seq("hits_probe"))
      .select(col("userId"),
        lit(k.toLong).as("k"),
        lit(nItems).as("n_train_items"),
        col("recall_exhaustive"),
        (col("hits_probe") * 10 >= lit(recallFloorX10.toLong) * k)
          .as("probe_recall_ok"),
        (col("n_cand") < lit(nItems)).as("probed_set_pruned"))
      .orderBy("userId")
  }

  def alsServingOracle: String = s"""
    WITH train AS (
      SELECT l_suppkey AS userId, l_partkey AS movieId
      FROM lineitem
      WHERE ${FixturePipelines.trainGateSql}),
    pu AS (SELECT DISTINCT userId FROM train ORDER BY userId LIMIT 8),
    ti AS (SELECT CAST(count(DISTINCT movieId) AS BIGINT) AS n FROM train)
    SELECT CAST(pu.userId AS INTEGER) AS userId,
           CAST(10 AS BIGINT) AS k,
           ti.n AS n_train_items,
           CAST(10 AS BIGINT) AS recall_exhaustive,
           true AS probe_recall_ok,
           true AS probed_set_pruned
    FROM pu CROSS JOIN ti
    ORDER BY userId"""
}
