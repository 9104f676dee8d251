package graft.ml

import graft.Tables
import graft.operators.Text
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q4w: MODEL-BASED quality filtering — the classifier tier of a crawl
  * curation pipeline. Heuristic filters (q41/q48) catch mechanical junk;
  * the next tier trains a cheap linear model on weak "reference-like"
  * labels and scores every document, keeping the high-scoring tail
  * (the GPT-3 / CCNet construction: LR over text features against a
  * quality proxy). At 100 TB the economics are the point: training sees
  * a bounded sample, scoring is one broadcast of O(n_features) weights
  * and a narrow codegen'd projection per row — no shuffle anywhere.
  *
  * Determinism contract (the q6j pattern): model weights are
  * seeded-stochastic state an external engine cannot replay, so the
  * graded row carries (a) EXACT integer corpus facts the DuckDB oracle
  * recomputes independently — doc counts and the weak-label split,
  * defined by pure INTEGER comparisons (`distinct_tokens * 2 >= n_tokens`)
  * so no rounding boundary can flip a label between engines — and
  * (b) the training claim folded to a boolean: in-sample AUC ≥ 0.9.
  * The label is a threshold on a quantity the feature vector contains,
  * so a correctly-wired fit separates it almost perfectly; AUC falling
  * under the floor means the pipeline (assembly, standardization, fit,
  * scoring join) broke, not that the corpus drifted.
  */
object QualityFilter {

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    val feats = Tables.documents(spark, dir).select(
      col("doc_id"),
      size(toks).as("n_tok"),
      size(array_distinct(toks)).as("n_distinct"),
      size(filter(toks, t => t.isin(Text.StopWords.map(lit(_)): _*)))
        .as("n_stop"),
      col("n_chars"))
    // weak label from integer arithmetic only — replayable exactly
    val labeled = feats
      .withColumn("label",
        (col("n_distinct") * 2 >= col("n_tok")).cast("double"))
      .withColumn("f_len", col("n_tok").cast("double"))
      .withColumn("f_div", col("n_distinct").cast("double") / col("n_tok"))
      .withColumn("f_stop", col("n_stop").cast("double") / col("n_tok"))
      .withColumn("f_chars", col("n_chars").cast("double"))
      .cache()
    val assembled = new VectorAssembler()
      .setInputCols(Array("f_len", "f_div", "f_stop", "f_chars"))
      .setOutputCol("features")
      .transform(labeled)
    val model = new LogisticRegression()
      .setMaxIter(15).setRegParam(0.01).setStandardization(true)
      .fit(assembled)
    val auc = new BinaryClassificationEvaluator()
      .setRawPredictionCol("rawPrediction")
      .evaluate(model.transform(assembled))
    val weightsFinite = model.coefficients.toArray.forall(w =>
      !w.isNaN && !w.isInfinite) && !model.intercept.isNaN
    labeled.agg(
        count(lit(1)).as("n_docs"),
        sum(col("label").cast("long")).as("n_pos"))
      .withColumn("auc_ge_090", lit(auc >= 0.9))
      .withColumn("weights_finite", lit(weightsFinite))
  }

  val qualityClassifierOracle: String = """
    WITH s AS (
      SELECT len(list_distinct(string_split(text, ' '))) * 2
               >= len(string_split(text, ' ')) AS pos
      FROM documents)
    SELECT CAST(count(1) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           true AS auc_ge_090,
           true AS weights_finite
    FROM s"""
}
