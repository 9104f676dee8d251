package graft.eval

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Evaluation metrics (reference: RegressionEvaluator at
  * MovieLensRecommender.py:148-151, used on three tables).
  *
  * `rmse` is the SQL-native form — a single HashAggregateExec, no ML
  * dependency — and `rmseEvaluator` is the spark.ml form; MetricsSpec
  * asserts their parity. */
object Metrics {

  /** RMSE as one aggregate: sqrt(avg((label − prediction)²)). */
  def rmse(df: DataFrame, label: String = "rating",
      prediction: String = "prediction"): Double =
    df.agg(sqrt(avg(pow(col(label) - col(prediction), 2))))
      .head().getDouble(0)

  /** spark.ml RegressionEvaluator parity path. */
  def rmseEvaluator(df: DataFrame, label: String = "rating",
      prediction: String = "prediction"): Double =
    new RegressionEvaluator()
      .setMetricName("rmse")
      .setLabelCol(label)
      .setPredictionCol(prediction)
      .evaluate(df)
}
