package graft.report

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** R-29 report sink (reference: MovieLensRecommender.py:243-259) — the
  * final side-by-side model comparison, as a DataFrame (so it can be
  * shown, written to parquet, or registered as a query) instead of
  * bare stdout prints. */
object Report {

  case class ModelResult(model: String, trainRmse: Double, testRmse: Double)

  /** The reference's closing comparison table: one row per model,
    * train/test RMSE side by side, ordered by test RMSE. */
  def comparison(spark: SparkSession, results: Seq[ModelResult]): DataFrame = {
    import spark.implicits._
    results.toDF()
      .select(col("model"),
        round(col("trainRmse"), 6).as("train_rmse"),
        round(col("testRmse"), 6).as("test_rmse"))
      .orderBy("test_rmse")
  }

  /** Stdout + parquet sink, mirroring the reference's report format while
    * keeping a machine-readable artifact. */
  def emit(spark: SparkSession, results: Seq[ModelResult], outPath: Option[String] = None): Unit = {
    val df = comparison(spark, results)
    df.show(truncate = false)
    outPath.foreach(p => df.coalesce(1).write.mode("overwrite").parquet(p))
  }
}
