package graft

import graft.functions.GraftExtensions
import graft.report.Report

/** SQL-function registration (GraftExtensions) + the R-29 report sink.
  * Uses the shared session: `spark.sql.extensions` only applies at
  * session construction, so the runtime `register` path is what a test
  * JVM (and any long-lived session) exercises. */
class ExtensionsSpec extends SparkSpec {

  test("cosine_sim and squared_l2 resolve in SQL and compute correctly") {
    GraftExtensions.register(spark)
    val r = spark.sql("""
      SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth,
             cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS collinear,
             squared_l2(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d2
    """).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 25.0) < 1e-12)
  }

  test("report comparison orders models by test RMSE (R-29)") {
    val df = Report.comparison(spark, Seq(
      Report.ModelResult("kmeans_cluster_avg", 1.003455, 1.033066),
      Report.ModelResult("als", 0.892506, 0.864197)))
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("als", "kmeans_cluster_avg"))
    assert(rows.head.getDouble(2) == 0.864197)
  }
}
