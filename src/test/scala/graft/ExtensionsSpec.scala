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

  test("VectorSimplification folds squared_l2(x, x) to 0.0 but preserves null semantics") {
    import graft.functions.VectorFunctions
    import graft.plans.VectorSimplification
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.functions._
    val v = array(lit(1.0), lit(2.0), lit(3.0)) // non-nullable array
    val df = spark.range(1).select(VectorFunctions.squaredL2(v, v).as("d"))
    val folded = VectorSimplification(df.queryExecution.analyzed)
    assert(folded.expressions.exists(_.exists {
      case Literal(0.0, _) => true
      case _ => false
    }), s"rule did not fold:\n$folded")
    // nullable input must NOT fold (null in → null out)
    import spark.implicits._
    val nullable = Seq(Some(Seq(1.0)), None).toDF("v")
      .select(VectorFunctions.squaredL2(col("v"), col("v")).as("d"))
    val kept = VectorSimplification(nullable.queryExecution.analyzed)
    assert(!kept.expressions.exists(_.exists {
      case Literal(0.0, _) => true
      case _ => false
    }))
    assert(nullable.collect().map(r => r.isNullAt(0)).toSeq == Seq(false, true))
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
