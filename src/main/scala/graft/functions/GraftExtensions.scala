package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst extension point: registers the engine's native vector
  * expressions as SQL functions, so `spark.sql("SELECT cosine_sim(a, b)")`
  * plans the codegen'd expression directly — the sanctioned way to add
  * engine functions without forking Spark. Activate with
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions   // at build
  *   GraftExtensions.register(spark)                        // existing session
  */
object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name)

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (new FunctionIdentifier("squared_l2"),
      info("squared_l2", "squared_l2(a, b) - squared Euclidean distance of two numeric arrays"),
      (args: Seq[Expression]) => SquaredL2Distance(args(0), args(1))))

  /** Extension-equivalent registration for an already-built session
    * (`spark.sql.extensions` is only honored at session construction). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }

  /** Runtime twin of `injectPlannerStrategy` for the engine's custom
    * operators (as-of join): `ExperimentalMethods` is the public,
    * documented seam for post-construction strategy registration.
    * Idempotent — safe to call from every operator invocation. */
  def registerStrategies(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies = cur :+ graft.plans.AsofJoinStrategy
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.VectorSimplification)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
