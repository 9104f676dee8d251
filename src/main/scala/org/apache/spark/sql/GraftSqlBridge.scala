package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The engine's single private-API touchpoint: turning a custom
  * [[LogicalPlan]] node into a `DataFrame` requires
  * `Dataset.ofRows`, which Spark scopes `private[sql]` — so this
  * one-method bridge lives in `org.apache.spark.sql` to re-export it.
  * Everything else (strategy injection, function registration,
  * optimizer rules) goes through the public `SparkSessionExtensions` /
  * `ExperimentalMethods` seams. The standard ecosystem pattern for
  * libraries that contribute whole operators (custom logical nodes
  * cannot be constructed any other way without a SQL parser
  * extension).
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
