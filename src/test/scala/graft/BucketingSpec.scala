package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join (the 100 TB join strategy the prompt and
  * SURVEY §4.1 name): both sides written bucketed on the join key →
  * the join plans with NO shuffle exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("join over tables bucketed on the key plans without a shuffle") {
    // default (in-repo) warehouse: spark.sql.warehouse.dir is a static
    // conf, unsettable on the shared session; tables are dropped below
    // and spark-warehouse/ is gitignored
    val n = 8

    Tables.orders(spark, sfDir)
      .write.bucketBy(n, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sfDir)
      .write.bucketBy(n, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    try {
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(round(sum("l_quantity"), 2).as("qty"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must consume bucketed scans directly — the only
    // allowed exchange is the one for the final tiny aggregation
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles:\n$plan")

    // and it must be CORRECT: same result as the plain-parquet join
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(round(sum("l_quantity"), 2).as("qty"))
    assert(joined.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("salted skew join equals the unsalted join result") {
    import graft.operators.Relational
    val salted = Relational.joinSkewSalted(spark, sfDir).collect().map(_.toSeq).toSet
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}
