package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** One-off feature probe for candidate SQL surfaces on this Spark
  * build: correlated LATERAL subqueries (with and without LIMIT),
  * SQL pipe syntax (`|>`), and collated grouping — run each, print
  * the plan head + a few rows, so the operator design starts from
  * what the engine actually supports rather than release notes. */
object SqlSurfaceProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")

    def probe(name: String, sql: String): Unit = {
      println(s"=== $name ===")
      try {
        val df = spark.sql(sql)
        df.show(5, false)
        println(df.queryExecution.executedPlan.toString.linesIterator
          .take(12).mkString("\n"))
      } catch { case e: Throwable =>
        println(s"FAILED: ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.take(4).mkString(" | "))
      }
    }

    probe("lateral_limit",
      """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer c JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |WHERE c.c_custkey % 100 = 0
        |ORDER BY c.c_custkey, t.o_orderkey""".stripMargin)

    probe("lateral_agg",
      """SELECT c.c_custkey, t.n, t.m
        |FROM customer c JOIN LATERAL (
        |  SELECT count(1) AS n, max(o_totalprice) AS m FROM orders o
        |  WHERE o.o_custkey = c.c_custkey) t
        |WHERE c.c_custkey % 100 = 0
        |ORDER BY c.c_custkey""".stripMargin)

    probe("pipe_syntax",
      """FROM orders
        ||> WHERE o_totalprice > 100000
        ||> AGGREGATE count(1) AS n,
        |     sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |     GROUP BY o_orderpriority
        ||> ORDER BY o_orderpriority""".stripMargin)

    probe("collation_group",
      """SELECT collate(upper(substr(source, 1, 4)), 'UTF8_LCASE') AS k,
        |       count(1) AS n
        |FROM documents GROUP BY k ORDER BY n DESC, k""".stripMargin)

    probe("collation_compare",
      """SELECT count(1) AS n_eq FROM documents
        |WHERE collate(source, 'UTF8_LCASE') = upper(source)""".stripMargin)

    spark.stop()
  }
}
