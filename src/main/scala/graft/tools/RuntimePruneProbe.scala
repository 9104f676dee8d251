package graft.tools
import org.apache.spark.sql.SparkSession
object RuntimePruneProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.probe_rt")
    spark.sql("""CREATE TABLE graft.probe_rt (k BIGINT, v BIGINT) USING graft_txn
       TBLPROPERTIES ('key'='k','shards'='8','layout_div'='10000')""")
    spark.sql("INSERT INTO graft.probe_rt SELECT id, id * 2 FROM range(10000)")
    // small dim with a selective filter on a non-invertible label
    spark.range(10000).selectExpr("id AS dk",
      "CASE WHEN id BETWEEN 5000 AND 5600 THEN 'hot' ELSE 'cold' END AS seg")
      .createOrReplaceTempView("dim_rt")
    val q = spark.sql("""
      SELECT count(1) AS n, sum(f.v) AS s
      FROM graft.probe_rt f JOIN dim_rt d ON f.k = d.dk
      WHERE d.seg = 'hot'""")
    q.collect().foreach(println)
    val plan = q.queryExecution.executedPlan
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[Any] =
      (p.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          (b.scan, b.runtimeFilters)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          null
      }).filter(_ != null)
    val all = plan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    } ++ plan.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }
    }.flatten
    all.foreach { b =>
      println(s"runtimeFilters: ${b.runtimeFilters}")
      println(s"scan: ${b.scan.description()}")
    }
    println(q.queryExecution.executedPlan.toString.take(3000))
  }
}
