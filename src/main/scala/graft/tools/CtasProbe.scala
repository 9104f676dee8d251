package graft.tools
import org.apache.spark.sql.SparkSession
object CtasProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.probe_ctas")
    // CTAS: schema from the query, layout from TBLPROPERTIES
    spark.sql("""CREATE TABLE graft.probe_ctas USING graft_txn
       TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')
       AS SELECT id AS k, id * 2 AS v FROM range(1000)""")
    println("CTAS rows: " + spark.sql("SELECT count(1) FROM graft.probe_ctas").head())
    val root = graft.Fs.scratch("graft_txn_catalog_wh") + "/probe_ctas"
    println("versions: " + graft.sources.TxnTable.latestVersion(root))
    // RTAS
    try {
      spark.sql("""REPLACE TABLE graft.probe_ctas USING graft_txn
         TBLPROPERTIES ('key'='k','shards'='4','layout_div'='500')
         AS SELECT id AS k, id * 3 AS v FROM range(500)""")
      println("RTAS rows: " + spark.sql("SELECT sum(v) FROM graft.probe_ctas").head())
      println("versions after RTAS: " + graft.sources.TxnTable.latestVersion(root))
    } catch { case e: Throwable => println(s"RTAS failed: $e") }
    // CTAS failure path: does a failed write leave the table behind?
    try {
      spark.sql("DROP TABLE IF EXISTS graft.probe_ctas_fail")
      spark.sql("""CREATE TABLE graft.probe_ctas_fail USING graft_txn
         TBLPROPERTIES ('key'='k','shards'='4','layout_div'='10')
         AS SELECT CAST(id AS BIGINT) AS k,
                   CAST(assert_true(id < 5, 'boom') AS BIGINT) AS v
           FROM range(1000)""")
      println("fail-CTAS unexpectedly passed")
    } catch { case e: Throwable =>
      println(s"fail-CTAS threw (${e.getClass.getSimpleName}); " +
        "table left behind: " + spark.catalog.tableExists("graft.probe_ctas_fail"))
    }
  }
}
