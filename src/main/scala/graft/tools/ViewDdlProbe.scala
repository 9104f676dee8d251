package graft.tools
import org.apache.spark.sql.SparkSession

/** Probe: where does `CREATE VIEW graft.v AS ...` die before
  * [[graft.sources.ViewDdlRule]] can claim it? Prints the parsed
  * plan and the full failure stack. */
object ViewDdlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.probe_vd")
    spark.sql("""CREATE TABLE graft.probe_vd (k BIGINT, v BIGINT) USING graft_txn
       TBLPROPERTIES ('key'='k','shards'='2','layout_div'='100')""")
    spark.sql("INSERT INTO graft.probe_vd SELECT id, id FROM range(100)")
    val plan = spark.sessionState.sqlParser.parsePlan(
      "CREATE VIEW graft.probe_view AS SELECT k, v + 1 AS v2 FROM graft.probe_vd")
    println("=== parsed ===")
    println(plan.toString.take(3000))
    try {
      spark.sql("CREATE VIEW graft.probe_view AS SELECT k, v + 1 AS v2 FROM graft.probe_vd")
      println("CREATE VIEW ok")
      println(spark.sql("SELECT sum(v2) FROM graft.probe_view").head())
      spark.sql("DROP VIEW graft.probe_view")
      println("DROP VIEW ok")
    } catch {
      case e: Throwable =>
        println("FAILED: " + e)
        e.getStackTrace.take(25).foreach(f => println("  " + f))
    }
  }
}
