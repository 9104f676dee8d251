package graft.tools
import org.apache.spark.sql.SparkSession
object RowLevelProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.probe_rl")
    spark.sql("""CREATE TABLE graft.probe_rl (k BIGINT, v BIGINT) USING graft_txn
       TBLPROPERTIES ('key'='k','shards'='2','layout_div'='100')""")
    spark.sql("INSERT INTO graft.probe_rl SELECT id, id FROM range(100)")
    val plan = spark.sessionState.sqlParser.parsePlan(
      "UPDATE graft.probe_rl SET v = v + 1 WHERE k % 7 = 0")
    val qe = spark.sessionState.executePlan(plan)
    println("=== optimized ===")
    println(qe.optimizedPlan.toString.take(4000))
    println("=== spark plan ===")
    try println(qe.sparkPlan.toString.take(3000))
    catch { case e: Throwable => println(s"sparkPlan failed: $e") }
  }
}
