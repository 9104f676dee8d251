package graft.tools
import org.apache.spark.sql.SparkSession
object VersionOptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.probe_vopt")
    spark.sql("""CREATE TABLE graft.probe_vopt (k BIGINT, v BIGINT) USING graft_txn
       TBLPROPERTIES ('key'='k','shards'='2','layout_div'='100')""")
    spark.sql("INSERT INTO graft.probe_vopt SELECT id, id FROM range(50)")
    spark.sql("INSERT INTO graft.probe_vopt SELECT id + 50, id FROM range(50)")
    println("head: " + spark.read.table("graft.probe_vopt").count())
    try println("v1 via option: " +
      spark.read.option("versionAsOf", 1).table("graft.probe_vopt").count())
    catch { case e: Throwable => println(s"versionAsOf option failed: $e") }
    try println("ts via option: " +
      spark.read.option("timestampAsOf", "2030-01-01 00:00:00")
        .table("graft.probe_vopt").count())
    catch { case e: Throwable => println(s"timestampAsOf option failed: ${e.toString.take(200)}") }
  }
}
