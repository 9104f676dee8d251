package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object StreamSinkProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftTxnCatalog.register(spark)
    val ckpt = graft.Fs.scratch("probe_sink_ckpt")
    graft.Fs.deleteRecursively(ckpt)
    spark.sql("DROP TABLE IF EXISTS graft.probe_src")
    spark.sql("DROP TABLE IF EXISTS graft.probe_dst")
    spark.sql("""CREATE TABLE graft.probe_src (k BIGINT, c BIGINT) USING graft_txn
       TBLPROPERTIES ('key'='k','shards'='2','layout_div'='1000')""")
    spark.sql("""CREATE TABLE graft.probe_dst (k BIGINT, c BIGINT) USING graft_txn
       TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')""")
    spark.sql("INSERT INTO graft.probe_src SELECT id, id * 2 FROM range(500)")
    def run(): Unit = {
      val q = spark.readStream.table("graft.probe_src")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graft.probe_dst")
      try q.awaitTermination() finally q.stop()
    }
    run()
    println("dst after run1: " +
      spark.sql("SELECT count(1), sum(c) FROM graft.probe_dst").head())
    val root = graft.Fs.scratch("graft_txn_catalog_wh") + "/probe_dst"
    val v = graft.sources.TxnTable.latestVersion(root)
    println(s"dst latestVersion: $v")
    val m = graft.sources.TxnTable.readManifest(root, v)
    println(s"files: ${m.files.size}; ranges: " +
      m.files.map(f => (f.minK, f.maxK, f.nRows)).mkString(" "))
    println("ledger: " + graft.sources.TxnTable.readManifestRaw(root, v).txns)
    // more source data; resume
    spark.sql("INSERT INTO graft.probe_src SELECT id + 500, id FROM range(100)")
    run()
    println("dst after run2: " +
      spark.sql("SELECT count(1), sum(c) FROM graft.probe_dst").head())
    val v2 = graft.sources.TxnTable.latestVersion(root)
    println(s"dst latestVersion after run2: $v2; ledger: " +
      graft.sources.TxnTable.readManifestRaw(root, v2).txns)
    // lost-ack: drop the engine's last commit marker, rerun → replay
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    new java.io.File(s"$ckpt/commits/${commits.last.getName}").delete()
    new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc").delete()
    run()
    val v3 = graft.sources.TxnTable.latestVersion(root)
    println("dst after replay: " +
      spark.sql("SELECT count(1), sum(c) FROM graft.probe_dst").head() +
      s" latestVersion: $v3 (expect == $v2)")
    // any stray duplicate stream dirs left?
    val dataDirs = new java.io.File(s"$root/data").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    println("data dirs: " + dataDirs.mkString(" "))
    println("ledger final: " +
      graft.sources.TxnTable.readManifestRaw(root, v3).txns)
  }
}
