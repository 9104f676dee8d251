package graft.sources
import org.apache.spark.sql.SparkSession

/** Probe: why doesn't [[MorDmlRule]] claim a narrow
  * UPDATE? Prints the analyzed plan and the rule's own view of it. */
object MorDmlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.probe_mor")
    spark.sql("""CREATE TABLE graft.probe_mor (k BIGINT, v BIGINT) USING graft_txn
       TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')""")
    spark.sql("INSERT INTO graft.probe_mor SELECT id, id FROM range(1000)")
    val plan = spark.sessionState.sqlParser.parsePlan(
      "UPDATE graft.probe_mor SET v = v + 1 WHERE k = 500")
    val analyzed = spark.sessionState.executePlan(plan).analyzed
    println("=== analyzed ===")
    println(analyzed.toString.take(4000))
    analyzed.foreach {
      case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable =>
        println(s"UpdateTable.resolved=${u.resolved}")
        println(s"assignments=${u.assignments.map(a =>
          s"${a.key.getClass.getSimpleName}:${a.key} <- ${a.value.getClass.getSimpleName}:${a.value.sql}")}")
        u.condition.foreach(c => println(s"cond=${c.getClass.getSimpleName}:${c.sql} resolved=${c.resolved}"))
        val rel = u.table.collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation => r.table.getClass.getName
        }
        println(s"relation table=$rel")
        u.table.foreach(n => println("  tableNode: " + n.getClass.getName))
      case _ =>
    }
    val root = graft.Fs.scratch("graft_txn_catalog_wh") + "/probe_mor"
    val m = TxnTable.readManifest(root, 1)
    val cond = spark.sessionState.sqlParser.parseExpression("k = 500")
    println(s"morBounds=${TxnTable.morBounds(m, cond)}")
    println(s"morSelectivity=${TxnTable.morSelectivity(m, cond)}")
    spark.sql("UPDATE graft.probe_mor SET v = v + 1 WHERE k = 500")
    println("post-update op=" + TxnTable.readManifest(root,
      TxnTable.latestVersion(root)).op)
  }
}
