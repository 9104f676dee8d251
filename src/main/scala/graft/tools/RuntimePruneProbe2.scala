package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RuntimePruneProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.GraftTxnCatalog.register(spark)
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("k"), col("n_chars").cast("long").as("c"))
    docs.createOrReplaceTempView("docs_sqlrt")
    val mx = docs.agg(max("k")).head().getLong(0)
    println(s"mx=$mx nDocs=${docs.count()}")
    spark.sql("DROP TABLE IF EXISTS graft.rt_fact")
    spark.sql(s"""
      CREATE TABLE graft.rt_fact (k BIGINT, c BIGINT) USING graft_txn
      TBLPROPERTIES ('key'='k', 'shards'='16', 'layout_div'='${mx + 1}')""")
    spark.sql("INSERT INTO graft.rt_fact SELECT k, c FROM docs_sqlrt")
    val (lo, hi) = (mx / 2, mx / 2 + mx / 16)
    spark.sql(s"""
      CREATE OR REPLACE TEMP VIEW dim_sqlrt AS
      SELECT k AS dk,
             CASE WHEN k BETWEEN $lo AND $hi THEN 'hot' ELSE 'cold' END AS seg
      FROM docs_sqlrt""")
    val q = spark.sql("""
      SELECT count(1) AS n_rows, sum(f.c) AS chars_sum, sum(f.k) AS id_checksum
      FROM graft.rt_fact f JOIN dim_sqlrt d ON f.k = d.dk
      WHERE d.seg = 'hot'""")
    println(q.head())
    println(q.queryExecution.executedPlan.toString.take(5000))
  }
}
