package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: does Spark 4 support SQL-defined functions (CREATE FUNCTION
  * ... RETURNS ... RETURN <expr>), scalar and table-valued? Feeds qbt. */
object SqlUdfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION density(nc BIGINT, nt BIGINT)
        |RETURNS BIGINT RETURN nc * 1000000 div greatest(nt, 1)""".stripMargin)
    spark.sql("SELECT density(350, 70) AS d").show()
    try {
      spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION topn(k INT)
          |RETURNS TABLE(v INT) RETURN SELECT id FROM range(k)""".stripMargin)
      spark.sql("SELECT * FROM topn(3)").show()
    } catch { case e: Exception => println("TVF-udf: " + e.getMessage.take(200)) }
    spark.stop()
  }
}
