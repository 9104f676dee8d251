package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: does Spark 4.1's SQL scripting (BEGIN…END, DECLARE, WHILE)
  * execute through spark.sql, and what does it return? Feeds qbi. */
object SqlScriptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.scripting.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = spark.sql(
      """BEGIN
        |  DECLARE total INT = 0;
        |  DECLARE i INT = 1;
        |  WHILE i <= 5 DO
        |    SET total = total + i * i;
        |    SET i = i + 1;
        |  END WHILE;
        |  SELECT total AS sum_sq;
        |END""".stripMargin)
    out.show()
    spark.stop()
  }
}
