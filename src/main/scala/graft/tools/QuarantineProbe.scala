package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level timing for qa0_robust_quarantine.
  * Usage: tools/run_main.sh graft.tools.QuarantineProbe [sfDir] */
object QuarantineProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    spark.range(1000000).selectExpr("sum(id) s").write.format("noop")
      .mode("overwrite").save()
    val dims = Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"),
        floor(col("x").cast("double") * 1e6 + 0.5).cast("long").as("xi"))
      .cache()
    t("dims cache")(dims.count())
    val h = t("hv agg")(dims.groupBy(col("dim"), col("xi").as("v"))
      .agg(count(lit(1)).as("c")).cache())
    t("hv count")(h.count())
    val byDim = Window.partitionBy("dim")
    val cumW = byDim.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val h2 = h.withColumn("cum", sum("c").over(cumW))
      .withColumn("n", sum("c").over(byDim))
      .withColumn("lo_pos", expr("(n + 1) div 2"))
      .withColumn("hi_pos", expr("(n + 2) div 2"))
    val med = h2.groupBy("dim").agg(
      (min(when(col("cum") - col("c") < col("lo_pos")
        && col("cum") >= col("lo_pos"), col("v")))
        + min(when(col("cum") - col("c") < col("hi_pos")
          && col("cum") >= col("hi_pos"), col("v")))).as("med2_e6"))
    t("med window+agg")(med.count())
    val med2 = t("med checkpoint")(med.localCheckpoint(true))
    val dev = dims.join(broadcast(med2), "dim")
      .withColumn("dev2", abs(col("xi") * 2 - col("med2_e6")))
    t("dev count")(dev.count())
    t("full query")(graft.operators.Similarity.robustQuarantine(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
