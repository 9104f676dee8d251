package graft.tools

import graft.Tables
import graft.operators.{Curation, Dedup, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level timing for q9s_split_leakage: which subtree dominates —
  * the posting explode, the df join + per-doc rank window, the
  * signature self-join, or the candidate verify?
  * Usage: tools/run_main.sh graft.tools.LeakageProbe [sfDir] */
object LeakageProbe {
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
    val docs = Tables.documents(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
    val grams = docs.select(col("doc_id"),
        array_distinct(Text.trigrams(col("text"))).as("grams"))
      .withColumn("n_grams", size(col("grams")).cast("long")).cache()
    t("grams build+cache")(grams.count())
    val posting = grams.select(col("doc_id"), explode(col("grams")).as("gram"))
    t("posting count")(posting.count())
    val gramDf = posting.groupBy("gram").agg(count(lit(1)).as("gram_df"))
    t("df agg")(gramDf.count())
    val sig = posting.join(gramDf, "gram")
      .withColumn("r", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("gram_df"), col("gram"))))
      .where(col("r") <= 8)
      .select(col("doc_id"), col("gram")).cache()
    t("sig build+cache")(sig.count())
    val cand = sig.as("sa").join(sig.as("sb"),
        col("sa.gram") === col("sb.gram")
          && col("sa.doc_id") < col("sb.doc_id"))
      .groupBy(col("sa.doc_id").as("a"), col("sb.doc_id").as("b"))
      .agg(count(lit(1)).as("n_sig_shared"))
      .where(col("n_sig_shared") >= 3)
    t("cand")(cand.count())
    val verified = cand
      .join(grams.select(col("doc_id").as("a"), col("grams").as("grams_a"),
        col("n_grams").as("na")), "a")
      .join(grams.select(col("doc_id").as("b"), col("grams").as("grams_b"),
        col("n_grams").as("nb")), "b")
      .withColumn("inter",
        size(array_intersect(col("grams_a"), col("grams_b"))).cast("long"))
      .where(col("inter") * 3 >= col("na") + col("nb"))
    t("verified")(verified.count())
    val full = t("full query")(Dedup.splitLeakage(spark, dir).collect())
    println(full.mkString("\n"))
    spark.stop()
  }
}
