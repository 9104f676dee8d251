package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-level timing breakdown of q9z's composed pipeline — which of
  * exact-dedup / pair-gen / connected-components / gating dominates.
  * Usage: tools/run_main.sh graft.tools.PipelineProbe <sfDir> */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val docs = graft.Tables.documents(spark, dir)
      .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
    val exact = docs
      .withColumn("norm", graft.operators.Dedup.normalizeText(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("norm").orderBy("doc_id")))
      .where(col("rn") === 1).drop("rn", "norm").cache()
    time("exact")(exact.count())
    val pairs = graft.operators.Dedup.jaccardPairs(exact, 3, 64L)
      .where(col("jacc_ppm") >= 970000L)
    val pc = time("pairs")(pairs.count())
    println(s"[probe] n_pairs=$pc")
    val comp = time("cc-build")(graft.operators.Dedup.connectedComponents(
      exact.select(col("doc_id").as("id")),
      pairs.select(col("a").as("src"), col("b").as("dst"))))
    time("cc-materialize")(comp.count())
    val nd = exact.join(
      comp.where(col("id") === col("rep")).select(col("id").as("doc_id")),
      "doc_id")
    time("neardup")(nd.count())
    val gated = nd
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tok_d", size(col("toks")).cast("double"))
      .withColumn("diversity",
        round(size(array_distinct(col("toks"))) / col("n_tok_d"), 4))
      .withColumn("stop_ratio",
        round(size(filter(col("toks"),
          t => t.isin("the", "a", "of", "and", "to", "in"))) / col("n_tok_d"), 4))
      .where(col("diversity") >= 0.35 && col("stop_ratio") <= 0.15
        && col("n_chars") >= 100)
    time("gated")(gated.count())
    val raw = docs.groupBy("source")
      .agg(count(lit(1)).as("n_raw"), sum("n_tok").as("tok_raw"))
    val ex2 = exact.groupBy("source").agg(count(lit(1)).as("n_exact"))
    val ndr = nd.groupBy("source").agg(count(lit(1)).as("n_neardup"))
    val qr = gated.groupBy("source")
      .agg(count(lit(1)).as("n_quality"), sum("n_tok").as("tok_quality"))
    val fin = raw.join(ex2, Seq("source"), "left")
      .join(ndr, Seq("source"), "left").join(qr, Seq("source"), "left")
    time("final-join")(fin.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
