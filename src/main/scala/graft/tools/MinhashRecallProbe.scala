package graft.tools

import graft.Tables
import graft.operators.{Dedup, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: how do the q52 (hand-rolled banded MinHash) and q53 (spark.ml
  * MinHashLSH) candidate sets relate to the EXACT trigram-Jaccard truth
  * on the fixture? Feeds the recall/precision floors folded into the
  * graded contracts. */
object MinhashRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // exact truth: THE contract truth definition, not a re-derivation —
    // the probe must measure exactly what q52/q53 certify against
    val truth = Dedup.gramJaccardAllPairs(Tables.documents(spark, dir)).cache()
    for (t <- Seq(0.5, 0.7, 0.9)) {
      println(s"truth J>=$t: ${truth.where(col("jac") >= t).count()}")
    }

    val q52 = Dedup.minhashNearDupPairs(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b")).cache()
    println(s"q52 candidates: ${q52.count()}")
    for (t <- Seq(0.5, 0.7)) {
      val tr = truth.where(col("jac") >= t).select("a", "b")
      println(s"q52 hit J>=$t: ${q52.join(tr, Seq("a", "b")).count()}")
    }
    val q52j = q52.join(truth, Seq("a", "b"), "left")
    println(s"q52 candidates with J>=0.2: ${q52j.where(col("jac") >= 0.2).count()}")
    println(s"q52 candidates with J<0.2 or no overlap: ${q52j.where(col("jac").isNull || col("jac") < 0.2).count()}")

    val q53 = Dedup.minhashLshJoin(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b")).cache()
    println(s"q53 pairs: ${q53.count()}")
    for (t <- Seq(0.5, 0.7)) {
      val tr = truth.where(col("jac") >= t).select("a", "b")
      println(s"q53 hit J>=$t: ${q53.join(tr, Seq("a", "b")).count()}")
    }
    spark.stop()
  }
}
