package graft.tools

import graft.ml.FixturePipelines
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.SparkSession

/** One-off ALS timing probe: same fit under different block/partition
  * settings, to pick the local[32] sweet spot for the CV bench. */
object AlsTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ratings = FixturePipelines.ratings(spark, dir).cache()
    println(s"n=${ratings.count()}")
    for ((label, blocks, parts) <- Seq(
        ("default(10 blocks)", -1, -1),
        ("blocks=8", 8, -1),
        ("blocks=32", 32, -1),
        ("blocks=4", 4, -1))) {
      val in = if (parts > 0) ratings.repartition(parts) else ratings
      val als = new ALS().setUserCol("userId").setItemCol("movieId")
        .setRatingCol("rating").setRank(10).setMaxIter(10).setRegParam(0.05)
        .setSeed(823).setColdStartStrategy("drop")
      if (blocks > 0) { als.setNumUserBlocks(blocks); als.setNumItemBlocks(blocks) }
      val t0 = System.nanoTime()
      als.fit(in)
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
