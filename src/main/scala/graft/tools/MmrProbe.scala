package graft.tools

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession

/** Dev probe: phase-level timing of the q8k MMR pipeline, so the slow
  * stage (shortlist scan, pairwise sims, greedy steps, final fold) is
  * measured instead of guessed.
  * Usage: tools/run_main.sh graft.tools.MmrProbe <sfDir> */
object MmrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[mmr] $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the JVM/parquet path on an unrelated trivial action first
    timed("warmup")(graft.Tables.embeddings(spark, dir).count())
    // phase replica of mmrRerank
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions._
    val emb = graft.Tables.embeddings(spark, dir)
    val qv = emb.filter(col("vec_id") === 0L).select(col("embedding").as("qe"))
    val cand = emb.filter(col("vec_id") =!= 0L)
      .join(broadcast(qv))
      .select(col("vec_id"), round(cosineHof(col("embedding"), col("qe")), 6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id")).limit(16).cache()
    timed("cand")(cand.count())
    val ce = cand.join(emb.select(col("vec_id"), col("embedding")), "vec_id")
    val ca = ce.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val cb = ce.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val sims = ca.join(broadcast(cb), col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"), round(cosineHof(col("ea"), col("eb")), 6).as("sim"))
      .cache()
    timed("sims")(sims.count())
    var sel = cand.orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(lit(1).as("step"), col("vec_id"), col("rel"),
        lit(null).cast("double").as("maxsim"), col("rel").as("score")).cache()
    timed("s1")(sel.count())
    for (t <- 2 to 6) {
      val picked = sel.select(col("vec_id"))
      val ms = sims.join(picked.withColumnRenamed("vec_id", "ib"), Seq("ib"), "left_semi")
        .groupBy(col("ia")).agg(max(col("sim")).as("ms"))
      val next = cand.join(picked, Seq("vec_id"), "left_anti")
        .join(ms, col("vec_id") === col("ia"))
        .select(lit(t).as("step"), col("vec_id"), col("rel"),
          col("ms").as("maxsim"),
          (lit(0.7) * col("rel") - lit(0.3) * col("ms")).as("score"))
        .orderBy(col("score").desc, col("vec_id")).limit(1)
      sel = timed(s"s$t")(sel.unionByName(next).localCheckpoint())
    }
    spark.stop()
  }
}
