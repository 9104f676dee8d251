package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: the exactness evidence behind Relational.withGlobalIndex's
  * scaladoc. The rank must be a contiguous 0-based total-order index,
  * bit-equal to the single-partition window twin, INCLUDING under the
  * q2i shape (three chained layers over a cached base, consumed in one
  * action) — the composition that broke the attempted pure-SQL
  * variant (range-boundary resampling across duplicated exchanges:
  * 96,160 distinct ranks over 100,000 rows). Run after any change to
  * the primitive. */
object GlobalIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100000).select(
      (col("id") * 2654435761L % 1000003).as("v"), col("id").as("k"))
    val r = graft.operators.Relational.withGlobalIndex(
      df, Seq(col("v"), col("k")), "rank")
    val a = r.agg(count(lit(1)), countDistinct("rank"),
      min("rank"), max("rank")).head()
    println(s"n=${a.getLong(0)} distinct=${a.getLong(1)} " +
      s"min=${a.getLong(2)} max=${a.getLong(3)}")
    val bad = r.select(col("v"), col("k"), col("rank"))
      .withColumn("rk2", expr("row_number() over (order by v, k)") - 1)
      .where(col("rank") =!= col("rk2")).count()
    println(s"mismatched vs window twin: $bad")
    // the q2i shape: THREE chained layers over a cached base, ntile
    // parity against the single-partition window twins in ONE action
    val cust = df.groupBy("k").agg(max("v").as("a"), count(lit(1)).as("c"),
      sum("v").as("m")).cache()
    val n = cust.count()
    val ranked = Seq(
      ("__r", Seq(col("a").desc, col("k"))),
      ("__f", Seq(col("c").desc, col("k"))),
      ("__m", Seq(col("m").desc, col("k"))))
      .foldLeft(cust: org.apache.spark.sql.DataFrame) { case (d, (c2, o)) =>
        graft.operators.Relational.withGlobalIndex(d, o, c2) }
    val t = ranked.select(col("k"),
      graft.operators.Relational.ntileOfIndex(col("__r"), n, 5).as("rt"),
      graft.operators.Relational.ntileOfIndex(col("__f"), n, 5).as("ft"),
      graft.operators.Relational.ntileOfIndex(col("__m"), n, 5).as("mt"))
    val twin = cust.select(col("k"),
      expr("ntile(5) over (order by a desc, k)").as("rt2"),
      expr("ntile(5) over (order by c desc, k)").as("ft2"),
      expr("ntile(5) over (order by m desc, k)").as("mt2"))
    val j = t.join(twin, "k")
    val badN = j.where(col("rt") =!= col("rt2") or
      (col("ft") =!= col("ft2")) or (col("mt") =!= col("mt2"))).count()
    println(s"triple-nest ntile mismatches vs window twins: $badN (n=$n)")
    require(bad == 0 && badN == 0 && a.getLong(1) == a.getLong(0),
      "withGlobalIndex exactness violated")
    println("exact")
  }
}
