package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated fixture tables
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md §B).
  *
  * All loaders are plain `spark.read.parquet` so Catalyst's vectorized
  * Parquet scan, predicate pushdown and column pruning apply untouched —
  * at 100 TB these tables would be partitioned directories and the same
  * call sites work unchanged (Spark handles multi-file/partitioned
  * layouts transparently).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read it as a raw nanos long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and rebuild a proper
    * TimestampType column at microsecond precision — same truncation
    * DuckDB's `epoch_us` applies, so oracle comparisons line up. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Must stay set for the lifetime of the plan (checked again at scan
    // execution), so it is session-level, not save/restored — see the
    // helper's doc for why.
    SessionConf.ensureNanosAsLong(spark)
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
