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
  /** `events.ts` has shipped in two physical encodings across fixture
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects outright — read as a raw nanos long via
    * `spark.sql.legacy.parquet.nanosAsLong` and truncate to micros,
    * the same truncation DuckDB's `epoch_us` applies) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (which Spark reads
    * as TIMESTAMP_NTZ). Dispatch on the SCHEMA actually read, not on
    * an assumption about the file — the sessions run with UTC session
    * timezone, so the NTZ→TimestampType cast is value-identical and
    * every downstream operator keeps seeing one canonical
    * TimestampType column either way. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Must stay set BEFORE the read for the nanos generation (checked
    // again at scan execution, so session-level, not save/restored);
    // harmless for the micros generation.
    SessionConf.ensureNanosAsLong(spark)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw // already TimestampType
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
