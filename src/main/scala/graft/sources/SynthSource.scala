package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** qa6: a complete DataSource V2 CONNECTOR (`TableProvider` →
  * `SupportsRead` table → `ScanBuilder` → `Batch` → `PartitionReader`)
  * — the API a Spark-native engine uses to bring its OWN storage into
  * Catalyst as a first-class scan, with the two pushdowns that decide
  * 100 TB viability implemented at the connector boundary rather than
  * hoped for from the optimizer:
  *
  *  - FILTER PUSHDOWN (`SupportsPushDownFilters`): range predicates on
  *    `id` narrow the generated span INSIDE the source — accepted
  *    filters are consumed (removed from the post-scan Filter), all
  *    others are declined and stay residual, so correctness never
  *    depends on what the source claims to handle.
  *  - COLUMN PRUNING (`SupportsPushDownRequiredColumns`): readers
  *    materialize only the projected fields — the `bucket` string is
  *    never built when the query doesn't touch it.
  *
  * Rows are DETERMINISTIC (the q46 Lehmer arithmetic on `id`), so an
  * external SQL engine regenerates the identical relation from a range
  * — which is what makes a custom connector hash-checkable at all. The
  * span splits into `parts` equal input partitions; pushdown evidence
  * is carried in the scan's `description()` (lo/hi/cols), asserted by
  * the graded query the q0f way. */
class SynthSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val parts = Option(properties.get("parts")).map(_.toInt).getOrElse(4)
    new SynthTable(rows, parts)
  }
}

object SynthSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value_e6", LongType, nullable = false),
    StructField("bucket", StringType, nullable = false)))

  val LehmerM = 2147483647L
  def lehmer(id: Long): Long =
    ((id % LehmerM) * 48271L % LehmerM) * 48271L % LehmerM

  /** qa6 graded query: scan the connector under a range filter and a
    * two-column aggregate, then fold the PLAN EVIDENCE — the filter
    * reached the source (narrowed lo/hi in the scan description) and
    * the unused string column was pruned — as literal contract columns
    * the oracle replays (the q0f pattern). The aggregate itself is
    * hash-checked against DuckDB regenerating the same Lehmer rows
    * from a range. */
  def pushdownScan(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.format("graft.sources.SynthSource")
      .option("rows", "100000").option("parts", "8").load()
      .where(col("id") >= 25000L && col("id") < 75000L)
      .select(col("id"), col("value_e6"))
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.contains("lo=25000, hi=75000")
    val pruned = plan.contains("cols=id,value_e6")
    df.groupBy((col("id") % 10).as("bucket_mod"))
      .agg(count(lit(1)).as("n"), sum("value_e6").as("sum_lehmer"),
        min("id").as("min_id"), max("id").as("max_id"))
      .withColumn("filter_pushed", lit(pushed))
      .withColumn("columns_pruned", lit(pruned))
      .orderBy("bucket_mod")
  }

  def pushdownScanOracle: String = """
    WITH g AS (
      SELECT i AS id,
             ((i % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647
               AS value_e6
      FROM (SELECT unnest(range(25000, 75000)) AS i))
    SELECT id % 10 AS bucket_mod,
           CAST(count(1) AS BIGINT) AS n,
           CAST(sum(value_e6) AS BIGINT) AS sum_lehmer,
           CAST(min(id) AS BIGINT) AS min_id,
           CAST(max(id) AS BIGINT) AS max_id,
           true AS filter_pushed,
           true AS columns_pruned
    FROM g GROUP BY 1 ORDER BY 1"""

  /** qak: the qa6 connector under AGGREGATE and LIMIT pushdown (round-7
    * verdict item 5). The global count/min/max over a range-filtered
    * span is answered by the source in CLOSED FORM (SynthAggScan — the
    * plan contains no Spark aggregate and the scan materializes zero
    * data rows), and `.limit(7)` caps the generated span at the source
    * (fully pushed — Spark may drop its own Limit). Both plan facts
    * ride as contract columns the oracle states as literals (q0f
    * pattern); the aggregate VALUES are the arithmetic DuckDB replays
    * from the same range. A third probe proves the decline path: a
    * sum over the Lehmer column is NOT pushable, and its value must
    * still be correct — computed by Spark from scanned rows. */
  def aggPushdownScan(spark: SparkSession, dir: String): DataFrame = {
    def src = spark.read.format("graft.sources.SynthSource")
      .option("rows", "1000000").option("parts", "8").load()
    val agg = src
      .where(col("id") >= 100000L && col("id") < 900000L)
      .agg(count(lit(1)).as("n_rows"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    val aggPushed = aggPlan.contains("agg=count,min,max") &&
      !aggPlan.contains("HashAggregate")
    val lim = src.select(col("id")).limit(7)
    val limPushed =
      lim.queryExecution.executedPlan.toString.contains("limit=7")
    val limRows = lim.count()
    // the decline path: sum(value_e6) is not a closed-form aggregate —
    // the source must refuse it and Spark must compute it from rows
    val declined = src.where(col("id") >= 100000L && col("id") < 100010L)
      .agg(sum(col("value_e6")).as("s"))
    val declinedKeptBySpark = declined.queryExecution.executedPlan
      .toString.contains("HashAggregate")
    val declinedSum = declined.head().getLong(0)
    agg
      .withColumn("agg_pushed", lit(aggPushed))
      .withColumn("limit_pushed", lit(limPushed))
      .withColumn("limit_rows_seen", lit(limRows))
      .withColumn("declined_sum", lit(declinedSum))
      .withColumn("declined_agg_stays_in_spark", lit(declinedKeptBySpark))
  }

  def aggPushdownScanOracle: String = """
    WITH d AS (
      SELECT CAST(sum(((i % 2147483647) * 48271 % 2147483647) * 48271
                  % 2147483647) AS BIGINT) AS declined_sum
      FROM (SELECT unnest(range(100000, 100010)) AS i))
    SELECT CAST(800000 AS BIGINT) AS n_rows,
           CAST(100000 AS BIGINT) AS min_id,
           CAST(899999 AS BIGINT) AS max_id,
           true AS agg_pushed,
           true AS limit_pushed,
           CAST(7 AS BIGINT) AS limit_rows_seen,
           d.declined_sum,
           true AS declined_agg_stays_in_spark
    FROM d"""
}

private[sources] class SynthTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synth($rows)"
  override def schema(): StructType = SynthSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SynthScanBuilder(rows, parts)
}

private[sources] class SynthScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  private var lo = 0L
  private var hi = rows
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SynthSource.schema
  private var aggFuncs: Seq[String] = Nil
  private var limit: Option[Int] = None

  // accept only range predicates on id — those narrow [lo, hi) exactly,
  // so claiming them is SAFE; everything else stays a residual Filter
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition {
      case GreaterThanOrEqual("id", _: java.lang.Long) => true
      case GreaterThan("id", _: java.lang.Long)        => true
      case LessThan("id", _: java.lang.Long)           => true
      case LessThanOrEqual("id", _: java.lang.Long)    => true
      case _                                           => false
    }
    ours.foreach {
      case GreaterThanOrEqual("id", v: java.lang.Long) =>
        lo = math.max(lo, v.longValue)
      case GreaterThan("id", v: java.lang.Long) =>
        lo = math.max(lo, v.longValue + 1)
      case LessThan("id", v: java.lang.Long) =>
        hi = math.min(hi, v.longValue)
      case LessThanOrEqual("id", v: java.lang.Long) =>
        hi = math.min(hi, v.longValue + 1)
      case _ =>
    }
    accepted = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // AGGREGATE PUSHDOWN (round-7 verdict item 5): a global (no group-by)
  // count(*)/min(id)/max(id) over the generated span has a CLOSED FORM
  // — count = hi-lo, min = lo, max = hi-1 — so the source answers it
  // from the pushed-filter bounds without materializing a single row.
  // That is the 100 TB shape: metadata-only aggregation, the same trick
  // parquet footers give count/min/max. Complete pushdown is claimed
  // (Spark plans no aggregate at all); anything else — group-bys, sums
  // over the Lehmer column, distinct — is declined and computed by
  // Spark from the scanned rows, so correctness never depends on what
  // the source claims.
  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
  private def idRef(e: org.apache.spark.sql.connector.expressions.Expression)
      : Boolean = e match {
    case r: NamedReference => r.fieldNames.toSeq == Seq("id")
    case _                 => false
  }
  private def pushableAgg(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min       => idRef(m.column)
        case m: Max       => idRef(m.column)
        case _            => false
      }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    pushableAgg(agg)
  override def pushAggregation(agg: Aggregation): Boolean =
    pushableAgg(agg) && {
      aggFuncs = agg.aggregateExpressions.toSeq.map {
        case _: CountStar => "count"
        case _: Min       => "min"
        case _: Max       => "max"
      }
      true
    }

  // LIMIT PUSHDOWN: rows are generated in id order, so capping the span
  // at lo+limit yields exactly the first `limit` rows — fully pushed
  // (isPartiallyPushed=false: Spark may drop its own Limit operator).
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed: Boolean = false

  override def build(): Scan = {
    val hiEff = math.max(lo, limit.map(l => math.min(hi, lo + l)).getOrElse(hi))
    if (aggFuncs.nonEmpty) new SynthAggScan(lo, hiEff, aggFuncs)
    else new SynthScan(lo, hiEff, parts, required, limit)
  }
}

/** Complete-pushdown aggregate scan: ONE row computed in closed form
  * from the span bounds — no generated rows at all. Output columns
  * follow the pushed aggregate order; min/max are null on an empty
  * span (SQL aggregate semantics). */
private[sources] class SynthAggScan(lo: Long, hi: Long, funcs: Seq[String])
    extends Scan with Batch {
  override def readSchema(): StructType = StructType(funcs.zipWithIndex.map {
    case ("count", i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i)       => StructField(s"agg_$i", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthAggScan(lo=$lo, hi=$hi, agg=${funcs.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SynthPartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthAggReaderFactory(funcs)
}

private[sources] class SynthAggReaderFactory(funcs: Seq[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = {
        val empty = sp.end <= sp.start
        val values: Array[Any] = funcs.toArray.map {
          case "count" => sp.end - sp.start
          case "min"   => if (empty) null else sp.start
          case "max"   => if (empty) null else sp.end - 1
        }
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}

private[sources] class SynthScan(lo: Long, hi: Long, parts: Int,
    required: StructType, limit: Option[Int] = None) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthScan(lo=$lo, hi=$hi, cols=${required.fieldNames.mkString(",")}" +
      limit.map(l => s", limit=$l").getOrElse("") + ")"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, parts)
    val span = hi - lo
    (0 until n).map { k =>
      SynthPartition(lo + span * k / n, lo + span * (k + 1) / n)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SynthReaderFactory(required.fieldNames)
}

private[sources] case class SynthPartition(start: Long, end: Long)
    extends InputPartition

private[sources] class SynthReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthPartition]
    new PartitionReader[InternalRow] {
      private var i = sp.start - 1
      override def next(): Boolean = { i += 1; i < sp.end }
      override def get(): InternalRow = {
        val values: Array[Any] = cols.map {
          case "id"       => i
          case "value_e6" => SynthSource.lehmer(i)
          case "bucket"   => UTF8String.fromString("b" + (i % 10))
        }
        new GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
