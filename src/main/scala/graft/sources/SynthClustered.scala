package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** qat: STORAGE-PARTITIONED JOIN — the connector capability that
  * decides whether a 100 TB fact-to-fact join shuffles at all: a scan
  * that REPORTS its clustering (`SupportsReportPartitioning` →
  * `KeyGroupedPartitioning` over an identity transform, each
  * `InputPartition` carrying its key via `HasPartitionKey`) lets
  * Catalyst satisfy `ClusteredDistribution` straight from storage —
  * the group-by runs map-side-only and the join of two co-clustered
  * sources plans with ZERO exchanges (the Iceberg SPJ mechanism,
  * enabled by `spark.sql.sources.v2.bucketing.enabled`).
  *
  * This source generates the qa6 Lehmer rows pre-clustered by
  * `grp = id % groups`: partition g holds exactly the ids ≡ g (mod
  * groups), so the reported KeyGroupedPartitioning is true by
  * construction — a source that LIES about clustering produces wrong
  * joins, which is why the graded query hash-checks the VALUES against
  * DuckDB regenerating the same rows, not just the plan shape. */
class SynthClustered extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthClustered.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L)
    val groups = Option(properties.get("groups")).map(_.toInt).getOrElse(8)
    new SynthClusteredTable(rows, groups)
  }
}

object SynthClustered {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value_e6", LongType, nullable = false),
    StructField("grp", LongType, nullable = false)))

  /** qat graded query: two co-clustered scans, per-group aggregates on
    * each, joined on the cluster key. With the reported partitioning
    * honored, the WHOLE plan carries zero exchanges — both group-bys
    * are satisfied by storage clustering and the join is
    * storage-partitioned. The no-shuffle fact rides as a contract
    * column; the aggregate/join VALUES replay in DuckDB from the same
    * Lehmer ranges (grp = i % 8), so a source misreporting its
    * clustering fails the hash, not just the plan check. */
  def spjAudit(spark: SparkSession, dir: String): DataFrame = {
    def src(rows: Long) = spark.read
      .format("graft.sources.SynthClustered")
      .option("rows", rows.toString).option("groups", "8").load()
    graft.SessionConf.withConfs(spark,
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val aggA = src(100000L).groupBy("grp")
        .agg(count(lit(1)).as("n_a"), sum("value_e6").as("sum_a"))
      val aggB = src(40000L).groupBy("grp")
        .agg(count(lit(1)).as("n_b"), sum("value_e6").as("sum_b"))
      val joined = aggA.join(aggB, "grp")
      val plan = joined.queryExecution.executedPlan.toString
      val noShuffle = !plan.contains("Exchange")
      joined
        .withColumn("storage_partitioned_no_shuffle", lit(noShuffle))
        .orderBy("grp")
    }
  }

  def spjAuditOracle: String = """
    WITH a AS (
      SELECT i % 8 AS grp, CAST(count(1) AS BIGINT) AS n_a,
             CAST(sum(((i % 2147483647) * 48271 % 2147483647) * 48271
               % 2147483647) AS BIGINT) AS sum_a
      FROM (SELECT unnest(range(100000)) AS i) GROUP BY 1),
    b AS (
      SELECT i % 8 AS grp, CAST(count(1) AS BIGINT) AS n_b,
             CAST(sum(((i % 2147483647) * 48271 % 2147483647) * 48271
               % 2147483647) AS BIGINT) AS sum_b
      FROM (SELECT unnest(range(40000)) AS i) GROUP BY 1)
    SELECT a.grp, a.n_a, a.sum_a, b.n_b, b.sum_b,
           true AS storage_partitioned_no_shuffle
    FROM a JOIN b ON a.grp = b.grp
    ORDER BY a.grp"""
}

private[sources] class SynthClusteredTable(rows: Long, groups: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synth-clustered($rows, $groups)"
  override def schema(): StructType = SynthClustered.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SynthClusteredScan(rows, groups)
    }
}

private[sources] class SynthClusteredScan(rows: Long, groups: Int)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = SynthClustered.schema
  override def toBatch: Batch = this
  override def description(): String =
    s"SynthClusteredScan(rows=$rows, groups=$groups, clustered=grp)"

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.identity("grp")), groups)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until groups).map(g =>
      SynthClusteredPartition(g.toLong, rows, groups)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new SynthClusteredReaderFactory
}

/** Partition g holds exactly the ids ≡ g (mod groups) — the clustering
  * the scan reports, true by construction. */
private[sources] case class SynthClusteredPartition(g: Long, rows: Long,
    groups: Int) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](g))
}

private[sources] class SynthClusteredReaderFactory
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SynthClusteredPartition]
    new PartitionReader[InternalRow] {
      private var i = sp.g - sp.groups
      override def next(): Boolean = { i += sp.groups; i < sp.rows }
      override def get(): InternalRow =
        new GenericInternalRow(Array[Any](i, SynthSource.lehmer(i), sp.g))
      override def close(): Unit = ()
    }
  }
}
