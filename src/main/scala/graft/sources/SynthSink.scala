package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** qa7: the DataSource V2 WRITE path — the COMMIT PROTOCOL
  * (`WriteBuilder` → `BatchWrite` → per-task `DataWriter` →
  * `WriterCommitMessage` → driver-side `commit`) that makes a
  * 1000-executor write exactly-once: every task accumulates its own
  * partial statistics and ships them to the driver as its commit
  * message; only `BatchWrite.commit` — which runs once, on the
  * driver, after ALL tasks succeeded — publishes the result, so
  * speculative or retried task attempts can never double-count (their
  * messages are simply not the ones Spark hands to commit, and an
  * aborted job publishes nothing).
  *
  * The sink is a STATISTICS sink (count / Σid / Σvalue per write),
  * which is exactly the shape of a real manifest/metadata commit —
  * and it makes the protocol hash-checkable: the graded query writes
  * a deterministic Lehmer frame through the full protocol and emits
  * the DRIVER-COMMITTED statistics, which DuckDB replays from a
  * range. Task arity rides the row as evidence that the stats came
  * through per-task messages, not a driver-side aggregate. */
class SynthSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SynthSource.schema // not used for a pure sink; any schema accepted

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SynthSinkTable(Option(properties.get("runId")).getOrElse("default"))
}

object SynthSink {
  case class Committed(nTasks: Long, nRows: Long, sumId: Long, sumValue: Long)
  /** Driver-side registry of committed writes, keyed by runId. Written
    * ONLY from BatchWrite.commit — the cluster-correct place. */
  val committed = new scala.collection.concurrent.TrieMap[String, Committed]

  /** qa7 graded query: push a deterministic frame through the full V2
    * commit protocol, then grade the DRIVER-COMMITTED statistics. */
  def sinkCommitAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val runId = java.util.UUID.randomUUID().toString
    val m = SynthSource.LehmerM
    spark.range(0, 50000).toDF("id")
      .withColumn("value_e6",
        pmod(col("id"), lit(m)) * lit(48271L) % lit(m) * lit(48271L) % lit(m))
      .repartition(8)
      .write.format("graft.sources.SynthSink")
      .option("runId", runId).mode("append").save()
    val st = committed.remove(runId)
      .getOrElse(sys.error("commit protocol published nothing"))
    Seq((st.nRows, st.sumId, st.sumValue, st.nTasks))
      .toDF("n_rows", "sum_id", "sum_value_e6", "n_tasks")
      .withColumn("one_message_per_task", col("n_tasks") === 8L)
  }

  def sinkCommitAuditOracle: String = """
    WITH g AS (
      SELECT i AS id,
             ((i % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647
               AS value_e6
      FROM (SELECT unnest(range(50000)) AS i))
    SELECT CAST(count(1) AS BIGINT) AS n_rows,
           CAST(sum(id) AS BIGINT) AS sum_id,
           CAST(sum(value_e6) AS BIGINT) AS sum_value_e6,
           CAST(8 AS BIGINT) AS n_tasks,
           true AS one_message_per_task
    FROM g"""
}

private[sources] class SynthSinkTable(runId: String)
    extends Table with SupportsWrite {
  override def name(): String = s"synth-sink($runId)"
  override def schema(): StructType = new StructType()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val idIdx = info.schema().fieldIndex("id")
    val vIdx = info.schema().fieldIndex("value_e6")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new SynthBatchWrite(runId, idIdx, vIdx)
      }
    }
  }
}

private[sources] case class SynthCommit(n: Long, sumId: Long, sumValue: Long)
    extends WriterCommitMessage

private[sources] class SynthBatchWrite(runId: String, idIdx: Int, vIdx: Int)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new SynthWriterFactory(idIdx, vIdx)

  // runs ONCE, on the driver, only after every task committed — the
  // exactly-once point of the protocol
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.map(_.asInstanceOf[SynthCommit])
    SynthSink.committed.put(runId, SynthSink.Committed(
      ms.length.toLong, ms.map(_.n).sum, ms.map(_.sumId).sum,
      ms.map(_.sumValue).sum))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] class SynthWriterFactory(idIdx: Int, vIdx: Int)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L; private var sumId = 0L; private var sumValue = 0L
      override def write(row: InternalRow): Unit = {
        n += 1; sumId += row.getLong(idIdx); sumValue += row.getLong(vIdx)
      }
      override def commit(): WriterCommitMessage = SynthCommit(n, sumId, sumValue)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
