package graft.sources

import graft.sources.TxnTable.{FileEntry, Manifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** qdm: STREAMING READ FROM the transactional table — the consumer
  * half qde prototyped with a hand-held cursor, now as the real
  * Structured Streaming API: `spark.readStream.table("graft.t")`
  * plans a [[TxnMicroBatchStream]] whose OFFSETS ARE THE LOG'S
  * VERSIONS. Each microbatch reads exactly the files ADDED in
  * (startVersion, endVersion] — resolved purely from the two
  * manifests, O(new data) per batch, never a table rescan — so the
  * table composes into `readStream → transform → writeStream`
  * pipelines like any native source (the Delta streaming-source
  * shape). Restart recovery is free: the engine checkpoints the
  * version offset, and the manifest diff for any committed range is
  * deterministic forever (immutable log).
  *
  * APPEND-ONLY CONTRACT, enforced not prosed: a file diff is a row
  * diff only while history is append-only, so [[planInputPartitions]]
  * walks the raw manifests in its range and THROWS on a version that
  * dropped files (optimize/delete/merge rewrites) — the honest
  * failure Delta spells `ignoreChanges`, instead of silently
  * re-delivering rewritten rows. Checkpoint manifests (append fulls)
  * are supersets and pass.
  *
  * Readers delegate to Spark's own vectorized parquet reader factory
  * (one template [[org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan]]
  * provides `createReaderFactory`; each batch's partitions come from a
  * per-batch ParquetScan over just the added files). At 100 TB the
  * per-batch file index serves straight from the manifest's paths +
  * `bytes` — metadata only. */
private[sources] class TxnMicroBatchStream(spark: SparkSession, root: String,
    schema: StructType) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private case class TxnOffset(version: Int) extends Offset {
    override def json(): String = version.toString
  }

  // Trigger.AvailableNow contract: pin the head ONCE at run start and
  // never report past it — versions committed mid-run are the NEXT
  // run's work, so the trigger's "process what was available, then
  // stop" promise is exact (no fallback-to-single-batch warning, no
  // racing tail-reads)
  private var availableNowCap: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(TxnTable.latestVersion(root))

  override def initialOffset(): Offset = TxnOffset(-1)
  override def deserializeOffset(json: String): Offset = TxnOffset(json.toInt)
  override def latestOffset(): Offset = TxnOffset(
    availableNowCap.getOrElse(TxnTable.latestVersion(root)))
  // admission control (inherited via SupportsTriggerAvailableNow): no
  // rate limit — a batch is whatever the log added up to the cap
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  private def parquetScanOver(files: Seq[FileEntry]) = {
    val paths = files.map(f => new org.apache.hadoop.fs.Path(s"$root/${f.path}"))
    val index = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
      spark, paths, Map.empty[String, String], Some(schema),
      org.apache.spark.sql.execution.datasources.NoopCache,
      Some(org.apache.spark.sql.execution.datasources.PartitionSpec.emptySpec),
      None)
    org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan(
      spark, spark.sessionState.newHadoopConf(), index, schema, schema,
      new StructType(), Array.empty, CaseInsensitiveStringMap.empty())
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val vFrom = start.asInstanceOf[TxnOffset].version
    val vTo = end.asInstanceOf[TxnOffset].version
    if (vTo <= vFrom) return Array.empty
    val before =
      if (vFrom < 0) Set.empty[String]
      else TxnTable.readManifest(root, vFrom).files.map(_.path).toSet
    // the append-only guard: any version in range whose FULL manifest
    // dropped a previously-live file is a rewrite — a file diff is not
    // a row diff there; fail loudly instead of re-delivering rows
    var live = before
    (math.max(vFrom + 1, 0) to vTo).foreach { v =>
      val raw = TxnTable.readManifestRaw(root, v)
      // a merge-on-read delete keeps every path (the append-only guard
      // below passes) yet CHANGES rows — an adds-only stream cannot
      // represent it; refuse loudly, the change feed is the tool
      require(raw.files.forall(_.dvRows == 0),
        s"streaming read of $root hit deletion vectors at version $v " +
          s"(op=${raw.op}): merge-on-read deletes are not streamable " +
          "as appends — consume the change feed, or purge first")
      if (raw.deltaOf < 0 && v > 0) {
        val full = raw.files.map(_.path).toSet
        require(live.subsetOf(full),
          s"streaming read of $root hit a REWRITE at version $v " +
            s"(op=${raw.op}): history must be append-only between " +
            "consumed offsets — reprocess from a fresh checkpoint")
        live = full
      } else live = live ++ raw.files.map(_.path)
    }
    val to = TxnTable.readManifest(root, vTo)
    val adds = to.files.filterNot(f => before.contains(f.path))
    if (adds.isEmpty) Array.empty
    else parquetScanOver(adds).toBatch.planInputPartitions()
  }

  // the factory only fixes schema/conf — partitions carry the files
  override def createReaderFactory(): PartitionReaderFactory =
    parquetScanOver(Nil).createReaderFactory()
}

object TxnStream {

  /** qdm: the stream-consumer lifecycle graded end-to-end — two
    * separate streaming RUNS over one growing table, one engine
    * checkpoint: run 1 (`Trigger.AvailableNow`) drains the 6 staged
    * key-sextile appends; three more land; run 2 resumes FROM THE
    * CHECKPOINTED VERSION OFFSET and delivers exactly the new three —
    * no re-delivery, no gap. Graded, all oracle-replayed from the
    * slice arithmetic: each run's rows/chars, the exactly-once total
    * (any re-delivered or skipped file shifts it), and the version
    * cursor both runs ended on. The rewrite guard is probed in the
    * same row: an OPTIMIZE after run 2 makes the next incremental read
    * fail loudly (`rewrite_refused`), the documented append-only
    * contract enforced in code. */
  def txnStreamRead(spark: SparkSession, dir: String): DataFrame = {
    val root = graft.Fs.scratch("graft_txn_streamread")
    val ckpt = graft.Fs.scratch("graft_txn_streamread_ckpt")
    graft.Fs.deleteRecursively(ckpt)
    GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.stream_docs")
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("k"), col("n_chars").cast("long").as("c"))
    val mx = docs.agg(max("k")).head().getLong(0) // 1-row probe (qaq)
    spark.sql(s"""
      CREATE TABLE graft.stream_docs (k BIGINT, c BIGINT) USING graft_txn
      TBLPROPERTIES ('key'='k', 'shards'='8', 'layout_div'='${mx + 1}')""")
    val whRoot = graft.Fs.scratch("graft_txn_catalog_wh") + "/stream_docs"
    val sliced = docs.withColumn("slice", expr(s"k * 9 div ${mx + 1}")).cache()
    sliced.count()
    try {
      def appendSlice(i: Int): Unit = TxnTable.append(spark, whRoot,
        sliced.where(col("slice") === i).drop("slice"), f"slice_$i")
      val seen = new java.util.concurrent.atomic.AtomicReference(
        Map.empty[Int, (Long, Long)]) // run -> (rows, chars)
      def run(idx: Int): Unit = {
        val consume: (DataFrame, Long) => Unit = (df, _) => {
          val r = df.agg(count(lit(1)), sum("c")).head()
          val add = (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
          seen.updateAndGet { m =>
            val (n0, c0) = m.getOrElse(idx, (0L, 0L))
            m.updated(idx, (n0 + add._1, c0 + add._2))
          }
          ()
        }
        val q = graft.SessionConf.withShufflePartitions(spark, 8) {
          spark.readStream.table("graft.stream_docs").writeStream
            .foreachBatch(consume)
            .option("checkpointLocation", ckpt)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
        }
        try q.awaitTermination() finally q.stop()
      }
      (0 until 6).foreach(appendSlice)
      run(0)
      (6 until 9).foreach(appendSlice)
      run(1)
      // the rewrite guard: a compaction between consumed offsets must
      // refuse the next incremental read, not re-deliver rewritten rows
      TxnTable.optimize(spark, whRoot, 4)
      val rewriteRefused =
        try { run(2); false }
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException =>
            Option(e.getCause).exists(_.getMessage.contains("REWRITE"))
        }
      val runs = seen.get()
      val (r0, c0) = runs.getOrElse(0, (0L, 0L))
      val (r1, c1) = runs.getOrElse(1, (0L, 0L))
      val total = spark.sql(
        "SELECT count(1), sum(c) FROM graft.stream_docs").head()
      spark.range(1).select(
        lit(r0).as("run0_rows"), lit(c0).as("run0_chars"),
        lit(r1).as("run1_rows"), lit(c1).as("run1_chars"),
        lit(r0 + r1 == total.getLong(0) && c0 + c1 == total.getLong(1))
          .as("exactly_once"),
        lit(rewriteRefused).as("rewrite_refused"))
    } finally sliced.unpersist()
  }

  /** Key-sextile replay: run 0 = slices 0-5, run 1 = slices 6-8; the
    * rewrite refusal is the enforced contract constant. */
  val txnStreamReadOracle: String = """
    WITH m AS (SELECT max(doc_id) AS mx FROM documents),
    d AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS c,
             doc_id * 9 // (m.mx + 1) AS slice
      FROM documents, m)
    SELECT CAST(sum(CASE WHEN slice < 6 THEN 1 ELSE 0 END) AS BIGINT)
             AS run0_rows,
           CAST(sum(CASE WHEN slice < 6 THEN c ELSE 0 END) AS BIGINT)
             AS run0_chars,
           CAST(sum(CASE WHEN slice >= 6 THEN 1 ELSE 0 END) AS BIGINT)
             AS run1_rows,
           CAST(sum(CASE WHEN slice >= 6 THEN c ELSE 0 END) AS BIGINT)
             AS run1_chars,
           true AS exactly_once,
           true AS rewrite_refused
    FROM d"""
}
