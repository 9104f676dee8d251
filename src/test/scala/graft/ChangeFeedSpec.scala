package graft

import graft.sources.TxnTable
import org.apache.spark.sql.functions._

/** Change data feed (qe5): write-time change recording, O(changes)
  * reads, reconciliation with snapshots, and the honest refusals. */
class ChangeFeedSpec extends SparkSpec {

  private def root(name: String) = graft.Fs.scratch(s"graft_cdfspec_$name")

  private def mkTable(name: String, n: Int = 1000, shards: Int = 8) = {
    val r = root(name)
    val df = spark.range(n).select(
      col("id").as("k"), (col("id") * 3 % 101).as("v"))
    TxnTable.create(spark, r, df, "k", shards)
    (r, df)
  }

  test("feed deltas reconcile the initial snapshot to the head") {
    val (r, df) = mkTable("reconcile")
    TxnTable.append(spark, r,
      df.where(col("k") < 50).select((col("k") + 5000L).as("k"), col("v")),
      "adds")
    TxnTable.deleteRange(spark, r, 100L, 299L)
    import spark.implicits._
    TxnTable.mergeRange(spark, r,
      Seq((10L, 999L), (6000L, 1L)).toDF("k", "v")) // 1 update, 1 insert
    TxnTable.deleteMor(spark, r, "v = 999")
    val feed = TxnTable.changeFeed(spark, r, -1, TxnTable.latestVersion(r))
    val byType = feed.groupBy("_change_type").count().collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(byType("insert") == 1000L + 50L + 1L)
    assert(byType("delete") == 200L + 1L)
    assert(byType("update_preimage") == 1L &&
      byType("update_postimage") == 1L)
    val head = TxnTable.readVersion(spark, r, TxnTable.latestVersion(r)).count()
    assert(head == byType("insert") - byType("delete"),
      "inserts minus deletes must reconcile to the head row count")
    // the mor delete recorded the UPDATED value, not the original
    assert(feed.where(col("_change_type") === "delete" && col("k") === 10L)
      .head().getAs[Long]("v") == 999L)
  }

  test("optimize, purge and metadata DDL contribute zero feed rows") {
    val (r, _) = mkTable("quiet")
    TxnTable.deleteMor(spark, r, "k < 10")
    val before = TxnTable.latestVersion(r)
    TxnTable.purgeDeletes(spark, r)
    TxnTable.optimize(spark, r, 4)
    TxnTable.addColumn(spark, r, "w", "BIGINT")
    TxnTable.setCheck(spark, r, "k >= 0")
    assert(TxnTable.changeFeed(spark, r, before,
      TxnTable.latestVersion(r)).count() == 0)
  }

  test("an unrecorded rewrite refuses the feed loudly") {
    val (r, _) = mkTable("refuse")
    TxnTable.transact(spark, r, "arbitrary",
      snap => snap.withColumn("v", col("v") + 1L))
    val err = intercept[Exception](
      TxnTable.changeFeed(spark, r, -1, TxnTable.latestVersion(r)).count())
    assert(err.getMessage.contains("change feed not recorded"))
    // a sub-range before the rewrite still serves
    assert(TxnTable.changeFeed(spark, r, -1, 0).count() == 1000)
  }

  test("the feed reads change files and add files, never unchanged data") {
    val (r, _) = mkTable("sources")
    TxnTable.deleteRange(spark, r, 0L, 99L)
    // the v2 feed slice must open ONLY the _cdf dir, not table files
    val slice = TxnTable.changeFeed(spark, r, 0, 1)
      .withColumn("__src", col("_metadata.file_path"))
    val srcs = slice.select("__src").distinct().collect().map(_.getString(0))
    assert(srcs.nonEmpty && srcs.forall(_.contains("/_cdf/")),
      s"feed read a non-change file: ${srcs.mkString(", ")}")
    // manifest facts match the recorded rows
    val raw = TxnTable.readManifestRaw(r, 1)
    assert(raw.cdfKind == "files" && raw.cdfRows == 100L)
  }

  test("the feed is SQL-reachable as the graft_txn_changes TVF") {
    val (r, _) = mkTable("tvf")
    TxnTable.deleteRange(spark, r, 0L, 99L)
    graft.functions.GraftExtensions.registerTableFunctions(spark)
    val rows = spark.sql(
      s"""SELECT _change_type, count(1) AS n
          FROM graft_txn_changes('$r', -1, 1) GROUP BY 1 ORDER BY 1""")
      .collect().map(row => row.getString(0) -> row.getLong(1))
    assert(rows.toSeq == Seq("delete" -> 100L, "insert" -> 1000L))
  }

  test("the streaming feed composes across a rewrite the adds-stream refuses") {
    val (r, _) = mkTable("stream")
    TxnTable.deleteRange(spark, r, 0L, 99L)
    TxnTable.optimize(spark, r, 4) // rewrite: adds-stream would refuse
    import spark.implicits._
    TxnTable.mergeRange(spark, r, Seq((500L, 7L)).toDF("k", "v"))
    val acc = new java.util.concurrent.atomic.AtomicReference(
      Map.empty[String, Long])
    val q = spark.readStream.format("graft.sources.TxnCdfSource")
      .option("root", r).load()
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.groupBy("_change_type").count().collect().foreach { row =>
          acc.updateAndGet(m => m.updated(row.getString(0),
            m.getOrElse(row.getString(0), 0L) + row.getLong(1)))
        }
        ()
      }
      .option("checkpointLocation",
        graft.Fs.scratch("graft_cdfspec_stream_ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val m = acc.get()
    assert(m("insert") == 1000L && m("delete") == 100L &&
      m("update_preimage") == 1L && m("update_postimage") == 1L,
      s"got $m")
  }

  test("vacuum keeps a referenced change-file dir alive") {
    val (r, _) = mkTable("vacuum", n = 200, shards = 2)
    // delete EVERYTHING in shard 0: the rewrite adds no files, so only
    // the cdfPath references the attempt dir
    TxnTable.deleteRange(spark, r, 0L, 99L)
    assert(TxnTable.vacuum(r, minAgeMs = 0L) == 0,
      "the change-file dir is referenced and must survive vacuum")
    assert(TxnTable.changeFeed(spark, r, 0, 1).count() == 100)
  }
}
