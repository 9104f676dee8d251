package graft

import graft.sources.TxnTable
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors (qe1): read-path application,
  * accumulation, composition with surgical DML, retention, and the
  * SQL-connector refusal contract. */
class DeletionVectorSpec extends SparkSpec {

  private def root(name: String) = graft.Fs.scratch(s"graft_dvspec_$name")

  private def mkTable(name: String, n: Int = 1000, shards: Int = 8) = {
    val r = root(name)
    val df = spark.range(n).select(
      col("id").as("k"), (col("id") * 3 % 101).as("v"))
    TxnTable.create(spark, r, df, "k", shards)
    (r, df)
  }

  test("deleteMor removes rows without rewriting any data file") {
    val (r, _) = mkTable("basic")
    val before = TxnTable.readManifest(r, 0)
    val (v, tagged, deleted) = TxnTable.deleteMor(spark, r, "k % 10 = 3")
    assert(v == 1 && deleted == 100L && tagged == 8)
    val after = TxnTable.readManifest(r, 1)
    assert(after.files.map(_.path) == before.files.map(_.path),
      "a merge-on-read delete must not rewrite data files")
    val head = TxnTable.readVersion(spark, r, 1)
    assert(head.count() == 900)
    assert(head.where(col("k") % 10 === 3).count() == 0)
    // v0 unaffected
    assert(TxnTable.readVersion(spark, r, 0).count() == 1000)
  }

  test("vectors accumulate and a re-delete of dead rows is a no-op") {
    val (r, _) = mkTable("accum")
    TxnTable.deleteMor(spark, r, "k < 100")
    val (v2, _, d2) = TxnTable.deleteMor(spark, r, "k < 150")
    assert(v2 == 2 && d2 == 50L, "only LIVE matches mint fresh positions")
    val (v3, t3, d3) = TxnTable.deleteMor(spark, r, "k < 150")
    assert(v3 == 2 && t3 == 0 && d3 == 0L, "no-op must not mint a version")
    assert(TxnTable.readVersion(spark, r, 2).count() == 850)
  }

  test("pruned reads apply vectors") {
    val (r, _) = mkTable("pruned")
    TxnTable.deleteMor(spark, r, "k BETWEEN 200 AND 299")
    val (df, kept, total) = TxnTable.prunedRead(spark, r, 1, 150L, 349L)
    assert(kept < total)
    assert(df.where(col("k").between(150, 349)).count() == 100,
      "the pruned scan must not resurrect vector-deleted rows")
  }

  test("surgical deleteRange over a dv'd file does not resurrect rows") {
    val (r, _) = mkTable("compose")
    TxnTable.deleteMor(spark, r, "k % 2 = 1") // 500 dead everywhere
    // shard 0 spans [0,124]: the range delete rewrites it from its
    // LIVE rows (evens 100..124 survive the rewrite)
    val (v2, rewritten, _) = TxnTable.deleteRange(spark, r, 0L, 99L)
    assert(v2 == 2 && rewritten > 0)
    val head = TxnTable.readVersion(spark, r, 2)
    // survivors: even keys >= 100
    assert(head.count() == 450)
    assert(head.where(col("k") % 2 === 1).count() == 0,
      "the copy-on-write rewrite must read LIVE rows, not raw files")
  }

  test("purge rewrites only dv'd files and restores SQL readability") {
    val (r, _) = mkTable("purge")
    TxnTable.deleteMor(spark, r, "k BETWEEN 0 AND 115") // shard 0 only
    val m1 = TxnTable.readManifest(r, 1)
    assert(m1.files.count(_.dvRows > 0) == 1)
    val (v2, purged, carried) = TxnTable.purgeDeletes(spark, r)
    assert(v2 == 2 && purged == 1 && carried == 7)
    assert(TxnTable.readManifest(r, 2).files.forall(_.dvRows == 0))
    assert(TxnTable.readVersion(spark, r, 2).count() == 884)
    // idempotent
    assert(TxnTable.purgeDeletes(spark, r) == ((2, 0, 8)))
  }

  test("the SQL connector serves a merge-on-read snapshot natively") {
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.dv_sqlread")
    spark.sql("""
      CREATE TABLE graft.dv_sqlread (k BIGINT, v BIGINT) USING graft_txn
      TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')""")
    spark.sql(
      "INSERT INTO graft.dv_sqlread SELECT id, id * 3 % 101 FROM range(1000)")
    val r = graft.Fs.scratch("graft_txn_catalog_wh") + "/dv_sqlread"
    TxnTable.deleteMor(spark, r, "k % 10 = 3")
    // live rows only, no OPTIMIZE needed — and bit-equal to the Scala
    // read path (the two DV-application seams must agree)
    val sql = spark.sql(
      "SELECT count(1), sum(k), sum(v) FROM graft.dv_sqlread").head()
    assert(sql.getLong(0) == 900)
    val twin = TxnTable.readVersion(spark, r, 2)
      .agg(count(lit(1)), sum("k"), sum("v")).head()
    assert((0 to 2).forall(i => sql.getLong(i) == twin.getLong(i)))
    assert(spark.sql(
      "SELECT count(1) FROM graft.dv_sqlread WHERE k % 10 = 3")
      .head().getLong(0) == 0, "vector-deleted rows must not resurrect")
    // residual filters re-apply above the unfiltered dv-file readers
    assert(spark.sql(
      "SELECT count(1) FROM graft.dv_sqlread WHERE v % 2 = 0")
      .head().getLong(0) ==
      TxnTable.readVersion(spark, r, 2).where(col("v") % 2 === 0).count())
    // time travel: v1 (pre-delete) reads every row through SQL
    assert(spark.sql(
      "SELECT count(1) FROM graft.dv_sqlread VERSION AS OF 1")
      .head().getLong(0) == 1000)
    // purge still compacts back to columnar-eligible clean files
    TxnTable.purgeDeletes(spark, r)
    assert(spark.sql("SELECT count(1) FROM graft.dv_sqlread")
      .head().getLong(0) == 900)
  }

  test("metadata-only COUNT(*) is exact on MoR; other folds decline") {
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.dv_meta")
    spark.sql("""
      CREATE TABLE graft.dv_meta (k BIGINT, v BIGINT) USING graft_txn
      TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000',
                     'stats_cols'='v')""")
    spark.sql(
      "INSERT INTO graft.dv_meta SELECT id, id * 3 % 101 FROM range(1000)")
    val r = graft.Fs.scratch("graft_txn_catalog_wh") + "/dv_meta"
    TxnTable.deleteMor(spark, r, "k % 10 = 3")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.sparkPlan
    // COUNT(*) folds nRows - dvRows: exact AND zero data scan
    val cq = spark.sql("SELECT count(*) FROM graft.dv_meta")
    assert(planOf(cq).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.isEmpty, "live count must stay metadata-only on MoR")
    assert(cq.head().getLong(0) == 900)
    // min/max/sum/count over the stats column: the per-file facts are
    // stale-wide after a delete — must DECLINE to a real scan and
    // still answer exactly (the DV-applying scan)
    val mq = spark.sql(
      "SELECT min(v), max(v), sum(v), count(v) FROM graft.dv_meta")
    assert(planOf(mq).collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }.nonEmpty, "stats folds must decline on a deletion-vector snapshot")
    val got = mq.head()
    val want = TxnTable.readVersion(spark, r, 2)
      .agg(min("v"), max("v"), sum("v"), count(col("v"))).head()
    assert((0 to 3).forall(i => got.getLong(i) == want.getLong(i)))
  }

  test("SQL UPDATE on a MoR snapshot: carried vectors stay applied") {
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.dv_upd")
    spark.sql("""
      CREATE TABLE graft.dv_upd (k BIGINT, v BIGINT) USING graft_txn
      TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')""")
    spark.sql(
      "INSERT INTO graft.dv_upd SELECT id, id * 3 % 101 FROM range(1000)")
    val r = graft.Fs.scratch("graft_txn_catalog_wh") + "/dv_upd"
    TxnTable.deleteMor(spark, r, "k % 10 = 3") // tags every file
    val m2 = TxnTable.readManifest(r, 2)
    assert(m2.files.forall(_.dvRows > 0))
    // band update: shard 0 rewrites (vectors implicitly purged there),
    // shards 1-3 carry by path WITH their vectors
    spark.sql("UPDATE graft.dv_upd SET v = v + 1000 WHERE k < 100")
    val m3 = TxnTable.readManifest(r, 3)
    val m2Paths = m2.files.map(_.path).toSet
    val carried = m3.files.filter(f => m2Paths(f.path))
    assert(carried.nonEmpty && carried.forall(_.dvRows > 0),
      "carried files must keep their deletion vectors")
    assert(m3.files.exists(f => !m2Paths(f.path) && f.dvRows == 0),
      "rewritten files must come out clean")
    val head = spark.sql(
      "SELECT count(1), sum(CASE WHEN v >= 1000 THEN 1 ELSE 0 END) " +
        "FROM graft.dv_upd").head()
    assert(head.getLong(0) == 900, "update must not resurrect deleted rows")
    assert(head.getLong(1) == 90, "only live band rows take the update")
    assert(spark.sql(
      "SELECT count(1) FROM graft.dv_upd WHERE k % 10 = 3")
      .head().getLong(0) == 0)
  }

  test("streaming a table across a merge-on-read delete refuses loudly") {
    import org.apache.spark.sql.streaming.Trigger
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.dv_stream")
    spark.sql("""
      CREATE TABLE graft.dv_stream (k BIGINT, v BIGINT) USING graft_txn
      TBLPROPERTIES ('key'='k','shards'='2','layout_div'='200')""")
    spark.sql("INSERT INTO graft.dv_stream SELECT id, id FROM range(200)")
    val r = graft.Fs.scratch("graft_txn_catalog_wh") + "/dv_stream"
    TxnTable.deleteMor(spark, r, "k % 10 = 3")
    // an adds-only stream cannot represent a row-changing MoR delete:
    // the planner's guard must fail the run, not silently re-serve
    // deleted rows
    val ckpt = graft.Fs.scratch("graft_dvspec_stream_ckpt")
    graft.Fs.deleteRecursively(ckpt)
    val caught = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      spark.readStream.table("graft.dv_stream")
        .writeStream.format("noop").option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    val msg = Option(caught.getCause).fold(caught.getMessage)(_.getMessage)
    assert(msg.contains("not streamable"),
      s"expected the dv streaming guard, got: $msg")
  }

  test("vacuum keeps referenced dv sidecar dirs, reclaims orphans") {
    val (r, _) = mkTable("vacuum")
    TxnTable.deleteMor(spark, r, "k % 5 = 0")
    // plant an orphan attempt dir
    val orphan = new java.io.File(s"$r/data/dv-v9-orphan")
    orphan.mkdirs()
    new java.io.File(orphan, "junk").createNewFile()
    assert(TxnTable.vacuum(r, minAgeMs = 0L) == 1)
    val dvDir = TxnTable.readManifest(r, 1).files
      .find(_.dvRows > 0).map(_.dv).get
    assert(new java.io.File(s"$r/$dvDir").exists(),
      "vacuum must not reclaim a referenced deletion vector")
    assert(TxnTable.readVersion(spark, r, 1).count() == 800)
  }

  test("pre-DV manifests (no dv fields) still parse") {
    val legacy = """{"version":0,"op":"create","key_col":"k","key_col2":"",""" +
      """"schema":"k BIGINT","shards":2,"layout_div":10,"delta_of":-1,""" +
      """"commit_ms":5,"check":"","stats_cols":[],"txns":[],""" +
      """"files":[{"path":"data/v0-aa/p.parquet","n_rows":3,"min_k":0,""" +
      """"max_k":9,"min_k2":-1,"max_k2":1,"bytes":77,"vmin":[],"vmax":[]}]}"""
    val m = TxnTable.parse(legacy)
    assert(m.files.head.dv == "" && m.files.head.dvRows == 0L)
    assert(m.files.head.bytes == 77L)
  }
}
