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

  test("the SQL connector refuses a merge-on-read snapshot loudly") {
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.dv_refuse")
    spark.sql("""
      CREATE TABLE graft.dv_refuse (k BIGINT, v BIGINT) USING graft_txn
      TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')""")
    spark.sql("INSERT INTO graft.dv_refuse SELECT id, id FROM range(1000)")
    val r = graft.Fs.scratch("graft_txn_catalog_wh") + "/dv_refuse"
    TxnTable.deleteMor(spark, r, "k = 7")
    val err = intercept[Exception] {
      spark.sql("SELECT count(1) FROM graft.dv_refuse").collect()
    }
    assert(err.getMessage.contains("deletion vectors"))
    TxnTable.purgeDeletes(spark, r)
    assert(spark.sql("SELECT count(1) FROM graft.dv_refuse")
      .head().getLong(0) == 999)
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
