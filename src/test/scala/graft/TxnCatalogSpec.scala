package graft

import graft.sources.{GraftTxnCatalog, TxnTable}
import org.apache.spark.sql.functions._

/** The transactional format's SQL catalog identity: DDL/DML/time
  * travel as pure SQL text over the snapshot log, with manifest-stat
  * file pruning at the connector boundary. */
class TxnCatalogSpec extends SparkSpec {

  private def sql(s: String) = spark.sql(s)

  override def withFixture(test: NoArgTest) = {
    GraftTxnCatalog.register(spark)
    super.withFixture(test)
  }

  test("CREATE/INSERT/SELECT round-trip; each INSERT is one commit") {
    sql("DROP TABLE IF EXISTS graft.spec_rt")
    sql("""CREATE TABLE graft.spec_rt (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')""")
    sql("INSERT INTO graft.spec_rt SELECT id, id * 2 FROM range(500)")
    sql("INSERT INTO graft.spec_rt SELECT id, id * 2 FROM range(500, 1000)")
    assert(sql("SELECT count(1), sum(v) FROM graft.spec_rt").head() ===
      org.apache.spark.sql.Row(1000L, (0L until 1000L).map(_ * 2).sum))
    // the SQL surface drove the SAME log: versions 0(create),1,2
    val root = graft.Fs.scratch("graft_txn_catalog_wh") + "/spec_rt"
    assert(TxnTable.versions(root) == Seq(0, 1, 2))
    assert(TxnTable.readManifestRaw(root, 2).deltaOf == 1, "INSERT = delta append")
  }

  test("VERSION AS OF reads history; TIMESTAMP AS OF resolves; pinned writes refuse") {
    sql("DROP TABLE IF EXISTS graft.spec_tt")
    sql("""CREATE TABLE graft.spec_tt (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='4','layout_div'='100')""")
    sql("INSERT INTO graft.spec_tt SELECT id, 1 FROM range(50)")
    sql("INSERT OVERWRITE graft.spec_tt SELECT id, 9 FROM range(10)")
    assert(sql("SELECT count(1) FROM graft.spec_tt VERSION AS OF 0").head().getLong(0) == 0)
    assert(sql("SELECT count(1) FROM graft.spec_tt VERSION AS OF 1").head().getLong(0) == 50)
    assert(sql("SELECT count(1), sum(v) FROM graft.spec_tt VERSION AS OF 2").head() ===
      org.apache.spark.sql.Row(10L, 90L))
    // head == v2
    assert(sql("SELECT sum(v) FROM graft.spec_tt").head().getLong(0) == 90)
    // a write against a time-travel snapshot fails loudly
    val e = intercept[Exception] {
      sql("INSERT INTO graft.spec_tt VERSION AS OF 1 SELECT id, 0 FROM range(1)")
    }
    // (Spark rejects this at parse/analysis; any loud failure is correct)
    assert(e != null)
  }

  test("pushed key filter prunes files at the connector; residual keeps exactness") {
    sql("DROP TABLE IF EXISTS graft.spec_prune")
    sql("""CREATE TABLE graft.spec_prune (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='8','layout_div'='4000')""")
    sql("INSERT INTO graft.spec_prune SELECT id, id % 7 FROM range(4000)")
    val q = sql("SELECT count(1), sum(k) FROM graft.spec_prune WHERE k BETWEEN 1000 AND 1240")
    val scans = q.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    assert(scans.nonEmpty, "must plan a DSv2 scan")
    val desc = scans.head.description()
    assert(desc.contains("GraftTxnScan"), desc)
    val Kept = """files_kept=(\d+)/(\d+)""".r.unanchored
    val (kept, total) = desc match {
      case Kept(a, b) => (a.toInt, b.toInt)
      case _          => fail(s"no pruning evidence in: $desc")
    }
    assert(kept < total, s"no file pruning: $kept/$total")
    assert(q.head() === org.apache.spark.sql.Row(241L, (1000L to 1240L).sum))
  }

  test("stats_cols TBLPROPERTY prunes a non-key SQL predicate") {
    sql("DROP TABLE IF EXISTS graft.spec_vstats")
    sql("""CREATE TABLE graft.spec_vstats (k BIGINT, t BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000',
                          'stats_cols'='t')""")
    // three ingest-time bands, each spanning the full key range
    (0 until 3).foreach { i =>
      sql(s"INSERT INTO graft.spec_vstats SELECT id, $i * 100 + id % 100 FROM range(1000)")
    }
    val q = sql("SELECT count(1) FROM graft.spec_vstats WHERE t >= 100 AND t <= 199")
    val desc = q.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }.head.description()
    val Kept = """files_kept=(\d+)/(\d+)""".r.unanchored
    val (kept, total) = desc match {
      case Kept(a, b) => (a.toInt, b.toInt)
      case _          => fail(s"no pruning evidence in: $desc")
    }
    assert(kept < total, s"value stats must prune: $kept/$total")
    assert(q.head().getLong(0) == 1000L, "t-band [100,199] is exactly batch 1")
  }

  test("check TBLPROPERTY lands as the table CHECK; violating INSERT rejected") {
    sql("DROP TABLE IF EXISTS graft.spec_check")
    sql("""CREATE TABLE graft.spec_check (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='2','layout_div'='100',
                          'check'='v >= 0')""")
    sql("INSERT INTO graft.spec_check SELECT id, id FROM range(10)")
    val e = intercept[Exception] {
      sql("INSERT INTO graft.spec_check SELECT id + 50, -1 FROM range(5)")
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("CHECK constraint") ||
        Option(e.getCause).exists(_.getMessage.contains("CHECK constraint"))),
      s"got: ${e.getMessage}")
    assert(sql("SELECT count(1) FROM graft.spec_check").head().getLong(0) == 10)
  }

  test("DDL surface: missing TBLPROPERTIES, duplicate CREATE, DROP, existence") {
    sql("DROP TABLE IF EXISTS graft.spec_ddl")
    intercept[Exception] {
      sql("CREATE TABLE graft.spec_ddl (k BIGINT) USING graft_txn")
    }
    sql("""CREATE TABLE graft.spec_ddl (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='2','layout_div'='10')""")
    intercept[Exception] {
      sql("""CREATE TABLE graft.spec_ddl (k BIGINT) USING graft_txn
             TBLPROPERTIES ('key'='k','shards'='2','layout_div'='10')""")
    }
    assert(sql("SHOW TABLES IN graft").collect()
      .map(_.getString(1)).contains("spec_ddl"))
    sql("DROP TABLE graft.spec_ddl")
    intercept[Exception] { sql("SELECT * FROM graft.spec_ddl") }
  }

  test("SQL and Scala surfaces are ONE table: API commits visible to SQL and back") {
    sql("DROP TABLE IF EXISTS graft.spec_both")
    sql("""CREATE TABLE graft.spec_both (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='2','layout_div'='100')""")
    sql("INSERT INTO graft.spec_both SELECT id, 0 FROM range(50)")
    val root = graft.Fs.scratch("graft_txn_catalog_wh") + "/spec_both"
    // a Scala-API surgical merge lands as v2; SQL sees it immediately
    TxnTable.mergeRange(spark, root, spark.range(10)
      .select(col("id").as("k"), lit(7L).as("v")))
    assert(sql("SELECT sum(v) FROM graft.spec_both").head().getLong(0) == 70L)
    assert(sql("SELECT sum(v) FROM graft.spec_both VERSION AS OF 1")
      .head().getLong(0) == 0L)
  }
}
