package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-11 ADVICE hardening, pinned by spec:
  *  - a streaming readChangeFeed with an ending bound refuses loudly
  *    instead of streaming past the requested end;
  *  - startingTimestamp/endingTimestamp accept the full Delta
  *    convention (date-only, zoned, negative epoch millis) and name
  *    the option on a parse failure;
  *  - CTAS/RTAS staging validates stats_types at analysis time
  *    (createEmpty's requires, mirrored);
  *  - SQL identity INSERT pins the batch exactly once and releases
  *    the checkpoint blocks after the commit (no storage creep on
  *    long ingest sessions). */
class AdviceR11Spec extends SparkSpec {

  private def sql(s: String) = spark.sql(s)

  override def withFixture(test: NoArgTest) = {
    GraftTxnCatalog.register(spark)
    super.withFixture(test)
  }

  test("streaming readChangeFeed refuses an ending bound loudly") {
    sql("DROP TABLE IF EXISTS graft.adv_cdf_end")
    sql("""CREATE TABLE graft.adv_cdf_end (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='2','layout_div'='100')""")
    sql("INSERT INTO graft.adv_cdf_end SELECT id, id FROM range(10)")
    val root = graft.Fs.scratch("graft_txn_catalog_wh") + "/adv_cdf_end"
    val m = TxnTable.readManifest(root, TxnTable.latestVersion(root))
    val scan = new TxnCdfOptionScan(root, m, Some(1), Some(1))
    val e = intercept[IllegalArgumentException] {
      scan.toMicroBatchStream("/tmp/ignored")
    }
    assert(e.getMessage.contains("ending"), e.getMessage)
    // batch reads with the same bound stay legal
    assert(new TxnCdfOptionScan(root, m, Some(1), Some(1))
      .readSchema().fieldNames.contains("_change_type"))
  }

  test("parseTs: date-only, zoned, space-separated, negative epoch millis") {
    import CdfReadOptionRule.parseTs
    assert(parseTs("1970-01-02") == 86400000L)
    assert(parseTs("1970-01-01 00:00:01") == 1000L)
    assert(parseTs("1970-01-01 00:00:01.500") == 1500L)
    assert(parseTs("1970-01-01T01:00:00+01:00") == 0L)
    assert(parseTs("1970-01-01T00:00:02Z") == 2000L)
    assert(parseTs("-5000") == -5000L)
    assert(parseTs("12345") == 12345L)
    val e = intercept[Exception] { parseTs("not-a-time") }
    assert(e.getMessage.contains("Timestamp"), e.getMessage)
  }

  test("CTAS with malformed stats_types fails at staging, not mid-write") {
    sql("DROP TABLE IF EXISTS graft.adv_ctas_st")
    // length mismatch: 2 types for 1 stats col
    val e1 = intercept[Exception] {
      sql("""CREATE TABLE graft.adv_ctas_st USING graft_txn
             TBLPROPERTIES ('key'='k','shards'='2','layout_div'='100',
                            'stats_cols'='v','stats_types'='long,string')
             AS SELECT id AS k, id AS v FROM range(10)""")
    }
    assert(e1.getMessage.contains("stats_types"), e1.getMessage)
    // unknown type name
    val e2 = intercept[Exception] {
      sql("""CREATE TABLE graft.adv_ctas_st USING graft_txn
             TBLPROPERTIES ('key'='k','shards'='2','layout_div'='100',
                            'stats_cols'='v','stats_types'='varchar')
             AS SELECT id AS k, id AS v FROM range(10)""")
    }
    assert(e2.getMessage.contains("unknown stats type"), e2.getMessage)
    // neither attempt may leave a half-made table behind
    assert(!spark.catalog.tableExists("graft.adv_ctas_st"))
  }

  test("SQL identity INSERT releases its checkpoint blocks after commit") {
    sql("DROP TABLE IF EXISTS graft.adv_id_unpin")
    sql("""CREATE TABLE graft.adv_id_unpin (
             id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 0 INCREMENT BY 1),
             k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='2','layout_div'='1000')""")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    sql("INSERT INTO graft.adv_id_unpin (k, v) SELECT id, id * 2 FROM range(100)")
    sql("INSERT INTO graft.adv_id_unpin (k, v) SELECT id, id * 3 FROM range(100, 200)")
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"identity INSERT leaked persistent RDDs: ${after -- before}")
    // and the allocation stayed correct: gap-free ids 0..199
    assert(sql("SELECT count(1), min(id), max(id), count(DISTINCT id) " +
      "FROM graft.adv_id_unpin").head() ===
      org.apache.spark.sql.Row(200L, 0L, 199L, 200L))
    // the refusal path releases too
    val b2 = spark.sparkContext.getPersistentRDDs.keySet
    intercept[Exception] {
      sql("INSERT INTO graft.adv_id_unpin SELECT 777, id, 0 FROM range(5)")
    }
    assert((spark.sparkContext.getPersistentRDDs.keySet -- b2).isEmpty)
  }
}
