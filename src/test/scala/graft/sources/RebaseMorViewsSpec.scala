package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-13 feature hardening: the lanes the graded rows (qew rebase-
  * publish, qex merge-on-read UPDATE, qeu/qey view DDL) don't
  * exercise — ledger union on publish (the round-12 ADVICE high),
  * conflict/structural refusals, update semantics edge cases, routing
  * boundaries, and the view-substitution cycle/prefix/case fixes. */
class RebaseMorViewsSpec extends SparkSpec {

  private def sql(s: String) = spark.sql(s)

  override def withFixture(test: NoArgTest) = {
    GraftTxnCatalog.register(spark)
    super.withFixture(test)
  }

  private def kv(lo: Long, hi: Long, v: Long) =
    spark.range(lo, hi).select(col("id").as("k"), lit(v).as("v"))

  test("publish carries the UNION of both idempotence ledgers") {
    val root = graft.Fs.scratch("graft_r13_ledger")
    TxnTable.create(spark, root, kv(0, 100, 1), "k", 2) // v0
    TxnTable.appendTxn(spark, root, kv(100, 110, 1), "sinkA", 5) // v1
    val bRoot = TxnTable.createBranch(root, "lm")
    TxnTable.appendTxn(spark, bRoot, kv(200, 210, 2), "sinkB", 3)
    val v = TxnTable.publishBranch(root, "lm")
    assert(v == 2)
    // the ADVICE-high regression: pre-fix, the publish copied the
    // branch's ledger (clone-born empty + sinkB) over main's, losing
    // sinkA's watermark — a replayed sinkA microbatch then double-lands
    assert(TxnTable.lastTxnVersion(root, "sinkA").contains(5L))
    assert(TxnTable.lastTxnVersion(root, "sinkB").contains(3L))
    val (_, _, fresh) =
      TxnTable.appendTxn(spark, root, kv(100, 110, 1), "sinkA", 5)
    assert(!fresh, "a replayed pre-fork delivery must dedupe after publish")
    assert(TxnTable.readVersion(spark, root, TxnTable.latestVersion(root))
      .count() == 120L)
  }

  test("rebase-publish: append ∥ append lands both; the feed serves the branch adds") {
    val root = graft.Fs.scratch("graft_r13_rebase")
    TxnTable.create(spark, root, kv(0, 100, 1), "k", 2) // v0
    TxnTable.createBranch(root, "rb") // fork at v0
    val bRoot = s"$root/_refs/rb"
    TxnTable.append(spark, bRoot, kv(200, 220, 2), "rb_add")
    TxnTable.append(spark, root, kv(100, 120, 3), "main_add") // v1
    val v = TxnTable.publishBranch(root, "rb")
    assert(v == 2, "publish must REBASE over the concurrent main append")
    val head = TxnTable.readVersion(spark, root, 2)
    assert(head.count() == 140L)
    assert(head.agg(sum("v")).head().getLong(0) == 100L + 60L + 40L)
    // cdf: the publish is adds-classified (branch only appended) and
    // serves exactly the branch's rows
    val cf = TxnTable.changeFeed(spark, root, 1, 2)
    assert(cf.where(col("_change_type") === "insert").count() == 20L)
    assert(cf.agg(min("k"), max("k")).head()
      === org.apache.spark.sql.Row(200L, 219L))
  }

  test("rebase-publish: branch deletion vectors graft onto the advanced main; the feed refuses the DML publish") {
    val root = graft.Fs.scratch("graft_r13_dvreb")
    TxnTable.create(spark, root,
      spark.range(100).select(col("id").as("k"), col("id").as("v")),
      "k", 2) // v0
    TxnTable.createBranch(root, "dm")
    val bRoot = s"$root/_refs/dm"
    val (_, tagged, deleted) =
      TxnTable.deleteMor(spark, bRoot, "k BETWEEN 10 AND 19")
    assert(tagged == 1 && deleted == 10L)
    TxnTable.append(spark, root, kv(100, 110, 0), "main_add") // v1
    val v = TxnTable.publishBranch(root, "dm")
    assert(v == 2)
    val head = TxnTable.readVersion(spark, root, 2)
    assert(head.count() == 100L) // 100 - 10 deleted + 10 appended
    assert(head.where(col("k").between(10, 19)).count() == 0L)
    val e = intercept[Exception] {
      TxnTable.changeFeed(spark, root, 1, 2).count()
    }
    assert(e.getMessage.contains("change feed not recorded"), e.getMessage)
  }

  test("rebase-publish: both sides touching the same base files refuses; structural divergence refuses") {
    val root = graft.Fs.scratch("graft_r13_conflict")
    TxnTable.create(spark, root,
      spark.range(100).select(col("id").as("k"), col("id").as("v")),
      "k", 2) // v0
    TxnTable.createBranch(root, "cf")
    TxnTable.deleteMor(spark, root, "k BETWEEN 5 AND 14")   // main v1
    TxnTable.deleteMor(spark, s"$root/_refs/cf", "k BETWEEN 0 AND 9")
    val e = intercept[Exception] { TxnTable.publishBranch(root, "cf") }
    assert(e.getMessage.contains("re-branch"), e.getMessage)
    TxnTable.dropBranch(root, "cf") // never published — always legal
    // structural: a post-fork layout change on main refuses the rebase
    TxnTable.createBranch(root, "sd")
    TxnTable.append(spark, s"$root/_refs/sd", kv(300, 310, 1), "sd_add")
    TxnTable.optimize(spark, root, 4) // main: shards 2 -> 4
    val e2 = intercept[Exception] { TxnTable.publishBranch(root, "sd") }
    assert(e2.getMessage.contains("DDL does not rebase"), e2.getMessage)
  }

  test("updateMor: one commit, zero rewrites, simultaneous assignments, idempotent re-update") {
    val root = graft.Fs.scratch("graft_r13_umor")
    TxnTable.create(spark, root,
      spark.range(100).select(col("id").as("k"), col("id").as("a"),
        (col("id") * 2).as("b")), "k", 2) // v0
    val v0Paths = TxnTable.readManifest(root, 0).files.map(_.path).toSet
    val (v1, tagged, n) =
      TxnTable.updateMor(spark, root, "k = 7", Seq("a" -> "a + 100"))
    assert(v1 == 1 && tagged == 1 && n == 1L)
    val m1 = TxnTable.readManifest(root, 1)
    assert(v0Paths.forall(p => m1.files.exists(_.path == p)),
      "a MoR update must rewrite no data file")
    assert(m1.files.map(_.dvRows).sum == 1L)
    val head1 = TxnTable.readVersion(spark, root, 1)
    assert(head1.count() == 100L)
    assert(head1.where(col("k") === 7).head()
      === org.apache.spark.sql.Row(7L, 107L, 14L))
    // simultaneous semantics: SET a = b, b = a swaps off the OLD row
    TxnTable.updateMor(spark, root, "k = 8", Seq("a" -> "b", "b" -> "a"))
    assert(TxnTable.readVersion(spark, root, 2).where(col("k") === 8).head()
      === org.apache.spark.sql.Row(8L, 16L, 8L))
    // a no-match update mints NO version
    val (v3, _, n3) =
      TxnTable.updateMor(spark, root, "k = 100000", Seq("a" -> "0"))
    assert(v3 == 2 && n3 == 0L && TxnTable.latestVersion(root) == 2)
    // re-updating a row that now lives in an ADD file composes
    TxnTable.updateMor(spark, root, "k = 7", Seq("a" -> "a + 1"))
    val head3 = TxnTable.readVersion(spark, root, 3)
    assert(head3.count() == 100L)
    assert(head3.where(col("k") === 7).head().getLong(1) == 108L)
    // the change feed carries pre/post images for the MoR update
    val cf = TxnTable.changeFeed(spark, root, 2, 3)
    assert(cf.where(col("_change_type") === "update_preimage").count() == 1L)
    assert(cf.where(col("_change_type") === "update_postimage")
      .head().getLong(1) == 108L)
    // unknown assignment column refuses
    val e = intercept[Exception] {
      TxnTable.updateMor(spark, root, "k = 1", Seq("zz" -> "1"))
    }
    assert(e.getMessage.contains("unknown column"), e.getMessage)
  }

  test("MoR routing: the parser prices narrow vs wide vs unpriceable from the manifest") {
    sql("DROP TABLE IF EXISTS graft.mor_route")
    sql("""CREATE TABLE graft.mor_route (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')""")
    sql("INSERT INTO graft.mor_route SELECT id, id FROM range(1000)")
    val p = new GraftSqlDdlParser(spark.sessionState.sqlParser)
    def parsed(s: String) = p.parsePlan(s)
    assert(parsed("UPDATE graft.mor_route SET v = v + 1 WHERE k = 500")
      .isInstanceOf[MorUpdateCommand], "a point update routes MoR")
    assert(!parsed("UPDATE graft.mor_route SET v = v + 1 WHERE v % 7 = 0")
      .isInstanceOf[MorUpdateCommand], "unpriceable stays copy-on-write")
    assert(!parsed(
      "UPDATE graft.mor_route SET v = v + 1 WHERE k BETWEEN 0 AND 900")
      .isInstanceOf[MorUpdateCommand], "a wide band stays copy-on-write")
    assert(!parsed(
      "UPDATE graft.mor_route SET v = v + 1 WHERE k = (SELECT 1)")
      .isInstanceOf[MorUpdateCommand], "subqueries stay copy-on-write")
    spark.conf.set("spark.graft.dml.mor.enabled", "false")
    try assert(!parsed("UPDATE graft.mor_route SET v = v + 1 WHERE k = 500")
      .isInstanceOf[MorUpdateCommand], "the session opt-out is honored")
    finally spark.conf.set("spark.graft.dml.mor.enabled", "true")
    // view DDL rides the same wrapper
    assert(parsed("CREATE VIEW graft.pv AS SELECT 1 AS x")
      .isInstanceOf[CreateGraftViewCommand])
    assert(parsed("DROP VIEW IF EXISTS graft.pv")
      .isInstanceOf[DropGraftViewCommand])
    assert(!parsed("CREATE VIEW spark_catalog.default.pv AS SELECT 1 AS x")
      .isInstanceOf[CreateGraftViewCommand], "non-graft DDL passes through")
  }

  test("merge-on-read SQL reads stay COLUMNAR (one sidecar no longer de-vectorizes the scan)") {
    sql("DROP TABLE IF EXISTS graft.colmor")
    sql("""CREATE TABLE graft.colmor (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')""")
    sql("INSERT INTO graft.colmor SELECT id, id FROM range(1000)")
    sql("CALL graft.system.delete_mor('colmor', 'k BETWEEN 100 AND 199')")
    val q = sql("SELECT count(1) AS n, sum(v) AS s FROM graft.colmor")
    val scans = q.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.forall(_.supportsColumnar),
      "the DV-applying scan must report columnar")
    assert(q.head() === org.apache.spark.sql.Row(900L,
      (0L until 1000L).sum - (100L to 199L).sum))
    // and through a projection + filter (residuals re-apply above)
    assert(sql("SELECT sum(v) FROM graft.colmor WHERE k < 150")
      .head().getLong(0) == (0L until 100L).sum)
  }

  test("view substitution: prefix names, case-insensitive catalog, cycles, unqualified refusal") {
    val wh = graft.Fs.scratch("graft_txn_catalog_wh")
    def info(name: String, q: String) =
      new org.apache.spark.sql.connector.catalog.ViewInfo(
        org.apache.spark.sql.connector.catalog.Identifier.of(
          Array.empty, name),
        q, "graft", Array.empty,
        new org.apache.spark.sql.types.StructType().add("x", "int"),
        Array("x"), Array.empty, Array.empty, java.util.Map.of())
    Seq("rev_by_bucket2", "rev", "loop_a", "loop_b", "selfy3")
      .foreach(TxnViews.drop(wh, _))
    sql("DROP TABLE IF EXISTS graft.vsrc")
    sql("""CREATE TABLE graft.vsrc (k BIGINT, v BIGINT) USING graft_txn
           TBLPROPERTIES ('key'='k','shards'='2','layout_div'='100')""")
    sql("INSERT INTO graft.vsrc SELECT id, id FROM range(100)")
    TxnViews.create(wh, info("rev_by_bucket2",
      "SELECT k % 10 AS b, count(1) AS n FROM graft.vsrc GROUP BY k % 10"),
      replace = false)
    // the ADVICE case: a view whose NAME is a prefix of a relation it
    // references — the old substring self-check refused every read
    TxnViews.create(wh, info("rev",
      "SELECT sum(n) AS t FROM graft.rev_by_bucket2"), replace = false)
    def run(q: String) = org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      ViewSubstitutionRule(spark.sessionState.sqlParser.parsePlan(q)))
    assert(run("SELECT t FROM graft.rev").head().getLong(0) == 100L)
    // catalog matching is case-insensitive
    assert(run("SELECT t FROM GRAFT.rev").head().getLong(0) == 100L)
    // mutual cycle: refused with the chain named, not an analyzer spin
    TxnViews.create(wh, info("loop_a", "SELECT * FROM graft.loop_b"),
      replace = false)
    TxnViews.create(wh, info("loop_b", "SELECT * FROM graft.loop_a"),
      replace = false)
    val e = intercept[Exception] { run("SELECT * FROM graft.loop_a") }
    assert(e.getMessage.contains("cyclic view reference"), e.getMessage)
    // self-reference is the 1-cycle of the same guard
    TxnViews.create(wh, info("selfy3", "SELECT * FROM graft.selfy3"),
      replace = false)
    val e2 = intercept[Exception] { run("SELECT * FROM graft.selfy3") }
    assert(e2.getMessage.contains("cyclic view reference"), e2.getMessage)
    // unqualified references refuse at create-time validation
    val e3 = intercept[Exception] {
      TxnViews.validate(spark, "u", "SELECT * FROM bare_name")
    }
    assert(e3.getMessage.contains("fully"), e3.getMessage)
    Seq("rev_by_bucket2", "rev", "loop_a", "loop_b", "selfy3")
      .foreach(TxnViews.drop(wh, _))
  }
}
