package graft

import graft.sources.TxnTable
import org.apache.spark.sql.functions._

/** Column mapping (qe3): metadata-only RENAME/DROP COLUMN — logical
  * presentation over physical files, structural refusals, tombstones,
  * write translation, and normalization by rewrite. */
class ColumnMappingSpec extends SparkSpec {

  private def root(name: String) = graft.Fs.scratch(s"graft_cmspec_$name")

  private def mkTable(name: String, n: Int = 1000, shards: Int = 8) = {
    val r = root(name)
    val df = spark.range(n).select(
      col("id").as("k"), (col("id") * 3 % 101).as("v"),
      (col("id") % 7).as("w"))
    TxnTable.create(spark, r, df, "k", shards)
    (r, df)
  }

  test("rename presents the new name without touching files; writes translate") {
    val (r, _) = mkTable("rename")
    val (v1, _) = TxnTable.renameColumn(spark, r, "v", "value")
    assert(v1 == 1)
    assert(TxnTable.readManifest(r, 1).files.map(_.path) ==
      TxnTable.readManifest(r, 0).files.map(_.path))
    val head = TxnTable.readVersion(spark, r, 1)
    assert(head.columns.toSeq == Seq("k", "value", "w"))
    assert(head.agg(sum("value")).head().getLong(0) ==
      (0L until 1000L).map(_ * 3 % 101).sum)
    // append under the LOGICAL name lands physically consistent
    import spark.implicits._
    TxnTable.append(spark, r,
      Seq((2000L, 5L, 1L)).toDF("k", "value", "w"), "post_rename")
    val v2 = TxnTable.readVersion(spark, r, 2)
    assert(v2.where(col("k") === 2000L).select("value").head().getLong(0) == 5L)
    // time travel: v0 still presents the OLD name
    assert(TxnTable.readVersion(spark, r, 0).columns.toSeq == Seq("k", "v", "w"))
  }

  test("structural columns refuse rename; collisions refuse") {
    val (r, _) = mkTable("refuse")
    intercept[Exception](TxnTable.renameColumn(spark, r, "k", "key2"))
    intercept[Exception](TxnTable.renameColumn(spark, r, "v", "w")) // collision
    TxnTable.setCheck(spark, r, "v >= 0")
    intercept[Exception](TxnTable.renameColumn(spark, r, "v", "value"))
  }

  test("drop is metadata-only; tombstone blocks re-add; travel sees the column") {
    val (r, _) = mkTable("drop")
    val (v1, _) = TxnTable.dropColumn(spark, r, "w")
    assert(TxnTable.readManifest(r, 1).files.map(_.path) ==
      TxnTable.readManifest(r, 0).files.map(_.path))
    assert(TxnTable.readVersion(spark, r, 1).columns.toSeq == Seq("k", "v"))
    intercept[Exception](TxnTable.addColumn(spark, r, "w", "BIGINT"))
    assert(TxnTable.readVersion(spark, r, 0)
      .agg(sum("w")).head().getLong(0) == (0L until 1000L).map(_ % 7).sum)
    // a renamed-then-dropped column tombstones its PHYSICAL name
    TxnTable.renameColumn(spark, r, "v", "value")
    TxnTable.dropColumn(spark, r, "value")
    intercept[Exception](TxnTable.addColumn(spark, r, "v", "BIGINT"))
    // the LOGICAL name never reached a file: re-adding it is safe
    TxnTable.addColumn(spark, r, "value", "BIGINT")
    assert(TxnTable.readVersion(spark, r, TxnTable.latestVersion(r))
      .where(col("value").isNotNull).count() == 0)
  }

  test("a full rewrite normalizes the mapping and clears tombstones") {
    val (r, _) = mkTable("normalize")
    TxnTable.renameColumn(spark, r, "v", "value")
    TxnTable.dropColumn(spark, r, "w")
    TxnTable.optimize(spark, r, 4)
    val m = TxnTable.readManifest(r, TxnTable.latestVersion(r))
    assert(m.renames.isEmpty && m.dropped.isEmpty)
    assert(m.schemaDdl.contains("value") && !m.schemaDdl.contains("w "))
    // now physical == logical: the once-refused re-add works
    TxnTable.addColumn(spark, r, "w", "BIGINT")
    // and deletes/merges keep working on the normalized table
    TxnTable.deleteRange(spark, r, 0L, 99L)
    assert(TxnTable.readVersion(spark, r, TxnTable.latestVersion(r))
      .count() == 900)
  }

  test("pruned reads and surgical DML speak logical names under a mapping") {
    val (r, _) = mkTable("surgical")
    TxnTable.renameColumn(spark, r, "v", "value")
    val (df, kept, total) = TxnTable.prunedRead(spark, r, 1, 100L, 199L)
    assert(kept < total && df.columns.contains("value"))
    assert(df.where(col("k").between(100, 199)).count() == 100)
    // merge a band under LOGICAL names
    import spark.implicits._
    TxnTable.mergeRange(spark, r,
      Seq((100L, 999L, 0L)).toDF("k", "value", "w"))
    val head = TxnTable.readVersion(spark, r, TxnTable.latestVersion(r))
    assert(head.where(col("k") === 100L).select("value").head().getLong(0) == 999L)
    // deleteMor with a LOGICAL predicate
    TxnTable.deleteMor(spark, r, "value = 999")
    assert(TxnTable.readVersion(spark, r, TxnTable.latestVersion(r))
      .where(col("k") === 100L).count() == 0)
  }

  test("SQL reads a renamed table logically; row-level DML translates") {
    graft.sources.GraftTxnCatalog.register(spark)
    spark.sql("DROP TABLE IF EXISTS graft.cm_sql")
    spark.sql("""
      CREATE TABLE graft.cm_sql (k BIGINT, v BIGINT) USING graft_txn
      TBLPROPERTIES ('key'='k','shards'='4','layout_div'='1000')""")
    spark.sql("INSERT INTO graft.cm_sql SELECT id, id * 2 FROM range(1000)")
    spark.sql("ALTER TABLE graft.cm_sql RENAME COLUMN v TO doubled")
    assert(spark.table("graft.cm_sql").columns.toSeq == Seq("k", "doubled"))
    assert(spark.sql(
      "SELECT sum(doubled) FROM graft.cm_sql WHERE k BETWEEN 0 AND 9")
      .head().getLong(0) == 90L)
    // INSERT through the renamed surface
    spark.sql("INSERT INTO graft.cm_sql SELECT 5000, 42")
    assert(spark.sql("SELECT doubled FROM graft.cm_sql WHERE k = 5000")
      .head().getLong(0) == 42L)
    // UPDATE under the mapping: the rewrite's files must come out
    // PHYSICALLY named (v), the logical surface still reads doubled
    spark.sql("UPDATE graft.cm_sql SET doubled = 0 WHERE k = 1")
    assert(spark.sql("SELECT doubled FROM graft.cm_sql WHERE k = 1")
      .head().getLong(0) == 0L)
    val r = graft.Fs.scratch("graft_txn_catalog_wh") + "/cm_sql"
    val m = TxnTable.readManifest(r, TxnTable.latestVersion(r))
    assert(m.renames == Seq("v" -> "doubled") &&
      org.apache.spark.sql.types.StructType.fromDDL(m.schemaDdl)
        .fieldNames.contains("v"),
      "the rewrite must keep the physical identity + the mapping")
    // non-key DELETE through the mapping
    spark.sql("DELETE FROM graft.cm_sql WHERE doubled % 100 = 8")
    assert(spark.sql(
      "SELECT count(1) FROM graft.cm_sql WHERE doubled % 100 = 8")
      .head().getLong(0) == 0L)
  }

  test("rename back to the physical name collapses the mapping entry") {
    val (r, _) = mkTable("renameback")
    TxnTable.renameColumn(spark, r, "v", "value")
    assert(TxnTable.readManifest(r, 1).renames == Seq("v" -> "value"))
    // the round-10 advice case: b→a where a is the column's own
    // physical identity must be legal, not a self-collision
    val (v2, _) = TxnTable.renameColumn(spark, r, "value", "v")
    assert(TxnTable.readManifest(r, v2).renames.isEmpty,
      "a rename-back must collapse the mapping, not stack an alias")
    assert(TxnTable.readVersion(spark, r, v2).columns.toSeq ==
      Seq("k", "v", "w"))
    // other columns' names still collide
    intercept[Exception](TxnTable.renameColumn(spark, r, "v", "w"))
  }

  test("identity append lands under a column mapping") {
    val r = root("idmap")
    TxnTable.createEmpty(spark, r, "id BIGINT,v BIGINT,w BIGINT", "id",
      4, 10000L)
    import spark.implicits._
    TxnTable.appendWithIdentity(spark, r,
      Seq((10L, 1L), (20L, 2L)).toDF("v", "w"), "id", "pre")
    TxnTable.renameColumn(spark, r, "v", "value")
    // the round-10 advice case: the batch arrives under the LOGICAL
    // name; numbering and the final select must both run under the
    // PHYSICAL names the files carry
    val (_, _, first, n) = TxnTable.appendWithIdentity(spark, r,
      Seq((30L, 3L), (40L, 4L)).toDF("value", "w"), "id", "post")
    assert(first == 2L && n == 2L)
    val head = TxnTable.readVersion(spark, r, TxnTable.latestVersion(r))
    assert(head.columns.toSeq == Seq("id", "value", "w"))
    assert(head.orderBy("id").select("id", "value").collect().toSeq.map(x =>
      (x.getLong(0), x.getLong(1))) ==
      Seq((0L, 10L), (1L, 20L), (2L, 30L), (3L, 40L)))
  }

  test("identity ids stay gap-free over a non-deterministic upstream") {
    val r = root("idnondet")
    TxnTable.createEmpty(spark, r, "id BIGINT,v BIGINT", "id", 4, 10000L)
    // a rand()-valued, repartitioned batch: any silent recompute
    // between the count walk and the numbering walk would disagree —
    // the localCheckpoint pin makes both walks read the same blocks
    val batch = spark.range(500)
      .select((rand(seed = 0) * 1e9).cast("long").as("v"))
      .repartition(7)
      .where(col("v") % 2 === 0)
    val (_, _, first, n) = TxnTable.appendWithIdentity(spark, r,
      batch, "id", "nondet")
    val ids = TxnTable.readVersion(spark, r, TxnTable.latestVersion(r))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ids.length == n)
    assert(ids.headOption.contains(first) &&
      ids.lastOption.contains(first + n - 1) &&
      ids.distinct.length == ids.length,
      s"ids must be gap-free [$first, ${first + n}) — got ${ids.take(10).toSeq}...")
  }
}
