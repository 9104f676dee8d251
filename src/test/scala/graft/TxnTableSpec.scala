package graft

import graft.sources.TxnTable
import org.apache.spark.sql.functions._

/** The snapshot-log table format: atomic put-if-absent commits,
  * optimistic rebase under a planted race, immutable time travel, and
  * manifest-stat pruning soundness. */
class TxnTableSpec extends SparkSpec {

  private def root(name: String) = graft.Fs.scratch(s"graft_txnspec_$name")

  private def mkTable(name: String, n: Int = 1000, shards: Int = 8) = {
    val r = root(name)
    val df = spark.range(n).select(
      col("id").as("k"), (col("id") * 3 % 101).as("v"))
    TxnTable.create(spark, r, df, "k", shards)
    (r, df)
  }

  test("create + readVersion round-trips the frame exactly (no __shard leak)") {
    val (r, df) = mkTable("roundtrip")
    val back = TxnTable.readVersion(spark, r, 0)
    assert(back.columns.toSeq == Seq("k", "v"),
      s"partition-dir key leaked into the logical table: ${back.columns.mkString(",")}")
    assert(back.exceptAll(df).count() == 0 && df.exceptAll(back).count() == 0)
  }

  test("commit is put-if-absent: second writer of the same version loses") {
    val (r, _) = mkTable("putifabsent")
    val m = TxnTable.readManifest(r, 0)
    assert(!TxnTable.commit(r, 0, m), "version 0 must already be taken")
    assert(TxnTable.commit(r, 1, m.copy(version = 1)))
    assert(!TxnTable.commit(r, 1, m.copy(version = 1)))
    assert(TxnTable.latestVersion(r) == 1)
  }

  test("manifest JSON round-trips schema DDL with commas and NOT NULL") {
    val (r, _) = mkTable("manifest")
    val m = TxnTable.readManifest(r, 0)
    assert(m.version == 0 && m.keyCol == "k" && m.shards == 8)
    assert(m.schemaDdl.contains("k") && m.schemaDdl.contains("v") &&
      m.schemaDdl.contains(","), m.schemaDdl)
    assert(m.files.nonEmpty && m.files.forall(f => f.nRows > 0 && f.minK <= f.maxK))
    // files must carry DISJOINT contiguous key ranges under the pinned layout
    val sorted = m.files.sortBy(_.minK)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxK < b.minK, s"overlap: $a vs $b")
      case _ => ()
    }
    assert(sorted.map(_.nRows).sum == 1000)
  }

  test("transact rebases after a planted conflict and lands the serial result") {
    val (r, _) = mkTable("rebase")
    // sneak a competing commit in via the beforeCommit seam: the first
    // attempt must then lose its link race and retry against v1
    var sneaked = false
    val (v, conflicts) = TxnTable.transact(spark, r, "bump",
      snap => snap.withColumn("v", col("v") + 1),
      beforeCommit = () => if (!sneaked) {
        sneaked = true
        TxnTable.transact(spark, r, "sneak",
          snap => snap.withColumn("v", col("v") * 2))
      })
    assert(conflicts == 1, s"expected exactly one conflict, got $conflicts")
    assert(v == 2 && TxnTable.latestVersion(r) == 2)
    // serial result: sneak (×2) first, then bump (+1) rebased on top
    val got = TxnTable.readVersion(spark, r, 2)
      .agg(sum(col("v"))).head().getLong(0)
    val want = spark.range(1000)
      .select((col("id") * 3 % 101 * 2 + 1).as("v"))
      .agg(sum("v")).head().getLong(0)
    assert(got == want, s"lost update: $got != $want")
    // the loser's orphan attempt dir must be gone: data/ holds exactly
    // one attempt dir per committed version
    val dataDirs = new java.io.File(s"$r/data").listFiles().filter(_.isDirectory)
    assert(dataDirs.length == 3, dataDirs.map(_.getName).mkString(","))
  }

  test("time travel: historical versions read back unchanged after later commits") {
    val (r, df) = mkTable("timetravel")
    TxnTable.transact(spark, r, "del", snap => snap.where(col("k") % 2 === 0))
    TxnTable.transact(spark, r, "bump", snap => snap.withColumn("v", col("v") + 7))
    assert(TxnTable.readVersion(spark, r, 0).count() == 1000)
    assert(TxnTable.readVersion(spark, r, 0).exceptAll(df).count() == 0)
    assert(TxnTable.readVersion(spark, r, 1).count() == 500)
    val v2 = TxnTable.readVersion(spark, r, 2)
    assert(v2.count() == 500 &&
      v2.agg(min(col("v"))).head().getLong(0) >= 7L)
  }

  test("prunedRead opens a strict file subset and loses no matching row") {
    val (r, df) = mkTable("pruned", n = 4000, shards = 16)
    val (lo, hi) = (1000L, 1240L)
    val (pruned, nRead, nTotal) = TxnTable.prunedRead(spark, r, 0, lo, hi)
    assert(nRead < nTotal, s"no pruning: $nRead of $nTotal")
    val got = pruned.where(col("k").between(lo, hi))
      .agg(count(lit(1)), sum("k")).head()
    val want = df.where(col("k").between(lo, hi))
      .agg(count(lit(1)), sum("k")).head()
    assert(got == want, s"pruning dropped matches: $got vs $want")
    // completeness at the edges: a probe exactly on a file boundary
    val m = TxnTable.readManifest(r, 0)
    val edge = m.files.sortBy(_.minK).apply(1).minK
    val (pe, _, _) = TxnTable.prunedRead(spark, r, 0, edge, edge)
    assert(pe.where(col("k") === edge).count() == 1)
  }

  test("concurrent merge query: serial composition, one conflict, three versions") {
    val row = TxnTable.txnConcurrentMerge(spark, sfDir).head()
    assert(row.getAs[Long]("n_versions") == 3L)
    assert(row.getAs[Long]("n_conflicts") == 1L)
    val base = Tables.orders(spark, sfDir)
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")),
        sum(when(col("o_orderkey") % 7 === 0, 10L).otherwise(0L)),
        sum(when(col("o_orderkey") % 13 === 0, 5L).otherwise(0L))).head()
    assert(row.getAs[Long]("sum_cents") ==
      base.getLong(0) + base.getLong(1) + base.getLong(2))
  }
}
