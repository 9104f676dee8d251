package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._

/** qen unit surface: the admission walk over the manifest log —
  * version/files/bytes caps, composite limits, the at-least-one-version
  * progress guarantee, and the option parse. The end-to-end drain
  * (⌈N/cap⌉ batches + mid-backlog restart) is the graded
  * qen_stream_admission row. */
class TxnAdmissionSpec extends SparkSpec {

  // a 6-version log: create (v0, no files) + 5 appends of 1 file each
  // (each append lands exactly one shard file: all keys in one shard)
  private lazy val root: String = {
    val r = graft.Fs.scratch("graft_admission_spec")
    graft.Fs.deleteRecursively(r)
    TxnTable.createEmpty(spark, r, "k BIGINT, v BIGINT", "k", 1, 1000000L)
    (0 until 5).foreach { i =>
      TxnTable.append(spark, r,
        spark.range(i * 10, i * 10 + 10).select(col("id").as("k"),
          (col("id") * 2).as("v")), s"batch_$i")
    }
    r
  }

  private val all = ReadLimit.allAvailable()

  test("no backlog admits nothing; allAvailable admits the head") {
    val head = TxnTable.latestVersion(root)
    assert(TxnAdmission.admit(root, head, head, all, TxnAdmission.Caps.none) == head)
    assert(TxnAdmission.admit(root, -1, head, all, TxnAdmission.Caps.none) == head)
  }

  test("maxVersionsPerTrigger caps the range; the backlog drains in ceil(N/cap) steps") {
    val head = TxnTable.latestVersion(root) // 5
    val caps = TxnAdmission.Caps(Some(2), None, None)
    var from = -1
    var steps = 0
    while (from < head) {
      val end = TxnAdmission.admit(root, from, head, all, caps)
      assert(end > from && end - from <= 2, s"from=$from end=$end")
      from = end; steps += 1
    }
    assert(steps == 3, s"6-version backlog at cap 2 must drain in 3 steps, took $steps")
  }

  test("maxFiles limit accumulates per-version ADDS and stops before exceeding") {
    val head = TxnTable.latestVersion(root)
    // v0 adds 0 files, v1..v5 add 1 each; maxFiles(2) from -1 admits
    // v0+v1+v2 (2 files), next trigger v3+v4 (2 files), then v5
    val e1 = TxnAdmission.admit(root, -1, head, ReadLimit.maxFiles(2),
      TxnAdmission.Caps.none)
    assert(e1 == 2, s"expected v2, got $e1")
    val e2 = TxnAdmission.admit(root, e1, head, ReadLimit.maxFiles(2),
      TxnAdmission.Caps.none)
    assert(e2 == 4, s"expected v4, got $e2")
    val e3 = TxnAdmission.admit(root, e2, head, ReadLimit.maxFiles(2),
      TxnAdmission.Caps.none)
    assert(e3 == 5)
  }

  test("a single version larger than the cap still admits alone (progress)") {
    val head = TxnTable.latestVersion(root)
    // one-file versions vs a zero-ish byte cap: each trigger admits
    // exactly one version that exceeds the cap, never wedging
    val e1 = TxnAdmission.admit(root, 0, head, ReadLimit.maxBytes(1L),
      TxnAdmission.Caps.none)
    assert(e1 == 1, s"first over-cap version must admit alone, got $e1")
    val e2 = TxnAdmission.admit(root, e1, head, ReadLimit.maxBytes(1L),
      TxnAdmission.Caps.none)
    assert(e2 == 2)
  }

  test("composite limit takes the tightest; version cap composes with engine limit") {
    val head = TxnTable.latestVersion(root)
    val comp = ReadLimit.compositeLimit(Array(
      ReadLimit.maxFiles(100), ReadLimit.maxFiles(1)))
    // tightest (1 file) wins: from v0 the first file lands at v1
    assert(TxnAdmission.admit(root, 0, head, comp, TxnAdmission.Caps.none) == 1)
    // the source's own version cap applies inside the engine limit
    assert(TxnAdmission.admit(root, -1, head, ReadLimit.maxFiles(100),
      TxnAdmission.Caps(Some(3), None, None)) == 2)
  }

  test("bytes accumulate real manifest bytes") {
    val head = TxnTable.latestVersion(root)
    def bytesOf(v: Int) = TxnAdmission.addsOf(root, v).map(_.bytes).sum
    assert(bytesOf(1) > 0, "appends must record file bytes in the manifest")
    // a cap of exactly v1+v2's bytes admits v0(0 bytes)+v1+v2 and
    // stops before v3 (whose bytes would exceed it)
    val e = TxnAdmission.admit(root, -1, head,
      ReadLimit.maxBytes(bytesOf(1) + bytesOf(2)), TxnAdmission.Caps.none)
    assert(e == 2, s"exact two-file byte budget must end at v2, got $e")
  }

  test("option parse: positive integers only, loud refusal otherwise") {
    val c = TxnAdmission.Caps.from(Map(
      "maxVersionsPerTrigger" -> "4", "maxBytesPerTrigger" -> "1048576").get)
    assert(c.maxVersions.contains(4) && c.maxBytes.contains(1048576L)
      && c.maxFiles.isEmpty)
    intercept[Exception] {
      TxnAdmission.Caps.from(Map("maxVersionsPerTrigger" -> "0").get)
    }
    val e = intercept[Exception] {
      TxnAdmission.Caps.from(Map("maxFilesPerTrigger" -> "lots").get)
    }
    assert(e.getMessage.contains("maxFilesPerTrigger"))
  }

  test("default limit: none = allAvailable; files+bytes = composite") {
    assert(TxnAdmission.Caps.none.defaultLimit ==
      ReadLimit.allAvailable())
    val d = TxnAdmission.Caps(None, Some(3), Some(100L)).defaultLimit
    assert(d.isInstanceOf[
      org.apache.spark.sql.connector.read.streaming.CompositeReadLimit])
  }
}
