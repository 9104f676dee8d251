package graft

import java.nio.file.Files

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Driver-faithfulness gate for the oracle SQL surface (round-6 verdict
  * item 2). The local replica (`tools/oracle_check.py`) reads DuckDB rows
  * via `fetchall()`, where Python collapses every integer type to `int` —
  * so an oracle emitting a HUGEINT output column (uncast integer `sum()`,
  * `sum() OVER ()`, `//`) passes the local value compare while failing the
  * driver's canonicalization. Round 6 shipped four red rows that way.
  *
  * This spec dumps `SparkEntry.oracleSql` via the same serializer Verify
  * uses and runs `tools/oracle_lint.py`, which DESCRIBEs every oracle in
  * DuckDB (bind + plan only, no execution) and fails on any
  * HUGEINT/UHUGEINT/DECIMAL output column. A planted-violation self-test
  * proves the lint actually sees what fetchall() cannot.
  *
  * Gated: cancels when python3+duckdb are unavailable (the lint is
  * driver-side tooling; the library itself never depends on it).
  */
class OracleTypeLintSpec extends AnyFunSuite {
  private lazy val duckdbAvailable: Boolean =
    scala.util.Try(
      Seq("python3", "-c", "import duckdb").!(ProcessLogger(_ => ())) == 0
    ).getOrElse(false)

  private val repoRoot = sys.props.getOrElse("user.dir", ".")
  private val lintPy = s"$repoRoot/tools/oracle_lint.py"
  private val sfDir = SparkSpec.sfDir

  test("planted-HUGEINT self-test: the lint catches the round-6 bug shapes") {
    assume(duckdbAvailable, "python3+duckdb not available in this environment")
    val out = new StringBuilder
    val code = Seq("python3", lintPy, "--self-test", sfDir)
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(code == 0, s"lint self-test failed:\n$out")
    assert(out.toString.contains("SELF-TEST PASS"), out.toString)
  }

  test("every registered oracle declares driver-safe output types") {
    assume(duckdbAvailable, "python3+duckdb not available in this environment")
    val tmp = Files.createTempFile("oracle_sql", ".json")
    try {
      OracleJson.dump(tmp)
      val out = new StringBuilder
      val code = Seq("python3", lintPy, sfDir, tmp.toString)
        .!(ProcessLogger(l => out.append(l).append('\n')))
      assert(code == 0,
        s"oracle output-type lint flagged driver-divergent columns:\n$out")
    } finally Files.delete(tmp)
  }
}
