package graft
import java.nio.file.{Files, Path}

/** Serializes `SparkEntry.oracleSql` as the driver-shaped
  * `oracle_sql.json`. Shared by [[Verify]] (end-of-run dump) and
  * OracleTypeLintSpec (which lints the declared output types in DuckDB
  * without executing any query) so the two can never disagree on
  * escaping.
  */
object OracleJson {
  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness.
    */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def render(oracle: Map[String, String]): String =
    oracle.map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ",", "}")

  def dump(path: Path, oracle: Map[String, String] = SparkEntry.oracleSql): Unit =
    Files.writeString(path, render(oracle))
}
