package graft.util

import java.nio.file.{Files, Paths}

/** Shared JSON plumbing for the two artifact mains (Verify, Bench):
  * both must dump the registry's oracle SQL for the DuckDB side of
  * their gate, and the escape rules must agree or a tab in builder-
  * authored SQL silently zeroes a round's correctness (see Verify). */
object JsonOut {

  /** JSON string escape: backslash, quote, and ALL control chars
    * (<0x20) — a tab or CR in builder-authored SQL would otherwise
    * make the driver's json.load fail. */
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Writes `<dir>/oracle_sql.json` from SparkEntry.oracleSql — the
    * exact file tools/bench_baseline.py and the driver's DuckDB
    * compare both read. */
  def dumpOracleSql(dir: String): Unit = {
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ",", "}")
    Files.createDirectories(Paths.get(dir))
    Files.writeString(Paths.get(s"$dir/oracle_sql.json"), json)
  }
}
