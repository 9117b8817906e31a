package graft.tools

import java.nio.file.{Files, Paths}

/** Scratch tool: dump one oracle SQL from SparkEntry.oracleSql to a file so
  * it can be timed in DuckDB in isolation (the r4 MST oracle outage showed
  * why: a single pathological oracle can zero the round's gate).
  * Usage: runMain graft.tools.DumpSql <queryName> <outFile>
  */
object DumpSql {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val out = args(1)
    val sql = graft.SparkEntry.oracleSql.getOrElse(name,
      sys.error(s"no oracle for $name"))
    Files.write(Paths.get(out), sql.getBytes("UTF-8"))
    println(s"[dumpsql] $name -> $out (${sql.length} chars)")
  }
}
