package graft

import java.nio.file.{Files, Paths}

import graft.core.Tables

/** Batch SQL executor for the differential fuzz harness
  * (tools/fuzz_differential.py): reads a JSON object {name: sql} of
  * ANSI queries, runs each with spark.sql over the registered driver
  * tables, writes each result to outDir/<name>/ as parquet. One JVM
  * for the whole corpus.
  *
  * Usage: runMain graft.SqlRunner <sfDir> <queriesJson> <outDir>
  */
object SqlRunner {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, queriesJson, outDir) = args
    val spark = core.Sessions.local(appName = "graft-sqlrunner")
    Tables.registerAll(spark, sfDir)
    Files.createDirectories(Paths.get(outDir)): Unit
    // minimal JSON object parser for {"name": "sql", ...} — values may
    // contain escaped quotes/newlines
    val raw = Files.readString(Paths.get(queriesJson))
    val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    def unesc(s: String): String = s
      .replace("\\n", "\n").replace("\\t", "\t")
      .replace("\\\"", "\"").replace("\\\\", "\\")
    var nOk = 0
    var nFail = 0
    entry.findAllMatchIn(raw).foreach { m =>
      val name = unesc(m.group(1))
      val sql = unesc(m.group(2))
      try {
        spark.sql(sql).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        nOk += 1
      } catch {
        case e: Throwable =>
          nFail += 1
          System.err.println(s"[sqlrunner] $name failed: ${e.getMessage.linesIterator.next()}")
      }
    }
    println(s"[sqlrunner] $nOk ok, $nFail failed")
    spark.stop()
  }
}
