package graft

import java.nio.file.Files

import graft.core.Tables

/** Empty-input robustness sweep over the WHOLE query surface. At
  * warehouse scale, zero-row inputs are routine — an empty ingest day,
  * a filter that eliminates a partition, a cold-start table — and an
  * operator that throws on them takes the pipeline down. Every
  * `SparkEntry.queries` entry must ANALYZE and EXECUTE against
  * zero-row tables (canonical schemas), producing an empty-or-small
  * result, never an exception.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = Files.createTempDirectory("graft-empty-sf").toString
    Tables.canonicalSchemas.foreach { case (name, schema) =>
      spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
        .write.parquet(s"$dir/$name.parquet")
    }
    dir
  }

  test("every query survives zero-row tables") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, emptyDir).count(); None }
        catch { case t: Throwable =>
          Some(name -> t.toString.linesIterator.next().take(200)) }
    }
    assert(failures.isEmpty,
      failures.map { case (n, e) => s"$n: $e" }.mkString(
        s"${failures.size} queries throw on empty input:\n", "\n", ""))
  }
}
