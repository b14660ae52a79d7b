package graft.core

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-side scratch directories for FIXTURE STORES — the temp
  * [[graft.store.VersionedTable]] roots the lifecycle queries build
  * (q170 retention, q173 rescrub, q174 forget).
  *
  * Why a seam instead of a bare `Files.createTempDirectory`: harnesses
  * that run MANY queries (graft.Plans) want every fixture store of one
  * run under a single run-scoped directory so the end-of-run sweep
  * deletes exactly this run's state. Mutating `java.io.tmpdir` at
  * runtime does NOT achieve that — the JDK caches the tmpdir path at
  * class initialization (r15 ADVICE), so the property write is
  * silently ignored. The directory must be plumbed EXPLICITLY: set
  * `spark.graft.fixtureStoreDir` and every fixture store lands under
  * it; unset, stores land in the default tmpdir as before.
  */
object Scratch {

  /** A fresh scratch directory with the given prefix, under
    * `spark.graft.fixtureStoreDir` when set (created if missing),
    * else the JVM default tmpdir.
    */
  def dir(spark: SparkSession, prefix: String): String =
    spark.conf.getOption("spark.graft.fixtureStoreDir") match {
      case Some(root) =>
        Files.createTempDirectory(
          Files.createDirectories(Paths.get(root)), prefix).toString
      case None => Files.createTempDirectory(prefix).toString
    }
}
