package graft

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Queries run in sorted
  * name order after a warm-up pass of the first query, so JVM/codegen
  * warm-up doesn't land on an arbitrary (hash-ordered) victim and
  * per-query numbers are comparable across rounds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(appName = "graft-bench")
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // warm-up: JIT + codegen + parquet footer caches
    ordered.headOption.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(): Unit } catch { case _: Throwable => }
    }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count(): Unit } catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
