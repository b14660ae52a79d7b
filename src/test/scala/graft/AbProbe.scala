package graft

/** A/B config probe: times one query under combinations of AQE and
  * whole-stage codegen to attribute per-stage driver overhead (AQE
  * re-optimization vs codegen compilation vs task work). Test-scoped
  * tooling. Run: `sbt "Test/runMain graft.AbProbe q136_kmv_distinct
  * /root/testdata/sf0.1 3"`.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q136_kmv_distinct")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = core.Sessions.local(appName = s"ab-$name")
    val fn = SparkEntry.queries(name)
    val cgTime = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    val cgGen = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_SOURCE_CODE_SIZE
    def run(): (Double, Long, Long) = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val (c0, g0) = (cgTime.getCount, cgGen.getCount)
      val t0 = System.nanoTime()
      fn(spark, sf).count()
      ((System.nanoTime() - t0) / 1e9,
        cgTime.getCount - c0, cgGen.getCount - g0)
    }
    try fn(spark, sf).count(): Unit catch { case t: Throwable =>
      println(s"WARMUP THREW: $t") }
    for {
      aqe <- Seq("true", "false")
      wsc <- Seq("true", "false")
    } {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.codegen.wholeStage", wsc)
      val rs = (1 to reps).map(_ => run())
      val walls = rs.map(_._1)
      println(f"AB $name aqe=$aqe wsc=$wsc min=${walls.min}%.3f " +
        s"all=[${walls.map(w => f"$w%.2f").mkString(",")}] " +
        s"compiles=[${rs.map(_._2).mkString(",")}] " +
        s"gens=[${rs.map(_._3).mkString(",")}]")
    }
    spark.stop()
  }
}
