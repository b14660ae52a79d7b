package graft

/** Decomposition probe for the lifecycle fixture queries (q170/q173/
  * q174): times a named `SparkEntry` query WITH and WITHOUT the
  * fixture-store snapshot+cleanup (`spark.graft.keepFixtureStores`),
  * so BASELINE.md can publish the cleanup constant separately from
  * the query's plan cost (r14 verdict What's-wrong #2 asked for
  * exactly this split). Test-scoped tooling, not product surface.
  *
  * Run: `sbt "Test/runMain graft.DecompProbe q170_retention_expire
  * /root/testdata/sf0.1 3"`. Prints one PROBE line: min-over-reps
  * wall with cleanup, without, and the difference. Sweeps the stores
  * the keep-mode reps leak before exiting.
  */
object DecompProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q170_retention_expire")
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = core.Sessions.local(appName = s"decomp-$name")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(): Unit =
      SparkEntry.queries(name)(spark, sf).collect(): Unit
    run() // warm-up: JIT + page cache, cleanup on
    spark.conf.set("spark.graft.keepFixtureStores", "true")
    val tKeep = (1 to reps).map(_ => time(run())).min
    spark.conf.unset("spark.graft.keepFixtureStores")
    val tFull = (1 to reps).map(_ => time(run())).min
    println(f"PROBE $name keep=$tKeep%.2f full=$tFull%.2f " +
      f"cleanup=${tFull - tKeep}%.2f (min over $reps reps, $sf)")
    // sweep the stores the keep-mode reps leaked (this probe's only)
    val tmp = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"))
    val s = java.nio.file.Files.list(tmp)
    try s.toArray.toSeq.map(_.asInstanceOf[java.nio.file.Path])
      .filter(p => Seq("graft-retention", "graft-rescrub",
        "graft-forget").exists(p.getFileName.toString.startsWith))
      .foreach { d =>
        val p = new org.apache.hadoop.fs.Path(d.toString)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true): Unit
      }
    finally s.close()
    spark.stop()
  }
}
