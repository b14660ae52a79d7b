package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Wall-time decomposition probe for the optimization round: runs
  * named `SparkEntry` queries in isolation and splits each rep's wall
  * into driver-side plan work (analysis/optimization/physical
  * planning, from the QueryExecution tracker) versus cluster work
  * (job/stage/task counts + summed task time from a listener). The
  * bench publishes wall and task_secs; this adds the missing middle —
  * HOW MANY jobs a query launches and how much of the wall is
  * scheduling/planning rather than compute. Test-scoped tooling, not
  * product surface.
  *
  * Run: `sbt "Test/runMain graft.PerfProbe q136_kmv_distinct,q180_mondrian
  * /root/testdata/sf0.1 2"`.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q136_kmv_distinct")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sf = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = core.Sessions.local(appName = "perf-probe")
    val stageCost = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet(): Unit
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = e.stageInfo
        val ms = si.taskMetrics.executorRunTime
        if (ms > 0) {
          val site = si.details.linesIterator
            .find(l => l.contains("graft") && !l.contains("PerfProbe"))
            .getOrElse(si.name).trim.take(90)
          stageCost.merge(s"${si.name.takeWhile(_ != ' ')} @ $site",
            java.lang.Long.valueOf(ms),
            (a: java.lang.Long, b: java.lang.Long) =>
              java.lang.Long.valueOf(a + b)): Unit
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) taskMs.addAndGet(m.executorRunTime): Unit
      }
    })
    def drain(): Unit = org.apache.spark.graft.Listeners.drain(spark.sparkContext)
    // planning-phase accounting for every EXECUTED query (the count()
    // action plans its own QueryExecution — df.queryExecution on the
    // built frame only ever shows analysis)
    val phaseMs = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]
    val execN = new java.util.concurrent.atomic.AtomicLong
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          execN.incrementAndGet()
          qe.tracker.phases.foreach { case (k, v) =>
            phaseMs.computeIfAbsent(k,
              _ => new java.util.concurrent.atomic.AtomicLong)
              .addAndGet(v.endTimeMs - v.startTimeMs): Unit
          }
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    def phaseSnap(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      phaseMs.asScala.map { case (k, v) => k -> v.get }.toMap
    }
    // warm-up on the first query (JIT, codegen, parquet footers)
    try SparkEntry.queries(names.head)(spark, sf).count(): Unit
    catch { case t: Throwable => println(s"WARMUP THREW: $t") }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val best = mutable.ArrayBuffer.empty[String]
      var minWall = Double.MaxValue
      (1 to reps).foreach { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        System.gc()
        drain()
        val (j0, s0, t0c, tm0) = (jobs.get, stages.get, tasks.get, taskMs.get)
        val ph0 = phaseSnap()
        val e0 = execN.get
        val t0 = System.nanoTime()
        val df = fn(spark, sf)
        val tBuild = (System.nanoTime() - t0) / 1e9
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        drain()
        Thread.sleep(50) // QueryExecutionListener fires async
        val ph = phaseSnap().map { case (k, v) =>
          f"$k=${(v - ph0.getOrElse(k, 0L)) / 1e3}%.2f"
        }.toSeq.sorted.mkString(" ") + s" execs=${execN.get - e0}"
        val line = f"PROBE $name wall=$wall%.3f build=$tBuild%.3f " +
          f"jobs=${jobs.get - j0} stages=${stages.get - s0} " +
          f"tasks=${tasks.get - t0c} task_secs=${(taskMs.get - tm0) / 1e3}%.2f " +
          s"finalPhases[$ph]"
        if (wall < minWall) { minWall = wall; best.clear(); best += line }
        println(line)
      }
      println("BEST " + best.mkString)
      import scala.jdk.CollectionConverters._
      stageCost.asScala.toSeq.sortBy(-_._2).take(12).foreach {
        case (s, ms) => println(f"  STAGE ${ms / 1e3}%8.2fs  $s")
      }
      stageCost.clear()
    }
    spark.stop()
  }
}
