package graft

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Queries run in sorted
  * name order after a warm-up pass of the first query, so JVM/codegen
  * warm-up doesn't land on an arbitrary (hash-ordered) victim and
  * per-query numbers are comparable across rounds.
  *
  * A query that THROWS publishes an `"err"` entry — never a duration.
  * Round 7 proved why: six analysis-broken queries published as
  * 0.06–0.16 s "speedups" because the old bench swallowed the throw and
  * timed the exception path. `err_count` in the JSON head makes a
  * partial run impossible to misread as a clean one.
  *
  * Per-query `task_secs` / `gc_secs` (round 10): summed executor task
  * run time and task JVM-GC time from a SparkListener, published for
  * the same rep the wall number comes from. The cal probes run
  * BETWEEN reps and cannot attribute a stall INSIDE one (the q41-r9
  * ambiguity, judged suite-context noise only after an isolated
  * re-run); with task time next to wall time the artifact
  * self-adjudicates — wall ≫ task/cores says "host contention or
  * scheduling stall", task-time itself inflated says "the plan
  * changed". GC inflated says block-manager/heap churn.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(appName = "graft-bench")
    // iteration aid: SPARK_GRAFT_ONLY=q54_lm_score,q28_… times a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // per-query executor accounting: task run time + JVM GC summed
    // over task-end events; drained (listener bus flush) before each
    // delta read so a rep's tail events can't leak into the next rep
    val taskMsAcc = new java.util.concurrent.atomic.AtomicLong
    val gcMsAcc = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) {
            taskMsAcc.addAndGet(m.executorRunTime)
            gcMsAcc.addAndGet(m.jvmGCTime): Unit
          }
        }
      })
    def metricsSnapshot(): (Long, Long) = {
      org.apache.spark.graft.Listeners.drain(spark.sparkContext)
      (taskMsAcc.get(), gcMsAcc.get())
    }
    // warm-up: JIT + codegen + parquet footer caches (a throw here is
    // fine — the same query will report its err in the timed pass)
    ordered.headOption.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(): Unit } catch { case _: Throwable => }
    }
    // drop blocks a query pinned (cache / Pin strategy) so 116
    // queries don't accumulate into block-manager eviction + GC
    // thrash that poisons every later timing
    def dropPinnedBlocks(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      // broadcast blocks (joined relations + task binaries) are only
      // reaped when the ContextCleaner's weak references fire — with a
      // big, mostly-idle heap that never GCs on its own, ~150 query
      // executions of pile-up fills the storage region and the later
      // broadcast-join queries crawl; one explicit GC per query keeps
      // the cleaner current
      System.gc()
    }
    def errString(t: Throwable): String = {
      val msg = Option(t.getMessage).getOrElse("").linesIterator
        .find(_.trim.nonEmpty).getOrElse("").take(160)
      s"${t.getClass.getSimpleName}: $msg"
    }
    // PER-QUERY host-noise probe (~50 ms single-thread integer loop on
    // an idle core, 1/10th of the end-of-run cal_sec workload): one
    // run-wide cal cannot attribute a mid-suite stall to the queries it
    // actually hit (this ambiguity is what made q41-r7 and q76-r8
    // adjudications expensive). A probe runs adjacent to every rep;
    // the published per-query `cals` value is the WORST adjacent probe
    // — elevated exactly for the queries whose reps a host stall
    // overlapped, ~0.05 everywhere else. Raw probes go to the sidecar.
    var calSink = 0L
    def calProbe(): Double = {
      val t0 = System.nanoTime()
      var acc = 0L
      var i = 0L
      while (i < 200000000L) { acc += i & 7L; i += 1 }
      calSink ^= acc // defeat dead-code elimination
      (System.nanoTime() - t0) / 1e9
    }
    val calsByQuery = scala.collection.mutable.LinkedHashMap
      .empty[String, List[Double]]
    // Left(err) = the query threw (deterministic analysis/planning
    // failures dominate; no retry — a throw on ANY rep marks the query
    // failed, because a half-failing query has no honest duration).
    // A rep is (wall, taskSec, gcSec): executor task time and GC are
    // deltas of the listener counters across the rep, bus-drained so
    // they cover exactly this rep's tasks.
    val outcomes: Seq[(String, Either[String, Seq[(Double, Double, Double)]])] =
      ordered.map { case (name, fn) =>
        def once(): Either[String, (Double, Double, Double)] = {
          val (task0, gc0) = metricsSnapshot()
          val t0 = System.nanoTime()
          val res =
            try { fn(spark, sfDir).count(); Right(()) }
            catch { case t: Throwable => Left(errString(t)) }
          val dt = (System.nanoTime() - t0) / 1e9
          val (task1, gc1) = metricsSnapshot()
          dropPinnedBlocks()
          calsByQuery.updateWith(name)(old =>
            Some(calProbe() :: old.getOrElse(Nil)))
          res.map(_ => (dt, (task1 - task0) / 1e3, (gc1 - gc0) / 1e3))
        }
        // two reps, both recorded; the headline number is the min: the
        // host is a shared VM with transient multi-second stalls that
        // land on arbitrary queries during a long run, and the min is
        // the undisturbed cost (verified: every "slow" full-run query
        // is fast when re-timed in isolation). Raw reps go to the
        // sidecar so the noise-rejection claim is auditable per query.
        // NOISE GUARD: when the two reps disagree by >3× at least one
        // was hit by a host stall — rerun (up to 3 extra) until two
        // reps agree within 3× or the budget runs out, so no published
        // per-query number rests on a single undisturbed sample.
        val rs =
          scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double)]
        var err: Option[String] = None
        def run(): Unit = if (err.isEmpty) once() match {
          case Left(e)  => err = Some(e)
          case Right(d) => rs += d
        }
        run(); run()
        // "settled" = the two FASTEST reps agree within 3×: the min is
        // then corroborated, not a lone sample between two stalls
        def settled = rs.size >= 2 && {
          val s = rs.map(_._1).sorted; s(1) <= s(0) * 3.0
        }
        var extra = 0
        while (err.isEmpty && !settled && extra < 3) { run(); extra += 1 }
        name -> err.toLeft(rs.toSeq)
      }
    // the published wall, task and GC numbers all come from the SAME
    // rep (the min-wall one), so task_secs explains queries, not reps
    val results = outcomes.collect { case (n, Right(rs)) => n -> rs.minBy(_._1) }
    val errors = outcomes.collect { case (n, Left(e)) => n -> e }
    // stdout line stays compact (ms precision): the driver captures a
    // bounded tail of this stream, and a full-precision 93-query JSON
    // line overflowed it in round 4 (artifact truncated mid-object)
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jstr(s: String): String = graft.core.Json.str(s)
    val qs = (results.map { case (k, v) => "\"" + k + "\":" + r3(v._1) } ++
      errors.map { case (k, e) => "\"" + k + "\":{\"err\":" + jstr(e) + "}" })
      .mkString("{", ",", "}")
    val taskSecs = results.map { case (k, v) => "\"" + k + "\":" + r3(v._2) }
      .mkString("{", ",", "}")
    val gcSecs = results.map { case (k, v) => "\"" + k + "\":" + r3(v._3) }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    // per-query cal: worst probe adjacent to this query's reps (idle
    // ≈ 0.05 s) — localizes a host stall to the queries it overlapped
    val cals = calsByQuery.map { case (k, ps) =>
      "\"" + k + "\":" + r3(ps.max)
    }.mkString("{", ",", "}")
    // sidecar: full-precision raw reps (each [wall, task, gc]) + raw
    // probes for noise auditing
    val repsJson = (outcomes.map {
      case (k, Right(rs)) => "\"" + k + "\":[" + rs.map { case (w, t, g) =>
        s"[$w,$t,$g]" }.mkString(",") + "]"
      case (k, Left(e))   => "\"" + k + "\":{\"err\":" + jstr(e) + "}"
    } ++ calsByQuery.map { case (k, ps) =>
      "\"cal:" + k + "\":[" + ps.reverse.mkString(",") + "]"
    }).mkString("{", ",", "}")
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_REPS.json"),
        (repsJson + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () } // sidecar is best-effort
    // host-noise calibration: a fixed single-thread integer workload
    // (~0.5 s on an idle core). The shared VM intermittently stalls
    // 5-10×; cal_sec lets a reader separate "engine got slower" from
    // "host was busy" when comparing rounds.
    val calT0 = System.nanoTime()
    var calAcc = 0L
    var calI = 0L
    while (calI < 2000000000L) { calAcc += calI & 7L; calI += 1 }
    val cal = (System.nanoTime() - calT0) / 1e9
    if (calAcc == Long.MinValue || calSink == Long.MinValue)
      println("") // defeat dead-code elim
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","err_count":${errors.size},"queries":$qs,"task_secs":$taskSecs,"gc_secs":$gcSecs,"cals":$cals,"cal_sec":${r3(cal)},"sf":"$sfDir"}""")
    spark.stop()
    // a bench with failing queries must not hand the driver rc=0
    if (errors.nonEmpty) sys.exit(1)
  }
}
