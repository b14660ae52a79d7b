package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Adversarial-scale check for the skew path (round-8 verdict #7): the
  * equality specs in LayoutSpec prove salting is CORRECT; this spec
  * proves it actually SPREADS — a planted 40% hot key must leave the
  * salted plan's busiest reduce task within 2× of the median task,
  * the property that decides whether a job survives a 100× scale-up
  * (one straggler reducer = the whole stage's wall clock).
  *
  * Task inputs are measured from the engine's own task metrics
  * (shuffle records read per task via a SparkListener), on the real
  * operator plans. Broadcast and AQE are pinned off inside the spec:
  * broadcast would dissolve the join shuffle entirely (the salted
  * join exists precisely for the dim-too-big-to-broadcast case), and
  * AQE's own skew mitigation would mask what the salting contributes.
  */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  /** 40% of rows on key 1, the rest uniform over `nKeys`. */
  private def skewedFact(n: Int, nKeys: Int): DataFrame =
    spark.range(n.toLong).selectExpr(
      "CASE WHEN id % 5 < 2 THEN 1 ELSE 1 + pmod(id, " + nKeys + ") END AS k",
      "cast(id as double) AS v")

  /** Shuffle records read per task, for the stage that read the most
    * shuffle rows during `action` (= the skew-sensitive reduce stage).
    */
  private def reduceTaskInputs(action: => Unit): Seq[Long] = {
    val rows = ArrayBuffer.empty[(Int, Long)]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) rows.synchronized {
          rows += ((te.stageId,
            te.taskMetrics.shuffleReadMetrics.recordsRead)): Unit
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      action
      // the listener bus is async (and private); wait until the task
      // stream drains — size stable for 300 ms, 5 s ceiling
      var last = -1
      var stableMs = 0
      while (stableMs < 300) {
        Thread.sleep(50)
        val now = rows.synchronized(rows.size)
        if (now == last) stableMs += 50
        else { stableMs = 0; last = now }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    val byStage = rows.synchronized(rows.toSeq).groupBy(_._1)
    byStage.maxBy(_._2.map(_._2).sum)._2.map(_._2)
  }

  private def withSkewConfs[A](body: => A): A = {
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // enough reduce tasks that a median is meaningful on local[4]
    val savedShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try body
    finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
      spark.conf.set("spark.sql.shuffle.partitions", savedShuffle)
    }
  }

  private def spreadRatio(inputs: Seq[Long]): Double = {
    val nonEmpty = inputs.sorted
    val median = nonEmpty(nonEmpty.size / 2).max(1L).toDouble
    nonEmpty.last / median
  }

  test("saltedJoin keeps the busiest task within 2x the median at a 40% hot key") {
    withSkewConfs {
      val fact = skewedFact(1000000, 500)
      val dim = spark.range(1L, 502L).selectExpr("id AS k", "concat('d', id) AS name")

      // the pathology, demonstrated on the same data: an unsalted
      // shuffle join funnels the hot key through ONE reduce task
      var tPlain = 0L
      val plain = reduceTaskInputs {
        val t0 = System.nanoTime()
        fact.join(dim, "k").count(): Unit
        tPlain = System.nanoTime() - t0
      }
      assert(spreadRatio(plain) > 2.0,
        s"fixture must actually be pathological; got ${plain.sorted}")

      // the salted plan spreads that same key across saltBuckets tasks
      var tSalted = 0L
      val salted = reduceTaskInputs {
        val t0 = System.nanoTime()
        Layout.saltedJoin(fact, dim, "k", saltBuckets = 16).count(): Unit
        tSalted = System.nanoTime() - t0
      }
      assert(spreadRatio(salted) <= 2.0,
        s"salted max/median must be <= 2; task inputs ${salted.sorted}")
      info(f"plain: max/median ${spreadRatio(plain)}%.1f, ${tPlain / 1e9}%.2f s; " +
        f"salted: max/median ${spreadRatio(salted)}%.1f, ${tSalted / 1e9}%.2f s")
    }
  }

  test("saltedSumCount keeps the busiest task within 2x the median at a 40% hot key") {
    withSkewConfs {
      val fact = skewedFact(200000, 500)
      val plain = reduceTaskInputs {
        fact.groupBy($"k").agg(org.apache.spark.sql.functions.sum($"v"))
          .count(): Unit
      }
      val salted = reduceTaskInputs {
        Layout.saltedSumCount(fact, "k", "v", saltBuckets = 16).count(): Unit
      }
      assert(spreadRatio(salted) <= 2.0,
        s"salted max/median must be <= 2; task inputs ${salted.sorted}")
      // note: plain group-by map-side combines, so its reduce inputs
      // are key-count-sized and may not look skewed at this scale —
      // no pathology assertion here; the salted bound is the contract
      info(s"plain agg task inputs: ${plain.sorted.mkString(",")}")
      info(s"salted agg task inputs: ${salted.sorted.mkString(",")}")
    }
  }

  test("kSuppress keeps the busiest task within 2x the median at a " +
      "40% hot quasi group (r14 verdict #1: quasi groups are large " +
      "BY DESIGN — the window plan buffered a whole group per task)") {
    // AQE off so its skew handling can't mask the plan's own shape;
    // the broadcast of the safe-group list is the OPERATOR's hint, so
    // autoBroadcastJoinThreshold stays off like the other legs
    withSkewConfs {
      val fact = skewedFact(400000, 500)
      val inputs = reduceTaskInputs {
        Privacy.kSuppress(fact, Seq("k"), k = 100L).count(): Unit
      }
      // the only shuffle is the group-count agg: map-side combine
      // bounds any task's input by (#map tasks x #groups-per-task),
      // independent of the hot group's row count
      assert(spreadRatio(inputs) <= 2.0,
        s"kSuppress max/median must be <= 2; task inputs ${inputs.sorted}")
      info(s"kSuppress agg task inputs: ${inputs.sorted.mkString(",")}")
    }
  }

  test("Mondrian cut stats keep the busiest task within 2x the " +
      "median on a wide banded domain with a 40% hot tick (r15 " +
      "verdict #1: the old per-leaf histogram window sorted every " +
      "distinct value of the round-1 single leaf in ONE task)") {
    withSkewConfs {
      import org.apache.spark.sql.functions._
      // one leaf (the round-1 regime), ~100k distinct ticks, 40% of
      // rows on one hot tick — the shape that funneled the whole
      // histogram through one window task before the two-level split
      val rows = spark.range(400000L).selectExpr(
        "'' AS _leaf",
        "CASE WHEN id % 5 < 2 THEN 1.0 ELSE " +
          "cast(1 + pmod(id * 2654435761, 100000) as double) END AS _v1")
        .withColumn("_t1", col("_v1").cast("long"))
      val inputs = reduceTaskInputs {
        Mondrian.dimCutStats(rows, 1, shift = 9,
          measureCol = col("_v1"), lEnforce = None).count(): Unit
      }
      assert(spreadRatio(inputs) <= 2.0,
        s"Mondrian stats max/median must be <= 2; " +
          s"task inputs ${inputs.sorted}")
      info(s"Mondrian stats task inputs: ${inputs.sorted.mkString(",")}")
    }
  }
}
