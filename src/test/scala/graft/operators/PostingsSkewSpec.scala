package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Skew stress for the POSTINGS family (VERDICT r11 #7): the
  * shingle/term-keyed joins are the engine's most shuffle-heavy ops
  * and their skew behavior was argued (df-cut), not measured. Same
  * task-metric method as [[SkewStressSpec]] — shuffle records read
  * per task under a planted hot key, on the REAL operator plans —
  * but asserted over EVERY material reduce stage of the job (the
  * straggler lives in the sh-keyed join stage, which is far from the
  * largest stage by total rows, so a biggest-stage heuristic would
  * miss it). Claims:
  *
  *  1. q147 sharedSpans: the sh-keyed postings SELF-join is the one
  *     genuinely quadratic exchange; the df-cut drops a boilerplate
  *     shingle BEFORE the join, and with it the straggler task. The
  *     uncut plan on the same data is demonstrably pathological.
  *  2. q103 BM25: a stop term in 40% of documents skews NO stage of
  *     the production plan, structurally: query terms broadcast into
  *     the postings scan (no th-keyed exchange at all), the score
  *     agg is keyed (query_id, doc_id) — a hot TERM's contributions
  *     spread over its DOCS — and the df agg map-side combines.
  *  3. q102 span excision: the hot shingle's occurrence rows reach
  *     reduce stages keyed by sh only through the map-combined count
  *     agg (O(distinct-sh) inputs) and otherwise group by doc_id.
  */
class PostingsSkewSpec extends SparkSpec {
  import spark.implicits._

  /** 40% of docs start with a repeated hot token run (6 hot shingles
    * per doc at n=3); remaining text is doc-unique so every other
    * shingle has df 1.
    */
  private def hotCorpus(nDocs: Int): DataFrame =
    (0 until nDocs).map { i =>
      val uniq = (0 until 12).map(j => s"u${i}_$j").mkString(" ")
      val text = if (i % 5 < 2) ("hot " * 8).trim + " " + uniq else uniq
      (i.toLong, text)
    }.toDF("doc_id", "text")

  /** Shuffle records read per task, per stage, for stages totalling
    * ≥ `floor` rows (tiny tail stages — final single-row aggs, count
    * collects — are all-in-one-task by nature and carry no skew
    * signal).
    */
  private def stageTaskInputs(floor: Long)(action: => Unit): Seq[Seq[Long]] = {
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
      var last = -1
      var stableMs = 0
      while (stableMs < 300) {
        Thread.sleep(50)
        val now = rows.synchronized(rows.size)
        if (now == last) stableMs += 50
        else { stableMs = 0; last = now }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    rows.synchronized(rows.toSeq).groupBy(_._1).values
      .map(_.map(_._2))
      .filter(_.sum >= floor)
      .toSeq
  }

  private def spreadRatio(inputs: Seq[Long]): Double = {
    val sorted = inputs.sorted
    sorted.last / sorted(sorted.size / 2).max(1L).toDouble
  }

  private def worstRatio(stages: Seq[Seq[Long]]): Double =
    stages.map(spreadRatio).foldLeft(1.0)(math.max)

  /** Production broadcast hints stay; only partition count is pinned
    * so a 16-task median is meaningful, and AQE off so its own skew
    * splitting can't mask the operator's shape.
    */
  private def withMeasuredConfs[A](extra: (String, String)*)(body: => A): A = {
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled") ++ extra.map(_._1)
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    extra.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q147 sharedSpans: the df-cut removes the hot-shingle straggler " +
      "the uncut self-join demonstrably has") {
    // broadcast off: the df-cut semi-filter and self-join must show
    // their shuffle shape (a broadcast would hide the uncut pathology
    // at this toy scale; at corpus scale nothing broadcasts)
    withMeasuredConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val docs = hotCorpus(1000).localCheckpoint(true)
      val uncut = stageTaskInputs(5000L) {
        NearDup.sharedSpans(docs, n = 3, maxDf = Long.MaxValue).count(): Unit
      }
      assert(worstRatio(uncut) > 2.0,
        s"fixture must be pathological uncut; got " +
          uncut.map(s => spreadRatio(s)).sorted.mkString(","))
      val cut = stageTaskInputs(5000L) {
        NearDup.sharedSpans(docs, n = 3, maxDf = 50L).count(): Unit
      }
      assert(worstRatio(cut) <= 2.0,
        s"df-cut max/median must be <= 2 in EVERY material stage; " +
          s"per-stage inputs ${cut.map(_.sorted).mkString(" | ")}")
      info(f"uncut worst max/median ${worstRatio(uncut)}%.1f; " +
        f"cut worst max/median ${worstRatio(cut)}%.1f")
    }
  }

  test("q103 BM25: a 40%-df stop term in the query skews no stage of " +
      "the production plan (broadcast term probe + doc-spread score agg)") {
    withMeasuredConfs() {
      val docs = hotCorpus(4000).localCheckpoint(true)
      // queries: 8 probes, each including the hot term + own tokens
      val queries = (0 until 8).flatMap { q =>
        Seq((q.toLong * 1000 + 999999, NearDup.tokenHash64("hot"))) ++
          (0 until 3).map(j =>
            (q.toLong * 1000 + 999999, NearDup.tokenHash64(s"u${q * 7}_$j")))
      }.toDF("query_id", "th").localCheckpoint(true)
      val stages = stageTaskInputs(5000L) {
        Retrieval.bm25TopK(docs, queries, k = 5).count(): Unit
      }
      assert(worstRatio(stages) <= 2.0,
        s"bm25 max/median must be <= 2 in EVERY material stage; " +
          s"per-stage inputs ${stages.map(_.sorted).mkString(" | ")}")
      info(f"bm25 worst max/median ${worstRatio(stages)}%.2f over " +
        s"${stages.size} material stages")
    }
  }

  test("q102 span dedup: a hot shingle skews no material stage of the " +
      "excise plan") {
    withMeasuredConfs() {
      val docs = hotCorpus(4000).localCheckpoint(true)
      val stages = stageTaskInputs(5000L) {
        SpanDedup.excise(docs, n = 3, minCount = 2L).count(): Unit
      }
      assert(worstRatio(stages) <= 2.0,
        s"excise max/median must be <= 2 in EVERY material stage; " +
          s"per-stage inputs ${stages.map(_.sorted).mkString(" | ")}")
      info(f"excise worst max/median ${worstRatio(stages)}%.2f over " +
        s"${stages.size} material stages")
    }
  }
}
