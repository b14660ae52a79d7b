package graft.streaming

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.{StateFold, Temporal}

/** Randomized streaming-vs-batch differential fuzz.
  *
  * The SQL surface is fuzzed against DuckDB (`tools/fuzz_differential
  * .py`); the streaming family's oracle is the batch form of the same
  * operator — a genuinely different execution path (incremental keyed
  * state across micro-batches vs one whole-input plan). Each band
  * draws random data (small key domains, planted equal-timestamp
  * ties, duplicate deliveries), random operator parameters, and a
  * random micro-batch split, across fixed seeds, and asserts exact
  * agreement with the batch operator. Fixed-parameter equivalence
  * specs live beside each operator; this band exists to walk the
  * parameter × split space those specs pin only pointwise.
  */
class StreamingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val seeds = Seq(11, 42, 97)
  private val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime

  /** Random events over ~4 days; ts quantized to `tieGranMs` so equal
    * timestamps (the ordering edge case) actually occur.
    */
  private def genEvents(rnd: Random, n: Int, users: Int,
      types: Seq[String], tieGranMs: Long): Seq[Ev2] =
    (1 to n).map { i =>
      val off = rnd.nextLong(4L * 24 * 3600 * 1000) / tieGranMs * tieGranMs
      Ev2(i.toLong, new Timestamp(base + off),
        rnd.nextInt(users).toLong, types(rnd.nextInt(types.size)),
        math.round(rnd.nextDouble() * 1e4) / 1e2)
    }

  /** Split into micro-batches of random sizes in [1, maxBatch]. */
  private def randomSplits[A](rnd: Random, xs: Seq[A], maxBatch: Int): Seq[Seq[A]] = {
    val out = Seq.newBuilder[Seq[A]]
    var rest = xs
    while (rest.nonEmpty) {
      val k = 1 + rnd.nextInt(maxBatch)
      out += rest.take(k)
      rest = rest.drop(k)
    }
    out.result()
  }

  /** Drive a streaming frame built from a MemoryStream of Ev2 through
    * a memory sink and return the sink table.
    */
  private def runStream(name: String, batches: Seq[Seq[Ev2]],
      mode: OutputMode)(build: DataFrame => DataFrame): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev2]
    val q = build(input.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("fuzz: tumbling/sliding windows == batch, random lengths and splits") {
    // slide must be <= window length; draw the pair together
    val shapes = Seq(
      "2 hours" -> "30 minutes", "2 hours" -> "1 hour",
      "7 hours" -> "3 hours", "1 day" -> "6 hours")
    for (seed <- seeds) {
      val rnd = new Random(seed)
      val rows = genEvents(rnd, 400, 12, Seq("view", "click", "buy"), 60000L)
      val (len, slide) = shapes(rnd.nextInt(shapes.size))
      // time-ordered delivery (the T1 replay contract): with the
      // default watermark, cross-batch disorder would advance the
      // watermark past straggler events and drop them at ingestion —
      // real late-data behavior, but not the equivalence under test
      val batches = randomSplits(rnd, rows.sortBy(e => (e.ts.getTime, e.event_id)), 120)

      val streamedT = runStream(s"fz_tum_$seed", batches, OutputMode.Complete())(
        df => WindowedAgg.tumbling(df, len))
        .orderBy($"win", $"event_type").collect()
      val batchT = WindowedAgg.tumbling(rows.toDF(), len)
        .orderBy($"win", $"event_type").collect()
      assert(streamedT.length == batchT.length && batchT.nonEmpty,
        s"tumbling row count, seed=$seed len=$len")
      streamedT.zip(batchT).foreach { case (s, b) =>
        assert(s.getTimestamp(0) == b.getTimestamp(0) &&
          s.getString(1) == b.getString(1) && s.getLong(2) == b.getLong(2) &&
          math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9,
          s"tumbling mismatch seed=$seed len=$len: $s vs $b")
      }

      val streamedS = runStream(s"fz_sli_$seed", batches, OutputMode.Complete())(
        df => WindowedAgg.sliding(df, len, slide))
        .orderBy($"win", $"event_type").collect()
      val batchS = WindowedAgg.sliding(rows.toDF(), len, slide)
        .orderBy($"win", $"event_type").collect()
      assert(streamedS.length == batchS.length,
        s"sliding row count, seed=$seed len=$len slide=$slide")
      streamedS.zip(batchS).foreach { case (s, b) =>
        assert(s.getTimestamp(0) == b.getTimestamp(0) &&
          s.getString(1) == b.getString(1) && s.getLong(2) == b.getLong(2) &&
          math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9,
          s"sliding mismatch seed=$seed: $s vs $b")
      }
    }
  }

  test("fuzz: session windows == batch, random gaps and splits") {
    val gaps = Seq("10 minutes", "45 minutes", "3 hours")
    for (seed <- seeds) {
      val rnd = new Random(seed)
      // few users + coarse ties → sessions that actually merge
      val rows = genEvents(rnd, 350, 5, Seq("view", "click"), 300000L)
      val gap = gaps(rnd.nextInt(gaps.size))
      // time-ordered delivery — same watermark reasoning as above
      val batches = randomSplits(rnd, rows.sortBy(e => (e.ts.getTime, e.event_id)), 100)
      val cols = Seq($"session_start", $"session_end", $"user_id")
      val streamed = runStream(s"fz_ses_$seed", batches, OutputMode.Complete())(
        df => WindowedAgg.sessions(df, gap)).orderBy(cols: _*).collect()
      val batch = WindowedAgg.sessions(rows.toDF(), gap)
        .orderBy(cols: _*).collect()
      assert(streamed.length == batch.length && batch.nonEmpty,
        s"session count, seed=$seed gap=$gap")
      streamed.zip(batch).foreach { case (s, b) =>
        assert(s.getTimestamp(0) == b.getTimestamp(0) &&
          s.getTimestamp(1) == b.getTimestamp(1) &&
          s.getLong(2) == b.getLong(2) && s.getLong(3) == b.getLong(3) &&
          math.abs(s.getDouble(4) - b.getDouble(4)) < 1e-9,
          s"session mismatch seed=$seed gap=$gap: $s vs $b")
      }
    }
  }

  test("fuzz: keyed state fold == batch ordered fold, random splits with ties") {
    for (seed <- seeds) {
      val rnd = new Random(seed)
      val raw = genEvents(rnd, 300, 8, Seq("e"), 30000L)
      // event-time-ordered replay (T1 contract); ties broken by id —
      // the same order the batch oracle folds in
      val ordered = raw.sortBy(e => (e.ts.getTime, e.event_id))
      val batches = randomSplits(rnd, ordered, 80)
        .map(_.map(e => StreamingStateFold.Event(e.event_id, e.ts, e.user_id, e.value)))

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamingStateFold.Event]
      val q = StreamingStateFold(input.toDS())
        .writeStream.format("memory").queryName(s"fz_fold_$seed")
        .outputMode(OutputMode.Update()).start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      // Update mode emits one row per key per touched batch; n is
      // strictly increasing per key, so the final state is the
      // max-n emission (no reliance on sink row order)
      val streamed = spark.table(s"fz_fold_$seed")
        .groupBy($"user_id")
        .agg(max_by($"folded_avg", $"n").as("avg"),
          max($"n").as("n"))
        .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap

      val expected = ordered.groupBy(_.user_id).map { case (u, es) =>
        u -> ((StateFold.foldValues(es.map(_.value)), es.size.toLong))
      }
      assert(streamed.keySet == expected.keySet, s"fold keys, seed=$seed")
      expected.foreach { case (u, (avg, n)) =>
        val (sAvg, sN) = streamed(u)
        assert(sN == n && math.abs(sAvg - avg) < 1e-12,
          s"fold mismatch seed=$seed user=$u: ($sAvg,$sN) vs ($avg,$n)")
      }
    }
  }

  test("fuzz: stream dedup == batch distinct, random duplicate rates and splits") {
    for (seed <- seeds) {
      val rnd = new Random(seed)
      val uniq = genEvents(rnd, 250, 10, (1 to 40).map("tok" + _), 60000L)
      // re-deliver a random ~40% slice, shuffled in — both same-batch
      // and cross-batch duplicates occur
      val dups = rnd.shuffle(uniq).take(100)
      val rows = rnd.shuffle(uniq ++ dups)
      val batches = randomSplits(rnd, rows, 70)

      val byKey = runStream(s"fz_dk_$seed", batches, OutputMode.Append())(
        df => StreamDedup.byKey(df, "event_id", "ts", "30 days"))
      val ids = byKey.select($"event_id").as[Long].collect()
      assert(ids.length == ids.distinct.length, s"byKey re-emitted an id, seed=$seed")
      assert(ids.sorted.toSeq == uniq.map(_.event_id).sorted,
        s"byKey id set != distinct ids, seed=$seed")

      val byContent = runStream(s"fz_dc_$seed", batches, OutputMode.Append())(
        df => StreamDedup.byContent(df, "event_type", "ts", "30 days"))
      val batchDistinct = rows.toDF().select($"event_type").distinct().count()
      assert(byContent.select($"event_type").distinct().count() == batchDistinct &&
        byContent.count() == batchDistinct,
        s"byContent != batch distinct contents, seed=$seed")
    }
  }

  test("fuzz: stream-stream range join == batch join, random horizons") {
    for (seed <- seeds) {
      val rnd = new Random(seed)
      val horizonMin = 5 + rnd.nextInt(180)
      val evs = genEvents(rnd, 300, 6, Seq("anchor", "point"), 60000L)
      val anchors = evs.filter(_.event_type == "anchor")
        .map(e => FzAnchor(e.event_id, e.user_id, e.ts))
      val points = evs.filter(_.event_type == "point")
        .map(e => FzPoint(e.event_id, e.user_id, e.ts, e.value))
      val aBatches = randomSplits(rnd, anchors, 60)
      val pBatches = randomSplits(rnd, points, 60)

      implicit val sqlCtx = spark.sqlContext
      val aIn = MemoryStream[FzAnchor]
      val pIn = MemoryStream[FzPoint]
      val q = StreamRangeJoin.followUp(aIn.toDF(), pIn.toDF(), "user_id",
          "a_ts", "p_ts", s"$horizonMin MINUTES", "10 days")
        .writeStream.format("memory").queryName(s"fz_rj_$seed")
        .outputMode(OutputMode.Append()).start()
      // interleave the two sides batch by batch
      aBatches.map(Some(_)).zipAll(pBatches.map(Some(_)), None, None)
        .foreach { case (a, p) =>
          a.foreach(aIn.addData(_)); p.foreach(pIn.addData(_))
          q.processAllAvailable()
        }
      q.stop()
      val streamed = spark.table(s"fz_rj_$seed")
        .select($"a_id", $"p_id").as[(Long, Long)].collect().sorted.toSeq

      val batch = anchors.toDF().alias("a").join(points.toDF().alias("p"),
          col("a.user_id") === col("p.user_id") &&
            col("p_ts") > col("a_ts") &&
            col("p_ts") <= col("a_ts") + expr(s"INTERVAL $horizonMin MINUTES"))
        .select(col("a.a_id"), col("p.p_id")).as[(Long, Long)]
        .collect().sorted.toSeq
      assert(streamed == batch,
        s"range-join pairs differ, seed=$seed horizon=${horizonMin}m " +
          s"(stream ${streamed.size}, batch ${batch.size})")
    }
  }

  test("fuzz: stream funnel final stages == batch funnel, random stage triples") {
    val types = Seq("signup", "view", "click", "purchase")
    for (seed <- seeds) {
      val rnd = new Random(seed)
      val picks = rnd.shuffle(types).take(3)
      val (s1, s2, s3) = (picks(0), picks(1), picks(2))
      val rows = genEvents(rnd, 400, 10, types, 120000L)
      // per-user in-order delivery: split the time-ordered log
      val ordered = rows.sortBy(e => (e.ts.getTime, e.event_id))
      val batches = randomSplits(rnd, ordered, 90)
        .map(_.map(e => StreamFunnel.FEvent(e.user_id, e.event_type, e.ts, e.event_id)))

      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[StreamFunnel.FEvent]
      val q = StreamFunnel(input.toDS(), s1, s2, s3)
        .writeStream.format("memory").queryName(s"fz_fun_$seed")
        .outputMode(OutputMode.Append()).start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      val streamed = spark.table(s"fz_fun_$seed")
        .groupBy($"user_id")
        .agg(max($"stage").as("stage"), min($"ts").as("t1x"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      val batch = Temporal.funnel(rows.toDF(), s1, s2, s3)
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
      assert(streamed == batch,
        s"funnel stages differ, seed=$seed stages=($s1,$s2,$s3)")
    }
  }
}

/** Fuzz-band row shapes (top-level: MemoryStream needs stable encoders). */
case class Ev2(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)
case class FzAnchor(a_id: Long, user_id: Long, a_ts: Timestamp)
case class FzPoint(p_id: Long, user_id: Long, p_ts: Timestamp, value: Double)
