package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.RangeJoin

case class Anchor(order_id: Long, user_id: Long, a_ts: Timestamp)
case class Point(p_event: Long, user_id: Long, p_ts: Timestamp, value: Double)

class StreamRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private val anchors = Seq(
    Anchor(100L, 1L, t("2024-01-01 10:00:00")),
    Anchor(101L, 2L, t("2024-01-01 11:00:00")),
  )
  private val points = Seq(
    Point(1L, 1L, t("2024-01-01 10:00:00"), 1.0), // at anchor — excluded (strict >)
    Point(2L, 1L, t("2024-01-01 10:30:00"), 2.0), // inside
    Point(3L, 1L, t("2024-01-01 11:00:00"), 3.0), // boundary — included (<=)
    Point(4L, 1L, t("2024-01-01 11:00:01"), 4.0), // past horizon
    Point(5L, 2L, t("2024-01-01 11:20:00"), 5.0), // inside, other key
    Point(6L, 9L, t("2024-01-01 10:10:00"), 6.0), // no anchor for key
  )
  private val expected = Set((100L, 2L), (100L, 3L), (101L, 5L))

  test("stream-stream follow-up join matches exactly the in-horizon pairs") {
    implicit val sqlCtx = spark.sqlContext
    val ain = MemoryStream[Anchor]
    val pin = MemoryStream[Point]
    val joined = StreamRangeJoin.followUp(ain.toDF(), pin.toDF(),
      "user_id", "a_ts", "p_ts", horizon = "1 HOUR", delay = "10 MINUTES")
    val q = joined.select($"order_id", $"p_event")
      .writeStream.format("memory").queryName("srj_out").start()
    // interleave arrivals across micro-batches, points before anchors too
    pin.addData(points(0), points(1)); q.processAllAvailable()
    ain.addData(anchors(0)); q.processAllAvailable()
    pin.addData(points(2), points(3), points(5)); q.processAllAvailable()
    ain.addData(anchors(1)); q.processAllAvailable()
    pin.addData(points(4)); q.processAllAvailable()
    q.stop()
    val got = spark.table("srj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("streaming matches equal the batch binned range join") {
    val pts = points.toDF()
      .select($"user_id", $"p_event", unix_micros($"p_ts").as("pt"))
    val anc = anchors.toDF()
      .select($"order_id", $"user_id", unix_micros($"a_ts").as("w_start"),
        (unix_micros($"a_ts") + 3600L * 1000000L).as("w_end"))
    val batch = RangeJoin.binnedFollowUpJoin(pts, anc,
        "user_id", "pt", "w_start", "w_end", binWidth = 3600L * 1000000L)
      .select($"order_id", $"p_event").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == expected)
  }

  test("join state is watermark-bounded (both sides carry event-time watermarks)") {
    implicit val sqlCtx = spark.sqlContext
    val ain = MemoryStream[Anchor]
    val pin = MemoryStream[Point]
    val joined = StreamRangeJoin.followUp(ain.toDF(), pin.toDF(),
      "user_id", "a_ts", "p_ts", horizon = "1 HOUR", delay = "10 MINUTES")
    // the analyzed plan must carry a watermark on each input — the
    // precondition for Spark's stream-stream state cleanup
    val wmCount = joined.queryExecution.analyzed.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
    }.size
    assert(wmCount == 2)
    // and the running query reports state that SHRINKS after the
    // watermark passes the horizon (old anchors/points evicted)
    val q = joined.writeStream.format("memory").queryName("srj_state").start()
    ain.addData(anchors(0)); pin.addData(points(1)); q.processAllAvailable()
    // advance both watermarks far past anchor_ts + horizon + delay
    ain.addData(Anchor(999L, 7L, t("2024-01-02 10:00:00")))
    pin.addData(Point(99L, 7L, t("2024-01-02 10:00:01"), 0.0))
    q.processAllAvailable()
    // one more batch so eviction from the advanced watermark lands
    ain.addData(Anchor(998L, 8L, t("2024-01-02 10:30:00")))
    pin.addData(Point(98L, 8L, t("2024-01-02 10:30:01"), 0.0))
    q.processAllAvailable()
    val rowsInState = q.lastProgress.stateOperators.asScala
      .map(_.numRowsTotal).sum
    q.stop()
    // day-old rows evicted: state holds only the recent window's rows
    assert(rowsInState <= 4, s"state not bounded: $rowsInState rows")
  }

  private implicit class ArrayOps[A](a: Array[A]) {
    def asScala: Seq[A] = a.toSeq
  }
}
