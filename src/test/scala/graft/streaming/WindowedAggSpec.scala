package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.core.Tables

case class Ev(event_id: Long, ts: Timestamp, event_type: String, value: Double)

class WindowedAggSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed agg over micro-batches == batch windowed agg (T-windows)") {
    val rows = Tables.load(spark, sf, "events")
      .select($"event_id", $"ts", $"event_type", $"value")
      .as[Ev].collect().toSeq.sortBy(_.ts.getTime)

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = WindowedAgg.tumbling(input.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete()).start()
    rows.grouped(300).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    val streamed = spark.table("win_out")
      .orderBy($"win", $"event_type").collect().toSeq
    val batch = WindowedAgg.tumbling(
      Tables.load(spark, sf, "events"))
      .orderBy($"win", $"event_type").collect().toSeq
    assert(batch.nonEmpty && streamed.length == batch.length)
    // double sums accumulate in different order across micro-batches →
    // compare with FP tolerance, exact on keys/counts
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.getTimestamp(0) == b.getTimestamp(0))
      assert(s.getString(1) == b.getString(1))
      assert(s.getLong(2) == b.getLong(2))
      assert(math.abs(s.getDouble(3) - b.getDouble(3)) < 1e-9)
    }
  }

  test("watermark bounds state: late rows beyond the watermark are dropped in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = WindowedAgg.tumbling(input.toDF(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append()).start()
    def t(s: String) = Timestamp.valueOf(s)
    input.addData(Ev(1, t("2024-01-01 01:00:00"), "click", 1.0))
    q.processAllAvailable()
    // advance watermark past day 1 → day-1 window closes and emits
    input.addData(Ev(2, t("2024-01-03 01:00:00"), "click", 1.0))
    q.processAllAvailable()
    // this event is older than the watermark → dropped, not re-opened
    input.addData(Ev(3, t("2024-01-01 02:00:00"), "click", 5.0))
    q.processAllAvailable()
    q.stop()
    val day1 = spark.table("late_out")
      .filter($"win" === t("2024-01-01 00:00:00")).collect()
    assert(day1.length == 1 && day1.head.getAs[Long]("n") == 1L)
  }
}
