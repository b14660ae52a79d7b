package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

case class DedupEv(event_id: Long, ts: Timestamp, payload: String)

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("byKey drops re-delivered event ids across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[DedupEv]
    val q = StreamDedup.byKey(input.toDF(), "event_id", "ts")
      .writeStream.format("memory").queryName("dedup_key_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(DedupEv(1, t("2024-01-01 10:00:00"), "a"),
      DedupEv(1, t("2024-01-01 10:00:00"), "a")) // same-batch redelivery
    q.processAllAvailable()
    input.addData(DedupEv(1, t("2024-01-01 10:00:05"), "a"), // cross-batch redelivery
      DedupEv(2, t("2024-01-01 10:00:10"), "b"))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_key_out").select($"event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("byContent drops duplicate payloads, batch and stream agree") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      DedupEv(1, t("2024-01-01 10:00:00"), "same text"),
      DedupEv(2, t("2024-01-01 10:00:01"), "same text"),
      DedupEv(3, t("2024-01-01 10:00:02"), "other text"))
    // batch
    val batchKept = StreamDedup.byContent(rows.toDF(), "payload", "ts")
      .count()
    assert(batchKept == 2)
    // stream, duplicate arriving in a later micro-batch
    val input = MemoryStream[DedupEv]
    val q = StreamDedup.byContent(input.toDF(), "payload", "ts")
      .writeStream.format("memory").queryName("dedup_content_out")
      .outputMode(OutputMode.Append()).start()
    input.addData(rows(0)); q.processAllAvailable()
    input.addData(rows(1), rows(2)); q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_content_out").select($"payload")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(kept == Seq("other text", "same text"))
  }
}
