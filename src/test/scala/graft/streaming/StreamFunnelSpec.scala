package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Temporal
import StreamFunnel.{Attainment, FEvent}

class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // u1 completes; u2's view precedes signup (stage 1 only); u3 stalls
  // at stage 2; u4's view is at EXACTLY the signup instant (strict >)
  private val events = Seq(
    FEvent(1L, "signup", t("2024-01-01 10:00:00"), 1L),
    FEvent(1L, "view", t("2024-01-01 11:00:00"), 2L),
    FEvent(1L, "purchase", t("2024-01-01 12:00:00"), 3L),
    FEvent(2L, "view", t("2024-01-01 09:00:00"), 4L),
    FEvent(2L, "signup", t("2024-01-01 10:00:00"), 5L),
    FEvent(3L, "signup", t("2024-01-01 10:00:00"), 6L),
    FEvent(3L, "view", t("2024-01-01 10:30:00"), 7L),
    FEvent(4L, "signup", t("2024-01-01 10:00:00"), 8L),
    FEvent(4L, "view", t("2024-01-01 10:00:00"), 9L))

  private def batchStages: Map[Long, Long] = {
    val df = events.toDF()
      .select($"user_id", $"event_type", $"ts", $"event_id",
        lit(1.0).as("value"))
    Temporal.funnel(df, "signup", "view", "purchase")
      .select($"user_id", $"stage").as[(Long, Long)].collect().toMap
  }

  test("stream funnel attains exactly the batch stages, any batch size") {
    val want = batchStages
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for (batchSize <- Seq(1, 3, events.size)) {
      val input = MemoryStream[FEvent]
      val q = StreamFunnel(input.toDS(), "signup", "view", "purchase")
        .writeStream.format("memory").queryName(s"sf_out_$batchSize")
        .outputMode(OutputMode.Append()).start()
      events.grouped(batchSize).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      q.stop()
      val rows = spark.table(s"sf_out_$batchSize").as[Attainment].collect()
      // highest attained stage per user matches the batch funnel
      val got = rows.groupBy(_.user_id).view
        .mapValues(_.map(_.stage).max).toMap
      assert(got == want, s"batchSize=$batchSize")
      // each stage emitted at most once per user, in order
      rows.groupBy(_.user_id).foreach { case (u, rs) =>
        val stages = rs.sortBy(a => (a.stage, a.ts.getTime)).map(_.stage)
        assert(stages.distinct.sameElements(stages), s"user=$u dup stages")
        assert(stages.sameElements(1L to stages.length), s"user=$u gap")
      }
    }
  }

  test("stage-2 emission carries the first qualifying timestamp") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[FEvent]
    val q = StreamFunnel(input.toDS(), "signup", "view", "purchase")
      .writeStream.format("memory").queryName("sf_ts")
      .outputMode(OutputMode.Append()).start()
    input.addData(events); q.processAllAvailable(); q.stop()
    val got = spark.table("sf_ts").as[Attainment].collect()
      .map(a => (a.user_id, a.stage) -> a.ts).toMap
    assert(got((1L, 2L)) == t("2024-01-01 11:00:00"))
    assert(got((3L, 2L)) == t("2024-01-01 10:30:00"))
    assert(!got.contains((4L, 2L))) // strict >: same-instant view ignored
  }
}
