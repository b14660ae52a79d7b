package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("session windows merge events within the gap, split beyond it") {
    val events = Seq(
      (1L, t("2024-01-01 10:00:00"), 1.0),
      (1L, t("2024-01-01 10:10:00"), 2.0), // same session (gap 30m)
      (1L, t("2024-01-01 11:30:00"), 4.0), // new session (>30m later)
      (2L, t("2024-01-01 10:05:00"), 8.0),
    ).toDF("user_id", "ts", "value")
    val s = WindowedAgg.sessions(events).orderBy($"user_id", $"session_start")
      .collect()
    assert(s.length == 3)
    assert(s(0).getAs[Long]("n_events") == 2 && s(0).getAs[Double]("total") == 3.0)
    assert(s(1).getAs[Long]("n_events") == 1 && s(1).getAs[Double]("total") == 4.0)
    // session end extends gap past the last event
    assert(s(0).getTimestamp(1) == t("2024-01-01 10:40:00"))
  }

  test("sliding windows: every event lands in length/slide windows") {
    val events = Seq((1L, t("2024-01-01 13:00:00"), "click", 1.0))
      .toDF("event_id", "ts", "event_type", "value")
    val wins = WindowedAgg.sliding(events).orderBy($"win").collect()
    // 1-day window, 6-h slide → the event appears in 4 windows
    assert(wins.length == 4)
    assert(wins.forall(_.getAs[Long]("n") == 1L))
    assert(wins.head.getTimestamp(0) == t("2023-12-31 18:00:00"))
    assert(wins.last.getTimestamp(0) == t("2024-01-01 12:00:00"))
  }

  test("approx_count_distinct tracks exact distinct within its error bound") {
    val e = Tables.load(spark, sf, "events")
    val exact = e.select($"user_id").distinct().count().toDouble
    val approx = e.agg(approx_count_distinct($"user_id", 0.02))
      .head().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile lands within rank error of the exact quantile") {
    val e = Tables.load(spark, sf, "events")
    val n = e.count()
    // accuracy a ⇒ rank error ≤ n/a; a = 100 ⇒ ±1% of ranks
    val approx = e.agg(percentile_approx($"value", lit(0.5), lit(100)))
      .head().getDouble(0)
    val rank = e.filter($"value" <= approx).count().toDouble / n
    assert(math.abs(rank - 0.5) <= 0.02, s"median rank off: $rank")
  }
}
