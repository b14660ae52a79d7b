package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned follow-up join: hand case incl. bin-boundary and exclusions") {
    // binWidth 10; interval (5, 25] for key 1
    val points = Seq(
      (1L, 100L, 5L),   // == start → excluded (strict >)
      (1L, 101L, 6L),   // in, first bin
      (1L, 102L, 15L),  // in, middle bin
      (1L, 103L, 25L),  // == end → included
      (1L, 104L, 26L),  // past end → excluded
      (2L, 105L, 10L),  // wrong key → excluded
    ).toDF("user_id", "pid", "pt")
    val intervals = Seq((1L, 900L, 5L, 25L))
      .toDF("user_id", "aid", "w_start", "w_end")
    val got = RangeJoin.binnedFollowUpJoin(points, intervals,
        "user_id", "pt", "w_start", "w_end", binWidth = 10L)
      .select($"pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(101L, 102L, 103L))
  }

  test("negative coordinates (pre-epoch time) bin correctly") {
    // interval (-25, -5] with binWidth 10 spans bins -3..-1
    val points = Seq(
      (1L, 200L, -25L), // == start → excluded
      (1L, 201L, -24L), // in
      (1L, 202L, -11L), // in (bin -2)
      (1L, 203L, -5L),  // == end → included
      (1L, 204L, -4L),  // past end
    ).toDF("user_id", "pid", "pt")
    val intervals = Seq((1L, 900L, -25L, -5L))
      .toDF("user_id", "aid", "w_start", "w_end")
    val got = RangeJoin.binnedFollowUpJoin(points, intervals,
        "user_id", "pt", "w_start", "w_end", binWidth = 10L)
      .select($"pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(201L, 202L, 203L))
  }

  test("binned join equals the naive inequality join at sf") {
    val ev = graft.core.Tables.load(spark, sf, "events")
    val hour = 3600L * 1000000L
    val points = ev.select($"user_id", $"event_id".as("m_event"),
      unix_micros($"ts").as("pt"))
    val anchors = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("w_start"),
        (unix_micros($"ts") + hour).as("w_end"))
    val binned = RangeJoin.binnedFollowUpJoin(points, anchors,
        "user_id", "pt", "w_start", "w_end", hour)
      .select($"event_id", $"m_event")
    val naive = anchors.as("a")
      .join(points.as("p"),
        $"a.user_id" === $"p.user_id" &&
          $"p.pt" > $"a.w_start" && $"p.pt" <= $"a.w_end")
      .select($"event_id", $"m_event")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("q47 plans as a hash equi-join — no nested-loop, no cartesian") {
    val df = RangeJoin.q47FollowUpWindow(spark, sf)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join must not plan nested-loop:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
