package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** q87 — bidirectional nearest as-of join within tolerance. */
class NearestAsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Double)*) =
    rows.toDF("event_id", "user_id", "s", "value")
      .select($"event_id", $"user_id", to_timestamp($"s").as("ts"),
        $"value", lit("view").as("event_type"))

  test("nearest wins; past breaks ties; tolerance excludes") {
    // one user, three days → snapshots are each day's latest event
    val e = ev(
      (1L, 1L, "2024-01-01 23:00:00", 10.0), // snap day1 = 23:00
      (2L, 1L, "2024-01-02 01:00:00", 20.0), // 2h after day1 snap
      (3L, 1L, "2024-01-02 22:00:00", 30.0), // snap day2 = 22:00
      (4L, 1L, "2024-01-04 10:00:00", 40.0)) // snap day4; far from day2
    val r = Temporal.nearestAsOfJoin(e, 6L * 3600 * 1000000)
      .select($"event_id", $"snap_ts".cast("string"), $"direction")
      .as[(Long, Option[String], Option[String])].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    // ev1 IS day-1's snapshot → distance 0, past
    assert(r(1L) == ((Some("2024-01-01 23:00:00"), Some("past"))))
    // ev2: past snap (day1 23:00) at 2h, future snap (day2 22:00) at
    // 21h → past wins
    assert(r(2L) == ((Some("2024-01-01 23:00:00"), Some("past"))))
    // ev3 is day-2's snapshot itself → distance 0
    assert(r(3L) == ((Some("2024-01-02 22:00:00"), Some("past"))))
    // ev4: nearest other snap is day2 22:00, 36h away → only its own
    // day-4 snapshot (itself) matches at 0
    assert(r(4L) == ((Some("2024-01-04 10:00:00"), Some("past"))))
  }

  test("future direction is reachable and beats a farther past") {
    val e = ev(
      (1L, 1L, "2024-01-01 01:00:00", 10.0),
      (2L, 1L, "2024-01-01 02:00:00", 20.0), // snap day1 = 02:00
      (3L, 2L, "2024-01-01 12:00:00", 30.0)) // other user
    // ev1: only snapshot of its user+window is day1 02:00, one hour in
    // the FUTURE (ev1 is not the day's latest event)
    val r = Temporal.nearestAsOfJoin(e, 6L * 3600 * 1000000)
      .filter($"event_id" === 1L)
      .select($"snap_ts".cast("string"), $"direction")
      .as[(String, String)].head()
    assert(r == (("2024-01-01 02:00:00", "future")))
  }

  test("corpus invariants: distance bound, direction consistency") {
    val tol = 6L * 3600 * 1000000
    val r = Temporal.q87NearestAsOf(spark, sf).cache()
    assert(r.count() == Tables.load(spark, sf, "events").count())
    assert(r.filter($"snap_ts".isNotNull &&
      abs(unix_micros($"snap_ts") - unix_micros($"ts")) > tol).isEmpty)
    assert(r.filter($"direction" === "past" && $"snap_ts" > $"ts").isEmpty)
    assert(r.filter($"direction" === "future" && $"snap_ts" <= $"ts").isEmpty)
    assert(r.filter($"snap_ts".isNotNull).count() > 0)
  }
}
