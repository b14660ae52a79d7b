package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Specs for the r4 batch-3 operators: rolling 7-day actives (q79),
  * type sets (q80), inter-arrival stats (q81), last-touch
  * attribution (q82).
  */
class AttributionRollingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String)*) =
    rows.toDF("event_id", "user_id", "event_type", "s")
      .select($"event_id", $"user_id", $"event_type",
        to_timestamp($"s").as("ts"), lit(1.0).as("value"))

  // ---- q79 rolling active -------------------------------------------

  test("rollingActive: hand-verified trailing window") {
    val e = ev(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 2L, "view", "2024-01-01 11:00:00"),
      (3L, 2L, "view", "2024-01-05 10:00:00"),
      (4L, 3L, "view", "2024-01-09 10:00:00"))
    val r = Temporal.rollingActive(e)
      .select($"report_day".cast("string"), $"n_active_7d")
      .as[(String, Long)].collect().toMap
    val want = (1 to 7).map(d => f"2024-01-0$d" -> 2L).toMap ++
      Map("2024-01-08" -> 1L, "2024-01-09" -> 2L)
    assert(r == want)
  }

  test("rollingActive: dominates same-day actives, bounded by total") {
    val e = Tables.load(spark, sf, "events")
    val daily = e.select($"user_id", $"ts".cast("date").as("report_day"))
      .distinct().groupBy($"report_day")
      .agg(countDistinct($"user_id").as("n_today"))
    val r = Temporal.rollingActive(e)
    val joined = r.join(daily, Seq("report_day"), "left").cache()
    assert(joined.filter($"n_today".isNotNull &&
      $"n_active_7d" < $"n_today").isEmpty)
    val total = e.select($"user_id").distinct().count()
    assert(joined.filter($"n_active_7d" > total).isEmpty)
  }

  // ---- q80 type sets ------------------------------------------------

  test("q80: csv is sorted and consistent with the distinct count") {
    val r = Relational.q80TypeSets(spark, sf).cache()
    val bad = r.filter(size(split($"types_csv", ",")) =!= $"n_types")
    assert(bad.isEmpty)
    val unsorted = r.filter(
      array_join(array_sort(split($"types_csv", ",")), ",") =!= $"types_csv")
    assert(unsorted.isEmpty)
  }

  // ---- q81 inter-arrival --------------------------------------------

  test("interArrival: hand-verified gaps") {
    val e = ev(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:00:10"),
      (3L, 1L, "view", "2024-01-01 10:00:30"))
    val r = Temporal.interArrival(e).collect().head
    assert(r.getLong(1) == 2L)             // n_gaps
    assert(r.getLong(2) == 10000000L)      // min
    assert(r.getLong(3) == 20000000L)      // max
    assert(r.getDouble(4) == 15000000.0)   // median of {1e7, 2e7}
    assert(r.getDouble(5) == 19000000.0)   // p90 = 1e7 + 0.9·1e7
  }

  // ---- q82 last-touch attribution -----------------------------------

  test("lastTouchAttribution: strictness, horizon, tie-break") {
    val e = ev(
      // u1: click then purchase → attributed
      (10L, 1L, "click", "2024-01-02 10:00:00"),
      (11L, 1L, "purchase", "2024-01-02 11:00:00"),
      // u2: purchase at EXACTLY the click instant → strict < excludes
      (20L, 2L, "click", "2024-01-02 10:00:00"),
      (21L, 2L, "purchase", "2024-01-02 10:00:00"),
      // u3: click 8 days before purchase → outside horizon
      (30L, 3L, "click", "2024-01-01 10:00:00"),
      (31L, 3L, "purchase", "2024-01-09 11:00:00"),
      // u4: two clicks at the same instant, later purchase →
      // attributed to that instant (tie on ts resolved by event_id)
      (40L, 4L, "click", "2024-01-03 09:00:00"),
      (41L, 4L, "click", "2024-01-03 09:00:00"),
      (42L, 4L, "purchase", "2024-01-03 10:00:00"),
      // u5: click only after the purchase → not attributed
      (50L, 5L, "purchase", "2024-01-02 10:00:00"),
      (51L, 5L, "click", "2024-01-02 12:00:00"))
    val r = Temporal.lastTouchAttribution(e, "click", "purchase")
      .select($"event_id", $"touch_ts".cast("string"), $"attributed")
      .as[(Long, Option[String], Boolean)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r(11L) == ((Some("2024-01-02 10:00:00"), true)))
    assert(r(21L) == ((None, false)))
    assert(r(31L) == ((None, false)))
    assert(r(42L) == ((Some("2024-01-03 09:00:00"), true)))
    assert(r(50L) == ((None, false)))
    assert(r.size == 5)
  }

  test("attribution on the corpus: horizon and ordering invariants") {
    val e = Tables.load(spark, sf, "events")
    val r = Temporal.q82Attribution(spark, sf).cache()
    assert(r.count() == e.filter($"event_type" === "purchase").count())
    assert(r.filter($"attributed" && $"touch_ts" >= $"conv_ts").isEmpty)
    assert(r.filter($"attributed" &&
      $"touch_ts" < $"conv_ts" - expr("INTERVAL 7 DAYS")).isEmpty)
    assert(r.filter($"attributed").count() > 0)
  }
}
