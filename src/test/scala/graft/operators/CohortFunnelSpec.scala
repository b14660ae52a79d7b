package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Specs for the r4 batch-2 operators: cohort retention (q74),
  * ordered funnel (q75), sweep-line concurrency (q76), winsorize +
  * robust scale (q77).
  */
class CohortFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "event_type", "s")
      .select($"user_id", $"event_type", to_timestamp($"s").as("ts"))
      .withColumn("event_id", monotonically_increasing_id())
      .withColumn("value", lit(1.0))

  // ---- q74 cohort retention -----------------------------------------

  test("cohortRetention: hand-verified triangle") {
    // weeks are day-diff/7 from 2024-01-01 (a Monday)
    val e = ev(
      (1L, "view", "2024-01-02 00:00:00"), // u1 wk0
      (1L, "view", "2024-01-09 00:00:00"), // u1 wk1
      (2L, "view", "2024-01-03 00:00:00"), // u2 wk0
      (3L, "view", "2024-01-10 00:00:00"), // u3 wk1
      (3L, "view", "2024-01-24 00:00:00")) // u3 wk3
    val r = Temporal.cohortRetention(e)
      .as[(Long, Long, Long)].collect().toSet
    assert(r == Set((0L, 0L, 2L), (0L, 1L, 1L), (1L, 0L, 1L), (1L, 2L, 1L)))
  }

  test("cohortRetention: offset-0 row counts every user of the cohort") {
    val r = Temporal.q74CohortRetention(spark, sf).cache()
    val zero = r.filter($"week_offset" === 0L)
      .agg(sum($"n_users")).head().getLong(0)
    val users = Tables.load(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(zero == users)
    // retention never exceeds the cohort's own size
    val c0 = r.filter($"week_offset" === 0L)
      .select($"cohort_week", $"n_users".as("c0"))
    assert(r.join(c0, "cohort_week").filter($"n_users" > $"c0").isEmpty)
  }

  // ---- q75 funnel ---------------------------------------------------

  test("funnel: strict progression on a fixture") {
    val e = ev(
      // u1 completes in order → stage 3
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // u2's only view precedes signup → stage 1
      (2L, "view", "2024-01-01 09:00:00"),
      (2L, "signup", "2024-01-01 10:00:00"),
      // u3's purchase lands between signup and view → stage 2
      (3L, "signup", "2024-01-01 10:00:00"),
      (3L, "purchase", "2024-01-01 10:30:00"),
      (3L, "view", "2024-01-01 11:00:00"),
      // u4 view at EXACTLY signup time: strict > excludes → stage 1
      (4L, "signup", "2024-01-01 10:00:00"),
      (4L, "view", "2024-01-01 10:00:00"),
      // u5 never signs up → absent from the funnel
      (5L, "view", "2024-01-01 10:00:00"))
    val r = Temporal.funnel(e, "signup", "view", "purchase")
      .select($"user_id", $"stage").as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 3L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("funnel: stages are monotonically shrinking on the corpus") {
    val r = Temporal.q75Funnel(spark, sf).cache()
    val n1 = r.count()
    val n2 = r.filter($"stage" >= 2L).count()
    val n3 = r.filter($"stage" === 3L).count()
    assert(n1 >= n2 && n2 >= n3)
    assert(n3 > 0, "no user completes the funnel — fixture too sparse")
    // t-columns consistent with the stage number
    assert(r.filter($"stage" === 3L && ($"t3".isNull || $"t2".isNull)).isEmpty)
    assert(r.filter($"stage" === 2L && ($"t3".isNotNull || $"t2".isNull)).isEmpty)
    assert(r.filter($"stage" === 1L && $"t2".isNotNull).isEmpty)
    assert(r.filter($"t2".isNotNull && $"t2" <= $"t1").isEmpty)
    assert(r.filter($"t3".isNotNull && $"t3" <= $"t2").isEmpty)
  }

  // ---- q76 peak concurrency -----------------------------------------

  test("peakConcurrency: overlap, inclusive boundary, disjoint days") {
    val e = ev(
      // day 1: u1 session 10:00–10:10 overlaps u2's single event 10:05
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-01 10:10:00"),
      (2L, "view", "2024-01-01 10:05:00"),
      // day 2: u3's session END touches u4's session START — inclusive
      // ends count both
      (3L, "view", "2024-01-02 09:00:00"),
      (3L, "view", "2024-01-02 11:00:00"), // > 30 min gap → 2nd session?
      (4L, "view", "2024-01-02 11:00:00"),
      // day 3: one lonely session
      (5L, "view", "2024-01-03 08:00:00"))
    // note: u3's 9:00 and 11:00 are > 30 min apart → TWO single-event
    // sessions; the 11:00 one coincides with u4's
    val r = Temporal.peakConcurrency(e)
      .select($"day".cast("string"), $"peak").as[(String, Long)]
      .collect().toMap
    assert(r == Map("2024-01-01" -> 2L, "2024-01-02" -> 2L,
      "2024-01-03" -> 1L))
  }

  test("peakConcurrency: peak is bounded by the day's active sessions") {
    val e = Tables.load(spark, sf, "events")
    val r = Temporal.peakConcurrency(e).cache()
    assert(r.filter($"peak" < 1L).isEmpty)
    // a user has at most one active session at any instant, so peak
    // concurrency is bounded by the user count — a sweep sign error
    // (e.g. double-counted starts) breaks this immediately
    val users = e.select($"user_id").distinct().count()
    assert(r.filter($"peak" > users).isEmpty)
  }

  test("peakConcurrency: distributed two-pass ≡ single-global-window form") {
    // corpus check at several bucket counts — including numBuckets=1
    // (degenerate single bucket), 4, and the session default — plus a
    // fixture whose ties straddle would-be cut points
    val e = Tables.load(spark, sf, "events")
    val oracle = Temporal.peakConcurrencyGlobalWindow(e)
      .as[(java.sql.Date, Long)].collect().toMap
    for (n <- Seq(1, 4, 32)) {
      val got = Temporal.peakConcurrency(e, numBuckets = n)
        .as[(java.sql.Date, Long)].collect().toMap
      assert(got == oracle, s"two-pass sweep diverged at numBuckets=$n")
    }
    // tie-heavy fixture: many sessions starting/ending at the same
    // instants, so cut points land inside tie groups
    val tied = ev((1L to 40L).flatMap { u =>
      Seq((u, "view", "2024-01-01 10:00:00"),
        (u, "view", "2024-01-01 10:20:00"),
        (u, "view", "2024-01-02 10:00:00"))
    }: _*)
    val o2 = Temporal.peakConcurrencyGlobalWindow(tied)
      .as[(java.sql.Date, Long)].collect().toMap
    val g2 = Temporal.peakConcurrency(tied, numBuckets = 8)
      .as[(java.sql.Date, Long)].collect().toMap
    assert(g2 == o2)
  }

  test("peakConcurrency: cuts follow change-point density, not event density") {
    // one mega-session (thousands of events, TWO change points) next
    // to many single-event sessions: raw-event-ts quantile cuts would
    // all land inside the mega-session's hour and collapse every other
    // session's change points into one bucket — the single-reducer
    // hotspot the decomposition exists to avoid
    val mega = (1L to 5000L).map(i =>
      (999L, "view", s"2024-01-01 10:${10 + (i % 40).toInt}:00"))
    val singles = (1L to 200L).map(u =>
      (u, "view", f"2024-01-${3 + (u % 25).toInt}%02d 0${(u % 9) + 1}:00:00"))
    val e = ev((mega ++ singles): _*)
    val staged = Temporal.peakConcurrencyStaged(e, numBuckets = 8)
      .select($"pid").distinct().as[Int].collect()
    assert(staged.length >= 4,
      s"change points collapsed into ${staged.length} buckets of 8 " +
        "— the cut probe is following event density")
    // and the skewed corpus still folds to the exact answer
    val got = Temporal.peakConcurrency(e, numBuckets = 8)
      .as[(java.sql.Date, Long)].collect().toMap
    val want = Temporal.peakConcurrencyGlobalWindow(e)
      .as[(java.sql.Date, Long)].collect().toMap
    assert(got == want)
  }

  // ---- q77 winsorize + robust scale ---------------------------------

  test("winsorScale: clamps to the cut band and scales into [0,1]") {
    val r = Profiling.q77WinsorScale(spark, sf).cache()
    assert(r.filter($"scaled" < 0.0 || $"scaled" > 1.0).isEmpty)
    // winsorized is the identity inside the band and constant outside:
    // value order is preserved weakly
    assert(r.filter($"winsorized" > $"value" + 1e-6 &&
      $"scaled" =!= 0.0).isEmpty)
    assert(r.filter($"winsorized" < $"value" - 1e-6 &&
      $"scaled" =!= 1.0).isEmpty)
    // ~10% of each group is clamped (5% each tail)
    val frac = r.withColumn("clamped",
        when(abs($"winsorized" - $"value") > 1e-6, 1.0).otherwise(0.0))
      .groupBy($"event_type").agg(avg($"clamped").as("f"))
    assert(frac.filter($"f" < 0.02 || $"f" > 0.2).isEmpty)
  }

  test("winsorScale: scaled is monotone in value within a group") {
    val r = Profiling.q77WinsorScale(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"event_type").orderBy($"value", $"event_id")
    val bad = r.withColumn("prev", lag($"scaled", 1).over(w))
      .filter($"prev".isNotNull && $"scaled" < $"prev")
    assert(bad.isEmpty)
  }
}
