package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Temporal operators over `events`: tumbling-window aggregation,
  * point-in-time (as-of) join, and CUBE grouping sets — the extended
  * surface a feature store needs for time-correct training data
  * (SURVEY.md §2.5/§2.9; the reference's offline store is queried for
  * "latest feature values" only, `feature_store_manager.py:125-141`).
  */
object Temporal {

  /** Q19 — tumbling 1-day event-time window aggregation. In batch this
    * is a plain group-by on the window bucket; the same expression
    * under `readStream` + `withWatermark` is the streaming windowed
    * agg (spec-checked for batch/stream equivalence in
    * StreamingWindowSpec).
    */
  def q19WindowedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .groupBy(window($"ts", "1 day").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .select($"w.start".as("win"), $"event_type", $"n", $"total")
      .orderBy($"win", $"event_type")
  }

  /** Q20 — as-of (point-in-time) join: each event matched to the
    * latest per-user daily snapshot STRICTLY BEFORE its event time.
    * This is the feature-store point-in-time-correctness join (no
    * training-label leakage from the future).
    *
    * Implementation is the union trick — no range explosion, no
    * per-event probe: tag snapshots and events, sort each user's
    * timeline once, carry the last-seen snapshot forward with a
    * running `last(ignoreNulls)` window. One shuffle on user_id; at
    * 100 TB this is a sort-merge pass, vs the naive
    * join-then-filter-then-argmax which materializes |events|·|snaps|
    * rows per user.
    *
    * Strict "<" semantics come from the sort key (t, is_snap): at
    * equal timestamps the event row (is_snap=0) precedes the snapshot
    * (is_snap=1), so a snapshot never matches an event at its own
    * timestamp.
    */
  def q20AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.load(spark, dir, "events")
    // daily snapshots: newest event per (user, day), deterministic
    val wSnap = Window.partitionBy($"user_id", date_trunc("day", $"ts"))
      .orderBy($"ts".desc, $"event_id".desc)
    val snaps = e.withColumn("rn", row_number().over(wSnap))
      .filter($"rn" === 1)
      .select($"user_id", $"value".as("snap_value"), $"ts".as("snap_ts"))

    val events = e.select($"event_id", $"user_id", $"ts",
      lit(0).as("is_snap"), lit(null).cast("double").as("s_value"),
      lit(null).cast("timestamp").as("s_ts"))
    val tagged = snaps.select(lit(null).cast("long").as("event_id"),
      $"user_id", $"snap_ts".as("ts"), lit(1).as("is_snap"),
      $"snap_value".as("s_value"), $"snap_ts".as("s_ts"))

    val wCarry = Window.partitionBy($"user_id")
      .orderBy($"ts", $"is_snap")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.unionByName(tagged)
      .withColumn("snap_value", last($"s_value", ignoreNulls = true).over(wCarry))
      .withColumn("snap_ts", last($"s_ts", ignoreNulls = true).over(wCarry))
      .filter($"is_snap" === 0)
      .select($"event_id", $"user_id", $"snap_value", $"snap_ts")
      .orderBy($"event_id")
  }

  /** Q21 — CUBE grouping sets: all 4 aggregation granularities of
    * (event_type, day-of-month) in one pass (Expand + partial agg:
    * the shuffle carries |groups|·4 rows, not raw data ×4).
    */
  def q21Cube(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "events")
      .withColumn("d", dayofmonth($"ts"))
      .cube($"event_type", $"d")
      .agg(count(lit(1)).as("n"), sum($"value").as("total"))
      .orderBy($"event_type".asc_nulls_last, $"d".asc_nulls_last)
  }

  /** Batch sessionization — gaps-and-islands: a new session starts
    * when a user is idle longer than `gapSec`. The batch twin of the
    * streaming session windows (`streaming.WindowedAgg`), as the
    * training-side sessionizer: one lag to mark breaks, one running
    * sum to number sessions, one group-by for the stats. Gap
    * comparison is exact integer epoch-microsecond arithmetic
    * (identical in any engine — both floor the source ns column to
    * µs); per-user windows are bounded groups (the q10 shape), so no
    * single-reducer risk.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    import events.sparkSession.implicits._
    val byUser = Window.partitionBy($"user_id")
      .orderBy($"ts", $"event_id")
    val marked = events
      .withColumn("prev_us",
        lag(unix_micros($"ts"), 1).over(byUser))
      .withColumn("brk",
        when($"prev_us".isNull ||
          unix_micros($"ts") - $"prev_us" > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session",
        sum($"brk").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy($"user_id", $"session")
      .agg(count(lit(1)).as("n"),
        min($"ts").as("start_ts"), max($"ts").as("end_ts"),
        sum($"value").as("total"))
  }

  /** Q58 — 30-minute-gap sessions per user over `events`. */
  def q58Sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    sessionize(Tables.load(spark, dir, "events"))
      .orderBy($"user_id", $"session")
  }

  /** Portable week index: whole weeks since the epoch anchor — plain
    * integer day arithmetic, no engine week-start convention.
    */
  private def weekIdx(ts: org.apache.spark.sql.Column) =
    floor(datediff(ts.cast("date"), to_date(lit("2024-01-01"))) / 7)
      .cast("long")

  /** Weekly cohort retention — the activity-triangle every growth /
    * engagement pipeline computes: users grouped by first-seen week,
    * counted distinct in each later week, as (cohort_week, offset,
    * n_users). Two aggregations (first-seen per user; distinct
    * user-weeks) joined on user_id — both shuffles are user-keyed and
    * combine map-side; the triangle itself is |cohorts|·|weeks| rows.
    * Week boundaries are integer day-diff division (no engine
    * week-start convention).
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val wk = events.select($"user_id", weekIdx($"ts").as("wk"))
    val cohort = wk.groupBy($"user_id").agg(min($"wk").as("cohort_week"))
    wk.distinct()
      .join(cohort, "user_id")
      .groupBy($"cohort_week", ($"wk" - $"cohort_week").as("week_offset"))
      .agg(countDistinct($"user_id").as("n_users"))
  }

  /** Q74 — weekly retention triangle over `events`. */
  def q74CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    cohortRetention(Tables.load(spark, dir, "events"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** Ordered funnel — strict-progression stage timestamps per user:
    * t1 = first `stage1`, t2 = first `stage2` AFTER t1, t3 = first
    * `stage3` after t2. The per-stage pass is filter → per-user min →
    * join back (user-keyed shuffles of |users| rows, never
    * event-sized intermediates); strict `>` makes reordering
    * impossible (a view logged before the signup doesn't count).
    * Timestamps are exact µs values — no float anywhere.
    */
  def funnel(events: DataFrame, stage1: String, stage2: String,
      stage3: String): DataFrame = {
    import events.sparkSession.implicits._
    val e = events.select($"user_id", $"event_type", $"ts")
    val s1 = e.filter($"event_type" === stage1)
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val s2 = e.join(s1, "user_id")
      .filter($"event_type" === stage2 && $"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val s3 = e.join(s2, "user_id")
      .filter($"event_type" === stage3 && $"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    s1.join(s2, Seq("user_id"), "left_outer")
      .join(s3, Seq("user_id"), "left_outer")
      .select($"user_id", $"t1", $"t2", $"t3",
        when($"t3".isNotNull, 3L).when($"t2".isNotNull, 2L)
          .otherwise(1L).as("stage"))
  }

  /** Q75 — signup → view → purchase funnel per user. */
  def q75Funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    funnel(Tables.load(spark, dir, "events"), "signup", "view", "purchase")
      .orderBy($"user_id")
  }

  /** Peak concurrent sessions per day — the sweep-line over session
    * intervals: +1 at each session start, −1 at each (INCLUSIVE) end,
    * running sum in (ts, delta DESC) order (starts sort before ends
    * at the same instant, so boundary-touching sessions — and
    * single-event sessions, whose start equals their end — count as
    * concurrent), max per calendar day. Within an equal-(ts, delta)
    * tie group the prefix sums are monotonic, so no permutation of
    * ties can change any prefix-sum maximum — deterministic.
    *
    * The sweep runs over 2·|sessions| CHANGE POINTS (already two
    * aggregations smaller than raw events), totally ordered. A naive
    * `Window.orderBy(ts)` funnels every change point through ONE
    * reducer — the classic global-window scale killer — so this is
    * the standard distributed prefix sum instead, in TWO actions and
    * with NO pinned blocks (round-9: the old three-action form kept
    * the change points `persist`ed across passes, and that pin
    * interacted badly with block-manager/GC churn in long suite runs —
    * q76's in-suite 3–5× bench anomaly):
    *
    *  1. deterministic ts range cuts from an approx-quantile sketch
    *     over DISTINCT (user, gap-cell) pairs — a windowless proxy
    *     for change-point density (bounded per unit session time,
    *     independent of event count; raw-event-ts quantiles would
    *     follow event density and let one mega-session's events pull
    *     every cut into its range while everyone else's change points
    *     collapse into a single bucket). The bucket rule compares the
    *     integer-µs timestamp only, so ALL rows with equal ts land in
    *     the same bucket and the (ts, delta DESC) tie order is never
    *     split across buckets;
    *  2. ONE pass over the change points: per-bucket LOCAL prefix
    *     sums (a PARTITIONED window — parallel across buckets),
    *     reduced in the same job to per-(bucket, day)
    *     `max(local prefix)` + `sum(delta)` — a frame bounded by
    *     buckets × calendar days, never by data size.
    *
    * The driver folds the per-bucket totals into cumulative offsets
    * (buckets are ordered by ts range) and takes each day's peak as
    * `max over buckets of (local day-max + bucket offset)`:
    * local-prefix + offset equals the single-reducer running sum
    * exactly, and a day's global maximum is the max of its per-bucket
    * maxima because the offset is constant within a bucket.
    * Spec-checked ≡ the global-window form in CohortFunnelSpec. The
    * collected frame is calendar-bounded (≤ buckets × ~365·years
    * rows), the same bounded-driver-reduction class as the old
    * per-bucket totals — and sessionize now runs exactly once, with
    * nothing persisted.
    */
  def peakConcurrency(events: DataFrame, gapSec: Long = 1800L,
      numBuckets: Int = 0): DataFrame = {
    val spark = events.sparkSession
    // bounded collect: ≤ numBuckets × distinct calendar days rows
    val rows = peakConcurrencyStaged(events, gapSec, numBuckets).collect()
    val totByPid: Map[Int, Long] = rows.groupBy(_.getInt(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    val pids = totByPid.keys.toSeq.sorted
    val offsets: Map[Int, Long] = pids
      .zip(pids.scanLeft(0L)((acc, p) => acc + totByPid(p)).init).toMap
    val peaks = rows.groupBy(_.getDate(1)).toSeq.map { case (day, xs) =>
      Row(day, xs.map(x => x.getLong(2) + offsets(x.getInt(0))).max)
    }
    spark.createDataFrame(
      java.util.Arrays.asList(peaks: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("day",
          org.apache.spark.sql.types.DateType),
        org.apache.spark.sql.types.StructField("peak",
          org.apache.spark.sql.types.LongType))))
  }

  /** The lazy bucketed sweep pre-aggregation: one row per (ts bucket,
    * calendar day) = (pid, day, mx = max local prefix, tot = bucket's
    * delta total that day). The public [[peakConcurrency]] folds
    * these driver-side; PlanShapeSpec asserts the distributed
    * (bucket-partitioned) window shape on this plan.
    */
  private[graft] def peakConcurrencyStaged(events: DataFrame,
      gapSec: Long = 1800L, numBuckets: Int = 0): DataFrame = {
    import events.sparkSession.implicits._
    val spark = events.sparkSession
    val n = if (numBuckets > 0) numBuckets
      else spark.sessionState.conf.numShufflePartitions
    val sess = sessionize(events, gapSec)
    val deltas = sess.select($"start_ts".as("ts"), lit(1L).as("delta"))
      .unionByName(sess.select($"end_ts".as("ts"), lit(-1L).as("delta")))
      .withColumn("us", unix_micros($"ts"))
    // action 1: deterministic range cuts (driver-side values; ε=1e-3
    // on a quantile SKETCH — bucket balance is approximate,
    // correctness is not: any cut assignment is correct as long as it
    // is a pure function of ts). The probe must track CHANGE-POINT
    // density, not event density: raw-event-ts quantiles would let
    // one mega-session (10M events, 2 change points) pull every cut
    // into its range while everyone else's change points collapse
    // into one bucket — the single-reducer hotspot this decomposition
    // exists to avoid. Exact change points would cost a second
    // sessionize (a full per-user sort — measured ~2× the operator);
    // instead sketch DISTINCT (user, gap-cell) pairs: a session
    // contributes ≥ 1 cell per change-point pair and ≤ its time span
    // in gap units — bounded per unit session TIME, independent of
    // event count — for one map-side-combined agg shuffle, no window.
    // A per-user hash jitter spreads each pair's probe point inside
    // its cell so the sketch can still subdivide a cell many users
    // crowd into; cuts stay pure ts literals either way.
    val gapUs = gapSec * 1000000L
    val cuts: Array[Long] =
      if (n <= 1) Array.empty
      else events
        .select($"user_id",
          (unix_micros($"ts") - pmod(unix_micros($"ts"), lit(gapUs))).as("cus"))
        .distinct()
        .select(($"cus" + pmod(xxhash64($"user_id"), lit(gapUs))).as("us"))
        .stat
        .approxQuantile("us", (1 until n).map(_.toDouble / n).toArray, 1e-3)
        .filter(d => !d.isNaN).map(_.toLong).distinct.sorted
    val bucket = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when($"us" > lit(c), 1).otherwise(0)
    }
    val stamped = deltas.withColumn("pid", bucket)
    // action 2 (at the caller): local prefix sums per bucket, reduced
    // to the bounded per-(bucket, day) frame inside the same job
    val wLocal = Window.partitionBy($"pid").orderBy($"ts", $"delta".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stamped
      .withColumn("conc", sum($"delta").over(wLocal))
      .groupBy($"pid", $"ts".cast("date").as("day"))
      .agg(max($"conc").as("mx"), sum($"delta").as("tot"))
  }

  /** Single-global-window reference form of [[peakConcurrency]] — the
    * one-reducer shape the distributed form replaces; kept as the spec
    * oracle for the ≡ check (CohortFunnelSpec) and for corpora small
    * enough that one reducer is fine.
    */
  private[graft] def peakConcurrencyGlobalWindow(events: DataFrame,
      gapSec: Long = 1800L): DataFrame = {
    import events.sparkSession.implicits._
    val sess = sessionize(events, gapSec)
    val deltas = sess.select($"start_ts".as("ts"), lit(1L).as("delta"))
      .unionByName(sess.select($"end_ts".as("ts"), lit(-1L).as("delta")))
    val w = Window.orderBy($"ts", $"delta".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("conc", sum($"delta").over(w))
      .groupBy($"ts".cast("date").as("day"))
      .agg(max($"conc").as("peak"))
  }

  /** Q76 — daily peak concurrent 30-minute sessions. */
  def q76PeakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    peakConcurrency(Tables.load(spark, dir, "events"))
      .orderBy($"day")
  }

  /** Rolling 7-day distinct active users — the windowed-distinct
    * metric that resists window frames (COUNT(DISTINCT) over a range
    * frame is unsupported everywhere): reduce to distinct
    * (user, day) FIRST, then fan each activity day out to the ≤ 7
    * report days it contributes to and count distinct per report
    * day. The fan-out multiplies the already-reduced user-day table
    * (≪ events), never the raw stream; the shape is the standard
    * contribute-to-window trick and scales as |user-days|·window.
    */
  def rollingActive(events: DataFrame, windowDays: Int = 7): DataFrame = {
    import events.sparkSession.implicits._
    val days = events.select($"user_id", $"ts".cast("date").as("day"))
      .distinct()
    val mx = days.agg(max($"day").as("max_day"))
    days
      .withColumn("report_day",
        explode(transform(sequence(lit(0), lit(windowDays - 1)),
          i => date_add($"day", i))))
      .crossJoin(broadcast(mx))
      .filter($"report_day" <= $"max_day")
      .groupBy($"report_day")
      .agg(countDistinct($"user_id").as("n_active_7d"))
  }

  /** Q79 — trailing-7-day distinct active users per day. */
  def q79RollingActive(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    rollingActive(Tables.load(spark, dir, "events"))
      .orderBy($"report_day")
  }

  /** Per-user inter-arrival statistics — the burstiness profile
    * (bot/abuse signal, session-gap tuning input): exact integer-µs
    * gaps from one per-user lag, then grouped count/min/max/median/
    * p90. Gaps are integers, so the percentile interpolation is the
    * portable (n−1)·q contract (the q53 precedent); per-user windows
    * are bounded groups.
    */
  def interArrival(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .withColumn("gap_us", unix_micros($"ts") - lag(unix_micros($"ts"), 1)
        .over(byUser))
      .filter($"gap_us".isNotNull)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_gaps"),
        min($"gap_us").as("min_gap"),
        max($"gap_us").as("max_gap"),
        round(percentile($"gap_us", lit(0.5)), 6).as("median_gap"),
        round(percentile($"gap_us", lit(0.9)), 6).as("p90_gap"))
  }

  /** Q81 — inter-arrival gap profile per user. */
  def q81InterArrival(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    interArrival(Tables.load(spark, dir, "events"))
      .orderBy($"user_id")
  }

  /** Last-touch attribution — each conversion joined to the latest
    * preceding touch event within `horizonDays`, via the q20 union
    * trick: tag touches and conversions, sort each user's timeline
    * once, carry the last touch forward, then age-filter. One
    * user-keyed shuffle; no per-conversion probe, no range
    * explosion. Strictly-before semantics from the sort key
    * (ts, tag): at an equal timestamp the conversion (tag 0)
    * precedes the touch (tag 1), so a touch never attributes a
    * conversion at its own instant; ties among equal-ts touches
    * resolve to the largest event_id (deterministic).
    */
  def lastTouchAttribution(events: DataFrame, touch: String,
      conversion: String, horizonDays: Int = 7): DataFrame = {
    import events.sparkSession.implicits._
    val touches = events.filter($"event_type" === touch)
      .select(lit(null).cast("long").as("event_id"), $"user_id", $"ts",
        lit(1).as("tag"), $"ts".as("t_ts"), $"event_id".as("t_id"))
    val convs = events.filter($"event_type" === conversion)
      .select($"event_id", $"user_id", $"ts",
        lit(0).as("tag"), lit(null).cast("timestamp").as("t_ts"),
        lit(null).cast("long").as("t_id"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"tag", $"t_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    convs.unionByName(touches)
      .withColumn("touch_ts", last($"t_ts", ignoreNulls = true).over(w))
      .filter($"tag" === 0)
      .withColumn("touch_ts",
        when($"touch_ts" >= $"ts" - expr(s"INTERVAL $horizonDays DAYS"),
          $"touch_ts"))
      .select($"event_id", $"user_id", $"ts".as("conv_ts"), $"touch_ts",
        $"touch_ts".isNotNull.as("attributed"))
  }

  /** Q82 — purchases attributed to the latest click within 7 days. */
  def q82Attribution(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lastTouchAttribution(Tables.load(spark, dir, "events"),
        touch = "click", conversion = "purchase")
      .orderBy($"event_id")
  }

  /** Behavioral n-grams — sequence mining lite: each user's event
    * types, ordered by time, become a string of type initials; the
    * sliding character n-grams of those strings are the behavioral
    * patterns, counted corpus-wide. One grouped sort-array per user
    * (bounded by per-user activity), then the n-gram fan-out runs on
    * |users| short strings, not on raw events.
    */
  def behaviorNgrams(events: DataFrame, n: Int = 3,
      topK: Int = 20): DataFrame = {
    import events.sparkSession.implicits._
    val seqs = events
      .select($"user_id",
        struct($"ts", $"event_id", substring($"event_type", 1, 1).as("c"))
          .as("s"))
      .groupBy($"user_id")
      .agg(concat_ws("", transform(sort_array(collect_list($"s")),
        x => x.getField("c"))).as("seq"))
    seqs.filter(length($"seq") >= n)
      .select(explode(transform(
        sequence(lit(1), length($"seq") - (n - 1)),
        i => $"seq".substr(i, lit(n)))).as("gram"))
      .groupBy($"gram")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"gram")
      .limit(topK)
  }

  /** Q83 — top-20 behavioral type trigrams across users. */
  def q83BehaviorNgrams(spark: SparkSession, dir: String): DataFrame =
    behaviorNgrams(Tables.load(spark, dir, "events"))

  /** SCD-2 interval compaction — collapse each user's consecutive
    * runs of an attribute (event_type here) into validity intervals
    * [valid_from, valid_to): the slowly-changing-dimension history
    * table a feature store serves point-in-time lookups from. One
    * change-flag lag, one running sum (run ids), one group-by, one
    * lead for the exclusive upper bound — all per-user bounded
    * windows, the q58 gaps-and-islands machinery applied to change
    * detection.
    */
  def scdIntervals(events: DataFrame, attrCol: String): DataFrame = {
    import events.sparkSession.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val runs = events
      .withColumn("chg",
        when(lag(col(attrCol), 1).over(byUser).isNull ||
          lag(col(attrCol), 1).over(byUser) =!= col(attrCol), 1L)
          .otherwise(0L))
      .withColumn("run",
        sum($"chg").over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"run")
      .agg(min(col(attrCol)).as("attr"), min($"ts").as("valid_from"),
        count(lit(1)).as("n_events"))
    runs
      .withColumn("valid_to",
        lead($"valid_from", 1).over(
          Window.partitionBy($"user_id").orderBy($"run")))
      .select($"user_id", $"run", $"attr", $"valid_from", $"valid_to",
        $"n_events")
  }

  /** Q84 — event-type validity intervals per user. */
  def q84ScdIntervals(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scdIntervals(Tables.load(spark, dir, "events"), "event_type")
      .orderBy($"user_id", $"run")
  }

  /** Bidirectional nearest as-of join — each event matched to the
    * NEAREST per-user daily snapshot within ± `tolUs` microseconds
    * (sensor alignment / feature backfill, where a slightly-later
    * snapshot is acceptable and nearer beats earlier). Two carry
    * passes over the same tagged per-user timeline — backward (last
    * snapshot ≤ t) and forward (first snapshot ≥ t) — then a per-row
    * arbiter picks the closer side, past winning ties. Same
    * one-shuffle sort-merge shape as the backward-only q20; never a
    * per-event probe or range explosion. A snapshot AT the event
    * instant matches at distance 0 (≤/≥ semantics, unlike q20's
    * strict <).
    */
  def nearestAsOfJoin(events: DataFrame, tolUs: Long): DataFrame = {
    import events.sparkSession.implicits._
    val wSnap = Window.partitionBy($"user_id", date_trunc("day", $"ts"))
      .orderBy($"ts".desc, $"event_id".desc)
    val snaps = events.withColumn("rn", row_number().over(wSnap))
      .filter($"rn" === 1)
      .select($"user_id", $"value".as("snap_value"), $"ts".as("snap_ts"))

    val evs = events.select($"event_id", $"user_id", $"ts",
      lit(0).as("is_snap"), lit(null).cast("double").as("s_value"),
      lit(null).cast("timestamp").as("s_ts"))
    val tagged = snaps.select(lit(null).cast("long").as("event_id"),
      $"user_id", $"snap_ts".as("ts"), lit(1).as("is_snap"),
      $"snap_value".as("s_value"), $"snap_ts".as("s_ts"))
    val tl = evs.unionByName(tagged)

    // backward: snapshot sorts BEFORE the event at an equal instant
    // (is_snap DESC) so "≤" includes the exact-time snapshot
    val wBack = Window.partitionBy($"user_id")
      .orderBy($"ts".asc, $"is_snap".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: the reversed timeline, same inclusion rule
    val wFwd = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"is_snap".desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = tl
      .withColumn("p_ts", last($"s_ts", ignoreNulls = true).over(wBack))
      .withColumn("p_value", last($"s_value", ignoreNulls = true).over(wBack))
      .withColumn("f_ts", last($"s_ts", ignoreNulls = true).over(wFwd))
      .withColumn("f_value", last($"s_value", ignoreNulls = true).over(wFwd))
      .filter($"is_snap" === 0)
    val dPast = unix_micros($"ts") - unix_micros($"p_ts")
    val dFut = unix_micros($"f_ts") - unix_micros($"ts")
    val pastOk = $"p_ts".isNotNull && dPast <= tolUs
    val futOk = $"f_ts".isNotNull && dFut <= tolUs
    carried.select($"event_id", $"user_id", $"ts",
      when(pastOk && (!futOk || dPast <= dFut), $"p_ts")
        .when(futOk, $"f_ts").as("snap_ts"),
      when(pastOk && (!futOk || dPast <= dFut), $"p_value")
        .when(futOk, $"f_value").as("snap_value"),
      when(pastOk && (!futOk || dPast <= dFut), lit("past"))
        .when(futOk, lit("future")).as("direction"))
  }

  /** Q87 — nearest snapshot within ±6 hours, past wins ties. */
  def q87NearestAsOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    nearestAsOfJoin(Tables.load(spark, dir, "events"), 6L * 3600 * 1000000)
      .orderBy($"event_id")
  }
}
