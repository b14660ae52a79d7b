package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Specs for the r4 batch-4 operators: behavioral n-grams (q83),
  * SCD-2 intervals (q84), weighted sampling (q85).
  */
class BehaviorScdSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, String)*) =
    rows.toDF("event_id", "user_id", "event_type", "s")
      .select($"event_id", $"user_id", $"event_type",
        to_timestamp($"s").as("ts"), lit(1.0).as("value"))

  // ---- q83 behavioral n-grams ---------------------------------------

  test("behaviorNgrams: hand-verified trigrams") {
    val e = ev(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:01:00"),
      (3L, 1L, "purchase", "2024-01-01 10:02:00"),
      (4L, 1L, "view", "2024-01-01 10:03:00"),
      // u2 repeats v->c->p exactly once; u3 too short to contribute
      (5L, 2L, "view", "2024-01-01 11:00:00"),
      (6L, 2L, "click", "2024-01-01 11:01:00"),
      (7L, 2L, "purchase", "2024-01-01 11:02:00"),
      (8L, 3L, "view", "2024-01-01 12:00:00"),
      (9L, 3L, "click", "2024-01-01 12:01:00"))
    // u1 seq "vcpv" → grams vcp, cpv; u2 seq "vcp" → vcp
    val r = Temporal.behaviorNgrams(e)
      .as[(String, Long)].collect().toList
    assert(r == List(("vcp", 2L), ("cpv", 1L)))
  }

  test("behaviorNgrams: gram total equals Σ max(0, len-2) on the corpus") {
    val e = Tables.load(spark, sf, "events")
    val total = Temporal.behaviorNgrams(e, topK = Int.MaxValue)
      .agg(sum($"n")).head().getLong(0)
    val want = e.groupBy($"user_id").agg(count(lit(1)).as("len"))
      .select(sum(greatest($"len" - 2, lit(0L)))).head().getLong(0)
    assert(total == want)
  }

  // ---- q84 SCD-2 intervals ------------------------------------------

  test("scdIntervals: runs, bounds, and counts on a fixture") {
    val e = ev(
      (1L, 1L, "view", "2024-01-01 10:00:00"),
      (2L, 1L, "view", "2024-01-01 10:05:00"),
      (3L, 1L, "click", "2024-01-01 10:10:00"),
      (4L, 1L, "view", "2024-01-01 10:20:00"),
      (5L, 2L, "error", "2024-01-01 09:00:00"))
    val r = Temporal.scdIntervals(e, "event_type")
      .select($"user_id", $"run", $"attr",
        $"valid_from".cast("string"), $"valid_to".cast("string"),
        $"n_events")
      .as[(Long, Long, String, String, Option[String], Long)]
      .collect().toSet
    assert(r == Set(
      (1L, 1L, "view", "2024-01-01 10:00:00", Some("2024-01-01 10:10:00"), 2L),
      (1L, 2L, "click", "2024-01-01 10:10:00", Some("2024-01-01 10:20:00"), 1L),
      (1L, 3L, "view", "2024-01-01 10:20:00", None, 3L - 2L),
      (2L, 1L, "error", "2024-01-01 09:00:00", None, 1L)))
  }

  test("scdIntervals: intervals tile each user's timeline") {
    val e = Tables.load(spark, sf, "events")
    val r = Temporal.scdIntervals(e, "event_type").cache()
    // event counts conserve
    assert(r.agg(sum($"n_events")).head().getLong(0) == e.count())
    // exactly one open interval per user, and it is the last run
    val open = r.filter($"valid_to".isNull)
    assert(open.count() == e.select($"user_id").distinct().count())
    val lastRun = r.groupBy($"user_id").agg(max($"run").as("run"))
    assert(open.join(lastRun, Seq("user_id", "run"), "left_anti").isEmpty)
    // intervals are disjoint and ordered: valid_from < valid_to, and
    // consecutive runs chain exactly
    assert(r.filter($"valid_to".isNotNull &&
      $"valid_from" >= $"valid_to").isEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"run")
    val chained = r.withColumn("next_from", lead($"valid_from", 1).over(w))
      .filter($"next_from".isNotNull && $"valid_to" =!= $"next_from")
    assert(chained.isEmpty)
  }

  // ---- q85 weighted sampling ----------------------------------------

  test("weightedSample: deterministic, sized, and weight-sensitive") {
    val docs = Tables.load(spark, sf, "documents")
    val r1 = Curation.q85WeightedSample(spark, sf)
      .as[(String, Long, Double)].collect().toList
    val r2 = Curation.q85WeightedSample(spark, sf)
      .as[(String, Long, Double)].collect().toList
    assert(r1 == r2)
    // exactly 10 per language (every language has > 10 docs here)
    val sizes = r1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.values.forall(_ == 10))
    // heavier docs are over-represented: the sampled mean n_chars
    // exceeds the corpus mean (length-weighted draw)
    val sampled = docs.join(
      r1.map(x => (x._1, x._2)).toDF("lang", "doc_id"),
      Seq("lang", "doc_id"), "left_semi")
    val mSample = sampled.agg(avg($"n_chars")).head().getDouble(0)
    val mAll = docs.agg(avg($"n_chars")).head().getDouble(0)
    assert(mSample > mAll,
      s"weighted sample mean $mSample ≤ corpus mean $mAll")
  }
}
