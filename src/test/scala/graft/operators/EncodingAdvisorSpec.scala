package graft.operators

import graft.SparkSpec

class EncodingAdvisorSpec extends SparkSpec {
  import spark.implicits._

  test("all four recommendations fire on planted shapes, with exact " +
      "run and distinct accounting") {
    // 4 groups × 25 rows; order inside a group is the row index.
    // enum_runs: long runs of few values      → dict_rle
    // enum_alt:  alternating few values       → dict (runs of 1)
    // inc_runs:  unique-ish but repeated ×5   → rle (long runs, many
    //            distinct values)
    // uniq:      all distinct, no runs        → plain
    val rows = for (g <- 0 until 4; i <- 0 until 25) yield (
      g.toLong, i.toLong,
      if (i < 13) "A" else "B",          // enum_runs: 2 runs per group
      if (i % 2 == 0) "X" else "Y",      // enum_alt: 25 runs per group
      (g * 25 + i) / 5 * 5,              // inc_runs: 5-long runs
      g * 25 + i)                        // uniq
    val df = rows.toDF("g", "ord", "enum_runs", "enum_alt", "inc_runs",
      "uniq")
    val got = Layout.encodingAdvisor(df, "g", Seq("ord"),
        Seq("enum_runs", "enum_alt", "inc_runs", "uniq"),
        dictMaxRatioTicks = 100000L, rleMinAvgRunTicks = 3000000L)
      .as[(String, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    // enum_runs: 2 distinct, 2 runs per group = 8 runs over 100 rows
    assert(got("enum_runs") === (("enum_runs", 100L, 2L, 20000L, 8L,
      12500000L, "dict_rle")))
    // enum_alt: 2 distinct, every row a run start
    assert(got("enum_alt") === (("enum_alt", 100L, 2L, 20000L, 100L,
      1000000L, "dict")))
    // inc_runs: 20 distinct values in 5-long runs; 4 group boundaries
    // coincide with value changes so runs = 20
    assert(got("inc_runs") === (("inc_runs", 100L, 20L, 200000L, 20L,
      5000000L, "rle")))
    // uniq: 100 distinct, 100 runs
    assert(got("uniq") === (("uniq", 100L, 100L, 1000000L, 100L,
      1000000L, "plain")))
  }

  test("group boundaries always start a run: a value continuing " +
      "across groups still breaks") {
    val rows = Seq((1L, 1L, "A"), (1L, 2L, "A"), (2L, 1L, "A"),
      (2L, 2L, "A"))
    val got = Layout.encodingAdvisor(rows.toDF("g", "ord", "v"),
        "g", Seq("ord"), Seq("v"))
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
    assert(got.head._5 === 2L) // one run per group, not one overall
  }

  test("NULL handling matches IS DISTINCT FROM: null-after-value and " +
      "value-after-null start runs, consecutive nulls do not, and an " +
      "all-null column reports 0 runs / 0 ticks instead of throwing") {
    val rows = Seq(
      (1L, 1L, Some("A"), None: Option[String]),
      (1L, 2L, None, None),      // A→null: run start
      (1L, 3L, None, None),      // null→null: NOT a run start
      (1L, 4L, Some("B"), None)) // null→B: run start
    val got = Layout.encodingAdvisor(rows.toDF("g", "ord", "v", "allnull"),
        "g", Seq("ord"), Seq("v", "allnull"))
      .as[(String, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap
    // v: runs start at ord 1 (A), 2 (null), 4 (B) = 3
    assert(got("v")._5 === 3L)
    // allnull: first row is null preceded by "null" lag — IS DISTINCT
    // FROM says no run start anywhere; ticks are guarded 0
    assert(got("allnull")._5 === 0L)
    assert(got("allnull")._6 === 0L)
  }
}
