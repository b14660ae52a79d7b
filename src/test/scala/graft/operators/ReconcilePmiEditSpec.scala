package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Specs for the r4 batch-1 operators: PMI collocations (q71),
  * full-outer reconciliation (q72), edit-distance near-dup (q73).
  */
class ReconcilePmiEditSpec extends SparkSpec {
  import spark.implicits._

  // ---- q71 PMI -------------------------------------------------------

  test("pmiCollocations: hand-verified counts and PMI on a fixture") {
    val docs = Seq((0L, "a b a b"), (1L, "a b c")).toDF("doc_id", "text")
    val r = TextStats.pmiCollocations(docs, minCount = 1L, topK = 10)
      .collect().map(x => ((x.getString(0), x.getString(1)),
        (x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    // bigrams: (a,b)×3, (b,a)×1, (b,c)×1; T=5
    // c1: a→3, b→2; c2: b→3, a→1, c→1
    assert(r(("a", "b")) ==
      (3L, 3L, 3L, math.rint(math.log(3.0 * 5 / (3 * 3)) * 1e6) / 1e6))
    assert(r(("b", "a")) ==
      (1L, 2L, 1L, math.rint(math.log(1.0 * 5 / (2 * 1)) * 1e6) / 1e6))
    assert(r(("b", "c")) ==
      (1L, 2L, 1L, math.rint(math.log(1.0 * 5 / (2 * 1)) * 1e6) / 1e6))
  }

  test("pmiCollocations: marginals are consistent on the corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val full = TextStats.pmiCollocations(docs, minCount = 1L,
      topK = Int.MaxValue).cache()
    // every row's c1 ≥ c12 and c2 ≥ c12; PMI ≤ ln(T / max(c1,c2)) bound
    assert(full.filter($"c1" < $"c12" || $"c2" < $"c12").isEmpty)
    // first-slot marginal really is the sum of that word's c12 rows
    val bad = full.groupBy($"w1").agg(
        sum($"c12").as("s"), max($"c1").as("m"), min($"c1").as("lo"))
      .filter($"s" =!= $"m" || $"s" =!= $"lo")
    assert(bad.isEmpty)
  }

  // ---- q72 full-outer reconciliation --------------------------------

  test("q72: coverage flags partition the keys; defaults are zero") {
    val r = Relational.q72OuterReconcile(spark, sf).cache()
    assert(r.select($"user_id").distinct().count() == r.count())
    assert(r.filter($"coverage" === "purchase_only" &&
      ($"n_click" =!= 0L || $"click_total" =!= 0.0)).isEmpty)
    assert(r.filter($"coverage" === "click_only" &&
      ($"n_purchase" =!= 0L || $"purchase_total" =!= 0.0)).isEmpty)
    assert(r.filter($"coverage" === "both" &&
      ($"n_purchase" === 0L || $"n_click" === 0L)).isEmpty)
    // both sides' keys all present: direct recount of each slice
    val e = Tables.load(spark, sf, "events")
    val nP = e.filter($"event_type" === "purchase" &&
      $"ts" < to_timestamp(lit("2024-01-05 00:00:00")))
      .select($"user_id").distinct().count()
    val nC = e.filter($"event_type" === "click" &&
      $"ts" >= to_timestamp(lit("2024-01-25 00:00:00")))
      .select($"user_id").distinct().count()
    assert(r.filter($"n_purchase" > 0).count() == nP)
    assert(r.filter($"n_click" > 0).count() == nC)
  }

  test("q72: full outer exercises both unmatched sides on this data") {
    val r = Relational.q72OuterReconcile(spark, sf)
    val byCov = r.groupBy($"coverage").count().as[(String, Long)]
      .collect().toMap
    assert(byCov.getOrElse("purchase_only", 0L) > 0 ||
      byCov.getOrElse("click_only", 0L) > 0,
      s"slices fully overlap ($byCov) — predicate windows need retuning")
  }

  // ---- q73 edit-distance near-dup -----------------------------------

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = dp(0); dp(0) = i
      for (j <- 1 to b.length) {
        val cur = dp(j)
        dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(b.length)
  }

  test("bandedLevenshtein matches the full DP under the threshold contract") {
    val rnd = new scala.util.Random(7)
    val scratch = Array(new Array[Int](64), new Array[Int](64))
    for (_ <- 1 to 1000) {
      val a = Seq.fill(rnd.nextInt(30))(('a' + rnd.nextInt(3)).toChar).mkString
      val b = Seq.fill(rnd.nextInt(30))(('a' + rnd.nextInt(3)).toChar).mkString
      val tau = rnd.nextInt(10)
      val full = lev(a, b)
      val want = if (full <= tau) full else -1
      assert(NearDup.bandedLevenshtein(a, b, tau, scratch) == want,
        s"""a="$a" b="$b" tau=$tau full=$full""")
    }
  }

  test("editDistancePairs equals brute force on the corpus") {
    val docs = Tables.load(spark, sf, "documents").cache()
    val got = NearDup.editDistancePairs(docs)
      .as[(Long, Long, Long)].collect().toSet
    val rows = docs.select($"doc_id", $"text", $"lang", $"n_chars")
      .as[(Long, String, String, Long)].collect()
    val want = (for {
      a <- rows; b <- rows
      if a._1 < b._1 && a._3 == b._3 && math.abs(a._4 - b._4) <= 20
      d = lev(a._2, b._2) if d <= 50
    } yield (a._1, b._1, d.toLong)).toSet
    assert(got == want)
    assert(want.nonEmpty, "corpus has no planted edit-distance pairs")
  }

  test("editDistancePairs: cross-bucket pairs emit exactly once") {
    // lengths 24 and 44 straddle the width-25 bucket boundary
    // (buckets 0 and 1) with Δlen = 20 — must appear exactly once
    val a = "x" * 24
    val b = "x" * 44
    val docs = Seq((1L, a, "en", 24L), (2L, b, "en", 44L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val r = NearDup.editDistancePairs(docs).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 1L && r.head.getLong(1) == 2L
      && r.head.getLong(2) == 20L)
  }

  test("editDistancePairs: length-difference contract bounds the candidates") {
    // Δlen = 25 > maxLenDiff: excluded by contract even though the
    // edit distance (25) is within maxDist
    val docs = Seq((1L, "y" * 30, "en", 30L), (2L, "y" * 55, "en", 55L),
      (3L, "y" * 30, "fr", 30L)) // different lang: never a candidate
      .toDF("doc_id", "text", "lang", "n_chars")
    assert(NearDup.editDistancePairs(docs).isEmpty)
  }
}
