package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[LocalDp.rrFrequency]] — the k-ary randomized-response channel:
  * deterministic per seed, total (every category ships), the channel
  * identity Σ est = n (exact before rounding), the domain guards,
  * and the r16 coin-independence regression (two salted keys made
  * the flip and other-pick coins perfectly correlated; the
  * two-multiplier remix must keep the conditional other-pick
  * distribution flat).
  */
class LocalDpSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = spark.range(1200L).select(
    concat(lit("c"), (col("id") % 4).cast("string")).as("cat"),
    col("id").as("rk"))

  test("deterministic per seed; all categories ship; reported " +
      "counts sum to n; sum of estimates == n up to rounding") {
    val a = LocalDp.rrFrequency(fixture, $"cat", $"rk",
      epsilonTicks = 1000000L, seed = 3L).collect().toSeq
    val b = LocalDp.rrFrequency(fixture, $"cat", $"rk",
      epsilonTicks = 1000000L, seed = 3L).collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
    assert(a.map(_.getString(0)).sorted == Seq("c0", "c1", "c2", "c3"))
    assert(a.map(_.getLong(1)).sum == 1200L)
    // sum-preservation: sum est = (sum c_v - n*k*q)/(p-q) = n exactly
    assert(math.abs(a.map(_.getLong(2)).sum - 1200L) <= 4L,
      s"estimates sum ${a.map(_.getLong(2)).sum}")
    // a different seed reports differently
    val c = LocalDp.rrFrequency(fixture, $"cat", $"rk",
      epsilonTicks = 1000000L, seed = 4L).collect().toSeq
    assert(c.map(_.getLong(1)) != a.map(_.getLong(1)))
  }

  test("estimates land near truth on a skewed fixture — the " +
      "regression that caught the correlated-coin seam (7-sigma " +
      "misses before the two-multiplier remix)") {
    // 700 / 300 / 200 split; eps = 1, n = 1200: est std ~ 35
    val skewed = spark.range(1200L).select(
      when(col("id") < 700, "x").when(col("id") < 1000, "y")
        .otherwise("z").as("cat"),
      col("id").as("rk"))
    val est = LocalDp.rrFrequency(skewed, $"cat", $"rk",
        epsilonTicks = 1000000L, seed = 9L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val truth = Map("x" -> 700L, "y" -> 300L, "z" -> 200L)
    truth.foreach { case (k, t) =>
      assert(math.abs(est(k) - t) < 150L,
        s"$k: est ${est(k)} vs true $t")
    }
  }

  test("conditional other-pick stays flat: among flipped rows of one " +
      "true category, every other category is picked a comparable " +
      "number of times (the correlated seam pinned one at zero)") {
    val oneCat = spark.range(3000L).select(
      when(col("id") % 7 === 0, "a").otherwise("b").as("cat"),
      col("id").as("rk"))
    // with 2 categories the pick is forced; use 4 planted categories
    val four = spark.range(3000L).select(
      lit("c1").as("cat"), col("id").as("rk"))
      .union(spark.range(3L).select(
        concat(lit("c"), (col("id") + 2).cast("string")).as("cat"),
        (col("id") + 5000L).as("rk")))
    val rep = LocalDp.rrFrequency(four, $"cat", $"rk",
        epsilonTicks = 1000000L, seed = 1L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~1670 of the 3000 c1 rows flip, uniformly over c2/c3/c4
    val others = Seq("c2", "c3", "c4").map(rep)
    assert(others.min > 0L, s"a pick slot starved: $rep")
    assert(others.max <= 2 * others.min,
      s"conditional pick skewed: $rep")
    assert(oneCat.count() == 3000L) // fixture sanity
  }

  test("domain guards: < 2 categories and > 4096 categories refuse") {
    val e1 = intercept[IllegalArgumentException] {
      LocalDp.rrFrequency(
        spark.range(10L).select(lit("only").as("cat"),
          col("id").as("rk")), $"cat", $"rk")
    }
    assert(e1.getMessage.contains("at least 2"))
    val e2 = intercept[IllegalArgumentException] {
      LocalDp.rrFrequency(
        spark.range(5000L).select(col("id").cast("string").as("cat"),
          col("id").as("rk")), $"cat", $"rk")
    }
    assert(e2.getMessage.contains("4096"))
  }
}
