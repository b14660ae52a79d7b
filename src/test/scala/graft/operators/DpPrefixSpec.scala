package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[DpPrefix.dpPrefixCounts]] — the binary mechanism's dyadic
  * bookkeeping, isolated from the noise: with ε huge the per-node
  * Laplace rounds to zero and the released prefixes must equal the
  * true running counts exactly (the decomposition identity); with a
  * working ε the error at every tick stays inside the deterministic
  * seam's hard noise bound (popcount(t) draws, each ≤ b·ln 2^31).
  */
class DpPrefixSpec extends SparkSpec {
  import spark.implicits._

  // 500 events over a 300-tick domain, clustered mid-range
  private def fixture = spark.range(500L)
    .select(((col("id") * 37 % 293) + 1).as("tick"))

  private def truePrefix = fixture.groupBy(col("tick"))
    .agg(count(lit(1)).as("n"))
    .withColumn("true_n", sum(col("n")).over(
      Window.orderBy(col("tick"))))
    .select(col("tick"), col("true_n"))

  test("epsilon -> infinity: released == the true running count at " +
      "every occupied tick (the dyadic decomposition identity)") {
    val released = DpPrefix.dpPrefixCounts(fixture, col("tick"),
      levels = 9, epsilonTicks = 1000000000000L, seed = 7L)
    val joined = released.join(truePrefix, "tick")
      .filter(col("released_n") =!= col("true_n"))
    assert(joined.count() == 0L,
      joined.limit(5).collect().mkString("; "))
  }

  test("working epsilon: |released - true| <= popcount(t) * " +
      "ceil(b * ln 2^31) at every tick — the seam's hard noise bound") {
    val levels = 9
    val b = levels * 1e6 / 1000000L
    val perNode = math.ceil(b * math.log(2147483648.0)).toLong
    val released = DpPrefix.dpPrefixCounts(fixture, col("tick"),
      levels = levels, epsilonTicks = 1000000L, seed = 7L)
    val bad = released.join(truePrefix, "tick")
      .withColumn("bound", lit(perNode) *
        bit_count(col("tick")).cast("long"))
      .filter(abs(col("released_n") - col("true_n")) > col("bound"))
    assert(bad.count() == 0L, bad.limit(5).collect().mkString("; "))
  }

  test("a tick domain wider than 2^levels is refused loudly") {
    val e = intercept[IllegalArgumentException] {
      DpPrefix.dpPrefixCounts(fixture, col("tick"), levels = 8)
    }
    assert(e.getMessage.contains("does not fit"))
  }

  test("non-positive ticks are refused (the 1-based contract)") {
    val e = intercept[IllegalArgumentException] {
      DpPrefix.dpPrefixCounts(
        spark.range(5L).select((col("id") - 2).as("t")), col("t"))
    }
    assert(e.getMessage.contains("1-based"))
  }

  test("empty input releases an empty frame") {
    assert(DpPrefix.dpPrefixCounts(
      fixture.filter(lit(false)), col("tick")).count() == 0L)
  }
}
