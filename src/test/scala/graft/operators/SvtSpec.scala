package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Svt.aboveThreshold]] — the Sparse Vector Technique: the release
  * must equal a plain-Scala reference scan (fresh threshold draw per
  * restart, fresh per-query draw, first-pass-wins, halt at c), ship
  * at most c rows with ranks 1..#positives in query order, release
  * nothing when nothing passes, and refuse an unbounded query list.
  */
class SvtSpec extends SparkSpec {
  import spark.implicits._

  // planted counts: category cNN repeated (30 + 7*(N%9)) times
  private def fixture = spark.range(12L)
    .select(concat(lit("c"), lpad(col("id").cast("string"), 2, "0"))
        .as("cat"),
      (lit(30) + (col("id") % 9).cast("int") * lit(7)).as("reps"))
    .select(col("cat"),
      explode(sequence(lit(1), col("reps"))).as("_rep"))
    .select(col("cat"))

  private def fp(s: String): Long =
    s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)

  private def lap(key: String, b: Double): Double = {
    val m = (fp(key) * 2654435761L) % 2147483648L
    val u = (m + 0.5) / 2147483648.0
    val c = u - 0.5
    -b * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
  }

  private def reference(counts: Seq[(String, Long)], t: Long, c: Int,
      eps: Double, seed: Long): Seq[(Int, String)] = {
    val (bRho, bNu) = (2.0 * c / eps, 4.0 * c / eps)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String)]
    var restart = 1; var i = 0
    while (restart <= c && i < counts.length) {
      val rho = lap(s"$restart\u0001$seed:svtT", bRho)
      var found = false
      while (!found && i < counts.length) {
        val (cat, n) = counts(i)
        if (n + lap(s"$restart\u0001$cat\u0001$seed:svt", bNu) >=
            t + rho) { out += ((restart, cat)); found = true }
        i += 1
      }
      if (found) restart += 1
    }
    out.toSeq
  }

  test("release == the reference scan across seeds; at most c rows, " +
      "ranks consecutive, categories in query order") {
    val counts = fixture.groupBy("cat").count().orderBy("cat")
      .as[(String, Long)].collect().toSeq
    for (seed <- Seq(1L, 2L, 77L)) {
      val got = Svt.aboveThreshold(fixture, $"cat", threshold = 55L,
          c = 2, epsilonTicks = 1000000L, seed = seed)
        .orderBy("rank").as[(Int, String)].collect().toSeq
      assert(got == reference(counts, 55L, 2, 1.0, seed), s"seed $seed")
      assert(got.size <= 2)
      assert(got.map(_._1) == (1 to got.size))
      // pass order respects query (category) order
      assert(got.map(_._2) == got.map(_._2).sorted)
    }
  }

  test("nothing passes an unreachable threshold — the whole scan is " +
      "negative and free") {
    assert(Svt.aboveThreshold(fixture, $"cat", threshold = 100000L,
      c = 3).count() == 0L)
  }

  test("an unbounded category domain refuses loudly") {
    val wide = spark.range(5000L)
      .select(col("id").cast("string").as("cat"))
    val e = intercept[IllegalArgumentException] {
      Svt.aboveThreshold(wide, $"cat", threshold = 1L, c = 1)
    }
    assert(e.getMessage.contains("4096"))
  }
}
