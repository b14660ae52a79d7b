package graft.operators

import graft.SparkSpec

class MixtureBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)], pct: Int = 200,
      cap: Long = 4000000L) =
    Curation.mixtureBudget(
        rows.toDF("source", "avail_tokens", "weight"), pct, cap)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap

  test("hand-traced realization: targets, epochs, cap and deficit") {
    // corpus 1000 tokens, budget 200% = 2000, Σw = 10
    // a: w=6 → target 1200 over 200 avail = 6 epochs → capped at 4,
    //    realized 800, deficit 400
    // b: w=3 → target 600 over 700 avail = 0.857142 epochs
    // c: w=1 → target 200 over 100 avail = 2 epochs exactly
    val got = run(Seq(("a", 200L, 6L), ("b", 700L, 3L), ("c", 100L, 1L)))
    assert(got("a") === (("a", 200L, 6L, 1200L, 6000000L, 4000000L,
      800L, 400L)))
    assert(got("b") === (("b", 700L, 3L, 600L, 857142L, 857142L,
      599L, 1L))) // floor ticks: realized 700·857142 div 1e6 = 599
    assert(got("c") === (("c", 100L, 1L, 200L, 2000000L, 2000000L,
      200L, 0L)))
  }

  test("invariants on a randomized schedule: floor-share targets " +
      "never exceed the budget, realized never exceeds target, " +
      "deficits are non-negative and zero exactly when uncapped") {
    val rnd = new scala.util.Random(4444)
    for (trial <- 1 to 10) {
      val rows = Seq.tabulate(12)(i =>
        (s"s$i", rnd.nextInt(5000).toLong + 1L, rnd.nextInt(20).toLong + 1L))
      val pct = 100 + rnd.nextInt(300)
      val got = run(rows, pct).values
      val budget = rows.map(_._2).sum * pct / 100
      assert(got.map(_._4).sum <= budget, s"trial $trial: Σtarget > budget")
      for (r <- got) {
        assert(r._7 <= r._4, s"trial $trial: realized > target")
        assert(r._8 >= 0, s"trial $trial: negative deficit")
        assert(r._6 <= r._5, s"trial $trial: capped > raw epochs")
        if (r._5 <= 4000000L)
          // uncapped: deficit is only the 1e-6-tick floor loss,
          // strictly less than one millionth of avail plus one token
          assert(r._8 <= r._2 / 1000000L + 1L,
            s"trial $trial: uncapped deficit ${r._8} too large")
      }
    }
  }

  test("a zero-avail source reports zero epochs and its full target " +
      "as deficit (the reassignment signal)") {
    val got = run(Seq(("dead", 0L, 5L), ("live", 1000L, 5L)))
    val d = got("dead")
    assert(d._5 === 0L && d._6 === 0L && d._7 === 0L)
    assert(d._8 === d._4)
  }
}
