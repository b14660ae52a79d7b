package graft.functions

import graft.SparkSpec
import graft.operators.Profiling

class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force k smallest distinct values — the sketch contract. */
  private def minK(vs: Seq[Long], k: Int): Seq[Long] =
    vs.distinct.sorted.take(k)

  test("agg reduce/merge keep exactly the k smallest distinct values " +
      "under any split and order") {
    val agg = new KmvDistinctAgg(8)
    val rnd = new scala.util.Random(8181)
    for (trial <- 1 to 20) {
      val vs = Seq.fill(120)(rnd.nextInt(60).toLong + 1L)
      // one-shot fold
      val whole = vs.foldLeft(agg.zero)(agg.reduce)
      assert(whole.toSeq === minK(vs, 8), s"fold, trial=$trial")
      // random split points, merged in both orders
      val cut = 1 + rnd.nextInt(vs.length - 1)
      val (l, r) = vs.splitAt(cut)
      val (bl, br) = (l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.merge(bl, br).toSeq === minK(vs, 8), s"merge, trial=$trial")
      assert(agg.merge(br, bl).toSeq === minK(vs, 8),
        s"merge order, trial=$trial")
    }
    // fewer distinct values than k: the sketch IS the exact set
    val few = Seq(5L, 3L, 5L, 9L, 3L)
    assert(few.foldLeft(agg.zero)(agg.reduce).toSeq === Seq(3L, 5L, 9L))
  }

  test("kmvDistinct: exact path below k, estimation path above it, " +
      "and the estimate lands within the KMV error band") {
    // 3 groups: tiny (exact path), and two large synthetic-string
    // groups where the estimate must approximate the true count
    val rows =
      Seq.tabulate(3)(i => ("tiny", s"t-$i")) ++
      Seq.tabulate(400)(i => ("big_a", s"alpha-url-$i/page")) ++
      Seq.tabulate(900)(i => ("big_b", s"beta-url-$i/item")) ++
      Seq.tabulate(400)(i => ("big_a", s"alpha-url-$i/page")) // dups
    val df = rows.toDF("g", "v")
    val got = Profiling.kmvDistinct(df, "g", "v", k = 16)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    // tiny: n_kept = n_exact = estimate = 3
    assert(got("tiny") === ((3L, 3L, 3L)))
    // big groups: full sketch, estimate within 3/sqrt(k) ≈ 75 %
    // (generous band — the spec guards gross breakage, not variance)
    for ((g, n) <- Seq(("big_a", 400L), ("big_b", 900L))) {
      val (nExact, nKept, est) = got(g)
      assert(nExact === n && nKept === 16L)
      assert(est > n / 4 && est < n * 4,
        s"$g estimate $est implausible for true $n")
    }
  }

  test("estimate is invariant to repartitioning (set semantics)") {
    val rows = Seq.tabulate(500)(i => ("g", s"url-$i"))
    val one = Profiling.kmvDistinct(
      rows.toDF("g", "v").repartition(1), "g", "v", k = 16)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val many = Profiling.kmvDistinct(
      rows.toDF("g", "v").repartition(17), "g", "v", k = 16)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(one === many)
  }
}
