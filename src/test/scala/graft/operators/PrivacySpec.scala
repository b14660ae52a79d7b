package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Privacy]] — the pre-release privacy audit: k-anonymity /
  * l-diversity census semantics (hand-counted groups, NULL quasi
  * values as their own linkable combination), and the suppression
  * release invariant (every released row sits in a group of ≥ k; the
  * released set is exactly the census's safe groups).
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (nation, segment, sensitive)
    ("US", "AUTO", 1L), ("US", "AUTO", 1L), ("US", "AUTO", 2L),
    ("US", "BIKE", 1L),
    ("DE", "AUTO", 1L), ("DE", "AUTO", 2L), ("DE", "AUTO", 3L),
    (null, "AUTO", 9L), (null, "AUTO", 9L))

  private def df = rows.toDF("nation", "segment", "sens")

  test("census counts groups and sensitive diversity exactly; NULL " +
      "quasi values form their own combination; flags follow k and l") {
    val got = Privacy
      .kAnonymityCensus(df, Seq("nation", "segment"), $"sens",
        k = 3L, l = 2L)
      .as[(Option[String], String, Long, Long, Boolean, Boolean)]
      .collect().toSet
    assert(got === Set(
      (Some("US"), "AUTO", 3L, 2L, false, false),
      (Some("US"), "BIKE", 1L, 1L, true, true),
      (Some("DE"), "AUTO", 3L, 3L, false, false),
      (None, "AUTO", 2L, 1L, true, true)))
  }

  test("suppression releases exactly the rows of >= k groups — the " +
      "NULL group suppresses like any other small group; the released " +
      "set has min group size >= k by construction") {
    val released = Privacy.kSuppress(df, Seq("nation", "segment"), k = 3L)
    val got = released.as[(Option[String], String, Long)].collect().toSeq
    assert(got.size === 6)
    assert(got.forall(r => r._1.contains("US") && r._2 == "AUTO" ||
      r._1.contains("DE") && r._2 == "AUTO"))
    // invariant: re-census of the release shows no k-risk group
    val recensus = Privacy
      .kAnonymityCensus(released, Seq("nation", "segment"), $"sens",
        k = 3L, l = 1L)
    assert(recensus.filter($"k_risk").isEmpty)
  }

  test("dpCounts: released counts equal a driver-side recompute of " +
      "the inverse-CDF Laplace formula; noise is bounded, seeded, " +
      "non-vacuous, and the zero clamp holds") {
    val data = (1 to 40).map(i => (s"n${i % 5}", s"s${i % 2}", i.toLong))
    val d = data.toDF("nation", "segment", "id")
    val eps = 400000L // 0.4 -> b = 2.5
    val b = 1e6 / eps
    def fp(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    def lap(key: String): Double = {
      val m = (fp(key) * 2654435761L) % 2147483648L
      val u = (m + 0.5) / 2147483648.0
      val c = u - 0.5
      -b * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
    }
    def expected(seed: Long): Map[(String, String), Long] =
      data.groupBy(r => (r._1, r._2)).map { case ((n, s), rs) =>
        val noise = lap(n + "\u0001" + s + "\u0001" + seed)
        (n, s) -> math.max(0L,
          rs.size + BigDecimal(noise)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    val got = Privacy.dpCounts(d, Seq("nation", "segment"),
        epsilonTicks = eps, seed = 7L)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === expected(7L))
    assert(got.values.forall(_ >= 0L))
    // non-vacuous: at eps 0.4 some group really moved off its true n
    val truth = data.groupBy(r => (r._1, r._2)).view.mapValues(_.size.toLong)
    assert(got.exists { case (k, v) => truth(k) != v })
    // deterministic per seed; a different seed draws different noise
    val again = Privacy.dpCounts(d, Seq("nation", "segment"),
        epsilonTicks = eps, seed = 7L)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(again === got)
    val other = Privacy.dpCounts(d, Seq("nation", "segment"),
        epsilonTicks = eps, seed = 8L)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(other === expected(8L))
    assert(other !== got)
    // noise bound: |released - n| <= b * ln(1e9+7) + 1 (rounding)
    val bound = b * math.log(2147483648.0) + 1
    assert(got.forall { case (k, v) => math.abs(v - truth(k)) <= bound })
    // clamp really fires somewhere over the seed space on a 1-row
    // group (negative noise beyond the count floors at zero)
    val tiny = Seq(("solo", "g", 1L)).toDF("nation", "segment", "id")
    val clamped = (0L to 200L).exists { s =>
      Privacy.dpCounts(tiny, Seq("nation", "segment"),
          epsilonTicks = eps, seed = s)
        .as[(String, String, Long)].head()._3 == 0L
    }
    assert(clamped)
  }

  test("generalize picks the smallest k-anonymous width on the " +
      "ladder, releases every row there, and falls back to residual " +
      "suppression at the coarsest width") {
    // one segment, values 0..19: at width 5 each band holds 5 rows,
    // at width 10 each holds 10
    val d = (0 until 20).map(i => ("A", i.toDouble, i.toLong))
      .toDF("seg", "v", "id")
    val r5 = Privacy.generalize(d, Seq("seg"), "v", k = 5L,
        baseWidth = 5.0, maxDoublings = 3)
      .select($"id", $"band", $"width")
      .as[(Long, Long, Double)].collect().toSeq
    assert(r5.size === 20 && r5.forall(_._3 === 5.0))
    assert(r5.map(_._2).distinct.sorted === Seq(0L, 1L, 2L, 3L))
    // k = 7 cannot hold at width 5 (bands of 5) but holds at 10
    val r7 = Privacy.generalize(d, Seq("seg"), "v", k = 7L,
        baseWidth = 5.0, maxDoublings = 3)
      .select($"id", $"width").as[(Long, Double)].collect()
    assert(r7.length === 20 && r7.forall(_._2 === 10.0))
    // k = 30 unreachable even at the coarsest width (20 rows total
    // in one band at width 40): residual suppression empties the
    // release rather than shipping a linkable group
    val r30 = Privacy.generalize(d, Seq("seg"), "v", k = 30L,
        baseWidth = 5.0, maxDoublings = 3)
    assert(r30.isEmpty)
    // partial residual: two segments, one tiny — the tiny one
    // suppresses at the chosen width, the big one releases
    val d2 = ((0 until 16).map(i => ("A", (i % 4).toDouble, i.toLong)) ++
      Seq(("B", 0.0, 99L))).toDF("seg", "v", "id")
    val r = Privacy.generalize(d2, Seq("seg"), "v", k = 4L,
        baseWidth = 1.0, maxDoublings = 2)
      .select($"id").as[Long].collect().toSet
    assert(!r.contains(99L) && r.size === 16)
  }

  test("property: for random data, the release equals the rows whose " +
      "census group is safe, and suppressed rows are exactly the " +
      "k-risky groups' rows") {
    val rnd = new scala.util.Random(175L)
    for (round <- 1 to 5) {
      val data = (1 to 60 + rnd.nextInt(60)).map { i =>
        (s"n${rnd.nextInt(4)}", s"s${rnd.nextInt(3)}", rnd.nextInt(5).toLong, i.toLong)
      }
      val d = data.toDF("nation", "segment", "sens", "id")
      val k = 2L + rnd.nextInt(4)
      val released = Privacy.kSuppress(d, Seq("nation", "segment"), k)
        .select($"id").as[Long].collect().toSet
      val sizes = data.groupBy(r => (r._1, r._2))
        .map { case (g, rs) => g -> rs.size }
      val want = data.filter(r => sizes((r._1, r._2)) >= k)
        .map(_._4).toSet
      assert(released === want, s"round $round k=$k")
    }
  }
}
