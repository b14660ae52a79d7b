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

  test("k+l suppression: a k-large group whose sensitive attribute " +
      "barely varies suppresses too — plain k-suppression releases " +
      "it (the r14 gap this closes)") {
    val d = Seq(
      // k-passes (4 rows) but l_div = 1: the attribute-disclosure group
      ("US", "AUTO", 1L, 1L), ("US", "AUTO", 1L, 2L),
      ("US", "AUTO", 1L, 3L), ("US", "AUTO", 1L, 4L),
      // passes both k=3 and l=2
      ("DE", "AUTO", 1L, 5L), ("DE", "AUTO", 2L, 6L),
      ("DE", "AUTO", 3L, 7L), ("DE", "AUTO", 1L, 8L),
      ("FR", "BIKE", 1L, 9L), ("FR", "BIKE", 2L, 10L),
      ("FR", "BIKE", 2L, 11L),
      // fails k
      ("JP", "AUTO", 1L, 12L))
      .toDF("nation", "segment", "sens", "id")
    val plainIds = Privacy.kSuppress(d, Seq("nation", "segment"), 3L)
      .select($"id").as[Long].collect().toSet
    assert(plainIds === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L))
    val klIds = Privacy.kSuppress(d, Seq("nation", "segment"), 3L,
        sensitive = Some($"sens"), l = 2L)
      .select($"id").as[Long].collect().toSet
    assert(klIds === Set(5L, 6L, 7L, 8L, 9L, 10L, 11L))
    // invariant: re-census of the k+l release flags nothing
    val recensus = Privacy.kAnonymityCensus(
      Privacy.kSuppress(d, Seq("nation", "segment"), 3L,
        sensitive = Some($"sens"), l = 2L),
      Seq("nation", "segment"), $"sens", k = 3L, l = 2L)
    assert(recensus.filter($"k_risk" || $"l_risk").isEmpty)
    // l > 1 without the sensitive column is a loud error
    intercept[IllegalArgumentException] {
      Privacy.kSuppress(d, Seq("nation", "segment"), 3L, l = 2L)
    }
  }

  test("dpSum: per-row clamp bounds the sensitivity, the sum is " +
      "exact long arithmetic, and the release equals a driver-side " +
      "recompute of the seeded draw") {
    // values straddle the clamp range [-10, 10] on both sides
    val data = Seq(
      ("A", -25L), ("A", 3L), ("A", 40L),   // clamped: -10 + 3 + 10 = 3
      ("B", 5L), ("B", 7L),                 // in range: 12
      ("C", -2L))                           // -2
    val d = data.toDF("g", "v")
    val eps = 500000L // 0.5 -> b = (hi-lo)/eps = 20/0.5 = 40
    val b = (10L - (-10L)) * 1e6 / eps
    def fp(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    def lap(key: String): Double = {
      val m = (fp(key) * 2654435761L) % 2147483648L
      val u = (m + 0.5) / 2147483648.0
      val c = u - 0.5
      -b * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
    }
    def draw(g: String, seed: Long): Long =
      BigDecimal(lap(g + "\u0001" + seed + ":sum"))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val clampedSums = Map("A" -> 3L, "B" -> 12L, "C" -> -2L)
    val got = Privacy.dpSum(d, Seq("g"), $"v", loTicks = -10L,
        hiTicks = 10L, epsilonTicks = eps, seed = 9L)
      .as[(String, Long)].collect().toMap
    assert(got === clampedSums.map { case (g, s) => g -> (s + draw(g, 9L)) })
    // seed changes the noise, determinism per seed
    val again = Privacy.dpSum(d, Seq("g"), $"v", loTicks = -10L,
        hiTicks = 10L, epsilonTicks = eps, seed = 9L)
      .as[(String, Long)].collect().toMap
    assert(again === got)
    val other = Privacy.dpSum(d, Seq("g"), $"v", loTicks = -10L,
        hiTicks = 10L, epsilonTicks = eps, seed = 10L)
      .as[(String, Long)].collect().toMap
    assert(other === clampedSums.map { case (g, s) => g -> (s + draw(g, 10L)) })
    assert(other !== got)
    // noise is bounded by the mechanism's own ceiling
    val bound = b * math.log(2147483648.0) + 1
    assert(got.forall { case (g, v) =>
      math.abs(v - clampedSums(g)) <= bound })
    intercept[IllegalArgumentException] {
      Privacy.dpSum(d, Seq("g"), $"v", loTicks = 10L, hiTicks = 10L)
    }
  }

  test("dpMean: epsilon splits across the sum and count draws, the " +
      "denominator clamps at 1, and the release equals the " +
      "driver-side recompute") {
    val data = Seq(("A", 4L), ("A", 8L), ("A", 100L), ("B", 6L))
    val d = data.toDF("g", "v")
    val (lo, hi) = (0L, 10L)
    val eps = 400000L // 0.4: epsSum = epsCnt = 200000 (0.2 each)
    val bSum = (hi - lo) * 1e6 / 200000L
    val bCnt = 1e6 / 200000.0
    def fp(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    def lap(f: Long, mult: Long, b: Double): Double = {
      val m = (f * mult) % 2147483648L
      val u = (m + 0.5) / 2147483648.0
      val c = u - 0.5
      -b * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
    }
    def rnd(x: Double): Long = BigDecimal(x)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def expected(seed: Long): Map[String, Double] = {
      val sums = Map("A" -> (4L + 8L + 10L), "B" -> 6L) // 100 clamps to 10
      val ns = Map("A" -> 3L, "B" -> 1L)
      sums.map { case (g, s) =>
        // one :mean key, two multiplier remixes (r16 decorrelation)
        val f = fp(g + "\u0001" + seed + ":mean")
        val noisedS = s + rnd(lap(f, 2654435761L, bSum))
        val noisedN = math.max(1L,
          ns(g) + rnd(lap(f, 2246822519L, bCnt)))
        g -> noisedS.toDouble / noisedN.toDouble
      }
    }
    val got = Privacy.dpMean(d, Seq("g"), $"v", lo, hi,
        epsilonTicks = eps, seed = 11L)
      .as[(String, Double)].collect().toMap
    assert(got === expected(11L))
    // the max(1, ...) denominator clamp is reachable over the seed
    // space on a 1-row group at this count-noise scale (b = 5)
    val tiny = Seq(("solo", 5L)).toDF("g", "v")
    val clampFired = (0L to 300L).exists { s =>
      val m = Privacy.dpMean(tiny, Seq("g"), $"v", lo, hi,
          epsilonTicks = eps, seed = s)
        .as[(String, Double)].head()._2
      // denominator 1 means the release IS the noised sum exactly
      val fSolo = fp("solo" + "\u0001" + s + ":mean")
      val noisedS = 5L + rnd(lap(fSolo, 2654435761L, bSum))
      val noisedN = 1L + rnd(lap(fSolo, 2246822519L, bCnt))
      noisedN < 1L && m == noisedS.toDouble
    }
    assert(clampFired)
  }

  test("generalize's histogram-rollup ladder picks the identical " +
      "width as the r14 row-explode formulation on random data " +
      "(floor(floor(v/w)/2^j) = floor(v/(w*2^j)))") {
    val rnd = new scala.util.Random(178L)
    for (round <- 1 to 5) {
      val n = 40 + rnd.nextInt(80)
      val data = (0 until n).map { i =>
        (s"s${rnd.nextInt(3)}",
          (rnd.nextDouble() - 0.3) * 2000.0, i.toLong)
      }
      val d = data.toDF("seg", "v", "id")
      val (k, bw, mj) = (2L + rnd.nextInt(6), 37.5, 4)
      // the r14 explode formulation, inline: min group size per width
      val explodeMins = d
        .withColumn("_j", explode(lit((0 to mj).toArray)))
        .withColumn("_band",
          floor($"v" / (lit(bw) * pow(lit(2.0), $"_j"))).cast("long"))
        .groupBy($"_j", $"seg", $"_band").agg(count(lit(1)).as("_n"))
        .groupBy($"_j").agg(min($"_n").as("_mn"))
        .as[(Int, Long)].collect().toMap
      val jWant = (0 to mj).find(j => explodeMins.get(j).exists(_ >= k))
        .getOrElse(mj)
      val wWant = bw * (1L << jWant)
      val got = Privacy.generalize(d, Seq("seg"), "v", k, bw, mj)
        .select($"id", $"band", $"width")
        .as[(Long, Long, Double)].collect()
      assert(got.forall(_._3 === wWant), s"round $round")
      // and the released rows equal the explode-picked width's own
      // k-suppression
      val want = data.groupBy(r => (r._1, math.floor(r._2 / wWant).toLong))
        .filter(_._2.size >= k).flatMap(_._2.map(_._3)).toSet
      assert(got.map(_._1).toSet === want, s"round $round")
    }
    // the 2^j ladder overflow guard (r14 ADVICE)
    val d = Seq(("A", 1.0, 1L)).toDF("seg", "v", "id")
    intercept[IllegalArgumentException] {
      Privacy.generalize(d, Seq("seg"), "v", 1L, 1.0, 63)
    }
  }

  test("quasiScan: hand-computed uniqueness stats per combination in " +
      "one grouping-sets pass; refinement monotonicity (a superset " +
      "combo never loses singletons); loud combinatorial guards") {
    // a: 2 values, b: 3 values; (a, b) has two singleton combos
    val d = Seq(
      ("x", 1L, 1L), ("x", 1L, 2L), ("x", 2L, 3L),
      ("y", 2L, 4L), ("y", 3L, 5L))
      .toDF("a", "b", "id")
    val got = Privacy.quasiScan(d, Seq("a", "b"), maxArity = 2, k = 2L)
      .as[(String, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // a: groups x(3), y(2) -> no singletons, no rows under k=2
    // b: 1(2), 2(2), 3(1) -> 1 singleton, 1 row at risk
    // a+b: x1(2), x2(1), y2(1), y3(1) -> 3 singletons, 3 rows at risk
    assert(got === Map(
      "a" -> ((1, 2L, 0L, 0L)),
      "b" -> ((1, 3L, 1L, 1L)),
      "a+b" -> ((2, 4L, 3L, 3L))))
    // refinement: singletons("a+b") >= singletons("a"), ("b")
    assert(got("a+b")._3 >= got("a")._3 && got("a+b")._3 >= got("b")._3)
    // NULL candidate values form their own (linkable) combination
    val dn = Seq((Some("x"), 1L), (Option.empty[String], 2L),
      (Option.empty[String], 3L)).toDF("a", "id")
    val gn = Privacy.quasiScan(dn, Seq("a"), 1, 2L)
      .as[(String, Int, Long, Long, Long)].head()
    assert(gn === (("a", 1, 2L, 1L, 1L))) // groups {x}, {NULL x2}
    intercept[IllegalArgumentException] {
      Privacy.quasiScan(d, Seq("a", "a"), 1, 2L)
    }
    intercept[IllegalArgumentException] {
      Privacy.quasiScan(d, Seq("a", "b"), 3, 2L)
    }
    intercept[IllegalArgumentException] {
      Privacy.quasiScan(d,
        (1 to 12).map(i => s"c$i"), 12, 2L) // 4095 sets > 256 cap
    }
  }

  test("t-closeness: hand-computed ordered-domain EMD per group; a " +
      "skewed-distribution group flags even though it would pass k " +
      "and l; suppression releases exactly the within-t groups") {
    // global sens distribution over domain {1, 2}: (4/6, 2/6)
    // A = (1,1,2,2): cum diff at 1 = |2/4 - 4/6| = 1/6 -> 166667
    // B = (1,1):     cum diff at 1 = |1 - 2/3|  = 1/3 -> 333333
    val d = Seq(("A", 1L, 1L), ("A", 1L, 2L), ("A", 2L, 3L),
      ("A", 2L, 4L), ("B", 1L, 5L), ("B", 1L, 6L))
      .toDF("g", "sens", "id")
    val got = Privacy.tClosenessCensus(d, Seq("g"), $"sens", 200000L)
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(got === Set(("A", 4L, 166667L, false),
      ("B", 2L, 333333L, true)))
    val rel = Privacy.tSuppress(d, Seq("g"), $"sens", 200000L)
      .select($"id").as[Long].collect().toSet
    assert(rel === Set(1L, 2L, 3L, 4L))
    // B passes k=2 and l=1 — t is the model that catches it
    val kl = Privacy.kSuppress(d, Seq("g"), 2L,
        sensitive = Some($"sens"), l = 1L)
      .select($"id").as[Long].collect().toSet
    assert(kl === Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("t-closeness: NULL sensitive rows are excluded from the " +
      "distance (ordered EMD needs a position); a single-value " +
      "domain has EMD 0; an all-NULL group never releases") {
    val d = Seq(
      ("A", Some(1L), 1L), ("A", Some(2L), 2L), ("A", None, 3L),
      ("B", Some(1L), 4L), ("B", Some(2L), 5L),
      ("C", None, 6L), ("C", None, 7L))
      .toDF("g", "sens", "id")
    val census = Privacy.tClosenessCensus(d, Seq("g"), $"sens", 100000L)
      .as[(String, Long, Long, Boolean)].collect().toSet
    // A and B both see (1, 2) once each = exactly the global
    // distribution -> EMD 0; the NULL rows don't skew A; C (all
    // NULL) has no census row at all
    assert(census === Set(("A", 2L, 0L, false), ("B", 2L, 0L, false)))
    // suppression: safe groups release ALL their rows (the NULL-sens
    // row of A rides along — group membership is the quasi key);
    // C has no distance evidence, so it conservatively suppresses
    val rel = Privacy.tSuppress(d, Seq("g"), $"sens", 100000L)
      .select($"id").as[Long].collect().toSet
    assert(rel === Set(1L, 2L, 3L, 4L, 5L))
    // single-value domain: every group's EMD is 0 by definition
    val one = Seq(("A", 7L, 1L), ("B", 7L, 2L)).toDF("g", "sens", "id")
    val c1 = Privacy.tClosenessCensus(one, Seq("g"), $"sens", 0L)
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(c1 === Set(("A", 1L, 0L, false), ("B", 1L, 0L, false)))
  }

  test("dpTopK: released ranks equal a driver-side recompute of the " +
      "Gumbel-perturbed exponential-mechanism scores; counts never " +
      "ship; the noisy ranking genuinely deviates from the true one") {
    val data = (1 to 100).map { i =>
      // group sizes 22/21/20/19/18 over g0..g4: close enough that
      // Gumbel noise at eps/k = 0.2 actually reorders
      val g = if (i <= 22) 0 else if (i <= 43) 1 else if (i <= 63) 2
        else if (i <= 82) 3 else 4
      (s"g$g", i.toLong)
    }
    val d = data.toDF("g", "id")
    val (k, eps, seed) = (3, 1000000L, 17L)
    val coef = eps / 1e6 / k / 2.0
    def fp(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    def gumbel(key: String): Double = {
      val m = (fp(key) * 2654435761L) % 2147483648L
      val u = (m + 0.5) / 2147483648.0
      -math.log(-math.log(u))
    }
    def expected(seed: Long): Seq[(String, Int)] =
      data.groupBy(_._1).view.mapValues(_.size).toSeq
        .map { case (g, n) =>
          (g, coef * n + gumbel(g + "\u0001" + seed + ":topk"))
        }
        .sortBy { case (g, s) => (-s, g) }
        .take(k).zipWithIndex.map { case ((g, _), i) => (g, i + 1) }
    val got = Privacy.dpTopK(d, Seq("g"), k, eps, seed)
      .as[(String, Int)].collect().toSeq
    assert(got.map(_._1).toSet.size === k)
    assert(got === expected(seed))
    assert(!Privacy.dpTopK(d, Seq("g"), k, eps, seed)
      .columns.contains("_n")) // counts never ship
    // determinism per seed; and over the seed space the selection
    // really deviates from the true top-k order (non-vacuous noise)
    assert(Privacy.dpTopK(d, Seq("g"), k, eps, seed)
      .as[(String, Int)].collect().toSeq === got)
    val trueTop = Seq("g0", "g1", "g2").zipWithIndex
      .map { case (g, i) => (g, i + 1) }
    val deviates = (0L to 40L).exists { s =>
      Privacy.dpTopK(d, Seq("g"), k, eps, s)
        .as[(String, Int)].collect().toSeq != trueTop
    }
    assert(deviates)
    // every seed's release matches its own recompute
    (0L to 10L).foreach { s =>
      assert(Privacy.dpTopK(d, Seq("g"), k, eps, s)
        .as[(String, Int)].collect().toSeq === expected(s), s"seed $s")
    }
  }

  test("releaseQuality: hand-computed NCP and discernibility per " +
      "partition; a zero-width domain contributes zero penalty") {
    // two partitions over dims a, b: global ranges a: 10, b: 0
    val rel = Seq(
      (1L, 0.0, 5.0, 7.0, 7.0), (2L, 0.0, 5.0, 7.0, 7.0),
      (3L, 0.0, 5.0, 7.0, 7.0),
      (4L, 5.0, 10.0, 7.0, 7.0), (5L, 5.0, 10.0, 7.0, 7.0))
      .toDF("id", "a_lo", "a_hi", "b_lo", "b_hi")
    val got = Privacy.releaseQuality(rel, Seq("a", "b"),
        Map("a" -> 10.0, "b" -> 0.0))
      .orderBy($"a_lo")
      .as[(Double, Double, Double, Double, Long, Long, Long)]
      .collect().toSeq
    // ncp = ((5/10) + 0)/2 = 0.25 -> 250000 ticks; dm = n^2
    assert(got === Seq(
      (0.0, 5.0, 7.0, 7.0, 3L, 250000L, 9L),
      (5.0, 10.0, 7.0, 7.0, 2L, 250000L, 4L)))
    // exact release (lo = hi everywhere) scores zero information loss
    val exact = Seq((1L, 2.0, 2.0, 7.0, 7.0), (2L, 2.0, 2.0, 7.0, 7.0))
      .toDF("id", "a_lo", "a_hi", "b_lo", "b_hi")
    val z = Privacy.releaseQuality(exact, Seq("a", "b"),
        Map("a" -> 10.0, "b" -> 0.0))
      .select($"ncp_ticks").as[Long].collect()
    assert(z.toSeq === Seq(0L))
  }

  test("dpQuantile: released values equal a driver-side recompute of " +
      "the Gumbel-perturbed rank utility; the pick is a real group " +
      "value; noise genuinely moves picks off the utility argmax " +
      "over the seed space; NULL values are excluded") {
    val rnd = new scala.util.Random(189L)
    val data = (1 to 120).map(i =>
      (s"g${i % 3}", (rnd.nextInt(20) + 1).toLong, i.toLong))
    val d = data.toDF("g", "v", "id")
    val (qT, eps) = (500000L, 300000L)
    val coef = eps / 1e6 / 2.0
    def fp(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    def gum(key: String): Double = {
      val m = (fp(key) * 2654435761L) % 2147483648L
      val u = (m + 0.5) / 2147483648.0
      -math.log(-math.log(u))
    }
    def expected(seed: Long): Map[String, Long] =
      data.groupBy(_._1).map { case (g, rs) =>
        val hist = rs.groupBy(_._2).view.mapValues(_.size)
          .toSeq.sortBy(_._1)
        val n = rs.size
        var cum = 0L
        val scored = hist.map { case (v, c) =>
          cum += c
          val u = -math.abs(cum.toDouble - 0.5 * n)
          (v, coef * u + gum(g + "\u0001" + v + "\u0001" + seed + ":qtl"))
        }
        g -> scored.minBy { case (v, s) => (-s, v) }._1
      }
    val got = Privacy.dpQuantile(d, Seq("g"), $"v", qT, eps, seed = 5L)
      .as[(String, Long)].collect().toMap
    assert(got === expected(5L))
    // released values are actual group values
    val vals = data.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(got.forall { case (g, v) => vals(g).contains(v) })
    // determinism; deviation from the utility argmax exists over seeds
    assert(Privacy.dpQuantile(d, Seq("g"), $"v", qT, eps, seed = 5L)
      .as[(String, Long)].collect().toMap === got)
    def argmax(g: String): Long = {
      val rs = data.filter(_._1 == g)
      val hist = rs.groupBy(_._2).view.mapValues(_.size)
        .toSeq.sortBy(_._1)
      var cum = 0L
      hist.map { case (v, c) =>
        cum += c
        (v, -math.abs(cum.toDouble - 0.5 * rs.size))
      }.minBy { case (v, u) => (-u, v) }._1
    }
    val deviates = (0L to 30L).exists { s =>
      Privacy.dpQuantile(d, Seq("g"), $"v", qT, eps, seed = s)
        .as[(String, Long)].collect()
        .exists { case (g, v) => v != argmax(g) }
    }
    assert(deviates)
    // NULL values are excluded from the candidate set
    val dn = Seq(("a", Some(1L)), ("a", Some(1L)), ("a", Option.empty[Long]))
      .toDF("g", "v")
    assert(Privacy.dpQuantile(dn, Seq("g"), $"v", qT, eps, 1L)
      .as[(String, Long)].head() === (("a", 1L)))
    intercept[IllegalArgumentException] {
      Privacy.dpQuantile(d, Seq("g"), $"v", qTicks = 1000000L)
    }
  }

  test("releaseDpGated refuses a release that would blow the budget " +
      "cap, admits one under it, and lets a replayed txn through " +
      "idempotently") {
    val vt = new graft.store.VersionedTable(spark,
      java.nio.file.Files.createTempDirectory("graft-priv-gate")
        .toString)
    val d = Seq(("A", 1L), ("B", 2L)).toDF("g", "v")
    val r = Privacy.dpCounts(d, Seq("g"), 600000L, seed = 3L)
    Privacy.releaseDpGated(vt, r, "laplace_count", 600000L,
      capTicks = 1000000L, txnId = Some("g-1")): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 600000L)
    // 600k spent + 600k requested > 1M cap -> loud refusal, no commit
    val ex = intercept[IllegalArgumentException] {
      Privacy.releaseDpGated(vt, r, "laplace_count", 600000L,
        capTicks = 1000000L, txnId = Some("g-2"))
    }
    assert(ex.getMessage.contains("budget exhausted"))
    assert(Privacy.epsilonSpentTicks(vt) === 600000L)
    // an under-cap release passes
    Privacy.releaseDpGated(vt, r, "laplace_count", 400000L,
      capTicks = 1000000L, txnId = Some("g-3")): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 1000000L)
    // replaying a committed txn is idempotent even at the cap
    Privacy.releaseDpGated(vt, r, "laplace_count", 400000L,
      capTicks = 1000000L, txnId = Some("g-3")): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 1000000L)
  }

  test("releaseDp puts each release's epsilon on the table's audit " +
      "ledger; two releases sum; txn replay spends epsilon once") {
    val vt = new graft.store.VersionedTable(spark,
      java.nio.file.Files.createTempDirectory("graft-priv-ledger")
        .toString)
    val d = Seq(("A", 1L), ("A", 2L), ("B", 3L)).toDF("g", "v")
    val r1 = Privacy.dpCounts(d, Seq("g"), epsilonTicks = 500000L,
      seed = 1L)
    Privacy.releaseDp(vt, r1, "laplace_count", 500000L): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 500000L)
    val r2 = Privacy.dpSum(d, Seq("g"), $"v", 0L, 10L,
      epsilonTicks = 250000L, seed = 2L)
    Privacy.releaseDp(vt, r2, "laplace_sum", 250000L,
      txnId = Some("rel-2")): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 750000L)
    // replaying the same release transaction does NOT double-spend
    Privacy.releaseDp(vt, r2, "laplace_sum", 250000L,
      txnId = Some("rel-2")): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 750000L)
    // the ledger rows carry the mechanism evidence
    val mechs = vt.auditLog()
      .filter($"key" === "privacy.mechanism")
      .select($"value").as[String].collect().sorted.toSeq
    assert(mechs === Seq("laplace_count", "laplace_sum"))
    // the budget SURVIVES vacuum (r15 review finding: a monotone
    // budget on finite-retention manifests must not shrink when old
    // manifests drop): each release carries the cumulative total, so
    // vacuuming down to the latest release still answers 750k —
    // and the gate keeps refusing past the cap
    vt.vacuum(retain = 1, graceMs = 0): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 750000L)
    intercept[IllegalArgumentException] {
      Privacy.releaseDpGated(vt, r2, "laplace_sum", 300000L,
        capTicks = 1000000L)
    }
    // ... and survives ORDINARY commits followed by vacuum (r15
    // ADVICE #2: vacuum retains purely by count — if appends or
    // maintain()'s compact/replace land after the last release and
    // vacuum runs with a small retain, every RELEASE manifest drops;
    // the totals must fold forward onto every manifest so the newest
    // one, which vacuum always keeps, carries the budget)
    vt.commit(d): Unit
    vt.replace(d): Unit
    vt.vacuum(retain = 1, graceMs = 0): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 750000L)
    intercept[IllegalArgumentException] {
      Privacy.releaseDpGated(vt, r2, "laplace_sum", 300000L,
        capTicks = 1000000L)
    }
    // a fresh table has spent nothing
    val vt2 = new graft.store.VersionedTable(spark,
      java.nio.file.Files.createTempDirectory("graft-priv-ledger")
        .toString)
    assert(Privacy.epsilonSpentTicks(vt2) === 0L)
  }

  test("dpSumGaussian: released sums equal a driver-side recompute " +
      "of the Box-Muller dag at the driver-calibrated sigma; " +
      "deterministic per seed; noise bounded; the delta lands on the " +
      "ledger; guards fire for the epsilon/delta domains") {
    val data = (1 to 60).map(i =>
      (s"n${i % 5}", s"s${i % 2}", (i * 37 % 200).toLong))
    val d = data.toDF("nation", "segment", "v")
    val (lo, hi, eps, del) = (0L, 100L, 500000L, 1000L)
    val sigma = Privacy.gaussianSigma(lo, hi, eps, del)
    def fp(str: String): Long =
      str.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    def unif(f: Long, mult: Long): Double = {
      val m = (f * mult) % 2147483648L
      (m + 0.5) / 2147483648.0
    }
    def z(n: String, sgm: String, seed: Long): Double = {
      // one key, two multiplier remixes (the r16 decorrelation)
      val f = fp(n + "\u0001" + sgm + "\u0001" + s"$seed:gs")
      val u1 = unif(f, 2654435761L)
      val u2 = unif(f, 2246822519L)
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
    def expected(seed: Long): Map[(String, String), Long] =
      data.groupBy(r => (r._1, r._2)).map { case ((n, sgm), rs) =>
        val cs = rs.map(r => math.max(lo, math.min(hi, r._3))).sum
        (n, sgm) -> (cs + BigDecimal(sigma * z(n, sgm, seed))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    val got = Privacy.dpSumGaussian(d, Seq("nation", "segment"), $"v",
        lo, hi, epsilonTicks = eps, deltaTicks = del, seed = 5L)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got === expected(5L))
    // deterministic per seed; a different seed draws differently
    assert(Privacy.dpSumGaussian(d, Seq("nation", "segment"), $"v",
        lo, hi, epsilonTicks = eps, deltaTicks = del, seed = 6L)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap === expected(6L))
    // non-vacuous noise, bounded by sigma * maxima of the B-M dag
    // over the coarse uniform: |z| <= sqrt(2 ln 2^31) ~ 6.56
    val truth = data.groupBy(r => (r._1, r._2)).view.mapValues(rs =>
      rs.map(r => math.max(lo, math.min(hi, r._3))).sum)
    assert(got.exists { case (k, v) => truth(k) != v })
    val bound = sigma * math.sqrt(2.0 * math.log(2.147483648e9)) + 1
    assert(got.forall { case (k, v) => math.abs(v - truth(k)) <= bound })
    // the (eps, delta) pair lands on the ledger via releaseDp
    val vt = new graft.store.VersionedTable(spark,
      java.nio.file.Files.createTempDirectory("graft-priv-gauss")
        .toString)
    Privacy.releaseDp(vt,
      Privacy.dpSumGaussian(d, Seq("nation", "segment"), $"v", lo, hi,
        eps, del, seed = 5L),
      "gaussian_sum", epsilonTicks = eps, deltaTicks = del): Unit
    assert(Privacy.epsilonSpentTicks(vt) === eps)
    assert(Privacy.deltaSpentTicks(vt) === del)
    // guards: the classic calibration needs eps < 1 and delta in (0,1)
    intercept[IllegalArgumentException] {
      Privacy.dpSumGaussian(d, Seq("nation"), $"v", lo, hi,
        epsilonTicks = 1000000L, deltaTicks = del)
    }
    intercept[IllegalArgumentException] {
      Privacy.dpSumGaussian(d, Seq("nation"), $"v", lo, hi,
        epsilonTicks = eps, deltaTicks = 0L)
    }
  }

  test("releaseKSuppress puts the information-loss counts on the " +
      "manifest (rows in/released, groups total/suppressed — counts " +
      "only, never keys); txn replay skips the evidence jobs") {
    val vt = new graft.store.VersionedTable(spark,
      java.nio.file.Files.createTempDirectory("graft-priv-loss")
        .toString)
    // fixture groups: (US,AUTO)=3, (US,BIKE)=1, (DE,AUTO)=3,
    // (NULL,AUTO)=2; k=2 -> BIKE's singleton group suppresses:
    // 8 of 9 rows released, 1 of 4 groups suppressed
    val v = Privacy.releaseKSuppress(vt, df.withColumn("id",
        monotonically_increasing_id()),
      Seq("nation", "segment"), k = 2L, txnId = Some("loss-1"))
    val audit = vt.auditOf(v)
    assert(audit("privacy.mechanism") === "k_suppress")
    assert(audit("privacy.k") === "2")
    assert(audit("privacy.rows_in") === "9")
    assert(audit("privacy.rows_released") === "8")
    assert(audit("privacy.groups_total") === "4")
    assert(audit("privacy.groups_suppressed") === "1")
    assert(vt.read().count() === 8L)
    // the release content matches the plain operator
    assert(vt.read().select($"nation", $"segment").distinct().count()
      === 3L)
    // replay: same version back, nothing recommitted
    assert(Privacy.releaseKSuppress(vt, df,
      Seq("nation", "segment"), k = 2L, txnId = Some("loss-1")) === v)
    assert(vt.currentVersion.get === v)
    // the k+l variant records l too
    val v2 = Privacy.releaseKSuppress(vt, df,
      Seq("nation", "segment"), k = 2L, sensitive = Some($"sens"),
      l = 2L, txnId = Some("loss-2"))
    val a2 = vt.auditOf(v2)
    assert(a2("privacy.l") === "2")
    // (NULL,AUTO) has one sensitive value -> it now suppresses too
    assert(a2("privacy.rows_released") === "6")
    assert(a2("privacy.groups_suppressed") === "2")
  }

  test("releaseTSuppress evidence counts TRUE group sizes (NULL " +
      "sensitive rows ride with safe groups) and counts the " +
      "conservatively-suppressed all-NULL group") {
    val vt = new graft.store.VersionedTable(spark,
      java.nio.file.Files.createTempDirectory("graft-priv-tloss")
        .toString)
    // the tSuppress fixture: A and B match the global distribution
    // (EMD 0, safe); C is all-NULL sensitive -> suppresses with no
    // census row; A's NULL row releases with its safe group
    val d = Seq(
      ("A", Some(1L), 1L), ("A", Some(2L), 2L), ("A", None, 3L),
      ("B", Some(1L), 4L), ("B", Some(2L), 5L),
      ("C", None, 6L), ("C", None, 7L))
      .toDF("g", "sens", "id")
    val v = Privacy.releaseTSuppress(vt, d, Seq("g"), $"sens",
      tTicks = 100000L, txnId = Some("tloss-1"))
    val audit = vt.auditOf(v)
    assert(audit("privacy.mechanism") === "t_suppress")
    assert(audit("privacy.rows_in") === "7")
    assert(audit("privacy.rows_released") === "5")
    assert(audit("privacy.groups_total") === "3")
    assert(audit("privacy.groups_suppressed") === "1")
    assert(vt.read().select($"id").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 4L, 5L))
  }

  test("parallel composition: releases on DISJOINT scopes spend the " +
      "MAX, same-scope and unscoped releases ADD, the gate admits a " +
      "scoped release a naive sum would refuse, and the state " +
      "survives appends + vacuum") {
    val vt = new graft.store.VersionedTable(spark,
      java.nio.file.Files.createTempDirectory("graft-priv-par")
        .toString)
    val d = Seq(("A", 1L), ("B", 2L)).toDF("g", "v")
    val r = Privacy.dpCounts(d, Seq("g"), 500000L, seed = 7L)
    // two disjoint scopes at 400k each: composed spend is max = 400k
    Privacy.releaseDp(vt, r, "laplace_count", 400000L,
      scope = Some("region-eu")): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 400000L)
    Privacy.releaseDp(vt, r, "laplace_count", 400000L,
      scope = Some("region-us")): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 400000L)
    // same scope again: that scope rises to 800k -> composed 800k
    Privacy.releaseDp(vt, r, "laplace_count", 400000L,
      scope = Some("region-eu")): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 800000L)
    // an unscoped release adds on top of the scoped maximum
    Privacy.releaseDp(vt, r, "laplace_count", 100000L,
      deltaTicks = 5L): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 900000L)
    assert(Privacy.deltaSpentTicks(vt) === 5L)
    // the gate sees composed totals: +300k on region-us lands at
    // 700k composed -> under a 1.1M cap even though the naive sum
    // (400+400+400+100+300) would blow it; +300k MORE on region-eu
    // would compose to 1.2M -> refused
    Privacy.releaseDpGated(vt, r, "laplace_count", 300000L,
      capTicks = 1100000L, scope = Some("region-us")): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 900000L)
    val ex = intercept[IllegalArgumentException] {
      Privacy.releaseDpGated(vt, r, "laplace_count", 300000L,
        capTicks = 1100000L, scope = Some("region-eu"))
    }
    assert(ex.getMessage.contains("budget exhausted"))
    // scope state folds forward across ordinary commits and vacuum
    vt.commit(d): Unit
    vt.vacuum(retain = 1, graceMs = 0): Unit
    assert(Privacy.epsilonSpentTicks(vt) === 900000L)
    assert(Privacy.budgetState(vt)("region-eu")._1 === 800000L)
    // scope hygiene is loud
    intercept[IllegalArgumentException] {
      Privacy.releaseDp(vt, r, "laplace_count", 1L,
        scope = Some("bad;scope"))
    }
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
