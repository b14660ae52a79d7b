package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[CmsLdp]] — the one-bit count-mean sketch: Spark reports must
  * equal a plain-Scala replay of the channel, the decode must invert
  * the channel (Σ estimates ≈ n — the debias identity in
  * expectation, checked on the deterministic fixture), the sketch
  * stays cell-bounded, and the seam's cell occupancy stays near
  * Poisson (the regression that caught two generations of affine
  * scrambles clumping at 2.6-12x).
  */
class CmsLdpSpec extends SparkSpec {
  import spark.implicits._

  private val P = 2147483647L
  private val (h, m) = (4, 32)

  private def fixture = spark.range(2400L).select(
    concat(lit("v"), (col("id") % 6).cast("string")).as("v"),
    col("id").as("rk"))

  private def fp(s: String): Long =
    s.foldLeft(0L)((acc, ch) => (acc * 31 + ch.toLong) % 1000000007L)

  private def unifS(f: Long, i: Long, k: Long): Double = {
    val s1 = (f * 1000003L + i * 8191L + k) % P
    ((s1 * s1 % P) * 48271L % P + 0.5) / P.toDouble
  }

  test("Spark reports == the plain-Scala channel replay") {
    val eps = 2.0
    val pFlip = 1.0 / (1.0 + math.exp(eps))
    val got = CmsLdp.reports(fixture, $"v", $"rk", h, m,
        epsilonTicks = 2000000L, seed = 5L)
      .as[(Int, Int, Boolean)].collect().toSeq
    val expected = (0L until 2400L).map { id =>
      val v = s"v${id % 6}"
      val f = fp(s"$id" + "\u0001" + "5:cms")
      val j = (unifS(f, 0, 1) * h).toInt
      val l = (unifS(f, 0, 2) * m).toInt
      val flip = unifS(f, 0, 3) < pFlip
      val x = CmsLdp.bucketScala(v, j, m) == l
      (j, l, x != flip)
    }
    assert(got == expected)
  }

  test("decode inverts the channel: sum of estimates lands near n " +
      "and every estimate is within the coarse sampling envelope") {
    val est = CmsLdp.frequency(fixture, $"v", $"rk",
        candidates = (0 until 6).map(i => s"v$i"), h = h, m = m,
        epsilonTicks = 2000000L, seed = 5L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(est.values.sum - 2400L) < 800L,
      s"channel sum broke: $est")
    // true 400 each; one-bit sampling std ~ m*sqrt(E[T])/(p-q) ~ 230
    est.foreach { case (v, e) =>
      assert(math.abs(e - 400L) < 700L, s"$v: $e vs 400")
    }
    // determinism
    val again = CmsLdp.frequency(fixture, $"v", $"rk",
        candidates = (0 until 6).map(i => s"v$i"), h = h, m = m,
        epsilonTicks = 2000000L, seed = 5L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == est)
  }

  test("the sketch is (h x m x 2)-cell bounded at any client count") {
    val sk = CmsLdp.sketch(CmsLdp.reports(fixture, $"v", $"rk",
      h, m, 2000000L, 5L))
    assert(sk.count() <= h.toLong * m * 2)
  }

  test("seam uniformity: (j, l) cell occupancy stays within 3x the " +
      "Poisson std — the affine-scramble clumping regression") {
    val rep = CmsLdp.reports(fixture, $"v", $"rk", h, m, 2000000L, 5L)
      .groupBy("j", "l").count().as[(Int, Int, Long)].collect()
    val mean = 2400.0 / (h * m)
    val full = Array.fill(h * m)(0L)
    rep.foreach { case (j, l, c) => full(j * m + l) = c }
    val std = math.sqrt(
      full.map(c => (c - mean) * (c - mean)).sum / (h * m))
    assert(std < 3 * math.sqrt(mean),
      s"cells clumped: std $std vs poisson ${math.sqrt(mean)}")
  }

  test("guards: h/m domains and the candidate cap refuse") {
    intercept[IllegalArgumentException] {
      CmsLdp.reports(fixture, $"v", $"rk", h = 0, m = m)
    }
    intercept[IllegalArgumentException] {
      CmsLdp.estimates(
        CmsLdp.sketch(CmsLdp.reports(fixture, $"v", $"rk", h, m)),
        candidates = Seq.empty, h, m, 1000000L)
    }
  }
}
