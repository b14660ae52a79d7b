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
