package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Mondrian]] — strict multidimensional k-anonymity by greedy
  * median cuts (LeFevre ICDE'06): the allowable-cut rule (both halves
  * ≥ k), the lower-median/left-inclusive split convention, the
  * normalized-range dimension pick with ties by dimension order, and
  * the release invariants (every released partition ≥ k, every row's
  * values inside its shipped ranges, a root under k suppresses).
  */
class MondrianSpec extends SparkSpec {
  import spark.implicits._

  test("hand-traced 2-round partition: round 1 cuts dim 1 at the " +
      "lower median (ties at normalized range 1.0 go to dimension " +
      "order), round 2 cuts the leaves where allowable") {
    // 8 rows, v1 in {0,1,2,3}, v2 in {0,10}; k=2
    // round 1: both dims tie at rng_norm 1.0 -> dim 1 wins; lower
    // median of (0,0,1,1,2,2,3,3) = the value at running count >= 4,
    // i.e. v1 = 1 -> left {0,0,1,1}, right {2,2,3,3}
    // round 2: within each leaf v1 range is 1, v2 range is 10 ->
    // dim 2, median at v2 = 0 -> splits of 2/2, both allowable
    val d = (0 until 8).map { i =>
      (i.toLong, (i / 2).toDouble, (i % 2 * 10).toDouble)
    }.toDF("id", "v1", "v2")
    val rel = Mondrian.generalize(d, "id", Seq("v1", "v2"),
        k = 2L, rounds = 2)
      .as[(Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(rel.size === 8)
    // leaf (v1 <= 1, v2 <= 0): ids 0, 2 (v1 in 0..1, v2 = 0)
    assert(rel(0L) === ((0.0, 1.0, 0.0, 0.0)) &&
      rel(2L) === rel(0L))
    // leaf (v1 <= 1, v2 > 0): ids 1, 3
    assert(rel(1L) === ((0.0, 1.0, 10.0, 10.0)) &&
      rel(3L) === rel(1L))
    // leaf (v1 > 1, v2 <= 0): ids 4, 6
    assert(rel(4L) === ((2.0, 3.0, 0.0, 0.0)) &&
      rel(6L) === rel(4L))
    // leaf (v1 > 1, v2 > 0): ids 5, 7
    assert(rel(5L) === ((2.0, 3.0, 10.0, 10.0)) &&
      rel(7L) === rel(5L))
  }

  test("strict allowable rule: a cut leaving either side under k is " +
      "refused; a root under k suppresses everything; an " +
      "unsplittable-but-k-large root releases whole") {
    // 5 rows, k=3: any split gives a side < 3 -> no cut, release the
    // root as one partition
    val d = (0 until 5).map(i => (i.toLong, i.toDouble, 0.0))
      .toDF("id", "v1", "v2")
    val whole = Mondrian.generalize(d, "id", Seq("v1", "v2"),
        k = 3L, rounds = 3)
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(whole.length === 5)
    assert(whole.forall(r => r._2 == 0.0 && r._3 == 4.0 &&
      r._4 == 0.0 && r._5 == 0.0))
    // 2 rows, k=3: even the root fails -> empty release
    val tiny = Seq((1L, 1.0, 1.0), (2L, 2.0, 2.0))
      .toDF("id", "v1", "v2")
    assert(Mondrian.generalize(tiny, "id", Seq("v1", "v2"),
      k = 3L, rounds = 2).isEmpty)
  }

  test("property: random data — every released partition holds >= k " +
      "rows, every row's values sit inside its shipped ranges, and " +
      "nothing is lost when the root passes k") {
    val rnd = new scala.util.Random(180L)
    for (round <- 1 to 4) {
      val n = 60 + rnd.nextInt(120)
      val data = (0 until n).map { i =>
        (i.toLong, rnd.nextInt(50).toDouble, rnd.nextInt(8).toDouble)
      }
      val d = data.toDF("id", "v1", "v2")
      val k = 5L + rnd.nextInt(10)
      val rel = Mondrian.generalize(d, "id", Seq("v1", "v2"),
          k = k, rounds = 4)
        .as[(Long, Double, Double, Double, Double)].collect()
      assert(rel.length === n, s"round $round (root >= k: no loss)")
      val byPart = rel.groupBy(r => (r._2, r._3, r._4, r._5))
      assert(byPart.values.forall(_.length >= k),
        s"round $round k=$k sizes=${byPart.values.map(_.length)}")
      val src = data.map(r => r._1 -> (r._2, r._3)).toMap
      assert(rel.forall { r =>
        val (a, b) = src(r._1)
        r._2 <= a && a <= r._3 && r._4 <= b && b <= r._5
      }, s"round $round (containment)")
      // partitions are axis-aligned boxes: any two distinct
      // partitions are DISJOINT on their separating cut dimension
      // (left values <= med < right values), so their value ranges
      // never overlap on both dims at once
      val parts = byPart.keys.toSeq
      for (p <- parts; q <- parts if p != q) {
        val v1Overlap = p._1 <= q._2 && q._1 <= p._2
        val v2Overlap = p._3 <= q._4 && q._3 <= p._4
        assert(!v1Overlap || !v2Overlap,
          s"round $round overlapping boxes $p $q")
      }
    }
  }

  test("l-diversity gate: a k-passing leaf whose sensitive values " +
      "collapsed suppresses whole; NULL sensitive counts as one " +
      "value; l > 1 without the sensitive column throws") {
    // one cut on v1 at median 1 (k=2): left leaf {0,0,1,1} right
    // {2,2,3,3}; sensitive: left all "x" (l_div 1), right x/y (2)
    val d = Seq(
      (0L, 0.0, 0.0, "x"), (1L, 0.0, 10.0, "x"),
      (2L, 1.0, 0.0, "x"), (3L, 1.0, 10.0, "x"),
      (4L, 2.0, 0.0, "x"), (5L, 2.0, 10.0, "y"),
      (6L, 3.0, 0.0, "x"), (7L, 3.0, 10.0, "y"))
      .toDF("id", "v1", "v2", "s")
    val rel = Mondrian.generalize(d, "id", Seq("v1", "v2"),
        k = 4L, rounds = 1, sensitive = Some($"s"), l = 2L)
      .select($"id").as[Long].collect().toSet
    assert(rel === Set(4L, 5L, 6L, 7L))
    // without l the same cut releases everything
    val relK = Mondrian.generalize(d, "id", Seq("v1", "v2"),
        k = 4L, rounds = 1)
      .select($"id").as[Long].collect().toSet
    assert(relK === Set(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L))
    // NULL sensitive is one value: a leaf of {NULL, "x"} has l_div 2
    val dn = Seq(
      (0L, 0.0, 0.0, Option.empty[String]), (1L, 0.0, 1.0, Some("x")),
      (2L, 1.0, 0.0, Option.empty[String]), (3L, 1.0, 1.0, Some("x")))
      .toDF("id", "v1", "v2", "s")
    val reln = Mondrian.generalize(dn, "id", Seq("v1", "v2"),
        k = 4L, rounds = 1, sensitive = Some($"s"), l = 2L)
      .select($"id").as[Long].collect().toSet
    assert(reln === Set(0L, 1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      Mondrian.generalize(d, "id", Seq("v1", "v2"), 2L, 1, None, 2L)
    }
  }

  test("empty input releases nothing; guards fire loudly") {
    val empty = Seq.empty[(Long, Double, Double)].toDF("id", "v1", "v2")
    assert(Mondrian.generalize(empty, "id", Seq("v1", "v2"),
      k = 2L, rounds = 2).isEmpty)
    val d = Seq((1L, 1.0, 1.0)).toDF("id", "v1", "v2")
    intercept[IllegalArgumentException] {
      Mondrian.generalize(d, "id", Seq("v1"), k = 2L, rounds = 2)
    }
    intercept[IllegalArgumentException] {
      Mondrian.generalize(d, "id", Seq("v1", "v2"), k = 0L, rounds = 2)
    }
    intercept[IllegalArgumentException] {
      Mondrian.generalize(d, "id", Seq("v1", "v2"), k = 2L, rounds = 21)
    }
  }
}
