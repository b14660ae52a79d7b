package graft.operators

import graft.SparkSpec

class RetrievalQualitySpec extends SparkSpec {
  import spark.implicits._

  private def list(rows: (Long, Long, Double)*) =
    rows.toSeq.toDF("probe_id", "vec_id", "sim")

  private def run(e: org.apache.spark.sql.DataFrame,
      a: org.apache.spark.sql.DataFrame, k: Int) =
    Similarity.retrievalQuality(e, a, k)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("perfect approx list scores recall 1e6 and rr 1e6; a disjoint " +
      "list scores 0/0") {
    val e = list((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7),
      (2L, 20L, 0.9), (2L, 21L, 0.8), (2L, 22L, 0.7))
    val disjoint = list((2L, 30L, 0.9), (2L, 31L, 0.8), (2L, 32L, 0.7))
    val got = run(e, e.filter($"probe_id" === 1L).union(disjoint), 3)
    assert(got(1L) === ((3L, 1000000L, 1000000L)))
    assert(got(2L) === ((0L, 0L, 0L)))
  }

  test("partial overlap: recall counts set intersection; rr follows " +
      "where the TRUE nearest neighbor lands in the approx ranking") {
    val e = list((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7),
      (1L, 13L, 0.6))
    // approx found the true NN but ranked it third; missed 11 and 13
    val a = list((1L, 40L, 0.95), (1L, 12L, 0.71), (1L, 10L, 0.63),
      (1L, 41L, 0.5))
    val got = run(e, a, 4)
    assert(got(1L) === ((2L, 500000L, 333333L)))
  }

  test("true-NN miss zeroes rr even at high recall (the metric pair " +
      "is the point: recall alone hides a missed best answer)") {
    val e = list((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.7))
    val a = list((1L, 11L, 0.8), (1L, 12L, 0.7), (1L, 50L, 0.1))
    val got = run(e, a, 3)
    assert(got(1L) === ((2L, 666666L, 0L)))
  }
}
