package graft.operators

import graft.SparkSpec

class SharedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (Long, String)*) =
    NearDup.sharedSpans(rows.toSeq.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("a copied span reports its exact start positions and token " +
      "length in both docs; unrelated text reports nothing") {
    // doc 2 copies tokens 3..7 of doc 1 ("c d e f g") at its pos 2
    val got = run(
      1L -> "a b c d e f g h",
      2L -> "x c d e f g y z",
      3L -> "p q r s t u v w")
    assert(got === Set((1L, 2L, 3L, 2L, 5L)))
  }

  test("two separate copied spans stay two islands (a gap breaks the " +
      "diagonal run), each with its own extent") {
    // spans "c d e f" (1:3) and "g h i j" (1:7) land at 2:1 and 2:6,
    // with a diagonal-breaking token between them
    val got = run(
      1L -> "a b c d e f g h i j",
      2L -> "c d e f zz g h i j")
    assert(got === Set((1L, 2L, 3L, 1L, 4L), (1L, 2L, 7L, 6L, 4L)))
  }

  test("minRun cuts single-shingle coincidences: a 3-token overlap " +
      "(one shingle) does not report, a 4-token overlap does") {
    val three = run(
      1L -> "a b c q q q q",
      2L -> "z a b c z z z")
    assert(three.isEmpty)
    val four = run(
      1L -> "a b c d q q q",
      2L -> "z a b c d z w")
    assert(four === Set((1L, 2L, 1L, 2L, 4L)))
  }

  test("one doc aligning to two places in the other yields two spans " +
      "on different diagonals with the same source start") {
    val got = run(
      1L -> "a b c d zz yy xx ww",
      2L -> "a b c d e a b c d f")
    assert(got === Set((1L, 2L, 1L, 1L, 4L), (1L, 2L, 1L, 6L, 4L)))
  }

  test("the df-cut drops boilerplate shingles before the join: a span " +
      "on more than maxDf docs reports nothing") {
    val rows = (1L to 6L).map(i => i -> "common span here tail")
    val got = NearDup.sharedSpans(rows.toDF("doc_id", "text"),
        maxDf = 5L)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.isEmpty) // "common span here(1..2)" shingles sit on 6 docs
  }
}
