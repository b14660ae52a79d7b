package graft.operators

import graft.SparkSpec

class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  private def phrase(qid: Long, terms: String*) =
    terms.zipWithIndex.map { case (t, i) =>
      (qid, i.toLong, NearDup.tokenHash64(t))
    }.toDF("query_id", "qpos", "th")

  private def run(d: org.apache.spark.sql.DataFrame,
      p: org.apache.spark.sql.DataFrame) =
    Retrieval.phraseSearch(d, p)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("exact adjacency: scattered terms never match, consecutive " +
      "runs match at every start, matches count per start") {
    val d = docs(
      1L -> "the quick brown fox jumps",
      2L -> "quick stop then brown later fox", // scattered — no match
      3L -> "a quick brown fox and quick brown fox again")
    val got = run(d, phrase(7L, "quick", "brown", "fox"))
    assert(got((7L, 1L)) === ((1L, 2L)))
    assert(!got.contains((7L, 2L)))
    assert(got((7L, 3L)) === ((2L, 2L))) // starts at 2 and 6
  }

  test("repeated-term phrase needs every POSITION matched: 'x x' " +
      "rejects alternating x's and accepts a run, overlapping " +
      "occurrences each count") {
    val d = docs(
      1L -> "y x y x y", // x at 2 and 4: no adjacent pair
      2L -> "y x x x y") // starts at 2 and 3 (overlap counts twice)
    val got = run(d, phrase(9L, "x", "x"))
    assert(!got.contains((9L, 1L)))
    assert(got((9L, 2L)) === ((2L, 2L)))
  }

  test("boundaries: phrase at the exact start and exact end of a doc") {
    val d = docs(
      1L -> "alpha beta rest of text",
      2L -> "some text then alpha beta")
    val got = run(d, phrase(3L, "alpha", "beta"))
    assert(got((3L, 1L)) === ((1L, 1L)))
    assert(got((3L, 2L)) === ((1L, 4L)))
  }

  test("fixture queries always match their source doc at the phrase " +
      "start; oracle-side tokenization agrees on empties") {
    val d = docs(
      0L -> "t1 t2 t3 t4 t5 t6 t7 t8",
      89L -> "u1 u2 u3 u4 u5 u6 u7",
      90L -> "v1 v2 v3") // too short for start=5,len=3 → no query
    val q = Retrieval.phraseQueries(d, mod = 89L, start = 5, len = 3)
    assert(q.select($"query_id").distinct().as[Long].collect().toSet
      === Set(0L, 89L))
    val got = run(d, q)
    assert(got((0L, 0L)) === ((1L, 5L)))
    assert(got((89L, 89L)) === ((1L, 5L)))
  }
}
