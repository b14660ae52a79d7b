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

  test("rarest-term anchoring ≡ direct all-terms alignment on the " +
      "fixture corpus and on planted repeat/boundary cases") {
    val fix = graft.core.Tables.load(spark, sf, "documents")
    val fq = Retrieval.phraseQueries(fix).localCheckpoint(true)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "doc_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows(Retrieval.phraseSearch(fix, fq)) ===
      rows(Retrieval.phraseSearchAligned(fix, fq)))
    val d = docs(
      1L -> "y x y x y", 2L -> "y x x x y", 3L -> "x x",
      4L -> "q w q w q w")
    val p = phrase(9L, "x", "x").union(phrase(5L, "q", "w", "q"))
    assert(rows(Retrieval.phraseSearch(d, p)) ===
      rows(Retrieval.phraseSearchAligned(d, p)))
  }

  test("join volume anchors on the rarest term: a stop term in the " +
      "phrase generates zero candidate rows beyond the rare term's df") {
    // 'the' floods 40 docs × 50 occurrences; 'zyzzyva the' occurs 3×
    val flood = (1L to 40L).map(i =>
      i -> Seq.fill(50)("the").mkString(" "))
    val rare = Seq(
      100L -> "a zyzzyva the b",
      101L -> "zyzzyva the",
      102L -> "c d zyzzyva the")
    val d = docs(flood ++ rare: _*)
    val p = phrase(7L, "zyzzyva", "the")
    val filtered = Retrieval.positionalPostings(d)
      .join(p.select($"th").distinct(), "th")
    val cands = Retrieval.rarestAnchorCandidates(filtered, p)
    assert(cands.count() === 3L) // = df('zyzzyva'), NOT 2003 = Σ pdf
    val got = run(d, p)
    assert(got.keySet === Set((7L, 100L), (7L, 101L), (7L, 102L)))
  }

  test("index-served phrase search ≡ fresh scan, absorbing benign " +
      "re-landed duplicate posting rows") {
    val d = docs(
      1L -> "the quick brown fox jumps",
      3L -> "a quick brown fox and quick brown fox again")
    val p = phrase(7L, "quick", "brown", "fox")
    val post = Retrieval.positionalPostings(d)
    val relanded = post.union(post.limit(7)) // exact-dup re-land
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("query_id", "doc_id")
        .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows(Retrieval.phraseSearchFromIndex(relanded, p)) ===
      rows(Retrieval.phraseSearch(d, p)))
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
