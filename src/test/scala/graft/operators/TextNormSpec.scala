package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextNormSpec extends SparkSpec {
  import spark.implicits._

  test("canonicalizers: hand cases") {
    val df = Seq("The  Answer is 42 ").toDF("t")
    val got = df.select(
      TextNorm.lowerStripDigits($"t"),
      TextNorm.bagOfWords(lit("b a c")),
      TextNorm.prefixFingerprint(lit("w1 w2 w3 w4"), 2)).head()
    assert(got.getString(0) == "the answer is")
    assert(got.getString(1) == "a b c")
    assert(got.getString(2) == "w1 w2")
  }

  test("canonicalDupGroups: planted truncated variant and digit twin") {
    val docs = Seq(
      (1L, "a b c d e tail-one"),
      (2L, "a b c d e other longer tail"), // same 5-token prefix as 1
      (3L, "x y z q r"),
      (4L, "Release 42 notes"),
      (5L, "release 7 notes")).toDF("doc_id", "text")
    val pre = TextNorm.canonicalDupGroups(docs,
        TextNorm.prefixFingerprint($"text", 5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pre == Set((1L, 1L, 2L), (2L, 1L, 2L)))
    val strip = TextNorm.canonicalDupGroups(docs,
        TextNorm.lowerStripDigits($"text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(strip == Set((4L, 4L, 2L), (5L, 4L, 2L)))
  }

  test("q92: non-trivial on the corpus; groups internally consistent") {
    val got = TextNorm.q92PrefixDupGroups(spark, sf).cache()
    assert(got.count() > 0)
    // canon_id is a member of its own group, and group sizes agree
    val sizes = got.groupBy($"canon_id").agg(count(lit(1)).as("n"),
      first($"group_size").as("gs"))
    assert(sizes.filter($"n" =!= $"gs").isEmpty)
    assert(got.filter($"doc_id" === $"canon_id").count() ==
      got.select($"canon_id").distinct().count())
  }
}
