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

  test("qualityGateReport: each rule fires on its planted doc, clean doc kept") {
    val stops = "the a an and of to in is on for".split(" ")
    // clean: 40 tokens, ≥ 2 stopwords (5%+), max token ≤ 20%
    val clean = (0 until 36).map(i => s"w$i").mkString(" ") +
      " the of is and"
    val short = "only five tokens here the"            // < 30 → too_short
    val noStop = (0 until 40).map(i => s"x$i").mkString(" ") // 0 stopwords
    val repet = ("spam " * 20) + (0 until 20).map(i => s"y$i").mkString(" ") +
      " the of is and"                                 // 'spam' 20/44 > 20%
    val docs = Seq(
      (1L, clean), (2L, short), (3L, noStop), (4L, repet.trim)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.qualityGateReport(docs).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(got(1L) == ((false, false, false, false, true)), s"clean: ${got(1L)}")
    assert(got(2L)._1 && !got(2L)._5, "short must trip too_short")
    assert(got(3L)._2 && !got(3L)._5, "noStop must trip low_stopword")
    assert(got(4L)._3 && !got(4L)._5, "repet must trip repetitive_tok")
    // dup_prefix: two docs sharing a 20-token prefix, later one flagged
    val p = (0 until 20).map(i => s"p$i").mkString(" ")
    val dd = Seq((10L, s"$p the of is and tail1 t2 t3 t4 t5 t6"),
      (11L, s"$p the of is and other tail x1 x2 x3 x4")).toDF("doc_id", "text")
    val g2 = TextAnalysis.qualityGateReport(dd).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(g2(10L) == ((false, true)) && g2(11L) == ((true, false)))
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
