package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ChunkTfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: hand case — sizes, overlap, full coverage") {
    // 23 tokens, size 4, stride 3 → starts 0,3,…,21; last chunk short
    val words = (1 to 23).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = TextStats.chunk(docs, size = 4, stride = 3)
      .orderBy($"chunk_id").collect()
    assert(got.length == 8) // starts 0..21 step 3
    assert(got.head.getString(2) == "w1 w2 w3 w4")
    assert(got(1).getString(2) == "w4 w5 w6 w7") // overlap of 1
    assert(got.last.getString(2) == "w22 w23")   // short tail
    assert(got.last.getLong(3) == 2L)
    // every token appears in at least one chunk
    val covered = got.flatMap(_.getString(2).split(" ")).toSet
    assert(covered == words.toSet)
  }

  test("chunk: doc shorter than one chunk → single chunk = doc") {
    val docs = Seq((7L, "a b c")).toDF("doc_id", "text")
    val got = TextStats.chunk(docs, size = 20, stride = 15).collect()
    assert(got.length == 1 && got.head.getString(2) == "a b c")
  }

  test("tfidf: hand-computed fixture") {
    // 2 docs; "x" in both (df=2), "y" only in doc 1 twice (df=1)
    val docs = Seq((1L, "x y y"), (2L, "x z")).toDF("doc_id", "text")
    val got = TextStats.tfIdfTopTerms(docs, 2)
      .orderBy($"doc_id", $"tf".desc, $"df".asc, $"term")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    // doc 1: y (tf=2, df=1, tfidf=2·ln2), x (tf=1, df=2, tfidf=0)
    assert(got(0)._1 == 1L && got(0)._2 == "y" && got(0)._3 == 2L)
    assert(math.abs(got(0)._5 - 2.0 * math.log(2.0)) < 1e-12)
    assert(got(1)._2 == "x" && got(1)._5 == 0.0)
    // doc 2: ranking (tf desc, df asc, term) puts z (df=1) before x
    assert(got(2)._1 == 2L && got(2)._2 == "z")
    assert(math.abs(got(2)._5 - math.log(2.0)) < 1e-12)
  }
}
