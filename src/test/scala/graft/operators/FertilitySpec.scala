package graft.operators

import graft.SparkSpec

class FertilitySpec extends SparkSpec {
  import spark.implicits._

  test("hand-traced fertility: char/word/piece sums and tick ratios") {
    // "don't stop" → BPE-ish pieces: don | 't | ' stop' = 3; 10 chars,
    // 2 ws tokens. "ab 12" → ab | ' 12'? pattern: 'ab' then ' 12' = 2
    // pieces, 5 chars, 2 ws tokens.
    val docs = Seq(
      ("en", "don't stop"),
      ("en", "ab 12"),
      ("xx", "aaaa")).toDF("lang", "text")
    val got = TextStats.tokenizerFertility(docs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val en = got("en")
    assert(en._2 === 2L)            // n_docs
    assert(en._3 === 15L)           // chars 10 + 5
    assert(en._4 === 4L)            // ws tokens 2 + 2
    assert(en._5 === 5L)            // pieces 3 + 2
    assert(en._6 === 15L * 1000000L / 5L)  // chars_per_bpe
    assert(en._7 === 5L * 1000000L / 4L)   // bpe_per_ws
    val xx = got("xx")
    assert(xx._5 === 1L && xx._6 === 4000000L && xx._7 === 1000000L)
  }

  test("a language the tokenizer underserves shows higher fertility: " +
      "punctuation-dense text fragments into more pieces per word") {
    val docs = Seq(
      ("plain", "hello world again folks"),
      ("dense", "a-b c.d e,f g;h")).toDF("lang", "text")
    val got = TextStats.tokenizerFertility(docs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._7).toMap
    assert(got("dense") > got("plain"))
  }
}
