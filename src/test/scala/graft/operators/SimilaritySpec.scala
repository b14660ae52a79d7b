package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: self-similarity 1, orthogonal 0, opposite -1") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), 1.0),
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f), 0.0),
      (Array(3.0f, 0.0f), Array(-1.0f, 0.0f), -1.0),
    ).toDF("a", "b", "expected")
    val got = df.select(Similarity.cosineSim($"a", $"b").as("sim"), $"expected").collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("q16 returns k rows per probe, self-match ranked first") {
    val df = Similarity.cosineTopK(spark, sf).cache()
    val perProbe = df.groupBy($"probe_id").count().collect()
    assert(perProbe.forall(_.getLong(1) == 10))
    // self-similarity = 1.0 tops each probe's list
    val top = df.orderBy($"probe_id", $"sim".desc).groupBy($"probe_id")
      .agg(first($"vec_id").as("top_vec"), max($"sim").as("top_sim")).collect()
    top.foreach { r => assert(r.getLong(0) == r.getLong(1) || math.abs(r.getDouble(2) - 1.0) < 1e-12) }
  }

  test("BPE-ish tokenizer splits like a GPT-2 pretokenizer") {
    val toks = Seq("hello world, it's 42 spark-engines!").toDF("t")
      .select(TextStats.bpeTokens($"t")).head().getSeq[String](0)
    assert(toks == Seq("hello", " world", ",", " it", "'s", " 42",
      " spark", "-", "engines", "!"))
  }

  test("q17 token stats: n_nonspace + (n_tokens-1) == len for space-joined text") {
    val bad = TextStats.q17TokenStats(spark, sf)
      .filter($"n_nonspace" + ($"n_tokens" - 1) =!= $"len").count()
    assert(bad == 0)
  }
}
