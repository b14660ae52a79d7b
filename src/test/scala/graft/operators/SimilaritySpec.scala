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

  test("knnGraph: hand-checkable 2-NN on axis/diagonal vectors") {
    // 0=(1,0), 1=(0,1), 2=(1,1)/norm, 3=(-1,0): cos(0,2)=cos(1,2)=√2/2,
    // cos(0,1)=0, cos(0,3)=-1, cos(1,3)=0, cos(2,3)=-√2/2
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.7071f, 0.7071f)), (3L, Array(-1.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val got = Similarity.knnGraph(emb, k = 2, nBlocks = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (s, rs) =>
        s -> rs.sortBy(t => (-t._3, t._2)).map(_._2).toSeq }
    assert(got(0L) == Seq(2L, 1L)) // √2/2, then 0 (nbr 1 beats 3's -1)
    assert(got(1L) == Seq(2L, 0L)) // √2/2, then tie 0.0 → lower id
    assert(got(2L) == Seq(0L, 1L)) // both √2/2-ish → lower id first
    assert(got(3L) == Seq(1L, 2L)) // 0.0, then -√2/2
  }

  test("knnGraph: every row has exactly k neighbors, none itself, ≡ brute force") {
    val emb = graft.core.Tables.load(spark, sf, "embeddings")
      .filter($"vec_id" < 60L).cache()
    val got = Similarity.knnGraph(emb, k = 3, nBlocks = 4).cache()
    assert(got.groupBy($"vec_id").count().filter($"count" =!= 3L).isEmpty)
    assert(got.filter($"vec_id" === $"nbr_id").isEmpty)
    // driver-side brute force over the same 60 rows
    val vs = emb.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expect = vs.map { case (id, e) =>
      id -> vs.filter(_._1 != id).map { case (j, f) => (j, cos(e, f)) }
        .sortBy(t => (-t._2, t._1)).take(3).toSeq
    }.toMap
    val gotBy = got.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (s, rs) =>
        s -> rs.sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3)).toSeq }
    assert(gotBy.keySet == expect.keySet)
    expect.foreach { case (id, exp) =>
      val g = gotBy(id)
      assert(g.map(_._1) == exp.map(_._1), s"neighbor ids for $id")
      g.zip(exp).foreach { case ((_, gs), (_, es)) => assert(math.abs(gs - es) < 1e-12) }
    }
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
