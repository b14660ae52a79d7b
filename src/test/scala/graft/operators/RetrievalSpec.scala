package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BM25 retrieval: hand-computed scores on a tiny corpus, ranking /
  * exclusion / tie-break contracts, and the determinism of the
  * integer-tick summation.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    1L -> "apple banana apple cherry",
    2L -> "banana cherry date egg fig",
    3L -> "apple apple apple apple",
    4L -> "grape fig egg date cherry banana apple").toDF("doc_id", "text")

  /** Scalar BM25 reference: same +1-idf variant, same tick rounding. */
  private def bm25Ticks(queryTerms: Seq[String]): Map[(String, Long), Long] = {
    val docs = Map(
      1L -> "apple banana apple cherry",
      2L -> "banana cherry date egg fig",
      3L -> "apple apple apple apple",
      4L -> "grape fig egg date cherry banana apple")
      .view.mapValues(_.split(" ", -1).toSeq).toMap
    val n = docs.size.toLong
    val tot = docs.values.map(_.length.toLong).sum
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    (for {
      t <- queryTerms
      (id, toks) <- docs
      tf = toks.count(_ == t).toLong if tf > 0
    } yield {
      val df = dfm(t)
      val dl = toks.length.toLong
      val v = math.log((n - df + 0.5) / (df + 0.5) + 1.0) * tf * 2.2 /
        (tf + 1.2 * (0.25 + 0.75 * dl * n / tot)) * 1000000.0
      (t, id) -> math.round(v)
    }).toMap
  }

  test("scores match the scalar BM25 reference, self excluded") {
    val queries = Seq(
      (0L, NearDup.tokenHash64("apple")),
      (0L, NearDup.tokenHash64("fig"))).toDF("query_id", "th")
    val got = Retrieval.bm25TopK(corpus, queries, k = 10)
      .orderBy($"rank")
      .select($"doc_id", $"score").as[(Long, Double)].collect()
    val ticks = bm25Ticks(Seq("apple", "fig"))
    val want = (1L to 4L).flatMap { id =>
      val s = Seq("apple", "fig").flatMap(t => ticks.get(t -> id)).sum
      if (s == 0L) None else Some(id -> s / 1e6)
    }.sortBy { case (id, s) => (-s, id) }
    assert(got.map(_._1).toSeq == want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-6)
    }
    // query_id 0 matches no doc_id, so nothing was self-excluded here;
    // now query AS doc 3: its own perfect match must be absent
    val self = Seq((3L, NearDup.tokenHash64("apple"))).toDF("query_id", "th")
    val ids = Retrieval.bm25TopK(corpus, self, k = 10)
      .select($"doc_id").as[Long].collect().toSet
    assert(!ids.contains(3L) && ids == Set(1L, 4L))
  }

  test("rank is dense per query and ties break by doc_id") {
    // two docs with identical text score identically for any query —
    // the lower doc_id must rank first
    val tied = Seq(
      1L -> "same words here exactly",
      2L -> "same words here exactly",
      3L -> "other material entirely").toDF("doc_id", "text")
    val q = Seq((9L, NearDup.tokenHash64("same"))).toDF("query_id", "th")
    val got = Retrieval.bm25TopK(tied, q, k = 5)
      .orderBy($"rank").select($"rank", $"doc_id")
      .as[(Int, Long)].collect()
    assert(got.toSeq == Seq((1, 1L), (2, 2L)))
  }

  test("prefixQueries carves distinct first-token prefixes") {
    val d = Seq(
      0L -> "a b a c d e",
      97L -> "x y z w v",
      5L -> "never a query doc").toDF("doc_id", "text")
    val q = Retrieval.prefixQueries(d, mod = 97L, nTerms = 4)
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(q.keySet == Set(0L, 97L))
    // "a b a c" → distinct {a, b, c}
    assert(q(0L) == Set("a", "b", "c").map(NearDup.tokenHash64))
    assert(q(97L) == Set("x", "y", "z", "w").map(NearDup.tokenHash64))
  }

  test("hybridRrfTopK fuses ranks with missing-leg zeros and doc_id ties") {
    val bm = Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L))
      .toDF("query_id", "rank", "doc_id")
    val dense = Seq((1L, 1, 20L), (1L, 2, 40L))
      .toDF("query_id", "rank", "doc_id")
    val got = Retrieval.hybridRrfTopK(bm, dense, k = 10)
      .orderBy($"rank").as[(Long, Int, Long, Double)].collect()
    def r(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 20: both legs (1/62 + 1/61) — wins; doc 10: bm-only 1/61;
    // doc 40: dense-only 1/62; doc 30: bm-only 1/63
    val want = Seq(
      (1L, 1, 20L, r(1.0 / 62 + 1.0 / 61)),
      (1L, 2, 10L, r(1.0 / 61)),
      (1L, 3, 40L, r(1.0 / 62)),
      (1L, 4, 30L, r(1.0 / 63)))
    assert(got.toSeq == want)
    // exact tie (same single-leg rank) breaks by doc_id
    val bm2 = Seq((2L, 1, 7L)).toDF("query_id", "rank", "doc_id")
    val d2 = Seq((2L, 1, 3L)).toDF("query_id", "rank", "doc_id")
    val tied = Retrieval.hybridRrfTopK(bm2, d2, k = 10)
      .orderBy($"rank").as[(Long, Int, Long, Double)].collect()
    assert(tied.map(t => (t._2, t._3)).toSeq == Seq((1, 3L), (2, 7L)))
  }

  test("q105 fusion promotes both-leg docs over single-leg docs at sf0.001") {
    val out = Retrieval.q105HybridRrf(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      // rrf scores weakly decrease with rank inside a query
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("dense leg swaps to IVF candidates under the same rank contract") {
    import org.apache.spark.sql.expressions.Window
    import graft.core.Tables
    val emb = Tables.load(spark, sf, "embeddings")
    val exact = Retrieval.denseRanks(emb, probeMod = 97L, k = 10)
    // full-coverage IVF (nProbe = nLists) scores every vector, so its
    // candidates carry the exact cosine ranking; k = 11 then drop the
    // self row (always sim 1.0, which denseRanks excluded pre-heap)
    val (indexed, model) = IvfIndex.buildPivots(emb, nLists = 16)
    val probes = emb.filter($"vec_id" % 97 === 0)
    val w = Window.partitionBy($"probe_id").orderBy($"sim".desc, $"vec_id")
    val ivf = IvfIndex.topK(indexed, model, probes, k = 11, nProbe = 16)
      .filter($"vec_id" =!= $"probe_id")
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"probe_id".as("query_id"), $"vec_id".as("doc_id"), $"rank")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rows(ivf) == rows(exact))
    // and the fused output is bit-identical through either leg
    val docs = Tables.load(spark, sf, "documents")
    val bm = Retrieval.bm25TopK(docs, Retrieval.prefixQueries(docs), k = 10)
      .localCheckpoint(true)
    def fused(dense: org.apache.spark.sql.DataFrame) =
      Retrieval.hybridRrfTopK(bm, dense, k = 5)
        .orderBy($"query_id", $"rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
    assert(fused(ivf) == fused(exact))
  }

  test("index-path scoring equals the corpus-scan path") {
    val q = Seq(
      (0L, NearDup.tokenHash64("apple")),
      (0L, NearDup.tokenHash64("fig")),
      (3L, NearDup.tokenHash64("apple"))).toDF("query_id", "th")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"query_id", $"rank")
        .as[(Long, Int, Long, Double)].collect().toSeq
    assert(rows(Retrieval.bm25TopKFromIndex(
        Retrieval.docTermStats(corpus), q, k = 10)) ==
      rows(Retrieval.bm25TopK(corpus, q, k = 10)))
    // a doc re-landed whole (identical posting rows twice — the
    // producer-re-send shape the offset fence cannot key on) must not
    // double-count df/N/Σdl
    val doubled = Retrieval.docTermStats(corpus)
      .unionByName(Retrieval.docTermStats(corpus.limit(2)))
    assert(rows(Retrieval.bm25TopKFromIndex(doubled, q, k = 10)) ==
      rows(Retrieval.bm25TopK(corpus, q, k = 10)))
  }

  test("a standing bucketed index aggregates df without an exchange") {
    import graft.operators.Layout
    // the deployment shape from the scaladoc: persist docTermStats
    // bucketed by term hash; per-term stats then aggregate with no
    // shuffle (bucketing satisfies the distribution requirement)
    val stats = Retrieval.docTermStats(corpus)
    Layout.writeBucketed(stats, "bm25_index_spec", "th", nBuckets = 4)
    val idx = spark.table("bm25_index_spec")
    val dfAgg = idx.groupBy($"th").agg(count(lit(1)).as("df"))
    dfAgg.collect()
    val plan = dfAgg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed df agg must not shuffle:\n$plan")
    // and the values match the ad-hoc computation
    val adhoc = Retrieval.docTermStats(corpus)
      .groupBy($"th").agg(count(lit(1)).as("df"))
      .as[(Long, Long)].collect().toMap
    assert(dfAgg.as[(Long, Long)].collect().toMap == adhoc)
  }

  test("q103 runs end to end at sf0.001 with a total ordering") {
    val out = Retrieval.q103Bm25TopK(spark, sf)
    val rows = out.select($"query_id", $"rank").as[(Long, Int)].collect()
    assert(rows.nonEmpty)
    // per query: ranks are 1..m with no gaps
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
    }
  }
}
