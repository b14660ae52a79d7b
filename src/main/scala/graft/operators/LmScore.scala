package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Pin, Tables}

/** Corpus-LM document scoring — the CCNet-style quality signal from
  * public data-curation literature: score every document by its mean
  * negative log-likelihood under a bigram language model fit on the
  * corpus itself (add-one smoothing). Low-perplexity ≈ fluent /
  * in-distribution; high ≈ noise, boilerplate, or wrong-language —
  * the filter threshold is a downstream policy choice.
  *
  * Determinism contract (the q10 lesson, via the labelCentroids
  * trick): each bigram's log-probability is quantized ONCE to 1e-6
  * ticks as a BIGINT; per-doc accumulation is then exact integer
  * arithmetic, so the result is identical under any aggregation
  * order or engine. The only float ops are one division and one
  * `ln` per DISTINCT bigram — both correctly rounded in Spark and
  * DuckDB.
  *
  * Scale shape: per-doc bigram counts come from one typed
  * per-partition loop (no shuffle); the LM is two partial+final
  * aggs over those counts (|vocab²| rows, NOT |tokens|); scoring is
  * one equi-join of doc-bigrams against the LM — AQE broadcasts the
  * LM while it is small (bounded vocab) and falls back to a shuffle
  * join for open-vocabulary corpora. No driver collect anywhere.
  */
object LmScore {

  /** Per-document bigram counts (doc_id, w1, w2, c) — typed loop,
    * one hash map per doc, emitted pre-aggregated so downstream
    * shuffles carry distinct bigrams, not occurrences.
    */
  def docBigramCounts(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.core.Parallel.fan(docs)
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        val m = new java.util.HashMap[(String, String), Array[Long]]()
        if (text != null) {
          val toks = text.split(" ", -1)
          var i = 0
          while (i < toks.length - 1) {
            val k = (toks(i), toks(i + 1))
            val c = m.get(k)
            if (c == null) m.put(k, Array(1L)) else c(0) += 1L
            i += 1
          }
        }
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala
          .map(e => (id, e.getKey._1, e.getKey._2, e.getValue()(0)))
      })
      .toDF("doc_id", "w1", "w2", "c")
  }

  /** Mean bigram NLL per doc under the corpus add-one bigram LM:
    * p(w2|w1) = (c12 + 1) / (c1 + V). Docs with < 2 tokens have no
    * bigrams and drop out (none exist in the driver corpus).
    */
  def lmScore(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // pinned: the LM aggs and the scoring join would otherwise each
    // re-run the tokenize+count pass
    val db = docBigramCounts(docs).transform(Pin.reuse)
    val c12 = db.groupBy($"w1", $"w2").agg(sum($"c").as("c12"))
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val vocab = docs
      .select(explode(TextStats.tokens($"text")).as("w"))
      .agg(countDistinct($"w").as("v"))
    val lm = c12.join(c1, "w1").crossJoin(broadcast(vocab))
      .select($"w1", $"w2",
        round(log(($"c12" + 1).cast("double") / ($"c1" + $"v")) * 1e6)
          .cast("long").as("tick"))
    db.join(lm, Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_bigrams"), sum($"c" * $"tick").as("s"))
      .select($"doc_id", $"n_bigrams",
        round(-$"s".cast("double") / ($"n_bigrams" * 1e6), 6).as("nll"))
  }

  /** Q54 — corpus-LM NLL score per document. */
  def q54LmScore(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    lmScore(Tables.load(spark, dir, "documents")).orderBy($"doc_id")
  }

  /** Per-document token counts (doc_id, w, c) — pre-aggregated so the
    * downstream shuffle carries distinct (doc, token) rows, not token
    * occurrences (map-side partial agg collapses the explode before
    * anything moves).
    */
  def docTokenCounts(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", explode(TextStats.tokens($"text")).as("w"))
      .groupBy($"doc_id", $"w").agg(count(lit(1)).as("c"))
  }

  /** Data-selection importance weights (DSIR, Xie et al. 2023, arXiv
    * 2302.03169, reduced to unigram features): score every document
    * by its mean per-token log-likelihood RATIO between a target
    * distribution (the data you want more of) and the overall corpus —
    * positive means target-like, negative means background-like; the
    * selection policy keeps the top-weighted docs. Both unigram LMs
    * are add-one smoothed over the SAME corpus vocabulary so the
    * ratio is defined for every token.
    *
    * Determinism: one log-ratio per DISTINCT vocabulary token,
    * quantized to 1e-6 ticks (the [[lmScore]] contract); per-doc
    * accumulation is exact integer arithmetic, identical under any
    * aggregation order or engine.
    *
    * Scale shape: token counts pre-aggregate map-side; the two LMs
    * are |V|-row aggs joined once (target LEFT so vocabulary absent
    * from the target still scores via smoothing); scoring is one
    * equi-join of doc-token counts against the |V|-row weight table —
    * AQE broadcasts it while vocab is bounded. No driver collect.
    */
  def importanceWeights(docs: DataFrame, isTarget: org.apache.spark.sql.Column)
      : DataFrame = {
    import docs.sparkSession.implicits._
    val dt = docTokenCounts(docs).transform(Pin.reuse)
    val corpusCounts = dt.groupBy($"w").agg(sum($"c").as("cc"))
    val targetCounts = docTokenCounts(docs.filter(isTarget))
      .groupBy($"w").agg(sum($"c").as("ct"))
    val totals = corpusCounts.agg(
      sum($"cc").as("nc"), count(lit(1)).as("v"))
    val targetTotal = targetCounts.agg(sum($"ct").as("nt"))
    val weights = corpusCounts
      .join(targetCounts, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(targetTotal))
      .select($"w",
        round((log((coalesce($"ct", lit(0L)) + 1).cast("double")
            / ($"nt" + $"v"))
          - log(($"cc" + 1).cast("double") / ($"nc" + $"v"))) * 1e6)
          .cast("long").as("tick"))
    dt.join(weights, "w")
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_toks"), sum($"c" * $"tick").as("s"))
      .select($"doc_id", $"n_toks",
        round($"s".cast("double") / ($"n_toks" * 1e6), 6).as("weight"))
  }

  /** Q68 — importance weights over `documents` with English docs as
    * the target distribution.
    */
  def q68ImportanceWeights(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    importanceWeights(docs, col("lang") === "en").orderBy($"doc_id")
  }

  /** LM artifact fit on a corpus: the (c12, c1, |V|) tables a serving
    * tier persists and re-uses — scoring a live stream never re-reads
    * the training corpus.
    */
  def fitLm(corpus: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    import corpus.sparkSession.implicits._
    val db = docBigramCounts(corpus)
    val c12 = db.groupBy($"w1", $"w2").agg(sum($"c").as("c12"))
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val vocab = corpus
      .select(explode(TextStats.tokens($"text")).as("w"))
      .agg(countDistinct($"w").as("v"))
    (c12, c1, vocab)
  }

  /** Score `docs` against a previously-fit LM — the stream-static
    * shape: `docs` may be a micro-batch of a stream while the LM
    * tables are static (AQE/broadcast join, no state). Smoothing for
    * text unseen at fit time: an unseen (w1, w2) with seen w1 scores
    * (0+1)/(c1+V); a bigram whose w1 is itself unseen scores 1/V —
    * the add-one row for a zero-count context. Self-scoring the fit
    * corpus reproduces [[lmScore]] exactly (every bigram seen).
    */
  def scoreAgainst(c12: DataFrame, c1: DataFrame, vocab: DataFrame,
      docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val db = docBigramCounts(docs)
    db.join(c12, Seq("w1", "w2"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select($"doc_id", $"c",
        round(log((coalesce($"c12", lit(0L)) + 1).cast("double")
            / (coalesce($"c1", lit(0L)) + $"v")) * 1e6)
          .cast("long").as("tick"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_bigrams"), sum($"c" * $"tick").as("s"))
      .select($"doc_id", $"n_bigrams",
        round(-$"s".cast("double") / ($"n_bigrams" * 1e6), 6).as("nll"))
  }
}
