package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Pin, Tables}

/** North-star text analysis over `documents` (token counting, quality
  * scoring) — SQL-expressible slice, oracle-checked as q17. The
  * heuristic language-ID and fingerprinting operators (not
  * SQL-reproducible in DuckDB) live in [[TextAnalysis]].
  *
  * Everything here is `org.apache.spark.sql.functions` higher-order
  * functions — codegen'd, no UDFs, stays inside WholeStageCodegen, and
  * is embarrassingly parallel (no shuffle except the final stats agg).
  */
object TextStats {

  /** Tokens = split on single spaces (documents are space-joined word
    * lists; matches DuckDB string_split semantics).
    */
  def tokens(text: Column): Column = split(text, " ", -1)

  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  /** BPE-ish pre-tokenizer: the GPT-2-style regex split (contraction
    * suffixes, space-prefixed letter runs, digit runs, punctuation
    * runs, whitespace) — the token counting a training-data pipeline
    * budgets with, without needing a vocab file. RE2-compatible (no
    * lookahead) so the same pattern runs in any engine.
    */
  val bpePattern = "'[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  /** TOKENIZER FERTILITY per language (q151) — the multilingual
    * budget metric: how many characters one BPE-ish token covers
    * (`chars_per_bpe`) and how many subword pieces a whitespace word
    * fragments into (`bpe_per_ws`, "fertility" proper). Languages a
    * tokenizer underserves show low chars-per-token / high fertility
    * — they burn context budget faster, and mixture planning (q144)
    * prices them accordingly. Exact 1e-6 ticks over exact Long sums:
    * one partial+final agg per language, no shuffle beyond it.
    */
  def tokenizerFertility(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"lang",
        length($"text").cast("long").as("_chars"),
        size(tokens($"text")).cast("long").as("_ws"),
        size(bpeTokens($"text")).cast("long").as("_bpe"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"_chars").as("n_chars"),
        sum($"_ws").as("n_ws_tokens"),
        sum($"_bpe").as("n_bpe_tokens"))
      // zero-denominator guard (ANSI div throws, DuckDB // errors): a
      // language whose corpus yields zero BPE or whitespace tokens
      // reports 0 ticks on both engines instead of aborting the query
      .withColumn("chars_per_bpe_ticks",
        expr("CASE WHEN n_bpe_tokens = 0 THEN 0L " +
          "ELSE n_chars * 1000000L div n_bpe_tokens END"))
      .withColumn("bpe_per_ws_ticks",
        expr("CASE WHEN n_ws_tokens = 0 THEN 0L " +
          "ELSE n_bpe_tokens * 1000000L div n_ws_tokens END"))
  }

  /** Q151 — per-language fertility over `documents`. */
  def q151TokenizerFertility(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tokenizerFertility(Tables.load(spark, dir, "documents"))
      .orderBy($"lang")
  }

  /** DuckDB oracle for [[q151TokenizerFertility]] — the same q40
    * regex (interpolated from [[bpePattern]] with SQL-quote
    * escaping), same whitespace tokenization and tick divisions.
    */
  def fertilityOracleSql: String = {
    val re = bpePattern.replace("'", "''")
    s"""WITH d AS (SELECT lang, len(text)::BIGINT AS chars,
       |    len(string_split(text, ' '))::BIGINT AS ws,
       |    len(regexp_extract_all(text, '$re'))::BIGINT AS bpe
       |  FROM documents)
       |SELECT lang, count(*)::BIGINT AS n_docs,
       |  sum(chars)::BIGINT AS n_chars,
       |  sum(ws)::BIGINT AS n_ws_tokens,
       |  sum(bpe)::BIGINT AS n_bpe_tokens,
       |  (CASE WHEN sum(bpe) = 0 THEN 0
       |    ELSE sum(chars) * 1000000 // sum(bpe) END)::BIGINT
       |    AS chars_per_bpe_ticks,
       |  (CASE WHEN sum(ws) = 0 THEN 0
       |    ELSE sum(bpe) * 1000000 // sum(ws) END)::BIGINT
       |    AS bpe_per_ws_ticks
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** Q40 — BPE-ish token counts per document. */
  def q40BpeTokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(bpeTokens($"text")).cast("long").as("n_bpe"))
      .orderBy($"doc_id")
  }

  /** TF-IDF top terms per document. Ranking is by the INTEGER key
    * (tf DESC, df ASC, term ASC) — "most frequent, most distinctive"
    * — which never depends on float comparison, so any engine ranks
    * identically; the tfidf VALUE `tf · ln(N/df)` is emitted as a
    * score. (Ranking by the float itself is a correctness trap:
    * mathematically-equal products like `2·ln(2)` vs `ln(4)` can
    * round differently across engines and flip near-ties.)
    *
    * Shape at scale: tf is one (doc, term) partial-agg; df one
    * (term) agg, joined UNHINTED — AQE broadcasts the vocabulary
    * while it is small and flips to a shuffle join past threshold (a
    * forced hint would be honored at ANY size — the r16 DpPrefix
    * lesson); per-doc top-k is a window
    * over ≤ |doc| rows per key — bounded groups, so the window is the
    * right tool here (unlike q16's corpus-sized probe groups).
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import docs.sparkSession.implicits._
    val n = docs.count()
    val tf = docs.select($"doc_id", explode(tokens($"text")).as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    val ranked = tf.join(df, "term")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
          .orderBy($"tf".desc, $"df".asc, $"term".asc)))
      .filter($"rn" <= k)
    ranked.select($"doc_id", $"term", $"tf", $"df",
      ($"tf" * log(lit(n.toDouble) / $"df")).as("tfidf"))
  }

  /** Q42 — top-3 TF-IDF terms per document (tfidf rounded so the
    * float column is hash-stable across engines; ordering never
    * touches it).
    */
  def q42TfIdf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tfIdfTopTerms(Tables.load(spark, dir, "documents"), 3)
      .withColumn("tfidf", round($"tfidf", 6))
      .orderBy($"doc_id", $"tf".desc, $"df".asc, $"term")
  }

  /** Fixed-size token-window chunking with overlap — the passage
    * splitter feeding embedding/pretraining pipelines: chunk i covers
    * tokens [i·stride, i·stride + size). Start offsets run while
    * < n_tokens, so every token lands in ≥ 1 chunk and the final
    * chunk may be short. Pure per-row expression (no shuffle, no
    * UDF); one doc fans out to ~n/stride rows.
    */
  def chunk(docs: DataFrame, size: Int = 20, stride: Int = 15): DataFrame = {
    require(stride > 0 && size >= stride, "need stride > 0, size >= stride")
    import docs.sparkSession.implicits._
    val toks = tokens($"text")
    // largest start offset = biggest stride multiple ≤ n−1, computed
    // with integer ops (Column `/` is double division)
    val lastTok = org.apache.spark.sql.functions.size(toks) - 1
    val lastStart = lastTok - pmod(lastTok, lit(stride))
    docs
      .select($"doc_id", posexplode(transform(
        sequence(lit(0), lastStart, lit(stride)),
        s => array_join(slice(toks, s + 1, lit(size)), " "))))
      .select($"doc_id", $"pos".cast("long").as("chunk_id"),
        $"col".as("chunk_text"),
        org.apache.spark.sql.functions.size(split($"col", " ", -1))
          .cast("long").as("chunk_tokens"))
  }

  /** Q43 — 20-token chunks, stride 15, over `documents`. */
  def q43Chunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunk(Tables.load(spark, dir, "documents"))
      .orderBy($"doc_id", $"chunk_id")
  }

  /** Bigram occurrence stats — the count side of an n-gram language
    * model: c(w1 w2), c(w1 ·) and the conditional p(w2|w1) =
    * c12/c1. Counts are exact integers (both aggs are plain sums),
    * and the probability is one double division on identical
    * integers — deterministic in any engine.
    */
  /** Per-partition pre-aggregated bigram counts (w1, w2, cnt) — one
    * hash map of (w1,w2)→count per partition, so the shuffle carries
    * |distinct bigrams per partition| rows, not |tokens| rows. (An
    * interpreted transform-into-struct HOF was ~30× slower per token
    * and shuffled every occurrence.) Fan-out keeps a small
    * single-file scan off one core. Shared by [[bigramStats]] and
    * [[pmiCollocations]].
    */
  /** Vocabulary head profile — the Zipf rank/frequency table a
    * tokenizer-vocabulary decision reads: top-k terms by corpus
    * frequency with rank and cumulative corpus share ("the head h
    * terms cover p% of tokens"). Ordering is (freq DESC, term ASC) —
    * integer-keyed, engine-independent; cum_share is one division of
    * exact integer partial sums, rounded as the stable float
    * contract.
    *
    * Shape: one partial-agg'd (term) count, then `TakeOrdered` to
    * the k head rows — the window that ranks and cumulates runs over
    * those k rows only (bounded, never vocabulary-sized); the corpus
    * token total broadcasts as a 1-row cross join.
    */
  def vocabHead(docs: DataFrame, k: Int = 50): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(explode(tokens($"text")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("freq"))
    val total = tf.agg(sum($"freq").as("total"))
    val w = Window.orderBy($"freq".desc, $"term")
    tf.orderBy($"freq".desc, $"term").limit(k)
      .withColumn("rank", row_number().over(w))
      .withColumn("cum", sum($"freq").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select($"rank", $"term", $"freq",
        round($"cum".cast("double") / $"total", 6).as("cum_share"))
  }

  /** Q94 — top-50 vocabulary head over `documents`. */
  def q94VocabHead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    vocabHead(Tables.load(spark, dir, "documents"))
      .orderBy($"rank")
  }

  private def bigramPartials(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.core.Parallel.fan(docs)
      .select($"text").as[String]
      .mapPartitions { it =>
        val counts =
          new java.util.HashMap[(String, String), Array[Long]]()
        it.foreach { text =>
          if (text != null) {
            val toks = text.split(" ", -1)
            var i = 0
            while (i < toks.length - 1) {
              val k = (toks(i), toks(i + 1))
              val c = counts.get(k)
              if (c == null) counts.put(k, Array(1L)) else c(0) += 1L
              i += 1
            }
          }
        }
        import scala.jdk.CollectionConverters._
        counts.entrySet().iterator().asScala
          .map(e => (e.getKey._1, e.getKey._2, e.getValue()(0)))
      }
      .toDF("w1", "w2", "cnt")
  }

  def bigramStats(docs: DataFrame, topK: Int = 50): DataFrame = {
    import docs.sparkSession.implicits._
    val c12 = bigramPartials(docs).groupBy($"w1", $"w2")
      .agg(sum($"cnt").as("c12"))
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    c12.join(c1, "w1")
      .select($"w1", $"w2", $"c12", $"c1",
        ($"c12".cast("double") / $"c1").as("p"))
      .orderBy($"c12".desc, $"w1", $"w2")
      .limit(topK)
  }

  /** Q50 — top-50 bigrams with conditional probabilities. */
  def q50BigramStats(spark: SparkSession, dir: String): DataFrame =
    bigramStats(Tables.load(spark, dir, "documents"))

  /** Pointwise mutual information collocations — the statistical
    * phrase detector (word2vec-style phrase mining, collocation
    * extraction for vocabulary induction): PMI(w1,w2) =
    * ln( c12·T / (c1·c2) ) where c1/c2 are the first-/second-slot
    * marginals and T the total bigram count. All four counts are
    * exact integers from one shared pre-aggregated pass; the PMI
    * value is a single double division + ln, rounded to 6 dp (the
    * q42 tfidf contract — ordering never touches the float, only
    * the exact-integer keys).
    *
    * Shape at scale: one bigram shuffle (pre-aggregated per
    * partition), marginals are two small re-aggs of the distinct-
    * bigram table broadcast back — never a re-scan of the corpus.
    */
  def pmiCollocations(docs: DataFrame, minCount: Long = 5L,
      topK: Int = 100): DataFrame = {
    import docs.sparkSession.implicits._
    // distinct-bigram counts: |vocab²|-bounded, far smaller than the
    // corpus — pinned (Pin.reuse) so the three derived aggs (marginals,
    // total) don't each re-run the corpus pass
    val c12 = bigramPartials(docs).groupBy($"w1", $"w2")
      .agg(sum($"cnt").as("c12")).transform(Pin.reuse)
    val c1 = c12.groupBy($"w1").agg(sum($"c12").as("c1"))
    val c2 = c12.groupBy($"w2").agg(sum($"c12").as("c2"))
    val t = c12.agg(sum($"c12").as("t"))
    c12.join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(t))
      .filter($"c12" >= minCount)
      .select($"w1", $"w2", $"c12", $"c1", $"c2",
        round(log(($"c12" * $"t").cast("double") / ($"c1" * $"c2")), 6)
          .as("pmi"))
      .orderBy($"c12".desc, $"w1", $"w2")
      .limit(topK)
  }

  /** Q71 — top-100 collocations by count with PMI scores. */
  def q71Pmi(spark: SparkSession, dir: String): DataFrame =
    pmiCollocations(Tables.load(spark, dir, "documents"))

  /** Per-document repetition diagnostics — the Gopher-rules family of
    * repetitiveness filters from public LM data-curation reports:
    * distinct-token ratio, top-token fraction, top-bigram fraction.
    * Templated/looping text scores high and gets filtered before
    * training.
    *
    * Typed per-partition loop (two small hash maps per doc, reused
    * across rows) — per-row compute only, no shuffle before the
    * final sort; every derived ratio is a single division of exact
    * integers, so any engine computes identical doubles.
    */
  def repetitionStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.core.Parallel.fan(docs)
      .select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val tok = new java.util.HashMap[String, Array[Long]]()
        val bg = new java.util.HashMap[(String, String), Array[Long]]()
        it.map { case (id, text) =>
          tok.clear(); bg.clear()
          val toks = text.split(" ", -1)
          var i = 0
          while (i < toks.length) {
            val c = tok.get(toks(i))
            if (c == null) tok.put(toks(i), Array(1L)) else c(0) += 1L
            if (i < toks.length - 1) {
              val k = (toks(i), toks(i + 1))
              val c2 = bg.get(k)
              if (c2 == null) bg.put(k, Array(1L)) else c2(0) += 1L
            }
            i += 1
          }
          var topTok = 0L
          tok.values.forEach(c => if (c(0) > topTok) topTok = c(0))
          var topBg = 0L
          bg.values.forEach(c => if (c(0) > topBg) topBg = c(0))
          (id, toks.length.toLong, tok.size.toLong, topTok, topBg)
        }
      }
      .toDF("doc_id", "n_tokens", "n_distinct", "top_tok", "top_bigram")
      .select($"doc_id", $"n_tokens", $"n_distinct", $"top_tok",
        $"top_bigram",
        ($"n_distinct".cast("double") / $"n_tokens").as("distinct_ratio"),
        ($"top_tok".cast("double") / $"n_tokens").as("top_tok_frac"),
        when($"n_tokens" > 1,
          $"top_bigram".cast("double") / ($"n_tokens" - 1))
          .as("top_bigram_frac"))
  }

  /** Q52 — repetition diagnostics over `documents`. */
  def q52Repetition(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    repetitionStats(Tables.load(spark, dir, "documents"))
      .orderBy($"doc_id")
  }

  /** Cross-document chunk-level dedup — the boilerplate detector: a
    * sub-document span repeated across documents (navigation text,
    * license headers, templated passages) shows up as a chunk whose
    * exact text recurs. Composes [[chunk]] with exact dedup; the
    * group key at scale is `sha2(chunk_text)` — 32 bytes per chunk
    * on the shuffle regardless of chunk length (the q15 contract).
    * Oracle-checkable because both sides group on the exact text.
    */
  def duplicatedChunks(docs: DataFrame, size: Int = 20,
      stride: Int = 15): DataFrame = {
    import docs.sparkSession.implicits._
    chunk(docs, size, stride)
      .groupBy($"chunk_text")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter($"n_occurrences" > 1)
  }

  /** Q61 — repeated 20-token chunks across `documents`. */
  def q61DupChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    duplicatedChunks(Tables.load(spark, dir, "documents"))
      .orderBy($"chunk_text")
  }

  /** Q17 — per-document token/length/stopword stats. */
  def q17TokenStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(
        $"doc_id",
        length($"text").as("len"),
        size(tokens($"text")).cast("long").as("n_tokens"),
        length(regexp_replace($"text", " ", "")).as("n_nonspace"),
        stopwordCount($"text").cast("long").as("n_stop"))
      .withColumn("stop_ratio",
        $"n_stop".cast("double") / $"n_tokens".cast("double"))
      .orderBy($"doc_id")
  }
}
