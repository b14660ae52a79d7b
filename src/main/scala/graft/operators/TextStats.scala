package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

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

  /** Q40 — BPE-ish token counts per document. */
  def q40BpeTokenCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id",
        size(bpeTokens($"text")).cast("long").as("n_bpe"))
      .orderBy($"doc_id")
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
