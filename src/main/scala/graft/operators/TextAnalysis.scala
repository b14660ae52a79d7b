package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** North-star text analysis beyond [[TextStats]]: heuristic language
  * ID, quality scoring, and content fingerprinting over `documents`.
  * All pure `functions._` expressions — codegen'd, shuffle-free per
  * row, embarrassingly parallel at 100 TB.
  */
object TextAnalysis {

  /** Function-word profiles for the heuristic language scorer. The
    * engine contract is the scoring formula, not linguistic truth:
    * score(lang) = |tokens ∩ profile(lang)| / |tokens|; argmax wins,
    * ties broken by profile order below.
    */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for"),
    "fr" -> Seq("le", "la", "les", "et", "de", "un", "une", "est", "dans", "pour"),
    "de" -> Seq("der", "die", "das", "und", "von", "ein", "eine", "ist", "im", "mit"),
    "es" -> Seq("el", "la", "los", "y", "de", "un", "una", "es", "en", "para"))

  private def toks(text: Column): Column = split(text, " ", -1)

  def profileHits(text: Column, words: Seq[String]): Column =
    size(filter(toks(text), t => t.isInCollection(words)))

  /** Q25 — language ID: argmax profile hit-ratio with deterministic
    * tie-break (first profile in declaration order wins ties, via
    * strict `>` against the running best).
    */
  def detectLanguage(text: Column): Column =
    profiles.tail.foldLeft(
      (lit(profiles.head._1), profileHits(text, profiles.head._2))) {
      case ((bestLang, bestHits), (lang, words)) =>
        val h = profileHits(text, words)
        (when(h > bestHits, lit(lang)).otherwise(bestLang),
          greatest(h, bestHits))
    }._1

  def q25LangId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", detectLanguage($"text").as("pred_lang"),
        profileHits($"text", profiles.head._2).as("en_hits"))
      .orderBy($"doc_id")
  }

  /** Q22 — quality score: bounded [0,1] blend of length, stopword
    * ratio and mean token length — the heuristic-filter shape used to
    * drop boilerplate/garbage docs from training corpora. Formula is
    * the contract (oracle reproduces it exactly).
    */
  def qualityScore(text: Column): Column = {
    val t = toks(text)
    val nTok = size(t).cast("double")
    val meanLen = (length(text) - (size(t) - 1)).cast("double") / nTok
    val stopRatio = profileHits(text, profiles.head._2).cast("double") / nTok
    least(nTok / lit(100.0), lit(1.0)) * lit(0.4) +
      (lit(1.0) - stopRatio) * lit(0.3) +
      least(meanLen / lit(8.0), lit(1.0)) * lit(0.3)
  }

  def q22Quality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", qualityScore($"text").as("quality"))
      .orderBy($"doc_id")
  }

  /** COMPOSITE quality gate with per-rule ATTRIBUTION — not just a
    * keep/drop bit but WHICH rule fired, the report a curation
    * pipeline needs to audit its own filtering (rule-level drop rates
    * are the first thing to check when a source's survival rate
    * shifts). Every rule is an INTEGER comparison (threshold ratios
    * cross-multiplied), so the report is engine-exact with no float
    * contract at all:
    *  - too_short: fewer than 30 tokens;
    *  - low_stopword: stopword share < 5% (n_stop·20 < n_tok) — the
    *    Gopher-style "not natural prose" signal;
    *  - repetitive_tok: one token exceeds 20% of the doc
    *    (max_tok·5 > n_tok) — degenerate repetition;
    *  - dup_prefix: non-canonical member of a prefix-fingerprint
    *    group ([[TextNorm]]) — a truncated/extended variant.
    *
    * Shape: one projection for the counts, one partial-agg'd
    * (doc, token) → (doc) max for the repetition rule, and an
    * UNHINTED join of the (dup-count-sized) canonical groups — AQE
    * broadcasts them while small, shuffles past threshold.
    */
  def qualityGateReport(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val stops = profiles.head._2
    val base = docs.select($"doc_id",
      size(toks($"text")).cast("long").as("n_tok"),
      profileHits($"text", stops).cast("long").as("n_stop"))
    val maxTok = docs.select($"doc_id", explode(toks($"text")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id").agg(max($"c").as("max_tok"))
    val dupPre = TextNorm.canonicalDupGroups(docs,
        TextNorm.prefixFingerprint($"text", 20))
      .filter($"doc_id" =!= $"canon_id")
      .select($"doc_id", lit(true).as("dup0"))
    base.join(maxTok, "doc_id")
      .join(dupPre, Seq("doc_id"), "left")
      .select($"doc_id",
        ($"n_tok" < 30L).as("too_short"),
        ($"n_stop" * 20L < $"n_tok").as("low_stopword"),
        ($"max_tok" * 5L > $"n_tok").as("repetitive_tok"),
        coalesce($"dup0", lit(false)).as("dup_prefix"))
      .withColumn("kept", !$"too_short" && !$"low_stopword" &&
        !$"repetitive_tok" && !$"dup_prefix")
  }

  /** Q99 — per-rule gate report over `documents`. */
  def q99QualityGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    qualityGateReport(Tables.load(spark, dir, "documents"))
      .orderBy($"doc_id")
  }

  /** Q26 — content fingerprint: rolling polynomial hash over the
    * character stream, mod 1e9+7 (engine-independent arithmetic — the
    * same fold runs in any engine, unlike builtin hash functions).
    * Used for cheap dedup keys and shard-stable sampling.
    *
    * Backed by the NATIVE codegen'd byte scan
    * ([[org.apache.spark.sql.graft.FingerprintExpr]]) — the original
    * HOF formulation ([[fingerprintHof]]) allocated a boxed
    * per-character array per row through three non-codegen lambda
    * closures; the two are spec'd bit-identical (ASCII, multibyte,
    * empty) and every fingerprint oracle (q26/q122/q125/q136) is
    * unchanged.
    */
  def fingerprint(text: Column): Column =
    graft.functions.fingerprintNative(text)

  /** The Column HOF formulation of [[fingerprint]] — kept as the
    * differential reference the native expression is spec'd against
    * (and as documentation of the arithmetic in Catalyst terms).
    */
  def fingerprintHof(text: Column): Column = {
    // explicit 1-based position indexing: split-on-empty-string
    // trailing-empty semantics differ between engines
    val chars = transform(
      sequence(lit(1), length(text)),
      i => ascii(text.substr(i, lit(1))).cast("long"))
    when(length(text) === 0, lit(0L))
      .otherwise(aggregate(chars, lit(0L),
        (acc, c) => (acc * 31L + c) % 1000000007L))
  }

  def q26Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select($"doc_id", fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }

  /** The [[fingerprint]] fold as DuckDB SQL over a text column —
    * shared by the q26 and q122 oracles (one formula text).
    */
  def fingerprintSql(textCol: String): String =
    // empty-input guard: DuckDB's list_reduce ERRORS on an empty list
    // where the Spark fold returns 0 — the CASE mirrors the
    // `when(length === 0, 0)` branch of [[fingerprint]] exactly
    s"""CASE WHEN length($textCol) = 0 THEN 0
       |    ELSE list_reduce(list_transform(range(1, length($textCol) + 1),
       |      i -> ascii($textCol[i])::BIGINT),
       |    (acc, c) -> (acc * 31 + c) % 1000000007) END""".stripMargin
}
