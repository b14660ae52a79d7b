package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** STRUCTURE-AWARE MARKDOWN EXTRACTION — fenced code blocks, the
  * structural unit a code-corpus pipeline treats differently from
  * prose (code gets its own dedup keys, its own quality rules, its
  * own mixture weight). One anchored regex extracts every CLOSED
  * fence — ``` + optional lowercase language tag + newline + a
  * backtick-free body + newline + ``` — so an UNTERMINATED trailing
  * fence marker is (by design, and by construction of the regex: the
  * body class `[^`]*` cannot cross a fence marker and nothing closes
  * it) not a fence; the q160 negative control plants exactly that.
  * The pattern stays in the dialect-shared subset (no lookarounds),
  * so Spark's Java regex and DuckDB's RE2 agree match-for-match, and
  * match order gives both engines the same fence index.
  *
  * Per fence: (doc_id, fence_idx, fence_lang, n_lines, body_fp) —
  * the body travels as the shared portable FINGERPRINT
  * ([[TextAnalysis.fingerprint]]), the cross-doc dedup key for
  * extracted code cells. Scale shape: per-row regex + generate, zero
  * shuffles — the pass rides the corpus scan; `posexplode_outer` +
  * null filter keeps Catalyst from inferring a `size > 0` filter
  * that would re-run the extraction regex twice per row (the q132
  * lesson).
  */
object Markdown {

  val fenceRe = "```([a-z]*)\\n([^`]*)\\n```"

  /** Per-fence extraction over `textCol`: one output row per closed
    * fence, in document order.
    */
  def codeFences(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"),
        posexplode_outer(regexp_extract_all(col(textCol), lit(fenceRe),
          lit(0))).as(Seq("pos", "m")))
      .filter($"m".isNotNull)
      .select($"doc_id", ($"pos" + 1).cast("long").as("fence_idx"),
        regexp_extract($"m", fenceRe, 1).as("fence_lang"),
        size(split(regexp_extract($"m", fenceRe, 2), "\n"))
          .cast("long").as("n_lines"),
        TextAnalysis.fingerprint(regexp_extract($"m", fenceRe, 2))
          .as("body_fp"))
  }

  // -- q160 fixture: planted fences derived from doc_id -------------

  /** `documents.text` with planted markdown: a two-line python fence
    * for every 6th doc, a bare (untagged) one-line fence for every
    * 10th, and an UNTERMINATED fence marker for every 15th (the
    * negative control — no closing ```, so no fence row). Values
    * inside the bodies come from the shared [[Redact.scramble]], so
    * both engines derive identical text from `doc_id` alone.
    */
  def plantedMarkdown(id: Column, text: Column): Column = {
    def v(k: Int, i: Int): Column =
      (Redact.scramble(id, lit(i.toLong), k) % 100000).cast("string")
    concat(
      coalesce(text, lit("")),
      when(id % 6 === 0, concat(
        lit(" ```python\nln1 v"), v(13, 1),
        lit("\nln2 v"), v(13, 2), lit("\n``` "))).otherwise(lit("")),
      when(id % 10 === 0, concat(
        lit(" ```\nonly v"), v(21, 1), lit("\n``` "))).otherwise(lit("")),
      when(id % 15 === 0, concat(
        lit(" ```python\nunclosed v"), v(27, 1))).otherwise(lit("")))
  }

  /** Q160 — fence extraction over the planted corpus: every closed
    * plant yields its row (tag, line count, body fingerprint), the
    * unterminated plant yields nothing, and docs on both the %6 and
    * %10 lattices yield two rows whose fence_idx order is the
    * planted order in both engines.
    */
  def q160CodeFences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("text", plantedMarkdown($"doc_id", $"text"))
    codeFences(docs).orderBy($"doc_id", $"fence_idx")
  }

  /** DuckDB oracle for [[q160CodeFences]] — same plants (chr(10)
    * newlines), same regex, match index via zipped unnests, body
    * fingerprint via the shared [[TextAnalysis.fingerprintSql]].
    */
  def oracleSql: String = {
    val P = 2147483647L
    def sc(k: Int, i: Int) =
      s"(((doc_id*1000003 + $i*8191 + $k) % $P) * ((doc_id*1000003 + $i*8191 + $k) % $P) % $P) * 48271 % $P"
    val pat = "```([a-z]*)\\n([^`]*)\\n```"
    s"""WITH aug AS (
       |  SELECT doc_id,
       |    coalesce(text, '')
       |    || CASE WHEN doc_id % 6 = 0
       |         THEN ' ``' || '`python' || chr(10)
       |           || 'ln1 v' || ((${sc(13, 1)}) % 100000)::VARCHAR || chr(10)
       |           || 'ln2 v' || ((${sc(13, 2)}) % 100000)::VARCHAR || chr(10)
       |           || '``' || '` ' ELSE '' END
       |    || CASE WHEN doc_id % 10 = 0
       |         THEN ' ``' || '`' || chr(10)
       |           || 'only v' || ((${sc(21, 1)}) % 100000)::VARCHAR || chr(10)
       |           || '``' || '` ' ELSE '' END
       |    || CASE WHEN doc_id % 15 = 0
       |         THEN ' ``' || '`python' || chr(10)
       |           || 'unclosed v' || ((${sc(27, 1)}) % 100000)::VARCHAR
       |         ELSE '' END AS t2
       |  FROM documents),
       | fx AS (SELECT doc_id, regexp_extract_all(t2, '$pat') AS ms
       |   FROM aug),
       | e AS (SELECT doc_id,
       |     unnest(range(1, len(ms) + 1)) AS fence_idx,
       |     unnest(ms) AS m
       |   FROM fx WHERE len(ms) > 0),
       | b AS (SELECT doc_id, fence_idx,
       |     regexp_extract(m, '$pat', 1) AS fence_lang,
       |     regexp_extract(m, '$pat', 2) AS body
       |   FROM e)
       |SELECT doc_id, fence_idx::BIGINT AS fence_idx, fence_lang,
       |  len(string_split(body, chr(10)))::BIGINT AS n_lines,
       |  (${TextAnalysis.fingerprintSql("body")}) AS body_fp
       |FROM b
       |ORDER BY doc_id, fence_idx""".stripMargin
  }
}
