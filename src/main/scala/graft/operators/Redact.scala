package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** PII scrubbing — the redaction pass every public-data pipeline runs
  * before training: detect and mask emails, phone numbers, and IPv4
  * addresses. Pure per-row regex expressions (codegen'd
  * `regexp_count`/`regexp_replace`, no UDF, no shuffle) — the scan is
  * the only cost at any corpus size, and the pass composes with any
  * other per-row gate on the same scan.
  *
  * Patterns stay in the dialect-shared regex subset (character
  * classes, bounded repetition, word boundaries — no lookarounds), so
  * an external auditor can re-run them in any RE2-compatible engine.
  */
object Redact {

  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(emailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phoneRe))
  def ipv4Count(text: Column): Column  = regexp_count(text, lit(ipv4Re))

  /** Mask every match with a typed placeholder. IPs run after phones
    * so a dotted phone (`555.123.4567`) is claimed by the more
    * specific phone pattern first.
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "[EMAIL]"),
        phoneRe, "[PHONE]"),
      ipv4Re, "[IP]")

  /** Per-document PII hit counts plus the redacted text. */
  def scan(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", emailCount(t).cast("long"))
      .withColumn("n_phones", phoneCount(t).cast("long"))
      .withColumn("n_ipv4", ipv4Count(t).cast("long"))
      .withColumn("redacted", redact(t))
  }

  /** Q69 — per-language PII audit summary over `documents` (clean
    * corpus ⇒ all-zero counts; the oracle cross-checks that both
    * engines' regex dialects agree on every real document, and the
    * planted-fixture spec proves the detection itself).
    */
  def q69PiiScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    scan(Tables.load(spark, dir, "documents"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_emails").as("emails"),
        sum($"n_phones").as("phones"),
        sum($"n_ipv4").as("ips"))
      .orderBy($"lang")
  }
}
