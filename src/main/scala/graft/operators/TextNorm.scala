package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text canonicalization for dedup — the CCNet-style normalizers
  * applied BEFORE content hashing, so trivially-different copies
  * (case, digits, token order, appended tails) collapse onto one
  * canonical key that exact dedup ([[Dedup]]) then catches. Each
  * canonicalizer is a codegen'd Column expression chain (no UDF),
  * identical semantics in an oracle engine.
  *
  * Scale shape of [[canonicalDupGroups]]: one partial-agg'd shuffle
  * on the canonical key; the surviving dup groups are ≪ corpus, so
  * the annotate-back join broadcasts the group table — the corpus is
  * scanned once and never self-joined.
  */
object TextNorm {

  /** Lowercase, strip digit runs, collapse whitespace, trim — the
    * classic near-identity normalizer (catches v2/dated copies).
    */
  def lowerStripDigits(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[0-9]+", ""), " +", " "))

  /** Sorted-token (bag-of-words) canonical form — word-order-
    * insensitive duplicate key (catches shuffled boilerplate).
    */
  def bagOfWords(text: Column): Column =
    concat_ws(" ", array_sort(split(text, " ", -1)))

  /** First-n-token fingerprint — catches truncated/extended variants
    * of the same underlying document (a common crawl failure mode:
    * same page, different pagination tails).
    */
  def prefixFingerprint(text: Column, n: Int): Column =
    concat_ws(" ", slice(split(text, " ", -1), 1, n))

  /** Docs whose canonical form collides with ≥ 1 other doc:
    * (doc_id, canon_id = min doc_id of the group, group_size).
    */
  def canonicalDupGroups(docs: DataFrame, canon: Column): DataFrame = {
    import docs.sparkSession.implicits._
    val keyed = docs.select($"doc_id", canon.as("canon"))
    val groups = keyed.groupBy($"canon")
      .agg(min($"doc_id").as("canon_id"), count(lit(1)).as("group_size"))
      .filter($"group_size" > 1L)
    keyed.join(groups, "canon")
      .select($"doc_id", $"canon_id", $"group_size")
  }

  /** Q92 — prefix-20 canonical dup groups over `documents`. */
  def q92PrefixDupGroups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    canonicalDupGroups(Tables.load(spark, dir, "documents"),
      prefixFingerprint(col("text"), 20))
      .orderBy($"doc_id")
  }
}
