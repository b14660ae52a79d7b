package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection: each document compresses to one
  * 60-bit signature whose Hamming distance tracks token-multiset
  * similarity. The cheapest of the dedup family at 100 TB — 8 bytes of
  * state per doc, and the candidate join is an equi-join on 15-bit
  * signature chunks (pigeonhole: Hamming distance ≤ 3 ⇒ at least one
  * of 4 chunks identical), verified with codegen'd `bit_count(a ^ b)`.
  *
  * The token hash is PORTABLE: two mod-prime polynomial character
  * hashes (the q26 fingerprint pattern) packed `hi·2^30 + lo`. Exact
  * BIGINT arithmetic, left-to-right fold — any SQL engine reproduces
  * it (`list_reduce` in DuckDB), which makes the whole pipeline
  * signature → banding → Hamming verify deterministic and
  * oracle-checkable (q29), not merely spec-checked. Pigeonhole
  * banding is exact (no probabilistic misses), so q29 is an equality
  * contract, unlike LSH candidate generation.
  */
object SimHash {

  val bits = 60
  val chunks = 4 // 15-bit bands; supports Hamming threshold ≤ chunks - 1
  private val P1 = 1073741789L // two largest primes < 2^30
  private val P2 = 1073741783L

  /** Portable 60-bit token hash. Zero-init fold ≡ reduce-without-init
    * (first step yields the first char code), matching DuckDB's
    * `list_reduce` exactly. Folds Unicode CODE POINTS, not UTF-16
    * units — SQL engines index strings by code point (`tok[i]` /
    * `ascii`), so folding `charAt` would diverge on any non-BMP
    * character (emoji etc.): one code point there, two surrogates
    * here.
    */
  def tokenHash(tok: String): Long = {
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < tok.length) {
      val cp = tok.codePointAt(i).toLong
      h1 = (h1 * 31 + cp) % P1
      h2 = (h2 * 37 + cp) % P2
      i += Character.charCount(cp.toInt)
    }
    (h1 << 30) | h2 // h2 < 2^30 ⇒ | ≡ +
  }

  /** 60-bit SimHash of whitespace tokens (empty tokens skipped — Java
    * split and SQL string_split disagree on trailing empties).
    */
  def simhash(text: String): Long = {
    val counts = new Array[Int](bits)
    text.split(" ").foreach { tok =>
      if (tok.nonEmpty) {
        val h = tokenHash(tok)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
    }
    counts.zipWithIndex.foldLeft(0L) {
      case (acc, (c, j)) => if (c > 0) acc | (1L << j) else acc
    }
  }

  /** (doc_id, simhash) signatures — one tiny row per doc. Input is
    * fanned out so a single-file scan doesn't pin the hash loop to
    * one core.
    */
  def signatures(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    graft.core.Parallel.fan(docs).select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => (id, simhash(t)) })
      .toDF("doc_id", "simhash")
  }

  /** Near-dup pairs with Hamming distance ≤ maxHamming (< chunks).
    * Candidates come from the banded equi-join; `bit_count(xor)` does
    * the exact verify. Signatures table is |docs| × 16 bytes — the
    * join shuffles signatures, never documents.
    */
  def nearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < chunks, s"banding supports Hamming < $chunks")
    import docs.sparkSession.implicits._
    val sig = signatures(docs)
    // band into 15-bit chunks: (chunk_idx, chunk_value, doc, sig)
    val banded = sig.select($"doc_id", $"simhash",
        explode(sequence(lit(0), lit(chunks - 1))).as("chunk"))
      .withColumn("chunk_val",
        expr(s"shiftrightunsigned(simhash, chunk * ${bits / chunks})")
          .bitwiseAND(lit((1L << (bits / chunks)) - 1)))
    banded.as("a").join(banded.as("b"),
        $"a.chunk" === $"b.chunk" && $"a.chunk_val" === $"b.chunk_val" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        bit_count($"a.simhash".bitwiseXOR($"b.simhash")).as("hamming"))
      .distinct() // pairs sharing >1 chunk appear once
      .filter($"hamming" <= maxHamming)
  }
}
