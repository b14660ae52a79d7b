package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** SimHash near-duplicate detection: each document compresses to one
  * 64-bit signature whose Hamming distance tracks token-multiset
  * similarity. The cheapest of the dedup family at 100 TB — 8 bytes of
  * state per doc, and the candidate join is an equi-join on 16-bit
  * signature chunks (pigeonhole: Hamming distance ≤ 3 ⇒ at least one
  * of 4 chunks identical), verified with codegen'd `bit_count(a ^ b)`.
  */
object SimHash {

  val bits = 64
  val chunks = 4 // supports Hamming threshold ≤ chunks - 1

  /** 64-bit SimHash of whitespace tokens. Deterministic across JVMs
    * (MurmurHash3 with fixed seeds).
    */
  def simhash(text: String): Long = {
    val counts = new Array[Int](bits)
    text.split(" ").foreach { tok =>
      val h = (MurmurHash3.stringHash(tok, 0xbeef).toLong << 32) |
        (MurmurHash3.stringHash(tok, 0xcafe).toLong & 0xffffffffL)
      var j = 0
      while (j < bits) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    counts.zipWithIndex.foldLeft(0L) {
      case (acc, (c, j)) => if (c > 0) acc | (1L << j) else acc
    }
  }

  /** (doc_id, simhash) signatures — one tiny row per doc. */
  def signatures(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)]
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
    // band into 16-bit chunks: (chunk_idx, chunk_value, doc, sig)
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
