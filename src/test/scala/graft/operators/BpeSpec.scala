package graft.operators

import graft.SparkSpec
import graft.core.Tables

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learnMerges: hand-verified sequence on the classic corpus") {
    // counts: "aaab"×3, "aab"×2 → pair counts round 1:
    // (a,a): 2·3 + 1·2 = 8; (a,b): 3 + 2 = 5 → merge (a,a)
    // round 2 over {aa,a,b}×3, {aa,b}×2: (aa,a)=3, (a,b)=3, (aa,b)=2
    //   → tie at 3 broken lexicographically: (a,b)
    val merges = Bpe.learnMerges(Seq(("aaab", 3L), ("aab", 2L)), 2)
    assert(merges == Seq(("a", "a"), ("a", "b")))
  }

  test("learnMerges stops when no pair repeats") {
    assert(Bpe.learnMerges(Seq(("ab", 1L), ("cd", 1L)), 10).isEmpty)
  }

  test("encodeWord follows merge rank order, not greedy frequency") {
    val ranks = Map(("a", "a") -> 0, ("a", "b") -> 1, ("aa", "ab") -> 2)
    // "aaab" → aa,a,b (rank0) → aa,ab (rank1) → aaab (rank2)
    assert(Bpe.encodeWord("aaab", ranks) == Vector("aaab"))
    assert(Bpe.encodeWord("aab", ranks) == Vector("aa", "b"))
    assert(Bpe.encodeWord("xyz", ranks) == Vector("x", "y", "z"))
  }

  test("fit + encode on the corpus: conservation and compression") {
    val docs = Tables.load(spark, sf, "documents")
    val merges = Bpe.fit(docs, nMerges = 30)
    assert(merges.size == 30) // corpus is far from merge-exhausted
    val enc = Bpe.encode(docs, merges).cache()
    assert(enc.count() == docs.count())
    // concatenating pieces reproduces the text exactly (spaces
    // removed — words encode independently)
    val bad = enc.join(docs, "doc_id")
      .filter(org.apache.spark.sql.functions.regexp_replace($"text", " ", "")
        =!= org.apache.spark.sql.functions.regexp_replace($"pieces_csv", ",", ""))
    assert(bad.isEmpty)
    // merges compress: fewer pieces than characters, ≥ tokens
    val r = enc.agg(
      org.apache.spark.sql.functions.sum($"n_pieces"),
      org.apache.spark.sql.functions.sum($"n_tokens")).head()
    val (pieces, tokens) = (r.getLong(0), r.getLong(1))
    val chars = docs.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.regexp_replace($"text", " ", ""))))
      .head().getLong(0)
    assert(pieces < chars && pieces >= tokens)
    enc.unpersist(); ()
  }

  test("minCount bounds the driver collect without changing the merges") {
    import spark.implicits._
    // head vocabulary (count 10) + a long tail of singleton junk over
    // a DISJOINT alphabet — the Zipf shape the cut exists for; the
    // singletons share no pairs with the head, so every merge's
    // selection margin exceeds the dropped mass
    val head = Seq.tabulate(10)(i => (i.toLong, "banana band bandana"))
    // every tail word is two GLOBALLY unique characters: each pair
    // occurs once in the corpus, below the ≥2 merge-candidate floor
    val tail = Seq.tabulate(20)(i => (100L + i,
      "" + (0x400 + 2 * i).toChar + (0x401 + 2 * i).toChar))
    val docs = (head ++ tail).toDF("doc_id", "text")
    // the driver-memory bound: the cut shrinks the collected vocab…
    val full = Bpe.wordCounts(docs).count()
    val cut = Bpe.wordCounts(docs)
      .filter(org.apache.spark.sql.functions.col("c") >= 2).count()
    assert(cut == 3L && full == 23L, s"cut $cut of $full words collected")
    // …and the merge table is unchanged
    val merges = Bpe.fit(docs, 8)
    assert(merges.nonEmpty)
    assert(Bpe.fit(docs, 8, minCount = 2L) == merges)
    // the same cut ALSO holds on the real corpus at its margins
    val corpus = Tables.load(spark, sf, "documents")
    assert(Bpe.fit(corpus, 30, minCount = 2L) == Bpe.fit(corpus, 30))
    // degenerate: a cut above every count learns nothing, loudly-empty
    assert(Bpe.fit(docs, 8, minCount = Long.MaxValue).isEmpty)
  }

  test("piece concatenation ambiguity guard: csv split round-trips piece counts") {
    // pieces_csv is a faithful piece list (no empty-piece artifacts)
    val docs = Tables.load(spark, sf, "documents").limit(20)
    val merges = Bpe.fit(docs, 10)
    val enc = Bpe.encode(docs, merges)
    val bad = enc.filter(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split($"pieces_csv", ",", -1))
        =!= $"n_pieces")
    assert(bad.isEmpty)
  }
}
