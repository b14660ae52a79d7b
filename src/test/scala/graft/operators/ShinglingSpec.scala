package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The typed shingle-hash path ([[NearDup.shingleHashSets]]) against
  * the Column reference formulation ([[NearDup.shingles]]), plus the
  * codegen'd sorted-merge intersect used by the near-dup verify.
  */
class ShinglingSpec extends SparkSpec {
  import spark.implicits._

  test("shingleHashSets: |set| per doc equals the Column shingles path") {
    val docs = Tables.load(spark, sf, "documents")
    val typed = NearDup.shingleHashSets(docs)
      .select($"doc_id", size($"shs").as("n"))
    val ref = docs
      .select($"doc_id", size(NearDup.shingles($"text")).as("n"))
      .filter($"n" > 0)
    assert(typed.exceptAll(ref).isEmpty && ref.exceptAll(typed).isEmpty)
  }

  test("shingleHashSets: arrays sorted strictly ascending (merge-intersect precondition)") {
    val bad = NearDup.shingleHashSets(Tables.load(spark, sf, "documents"))
      .select(exists(
        sequence(lit(1), size($"shs") - 1),
        i => element_at($"shs", i + 1) <= element_at($"shs", i)).as("unsorted"))
      .filter($"unsorted")
    assert(bad.isEmpty)
  }

  test("shingle-hash equality tracks shingle-string equality (co-counts match q18 string join)") {
    // same doc pair co-counts via hashed sets vs via distinct shingle
    // STRINGS — collisions or tokenization drift would break equality
    val docs = Tables.load(spark, sf, "documents").limit(200).cache()
    val sets = NearDup.shingleHashSets(docs)
    val hashCo = sets.select($"doc_id".as("doc_a"), $"shs".as("sa"))
      .crossJoin(sets.select($"doc_id".as("doc_b"), $"shs".as("sb")))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        graft.functions.sortedIntersectSize($"sa", $"sb").as("co"))
      .filter($"co" > 0)
    val strSh = docs.select($"doc_id", explode(NearDup.shingles($"text")).as("s"))
    val strCo = strSh.select($"s", $"doc_id".as("doc_a"))
      .join(strSh.select($"s", $"doc_id".as("doc_b")), "s")
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).cast("int").as("co"))
    assert(hashCo.exceptAll(strCo).isEmpty && strCo.exceptAll(hashCo).isEmpty)
    docs.unpersist(); ()
  }

  test("jaccardPairsAgainst: planted batch copy found, disjoint doc admitted") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon eta"), // 4-gram shingles differ at tail
      (11L, "red green blue cyan magenta yellow")).toDF("doc_id", "text")
    val got = NearDup.jaccardPairsAgainst(batch, corpus, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 1: shingles {abc,bcd,cde,dez}; doc 10: {abc,bcd,cde,deη}
    // co=3, na=nb=4 → jac = 3/5 = 0.6
    assert(got.toSeq == Seq((10L, 1L, 0.6)))
  }

  test("containmentPairs: strict excerpt one-way, mutual dup both ways") {
    val docs = Seq(
      // 20 is a verbatim excerpt of 1 (all 4 of its shingles inside
      // 1's 8) → contained 20→1 at 1000000 ticks; 1 in 20 is only
      // 4/8 = 500000 → below τ, direction filtered
      (1L, "a b c d e f g h i j"),
      (20L, "c d e f g h"),
      // 30/31 mutual near-dups: 5 of 6 shingles shared → 833333 both
      // ways
      (30L, "p q r s t u v w"),
      (31L, "p q r s t u v x"),
      (40L, "totally disjoint words only here")).toDF("doc_id", "text")
    val got = NearDup.containmentPairs(docs, tauTicks = 600000L)
      .orderBy($"doc_id", $"container_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (20L, 1L, 4L, 1000000L),
      (30L, 31L, 5L, 833333L),
      (31L, 30L, 5L, 833333L)))
  }

  test("jaccardPairsAgainst ≡ full jaccardPairs restricted to cross pairs") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
    val cut = (docs.agg(max($"doc_id")).head().getLong(0) + 1L) / 2L
    val full = NearDup.jaccardPairs(docs, 0.5)
      .filter($"doc_a" < cut && $"doc_b" >= cut)
      .select($"doc_b".as("doc_id"), $"doc_a".as("dup_of"), $"jac")
    val inc = NearDup.q91IncrementalNearDup(spark, sf)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty)
  }

  test("sortedIntersectSize: hand cases incl. empty/disjoint/dup-free subsets") {
    val df = Seq(
      (Array(1L, 3L, 5L), Array(1L, 3L, 5L), 3),
      (Array(1L, 3L, 5L), Array(2L, 4L, 6L), 0),
      (Array[Long](), Array(1L, 2L), 0),
      (Array(1L, 2L, 9L), Array(2L, 9L, 10L), 2),
      (Array(Long.MinValue, 0L, Long.MaxValue), Array(Long.MinValue, Long.MaxValue), 2)
    ).toDF("a", "b", "want")
    val bad = df.filter(
      graft.functions.sortedIntersectSize($"a", $"b") =!= $"want")
    assert(bad.isEmpty)
  }

  test("sortedIntersectSize: null elements follow array_intersect semantics") {
    // null counts as a common element iff present on BOTH sides —
    // and is never read as a garbage zero
    val cases = spark.sql(
      """SELECT * FROM VALUES
        |  (array(2L, CAST(NULL AS BIGINT)), array(0L, 2L), 1),
        |  (array(CAST(NULL AS BIGINT)), array(CAST(NULL AS BIGINT)), 1),
        |  (array(CAST(NULL AS BIGINT), 7L), array(CAST(NULL AS BIGINT), 7L), 2),
        |  (array(0L), array(CAST(NULL AS BIGINT)), 0)
        |  AS t(a, b, want)""".stripMargin)
    import org.apache.spark.sql.functions.col
    val bad = cases.filter(
      graft.functions.sortedIntersectSize(col("a"), col("b")) =!= col("want"))
    assert(bad.isEmpty)
  }

  test("minhash missedPairs diagnostic: empty at sf (no banding misses)") {
    val docs = Tables.load(spark, sf, "documents")
    assert(MinHashDedup.missedPairs(docs).isEmpty)
  }
}
