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
