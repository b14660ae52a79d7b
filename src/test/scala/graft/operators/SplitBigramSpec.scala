package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SplitBigramSpec extends SparkSpec {
  import spark.implicits._

  test("assignSplits: exhaustive, disjoint, near the declared fractions, growth-stable") {
    val docs = Tables.load(spark, sf, "documents")
    val s = Curation.assignSplits(docs, "doc_id").cache()
    assert(s.count() == docs.count())
    val frac = s.groupBy($"split").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(math.abs(frac("train") / n - 0.8) < 0.1)
    assert(frac.values.sum == docs.count())
    // growth stability: a doc's split is a pure key function — the
    // assignment computed on a subset matches the full corpus
    val sub = Curation.assignSplits(docs.limit(100), "doc_id")
      .select($"doc_id", $"split")
    val bad = sub.join(s.select($"doc_id", $"split".as("full")), "doc_id")
      .filter($"split" =!= $"full")
    assert(bad.isEmpty)
    s.unpersist(); ()
  }

  test("q49 grouped top-k equals the window formulation") {
    val docs = Tables.load(spark, sf, "documents")
    val q = docs.select($"lang", $"doc_id",
      round(TextAnalysis.qualityScore($"text"), 6).as("quality"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"quality".desc, $"doc_id")
    val viaWindow = q.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3).drop("rn")
      .select($"lang", $"doc_id", $"quality")
    val viaAgg = Curation.q49TopQualityPerLang(spark, sf)
    assert(viaAgg.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaAgg).isEmpty)
  }

  test("bigramStats: hand-computed counts and conditionals") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val got = TextStats.bigramStats(docs).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // bigrams: doc1 = (a,b),(b,a),(a,b),(b,c); doc2 = (a,b); doc3 none
    assert(got(("a", "b")) == ((3L, 3L, 1.0)))        // c(a·)=3
    assert(got(("b", "a")) == ((1L, 2L, 0.5)))        // c(b·)=2
    assert(got(("b", "c")) == ((1L, 2L, 0.5)))
    assert(got.size == 3)
  }
}
