package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression == zip_with/aggregate composition on real embeddings") {
    val emb = Tables.load(spark, sf, "embeddings").limit(200)
    val pairs = emb.select($"vec_id".as("ida"), $"embedding".as("a"))
      .crossJoin(emb.select($"vec_id".as("idb"), $"embedding".as("b")))
      .filter($"ida" < $"idb").limit(5000)
    val both = pairs.select(
      cosineSimilarity($"a", $"b").as("fused"),
      (Similarity.dotD($"a", $"b") /
        (Similarity.normD($"a") * Similarity.normD($"b"))).as("composed"))
    val maxDiff = both.select(max(abs($"fused" - $"composed"))).head().getDouble(0)
    assert(maxDiff < 1e-12)
  }

  test("float input arrives via implicit cast; nulls propagate") {
    val df = Seq(
      (Some(Array(1.0f, 0.0f)), Some(Array(0.6f, 0.8f))),
      (None, Some(Array(1.0f, 0.0f)))
    ).toDF("a", "b")
    val got = df.select(cosineSimilarity($"a", $"b")).collect()
    assert(math.abs(got(0).getDouble(0) - 0.6) < 1e-6) // float32 literal quantization
    assert(got(1).isNullAt(0))
  }

  test("SQL registration: graft_cosine_sim callable from spark.sql") {
    registerAll(spark)
    Tables.load(spark, sf, "embeddings").createOrReplaceTempView("emb_t")
    val r = spark.sql(
      """SELECT graft_cosine_sim(a.embedding, a.embedding) AS s
        |FROM emb_t a WHERE a.vec_id = 0""".stripMargin).head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("expression participates in whole-stage codegen (no eval fallback)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val df = emb.select(cosineSimilarity($"embedding", $"embedding").as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)")) // codegen span covers the projection
  }
}
