package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("semiJoinPruned equals the plain semi join (long keys)") {
    val orders = Tables.load(spark, sf, "orders")
    val dim = Tables.load(spark, sf, "customer")
      .filter($"c_mktsegment" === "BUILDING")
    val pruned = BloomPrune.semiJoinPruned(orders, "o_custkey",
        dim, "c_custkey", expectedItems = 10000L)
      .select($"o_orderkey").as[Long].collect().toSet
    val plain = orders.join(
        dim.select($"c_custkey".as("o_custkey")).distinct(),
        Seq("o_custkey"), "left_semi")
      .select($"o_orderkey").as[Long].collect().toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("semiJoinPruned equals the plain semi join (string keys)") {
    val docs = Tables.load(spark, sf, "documents")
    val dim = docs.filter($"source".isin("src0", "src1"))
      .select($"source".as("k"))
    val pruned = BloomPrune.semiJoinPruned(docs, "source", dim, "k",
        expectedItems = 100L)
      .select($"doc_id").as[Long].collect().toSet
    val plain = docs.filter($"source".isin("src0", "src1"))
      .select($"doc_id").as[Long].collect().toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("semiJoinPruned covers narrow integrals and rejects unsupported key types") {
    // int/short/byte keys probe the long-built filter (upcast), never
    // the string branch — a silent-empty-result bug if mismatched
    val fact = Seq(1, 2, 3, 4, 5).toDF("k")
      .select($"k".cast("int").as("k"))
    val dim = Seq(2, 4).toDF("k").select($"k".cast("short").as("k"))
    val got = BloomPrune.semiJoinPruned(
        fact.select($"k".cast("short").as("k")), "k", dim, "k", 10L)
      .as[Short].collect().toSet
    assert(got == Set(2.toShort, 4.toShort))
    val gotByte = BloomPrune.semiJoinPruned(
        fact.select($"k".cast("byte").as("k")), "k",
        dim.select($"k".cast("byte").as("k")), "k", 10L)
      .as[Byte].collect().toSet
    assert(gotByte == Set(2.toByte, 4.toByte))
    val gotInt = BloomPrune.semiJoinPruned(fact, "k",
        dim.select($"k".cast("int").as("k")), "k", 10L)
      .as[Int].collect().toSet
    assert(gotInt == Set(2, 4))
    // unsupported key type fails loudly, not silently empty
    val ts = Seq("2024-01-01").toDF("s").select(to_date($"s").as("k"))
    val ex = intercept[IllegalArgumentException] {
      BloomPrune.semiJoinPruned(ts, "k", ts, "k", 10L)
    }
    assert(ex.getMessage.contains("unsupported join-key type"))
  }

  test("bloom pass prunes most non-matching rows before the shuffle") {
    val orders = Tables.load(spark, sf, "orders").cache()
    val dim = Tables.load(spark, sf, "customer")
      .filter($"c_mktsegment" === "BUILDING").cache()
    val bloom = dim.stat.bloomFilter("c_custkey", 10000L, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)
    val probe = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    val passed = orders.filter(probe($"o_custkey")).count()
    val matching = orders.join(
        dim.select($"c_custkey".as("o_custkey")).distinct(),
        Seq("o_custkey"), "left_semi").count()
    val total = orders.count()
    // no false negatives; false positives bounded well under the
    // non-matching population (1% nominal fpp, 10x slack)
    assert(passed >= matching)
    assert(passed - matching <= math.max(10L, (total - matching) / 10))
  }
}
