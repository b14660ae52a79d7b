package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with zero Exchange (co-located join)") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val e = Tables.load(spark, sf, "events")
    Layout.writeBucketed(
      e.select($"user_id", $"value"), "ev_bucketed", "user_id", 8)
    Layout.writeBucketed(
      e.groupBy($"user_id").agg(avg($"value").as("avg_v")),
      "feat_bucketed", "user_id", 8)
    val joined = spark.table("ev_bucketed")
      .join(spark.table("feat_bucketed").hint("merge"), "user_id")
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected shuffle-free co-located join, got:\n$plan")
  }

  test("salted aggregation matches plain aggregation") {
    val e = Tables.load(spark, sf, "events")
    val salted = Layout.saltedSumCount(e, "user_id", "value", 8)
      .orderBy($"user_id").collect()
      .map(r => (r.getLong(0), (math.rint(r.getDouble(1) * 1e6), r.getLong(2))))
    val plain = e.groupBy($"user_id")
      .agg(sum($"value").as("total"), count(lit(1)).as("n"))
      .orderBy($"user_id").collect()
      .map(r => (r.getLong(0), (math.rint(r.getDouble(1) * 1e6), r.getLong(2))))
    assert(salted.toMap == plain.toMap)
  }

  test("salted join matches plain join and spreads a hot key") {
    val fact = Seq.fill(1000)((1L, 1.0)).toDF("k", "v") // 1 pathological key
      .union(Seq((2L, 5.0), (3L, 7.0)).toDF("k", "v"))
    val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold")).toDF("k", "name")
    val salted = Layout.saltedJoin(fact, dim, "k", 8)
    assert(salted.count() == 1002)
    assert(salted.filter($"k" === 1L).select($"name").distinct().head().getString(0) == "hot")
    // the hot key's rows carry multiple distinct salts (spread happened)
    val spread = Layout.saltedJoin(fact, dim, "k", 8)
    val salts = fact.withColumn("_salt",
      pmod(xxhash64($"k", monotonically_increasing_id()), lit(8)))
      .filter($"k" === 1L).select($"_salt").distinct().count()
    assert(salts > 1, s"hot key landed on $salts salt buckets")
  }
}
