package graft.store

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Layout

/** Plan-shape proof that the store's bucketed serving layout delivers
  * the 100 TB promises: point lookups scan one bucket, enrich joins
  * against same-bucketed event tables plan with zero Exchange.
  */
class StoreLayoutSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def storeWithData() = {
    val fs = FeatureStore(
      spark,
      Files.createTempDirectory("fs-layout").toString,
      keyCol = "customer_id", eventTimeCol = "purchase_timestamp")
    fs.ingest(Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (2L, ts("2024-01-02 12:00:00"), 200.0),
      (3L, ts("2024-01-03 09:00:00"), 300.0),
    ).toDF("customer_id", "purchase_timestamp", "avg_purchase_value"))
    fs
  }

  test("bucketed online compaction: point lookup prunes to one bucket") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val fs = storeWithData()
    fs.compactOnlineBucketed("online_serving", nBuckets = 8)
    val q = fs.onlineBucketed("online_serving")
      .filter($"customer_id" === 2L)
    assert(q.collect().map(_.getDouble(2)).toSeq == Seq(200.0))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"expected bucket-pruned scan, got:\n$plan")
  }

  test("enrich join against same-bucketed events plans with zero Exchange") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    val fs = storeWithData()
    fs.compactOnlineBucketed("online_serving2", nBuckets = 8)
    Layout.writeBucketed(
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("customer_id", "v"),
      "events_bucketed", "customer_id", 8)
    val joined = spark.table("events_bucketed")
      .join(fs.onlineBucketed("online_serving2").hint("merge"), "customer_id")
    assert(joined.count() == 3)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"expected shuffle-free co-located enrich join, got:\n$plan")
  }
}
