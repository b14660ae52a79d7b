package graft.pipeline

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.store.FeatureStore

class TrainingDatasetSpec extends SparkSpec {
  import spark.implicits._

  test("build runs the reference training SQL over the offline store (S3 path)") {
    val fs = FeatureStore(spark,
      Files.createTempDirectory("td-test").toString,
      "customer_id", "purchase_timestamp")
    val feats = FeatureEngineering.engineerFeatures(Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 100.0, 5.0),
      (1L, Timestamp.valueOf("2024-01-03 09:30:00"), 50.0, 6.0),
      (2L, Timestamp.valueOf("2024-01-02 12:00:00"), 200.0, 9.0),
    ).toDF("customer_id", "purchase_timestamp", "purchase_value", "loyalty_score"))
    fs.ingest(feats)
    val td = TrainingDataset.build(spark, fs)
    assert(td.columns.toSeq == Seq("customer_id", "latest_purchase_value",
      "avg_purchase_value", "avg_loyalty_score", "latest_loyalty_score"))
    assert(td.count() == 2)
    // arbitrary SQL surface over the same view
    val n = TrainingDataset.query(spark, fs,
      "SELECT count(*) AS n FROM offline_features").head().getLong(0)
    assert(n == 2)
  }
}
