package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.store.FeatureStore

/** Port of `build_training_dataset`
  * (`core/feature_store_manager.py:121-153`): SQL retrieval of
  * training data from the offline store. The reference hands an SQL
  * string to Athena (managed Presto) and polls for a result CSV; here
  * the same SQL runs on Spark's own engine over a temp view of the
  * offline parquet — no service boundary, no polling, and Catalyst
  * prunes the SELECT-list columns into the scan.
  */
object TrainingDataset {

  /** The reference's training query shape
    * (`feature_store_manager.py:135-141`): latest-ordered full
    * history, five feature columns.
    */
  def trainingSql(table: String): String =
    s"""SELECT customer_id, latest_purchase_value, avg_purchase_value,
       |       avg_loyalty_score, latest_loyalty_score
       |FROM $table
       |ORDER BY customer_id, purchase_timestamp DESC""".stripMargin

  /** Register the store's offline history and run the training SQL. */
  def build(spark: SparkSession, store: FeatureStore,
      viewName: String = "offline_features"): DataFrame = {
    store.offline().createOrReplaceTempView(viewName)
    spark.sql(trainingSql(viewName))
  }

  /** Arbitrary SQL over the offline store — the general Athena-query
    * replacement (S3 scan surface).
    */
  def query(spark: SparkSession, store: FeatureStore, sql: String,
      viewName: String = "offline_features"): DataFrame = {
    store.offline().createOrReplaceTempView(viewName)
    spark.sql(sql)
  }
}
