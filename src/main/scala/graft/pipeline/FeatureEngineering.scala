package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Port of the reference's batch feature engineering
  * (`core/utils.py:167-230`): per-customer aggregation of purchase
  * history into the 6-column engineered feature schema
  * (`core/feature_store_manager.py:85-92`).
  *
  * One lazy plan: scan → timestamp parse → hash group-by with partial
  * (map-side) aggregation → alias projection. The shuffle carries one
  * row per (input partition, customer) — at 100 TB this is the only
  * exchange and it is minimal.
  *
  * `last` in pandas file order (reference `core/utils.py:204,208`) is
  * nondeterministic under a shuffle; we use `max_by(value,
  * (event_time, seq))`-shaped latest-by-time semantics instead — the
  * README's stated intent ("latest purchase value", `README.md:27,43`).
  * Divergence documented in SURVEY.md §2.4 A1.
  */
object FeatureEngineering {

  /** Raw purchase schema (`test_task_data.md:2-5`); declared, never
    * inferred.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("customer_id", LongType, nullable = false),
    StructField("purchase_timestamp", StringType, nullable = false),
    StructField("purchase_value", DoubleType, nullable = false),
    StructField("loyalty_score", DoubleType, nullable = false)))

  /** Engineered feature schema (A2 in FIXTURES.md). */
  val featureCols: Seq[String] = Seq(
    "customer_id", "purchase_timestamp", "latest_purchase_value",
    "avg_purchase_value", "avg_loyalty_score", "latest_loyalty_score")

  /** ISO-8601 wire format with microseconds — Python `%f` ≡ SSSSSS
    * (`core/utils.py:226-228`).
    */
  val wireTsFormat = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'"

  def readRawCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(rawSchema).csv(path)
      .withColumn("purchase_timestamp", to_timestamp(col("purchase_timestamp")))

  /** JSON-lines ingest with the same declared schema + ts
    * normalization — ingest formats differ per producer, the engine
    * contract doesn't. Declared schema means no inference pass (one
    * read, predictable types at 100 TB).
    */
  def readRawJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(rawSchema).json(path)
      .withColumn("purchase_timestamp", to_timestamp(col("purchase_timestamp")))

  /** ORC ingest — same contract; ORC files carry typed timestamps so
    * only the string-typed case needs normalizing.
    */
  def readRawOrc(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.orc(path)
    if (df.schema("purchase_timestamp").dataType == StringType)
      df.withColumn("purchase_timestamp", to_timestamp(col("purchase_timestamp")))
    else df
  }

  /** Avro ingest — the Kafka-wire production format
    * (`Scaling and monitoring strategies.md:5-21` makes a stream the
    * production source, and Avro container files are its batch
    * landing shape). Same declared-schema contract; the reader is
    * [[graft.sources.AvroSource]] (this distribution bundles Avro's
    * Java core but not the spark-avro DataSource, so the engine
    * carries its own input-format-based reader).
    */
  def readRawAvro(spark: SparkSession, path: String): DataFrame =
    graft.sources.AvroSource.read(spark, path, rawSchema)
      .withColumn("purchase_timestamp", to_timestamp(col("purchase_timestamp")))

  /** The A1 group-by: max ts, latest-by-ts value/score, running means.
    * Input must have TimestampType `purchase_timestamp`.
    */
  def engineerFeatures(raw: DataFrame): DataFrame = {
    import raw.sparkSession.implicits._
    raw.groupBy($"customer_id")
      .agg(
        max($"purchase_timestamp").as("purchase_timestamp"),
        max_by($"purchase_value", $"purchase_timestamp").as("latest_purchase_value"),
        avg($"purchase_value").as("avg_purchase_value"),
        avg($"loyalty_score").as("avg_loyalty_score"),
        max_by($"loyalty_score", $"purchase_timestamp").as("latest_loyalty_score"))
      .select(featureCols.map(col): _*)
  }

  /** Wire-format projection: native types → the stringly record codec
    * the reference puts on the wire (F2/F3,
    * `feature_store_manager.py:224-236`). Applied only at an explicit
    * boundary; everything internal stays typed.
    */
  def toWire(features: DataFrame): DataFrame = {
    import features.sparkSession.implicits._
    features.select(
      $"customer_id".cast(StringType).as("customer_id"),
      date_format($"purchase_timestamp", wireTsFormat).as("purchase_timestamp"),
      $"latest_purchase_value".cast(StringType),
      $"avg_purchase_value".cast(StringType),
      $"avg_loyalty_score".cast(StringType),
      $"latest_loyalty_score".cast(StringType))
  }

  /** The reference's literal record wire shape: one
    * `array<struct<FeatureName, ValueAsString>>` per row — what
    * `put_record` sends and `get_record` returns
    * (`feature_store_manager.py:224-236`, `utils.py:145-158`). */
  def toWireRecords(features: DataFrame): DataFrame = {
    import features.sparkSession.implicits._
    val entries =
      struct(lit("customer_id").as("FeatureName"),
        $"customer_id".cast(StringType).as("ValueAsString")) +:
      struct(lit("purchase_timestamp").as("FeatureName"),
        date_format($"purchase_timestamp", wireTsFormat).as("ValueAsString")) +:
      featureCols.drop(2).map(c => struct(lit(c).as("FeatureName"),
        col(c).cast(StringType).as("ValueAsString")))
    features.select(array(entries: _*).as("record"))
  }

  /** Inbound wire decode — the inverse of [[toWireRecords]] and the
    * port of `get_feature_value`'s name/value-list extraction
    * (`utils.py:160-164`, consumed by `get_latest_features`,
    * `feature_store_manager.py:174-204`). The reference re-parses
    * stringly values with `float()` at every read
    * (`inference.py:108,116-117`); here the decode happens once at
    * the boundary and everything downstream is typed. Name lookup via
    * `map_from_entries` + `element_at` — codegen'd, no UDF.
    */
  def fromWireRecords(records: DataFrame): DataFrame = {
    import records.sparkSession.implicits._
    val m = map_from_entries($"record")
    records.select(
      element_at(m, "customer_id").cast(LongType).as("customer_id") +:
        to_timestamp(element_at(m, "purchase_timestamp"), wireTsFormat)
          .as("purchase_timestamp") +:
        featureCols.drop(2).map(c =>
          element_at(m, c).cast(DoubleType).as(c)): _*)
  }
}
