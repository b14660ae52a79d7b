package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared bus wire-shape fixture for the ingest-composition specs —
  * ONE definition of the contract every `OffsetTrackedSink` spec
  * feeds: single partition 0, gapless 1-based offsets in `idCol`
  * order, event-time from the id, key = id string, value = JSON of
  * the payload columns. Changing the wire schema means changing it
  * here, for every composition spec at once.
  */
object WireFixtures {

  /** Wire-shape `df`: one row per input row with columns
    * (partition, offset, ts, key, value). `idCol` must be one of
    * `payloadCols` (the id travels in the JSON payload).
    */
  def wireOf(df: DataFrame, idCol: String,
      payloadCols: Seq[String]): DataFrame =
    df.select(payloadCols.map(col): _*)
      .withColumn("offset",
        row_number().over(Window.orderBy(col(idCol))).cast("long"))
      .withColumn("partition", lit(0))
      .withColumn("ts", timestamp_micros(col(idCol) * 1000L))
      .withColumn("key", col(idCol).cast("string"))
      .withColumn("value", to_json(struct(payloadCols.map(col): _*)))
      .select(col("partition"), col("offset"), col("ts"),
        col("key"), col("value"))

  /** Parse the JSON `value` back to payload columns per `ddl`
    * (e.g. `"doc_id BIGINT, text STRING"`).
    */
  def parsePayload(df: DataFrame, ddl: String): DataFrame = {
    val fields = StructType.fromDDL(ddl).fieldNames
    df.select(from_json(col("value"), StructType.fromDDL(ddl)).as("r"))
      .select(fields.map(f => col(s"r.$f")): _*)
  }
}
