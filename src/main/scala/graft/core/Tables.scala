package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables
  * (`/root/testdata/sf*`, schemas in /root/repo/FIXTURES.md §B).
  *
  * Parquet is read with the footer schema (no inference pass) and all
  * predicates/projections applied after these loaders still push down
  * into the scan (FileSourceScanExec PushedFilters / ReadSchema) because
  * the loader adds no barrier between scan and query.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is physical TIMESTAMP(NANOS) which Spark's vectorized
    // parquet reader rejects outright; read it as a long of nanoseconds
    // and truncate to microseconds — the same floor-to-µs the DuckDB
    // oracle applies when it reads the ns column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType =>
        d.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case (d, _) => d
    }
  }

  /** Register every table as a temp view named like the file — the
    * SQL surface (`spark.sql`) sees the same names the DuckDB oracle
    * uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
