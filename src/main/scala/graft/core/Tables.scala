package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated parquet tables
  * (`/root/testdata/sf*`, schemas in /root/repo/FIXTURES.md §B).
  *
  * Each table has a DECLARED canonical schema (SURVEY §1.2): the loader
  * reads the parquet footer, normalizes the encodings the driver has
  * shipped across rounds (timestamps as TIMESTAMP_NTZ, as TIMESTAMP
  * NANOS-as-long), and then asserts the result matches the declaration —
  * so an encoding drift fails HERE, loudly, instead of surfacing as an
  * analysis error ten operators downstream (round 7's defining defect:
  * `ts` arrived as NTZ and every `unix_micros` call site threw).
  *
  * The normalization is a per-column cast on top of the scan, so
  * predicates/projections applied after these loaders still push down
  * into the scan (FileSourceScanExec PushedFilters / ReadSchema) for
  * every non-rewritten column.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Canonical post-load schemas — the contract every graft operator is
    * written against. Timestamps are session-zoned TimestampType (UTC,
    * build.sbt pins spark.sql.session.timeZone) to match the DuckDB
    * oracle's naive-UTC reading of the same files.
    */
  val canonicalSchemas: Map[String, StructType] = Map(
    "region" -> "r_regionkey int, r_name string",
    "nation" -> "n_nationkey int, n_name string, n_regionkey int",
    "customer" -> ("c_custkey bigint, c_name string, c_nationkey int, " +
      "c_acctbal double, c_mktsegment string"),
    "supplier" -> "s_suppkey bigint, s_name string, s_nationkey int, s_acctbal double",
    "part" -> ("p_partkey bigint, p_name string, p_brand string, p_type string, " +
      "p_size int, p_retailprice double"),
    "orders" -> ("o_orderkey bigint, o_custkey bigint, o_orderstatus string, " +
      "o_totalprice double, o_orderdate timestamp, o_orderpriority string"),
    "lineitem" -> ("l_orderkey bigint, l_partkey bigint, l_suppkey bigint, " +
      "l_linenumber int, l_quantity double, l_extendedprice double, " +
      "l_discount double, l_tax double, l_returnflag string, " +
      "l_linestatus string, l_shipdate timestamp"),
    "events" -> ("event_id bigint, ts timestamp, user_id bigint, " +
      "event_type string, value double, props string"),
    "documents" -> "doc_id bigint, text string, lang string, source string, n_chars bigint",
    "embeddings" -> "vec_id bigint, embedding array<float>, label int"
  ).map { case (k, ddl) => k -> StructType.fromDDL(ddl) }

  /** Structural equality modulo nullability (parquet nullability varies
    * by writer; graft treats every fixture column as nullable).
    */
  private def bare(dt: DataType): DataType = dt match {
    case ArrayType(e, _)   => ArrayType(bare(e), containsNull = true)
    case MapType(k, v, _)  => MapType(bare(k), bare(v), valueContainsNull = true)
    case StructType(fs)    => StructType(fs.map(f => StructField(f.name, bare(f.dataType))))
    case other             => other
  }

  /** The parquet-reader confs the canonical timestamp typing wants SET
    * AT SESSION CONSTRUCTION (`Sessions.local` applies them; so does the
    * spec session). They are deliberately NOT set here: a loader that
    * flips session-global switches as a side effect silently changes
    * timestamp typing for every unrelated read in the same session
    * (round-8 advice). On a session without them the normalization fold
    * below still yields the canonical schema — at the cost of the NTZ
    * cast sitting between scan and predicate (pushdown loss), and
    * nanos-encoded fixtures failing outright (the vectorized reader
    * rejects TIMESTAMP(NANOS) without the legacy flag) — loudly, via
    * the schema `require`.
    *
    *  - `nanosAsLong`: TIMESTAMP(NANOS) arrives as a long of nanos and
    *    the fold floors it to µs (the same floor DuckDB applies).
    *  - `inferTimestampNTZ=false`: TIMESTAMP(isAdjustedToUTC=false)
    *    surfaces as TimestampType AT THE SCAN (UTC session ⇒ identical
    *    values), so ts/date range predicates keep parquet row-group
    *    pruning — verified PushedFilters [GreaterThanOrEqual(ts,...)]
    *    vs [] for the cast-after-scan alternative.
    */
  val readerConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val want = canonicalSchemas.get(name)
    def wantsTimestamp(c: String): Boolean =
      want.exists(_.fields.exists(f => f.name == c && f.dataType == TimestampType))
    val df = raw.schema.fields.foldLeft(raw) {
      // TIMESTAMP_MICROS(isAdjustedToUTC=false) → TimestampNTZType; the
      // session is UTC so the cast to TimestampType is value-preserving
      // and keeps the oracle's naive reading byte-identical.
      case (d, f) if f.dataType == TimestampNTZType && wantsTimestamp(f.name) =>
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      // nanos-as-long (see flag above): floor to µs.
      case (d, f) if f.dataType == LongType && wantsTimestamp(f.name) =>
        d.withColumn(f.name, expr(s"timestamp_micros(${f.name} div 1000)"))
      case (d, _) => d
    }
    want.foreach { w =>
      val got = bare(StructType(df.schema.fields.map(f => StructField(f.name, f.dataType))))
      require(got == bare(w),
        s"$dir/$name.parquet: fixture schema drifted beyond what Tables.load " +
          s"normalizes; got ${got.asInstanceOf[StructType].toDDL}; " +
          s"want ${w.toDDL}. Extend the normalization fold (keep operators " +
          "on the canonical schema) rather than letting the new shape through.")
    }
    df
  }

  /** Register every table as a temp view named like the file — the
    * SQL surface (`spark.sql`) sees the same names the DuckDB oracle
    * uses.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
