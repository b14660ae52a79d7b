package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

/** The explicit fixture-boundary contract (VERDICT r7 task #3): every
  * driver table loads to EXACTLY the canonical schema — names, order,
  * and types — regardless of how the driver encoded the parquet this
  * round. Round 7 broke because `events.ts` drifted to TIMESTAMP_NTZ
  * and the old loader let it through; this spec pins the contract so
  * the drift fails here with a named table instead of as a downstream
  * analysis error.
  */
class TablesSchemaSpec extends SparkSpec {

  private def loadedTypes(name: String): Seq[(String, DataType)] =
    Tables.load(spark, sf, name).schema.fields.toSeq.map(f => (f.name, f.dataType))

  for (name <- Tables.all) {
    test(s"$name loads to its canonical declared schema") {
      val want = Tables.canonicalSchemas(name).fields.toSeq.map(f => (f.name, f.dataType))
      assert(loadedTypes(name) === want)
    }
  }

  test("every timestamp column is session-zoned TimestampType, never NTZ") {
    // the r7 failure mode, spelled out: NTZ reaching operators breaks
    // every unix_micros call site at analysis time
    for (name <- Tables.all; (c, t) <- loadedTypes(name)) {
      assert(t !== TimestampNTZType, s"$name.$c must not surface as TIMESTAMP_NTZ")
    }
    assert(loadedTypes("events").contains(("ts", TimestampType)))
    assert(loadedTypes("orders").contains(("o_orderdate", TimestampType)))
    assert(loadedTypes("lineitem").contains(("l_shipdate", TimestampType)))
  }

  test("ts range predicates push down into the parquet scan (100 TB contract)") {
    // the loader must surface timestamps AT THE SCAN (inferTimestampNTZ
    // off), not via a post-scan cast — a cast between scan and filter
    // empties PushedFilters and forfeits row-group pruning
    val plan = Tables.load(spark, sf, "events")
      .filter("ts >= timestamp'2024-01-02 00:00:00'")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,"),
      s"ts filter must reach PushedFilters; plan:\n${plan.take(800)}")
    val plan2 = Tables.load(spark, sf, "lineitem")
      .filter("l_shipdate < timestamp'1995-01-01 00:00:00'")
      .queryExecution.executedPlan.toString
    assert(plan2.contains("LessThan(l_shipdate,"),
      s"l_shipdate filter must reach PushedFilters; plan:\n${plan2.take(800)}")
  }

  test("Tables.load leaves the session's SQL conf untouched") {
    // round-8 advice: the loader used to flip reader confs as a side
    // effect, silently changing timestamp typing for every unrelated
    // read in the session. The confs now live in session construction.
    val probes = Tables.readerConfs.keys.toSeq
    val before = probes.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try {
      Tables.load(spark, sf, "events")
      assert(spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "true",
        "load must not overwrite a caller's conf choice")
      // and the fold fallback still yields the canonical schema even
      // when the scan surfaces NTZ (the conf the caller chose)
      assert(Tables.load(spark, sf, "events").schema("ts").dataType
        === TimestampType)
    } finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("a session built with readerConfs reads NTZ fixtures as TimestampType at the scan") {
    // the confs' new home must actually deliver scan-level typing: a
    // RAW read (no Tables.load normalization) of the driver's
    // NTZ-encoded fixture must surface TimestampType straight from the
    // scan. (A Spark-written NTZ file is NOT a valid probe here: Spark
    // embeds its own schema metadata, which overrides inference — the
    // conf governs exactly the foreign-writer files the driver ships.)
    assert(spark.read.parquet(s"$sf/events.parquet").schema("ts").dataType
      === TimestampType,
      "a session built with Tables.readerConfs must type NTZ at the scan")
  }

  test("an unexpected fixture shape fails loudly at the loader") {
    // a table whose canonical schema can't be reached by normalization
    // must name the file in the error, not flow through
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    spark.range(3).selectExpr("id as r_regionkey", "cast(id as string) as r_name",
      "id as extra_col").write.parquet(s"$dir/region.parquet")
    val e = intercept[IllegalArgumentException](Tables.load(spark, dir, "region"))
    assert(e.getMessage.contains("region.parquet"))
    assert(e.getMessage.contains("drifted"))
  }
}
