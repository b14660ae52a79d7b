package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // FIXTURES.md §A1 inline fixture: multi-event keys, single-event
  // keys, timestamp ties.
  private lazy val raw = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0, 5.0),
    (1L, ts("2024-01-03 09:30:00"), 50.0, 6.0),
    (2L, ts("2024-01-02 12:00:00"), 200.0, 9.0),
    (3L, ts("2024-01-05 08:15:00"), 10.0, 1.0),
  ).toDF("customer_id", "purchase_timestamp", "purchase_value", "loyalty_score")

  test("engineerFeatures: 6 columns, one row per customer (reference tests.py:39-74)") {
    val f = FeatureEngineering.engineerFeatures(raw).cache()
    assert(f.columns.toSeq == FeatureEngineering.featureCols)
    assert(f.count() == raw.select($"customer_id").distinct().count())
  }

  test("engineerFeatures: latest-by-time and mean semantics") {
    val f = FeatureEngineering.engineerFeatures(raw)
      .filter($"customer_id" === 1L).head()
    assert(f.getTimestamp(1) == ts("2024-01-03 09:30:00"))
    assert(f.getDouble(2) == 50.0)   // latest_purchase_value at max ts
    assert(f.getDouble(3) == 75.0)   // avg(100, 50)
    assert(f.getDouble(4) == 5.5)    // avg(5, 6)
    assert(f.getDouble(5) == 6.0)    // latest_loyalty_score
  }

  test("csv / json / orc ingest agree on the same rows (S1 source formats)") {
    import graft.pipeline.FeatureEngineering
    val dir = java.nio.file.Files.createTempDirectory("fmt-test").toString
    val rows = Seq(
      (1L, "2024-01-01T10:00:00.123456Z", 100.0, 5.0),
      (2L, "2024-01-02T09:30:00.000001Z", 50.0, 6.5))
      .toDF("customer_id", "purchase_timestamp", "purchase_value",
        "loyalty_score")
    rows.coalesce(1).write.option("header", "true").csv(s"$dir/csv")
    rows.coalesce(1).write.json(s"$dir/json")
    rows.coalesce(1).write.orc(s"$dir/orc")
    // avro fixture via the bundled Java library (container file with
    // a [null, T]-unioned field to exercise the nullable path)
    writeAvroFixture(s"$dir/avro/part-0.avro", Seq(
      (1L, "2024-01-01T10:00:00.123456Z", 100.0, 5.0),
      (2L, "2024-01-02T09:30:00.000001Z", 50.0, 6.5)))
    val c = FeatureEngineering.readRawCsv(spark, s"$dir/csv")
    val j = FeatureEngineering.readRawJson(spark, s"$dir/json")
    val o = FeatureEngineering.readRawOrc(spark, s"$dir/orc")
    val a = FeatureEngineering.readRawAvro(spark, s"$dir/avro")
    Seq(j, o, a).foreach { d =>
      assert(d.exceptAll(c).isEmpty && c.exceptAll(d).isEmpty,
        "format readers disagree")
    }
    assert(c.schema("purchase_timestamp").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  private def writeAvroFixture(path: String,
      rows: Seq[(Long, String, Double, Double)]): Unit = {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecordBuilder, GenericRecord}
    val schema = SchemaBuilder.record("Purchase").fields()
      .requiredLong("customer_id")
      .requiredString("purchase_timestamp")
      .requiredDouble("purchase_value")
      .optionalDouble("loyalty_score") // [null, double] union branch
      .endRecord()
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    try rows.foreach { case (id, ts, v, s) =>
      w.append(new GenericRecordBuilder(schema)
        .set("customer_id", id)
        .set("purchase_timestamp", ts)
        .set("purchase_value", v)
        .set("loyalty_score", s)
        .build())
    } finally w.close()
  }

  test("avro reader: missing nullable field reads as null; type mismatch fails loudly") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("avro-evo").toString
    writeAvroFixture(s"$dir/part-0.avro",
      Seq((7L, "2024-02-01T00:00:00.000000Z", 1.5, 2.5)))
    // declared schema with an extra nullable column unknown to the
    // writer: schema evolution's add-a-column case
    val evolved = StructType(FeatureEngineering.rawSchema.fields :+
      StructField("channel", StringType, nullable = true))
    val got = graft.sources.AvroSource.read(spark, dir, evolved)
    assert(got.count() == 1)
    assert(got.select($"channel").head().isNullAt(0))
    // declared LONG for a string-typed writer field must throw, not
    // coerce garbage
    val bad = StructType(Seq(
      StructField("purchase_timestamp", LongType, nullable = true)))
    val ex = intercept[org.apache.spark.SparkException] {
      graft.sources.AvroSource.read(spark, dir, bad).collect()
    }
    assert(ex.getMessage != null)
  }

  test("toWire formats microsecond ISO-8601 strings (utils.py:226-228)") {
    val w = FeatureEngineering.toWire(
      FeatureEngineering.engineerFeatures(raw)).head()
    assert(w.getString(1).matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}Z"""))
    assert(w.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("wire-record codec round-trips: fromWireRecords ∘ toWireRecords = id") {
    val f = FeatureEngineering.engineerFeatures(raw)
    val rt = FeatureEngineering.fromWireRecords(
      FeatureEngineering.toWireRecords(f))
    // compare names+types (decode can't prove non-null, so
    // nullability legitimately widens)
    assert(rt.schema.map(f => (f.name, f.dataType)) ==
      f.schema.map(f => (f.name, f.dataType)))
    assert(rt.exceptAll(f).isEmpty && f.exceptAll(rt).isEmpty)
  }

  test("toWireRecords emits the reference's name/value record shape (utils.py:145-158)") {
    val rec = FeatureEngineering.toWireRecords(
      FeatureEngineering.engineerFeatures(raw))
      .select(explode($"record").as("e"))
      .select($"e.FeatureName", $"e.ValueAsString")
    assert(rec.select($"FeatureName").distinct().count() == 6)
    // every value is stringly on the wire, like ValueAsString demands
    assert(rec.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("enrich: known customer gets stored averages, unknown gets cold-start defaults") {
    val online = FeatureEngineering.engineerFeatures(raw)
    val events = Seq(
      (1L, ts("2024-02-01 00:00:00"), 80.0),  // known
      (9L, ts("2024-02-01 00:00:00"), 40.0),  // cold start
    ).toDF("customer_id", "purchase_timestamp", "purchase_value")
    val e = EventEnricher.enrich(events, online).cache()
    val known = e.filter($"customer_id" === 1L).head()
    assert(known.getAs[Boolean]("known_customer"))
    assert(known.getAs[Double]("latest_purchase_value") == 80.0) // incoming value
    assert(known.getAs[Double]("avg_purchase_value") == 75.0)    // stored
    assert(known.getAs[Double]("avg_loyalty_score") == 5.5)      // stored
    val cold = e.filter($"customer_id" === 9L).head()
    assert(!cold.getAs[Boolean]("known_customer"))
    assert(cold.getAs[Double]("avg_purchase_value") == 40.0)     // = value
    assert(cold.getAs[Double]("avg_loyalty_score") == 0.0)       // = 0
  }

  test("OLS matches hand-computed normal equations and row scoring (M2/M3)") {
    // y = 2*x1 - 1*x2 + 0.5*x3 + 3, exactly linear data → residual 0
    val data = Seq(
      (1.0, 2.0, 4.0), (2.0, 1.0, 6.0), (3.0, 5.0, 1.0),
      (4.0, 2.0, 2.0), (5.0, 7.0, 3.0), (0.5, 1.5, 2.5),
    ).map { case (x1, x2, x3) =>
      (x1, x2, x3, 2.0 * x1 - 1.0 * x2 + 0.5 * x3 + 3.0)
    }.toDF("latest_purchase_value", "avg_purchase_value",
      "avg_loyalty_score", "latest_loyalty_score")
    val m = LoyaltyModel.train(data)
    val coef = m.coefficients.toArray
    assert(math.abs(coef(0) - 2.0) < 1e-8)
    assert(math.abs(coef(1) + 1.0) < 1e-8)
    assert(math.abs(coef(2) - 0.5) < 1e-8)
    assert(math.abs(m.intercept - 3.0) < 1e-8)
    val scored = LoyaltyModel.score(m, data)
    val maxErr = scored
      .select(abs($"predicted_loyalty_score" - $"latest_loyalty_score").as("e"))
      .agg(max($"e")).head().getDouble(0)
    assert(maxErr < 1e-6)
  }

  test("model save/load round-trip (S7)") {
    val dir = java.nio.file.Files.createTempDirectory("model-test").toString
    val data = Seq((1.0, 2.0, 3.0, 4.0), (2.0, 3.0, 4.0, 5.0),
      (3.0, 5.0, 7.0, 8.0), (4.0, 4.0, 4.0, 6.0))
      .toDF("latest_purchase_value", "avg_purchase_value",
        "avg_loyalty_score", "latest_loyalty_score")
    val m = LoyaltyModel.train(data)
    LoyaltyModel.save(m, s"$dir/model")
    val loaded = LoyaltyModel.load(s"$dir/model")
    assert(loaded.coefficients == m.coefficients)
    assert(loaded.intercept == m.intercept)
  }
}
