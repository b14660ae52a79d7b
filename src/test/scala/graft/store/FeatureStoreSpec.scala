package graft.store

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FeatureStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshStore() = FeatureStore(
    spark,
    Files.createTempDirectory("fs-test").toString,
    keyCol = "customer_id", eventTimeCol = "purchase_timestamp")

  private val batch1 = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-03 09:30:00"), 50.0),
    (2L, ts("2024-01-02 12:00:00"), 200.0),
  ).toDF("customer_id", "purchase_timestamp", "avg_purchase_value")

  test("ingest + latestView: one row per key, newest wins") {
    val fs = freshStore()
    fs.ingest(batch1)
    val latest = fs.latestView().collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(latest == Map(1L -> 50.0, 2L -> 200.0))
    assert(fs.offline().count() == 3) // full history retained
  }

  test("upsert updates existing key and inserts new key (MERGE semantics)") {
    val fs = freshStore()
    fs.ingest(batch1)
    fs.putRecords(Seq(
      (1L, ts("2024-01-05 08:00:00"), 75.0),  // matched → update
      (3L, ts("2024-01-04 11:00:00"), 10.0),  // not matched → insert
    ).toDF("customer_id", "purchase_timestamp", "avg_purchase_value"))
    val latest = fs.latestView().collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(latest == Map(1L -> 75.0, 2L -> 200.0, 3L -> 10.0))
    assert(fs.offline().count() == 5) // offline store is append-only
  }

  test("event-time ties broken by ingest sequence (later batch wins)") {
    val fs = freshStore()
    fs.ingest(Seq((1L, ts("2024-01-01 10:00:00"), 1.0))
      .toDF("customer_id", "purchase_timestamp", "avg_purchase_value"))
    fs.putRecords(Seq((1L, ts("2024-01-01 10:00:00"), 2.0))
      .toDF("customer_id", "purchase_timestamp", "avg_purchase_value"))
    assert(fs.latestView().head().getDouble(2) == 2.0)
  }

  test("point lookup + existence probe (get_record round-trip, reference tests.py:12-36)") {
    val fs = freshStore()
    fs.ingest(batch1)
    val rec = fs.getRecord(1L)
    assert(rec.isDefined && rec.get.getDouble(2) == 50.0)
    assert(fs.recordExists(2L))
    assert(!fs.recordExists(99L))
    assert(fs.getRecord(99L).isEmpty)
  }

  test("compaction is idempotent and online() matches latestView()") {
    val fs = freshStore()
    fs.ingest(batch1)
    fs.compactOnline()
    fs.compactOnline()
    val a = fs.online().orderBy($"customer_id").collect().toSeq
    val b = fs.latestView().orderBy($"customer_id").collect().toSeq
    assert(a == b)
  }

  test("online commit is crash-safe: an uncommitted version dir is ignored") {
    val dir = Files.createTempDirectory("fs-crash").toString
    val fs = FeatureStore(spark, dir,
      keyCol = "customer_id", eventTimeCol = "purchase_timestamp")
    fs.ingest(batch1)
    fs.compactOnline()
    val before = fs.online().orderBy($"customer_id").collect().toSeq
    // simulate a writer crash: a newer version dir with data files but
    // no _SUCCESS marker (the committer writes the marker last)
    val partial = java.nio.file.Paths.get(dir, "online", "v_99")
    Files.createDirectories(partial)
    Files.writeString(partial.resolve("part-00000.parquet"), "garbage")
    val after = fs.online().orderBy($"customer_id").collect().toSeq
    assert(after == before) // still serving the last committed version
  }

  test("online versions are pruned to current + previous after commits") {
    val dir = Files.createTempDirectory("fs-prune").toString
    val fs = FeatureStore(spark, dir,
      keyCol = "customer_id", eventTimeCol = "purchase_timestamp")
    fs.ingest(batch1)
    fs.compactOnline()
    fs.compactOnline()
    fs.compactOnline()
    val versions = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir, "online")).toArray.map(_.toString)
      .filter(_.matches(".*/v_\\d+"))
    assert(versions.length == 2, s"expected 2 retained versions: ${versions.toSeq}")
  }

  test("offline store partitioned by event_date (partition pruning path)") {
    val fs = freshStore()
    fs.ingest(batch1)
    val pruned = fs.offline().filter($"event_date" === "2024-01-01")
    assert(pruned.count() == 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
  }
}
