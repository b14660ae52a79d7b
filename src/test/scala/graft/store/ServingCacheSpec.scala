package graft.store

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** The ElastiCache-role cache tier over the bucketed serving layout:
  * correct values, zero-job repeat lookups, read-through invalidation
  * on merge, bounded LRU eviction, and hash agreement with the
  * layout's own bucketing.
  */
class ServingCacheSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshStore() = FeatureStore(
    spark,
    Files.createTempDirectory("fs-cache").toString,
    keyCol = "customer_id", eventTimeCol = "purchase_timestamp")

  test("cache lookups match the layout's pruned scan; repeats are hits") {
    val s = freshStore()
    s.mergeServing((1L to 100L).map(i =>
        (i, ts("2024-01-01 00:00:00"), i.toDouble))
      .toDF("customer_id", "purchase_timestamp", "v"))
    val cache = s.servingCache()
    for (k <- Seq(1L, 7L, 63L, 100L)) {
      val got = cache.get(k).get
      val want = s.getServingRecord(k).head()
      assert(got.getAs[Double]("v") == want.getAs[Double]("v"), s"key $k")
    }
    val (h0, m0) = cache.stats
    // repeats of the same keys: all hits, no further bucket loads
    for (k <- Seq(1L, 7L, 63L, 100L)) assert(cache.get(k).nonEmpty)
    val (h1, m1) = cache.stats
    assert(m1 == m0, "repeat lookups must not reload any bucket")
    assert(h1 == h0 + 4)
    assert(cache.get(9999L).isEmpty, "unknown key in an existing bucket")
  }

  test("a serving merge invalidates exactly via the signature (read-through)") {
    val s = freshStore()
    s.mergeServing(Seq((5L, ts("2024-01-01 00:00:00"), 50.0))
      .toDF("customer_id", "purchase_timestamp", "v"))
    val cache = s.servingCache()
    assert(cache.get(5L).get.getAs[Double]("v") == 50.0)
    // newer event merges in-place into the same bucket dir
    s.mergeServing(Seq((5L, ts("2024-06-01 00:00:00"), 55.0))
      .toDF("customer_id", "purchase_timestamp", "v"))
    assert(cache.get(5L).get.getAs[Double]("v") == 55.0,
      "stale cached bucket must reload after the merge")
  }

  test("LRU keeps at most maxCachedBuckets buckets and stays correct") {
    val s = freshStore()
    s.mergeServing((1L to 200L).map(i =>
        (i, ts("2024-01-01 00:00:00"), i.toDouble))
      .toDF("customer_id", "purchase_timestamp", "v"))
    val cache = s.servingCache(maxCachedBuckets = 2)
    // touch many distinct buckets to force eviction churn
    val keys = (1L to 60L)
    keys.foreach(k => assert(cache.get(k).get.getAs[Double]("v") == k.toDouble))
    // correctness survives eviction: re-read an early key
    assert(cache.get(1L).get.getAs[Double]("v") == 1.0)
    val (_, misses) = cache.stats
    assert(misses > 2, "eviction must have forced reloads")
  }

  test("driver-side bucket hash agrees with Layout.keyBucket") {
    val s = freshStore()
    s.mergeServing((1L to 50L).map(i =>
        (i, ts("2024-01-01 00:00:00"), i.toDouble))
      .toDF("customer_id", "purchase_timestamp", "v"))
    val cache = s.servingCache()
    val want = s.serving().sparkSession.read
      .parquet(s"${s.conf.path}/serving")
      .select($"customer_id",
        graft.operators.Layout.keyBucket("customer_id", 64).as("kb"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (k <- 1L to 50L)
      assert(cache.bucketOf(k) == want(k), s"bucket mismatch for key $k")
  }

  test("a never-merged serving layout yields None, not PATH_NOT_FOUND") {
    val s = freshStore()
    assert(s.servingCache().get(1L).isEmpty)
  }

  test("an empty (never-merged) bucket yields None, not an error") {
    val s = freshStore()
    s.mergeServing(Seq((1L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("customer_id", "purchase_timestamp", "v"))
    val cache = s.servingCache()
    // probe keys until one hashes to a bucket with no kb= dir
    val missing = (2L to 300L).find(k =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"${s.conf.path}/serving", s"kb=${cache.bucketOf(k)}")))
    assert(missing.nonEmpty, "some key must hash to an unwritten bucket")
    assert(cache.get(missing.get).isEmpty)
  }
}
