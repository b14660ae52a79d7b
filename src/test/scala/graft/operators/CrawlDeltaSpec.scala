package graft.operators

import graft.SparkSpec

class CrawlDeltaSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (String, String, Long, Long)*) =
    rows.toSeq.toDF("canonical_url", "domain", "fp", "ord")

  test("classification: new / vanished / changed / unchanged all land " +
      "in the right domain with the exact tick churn") {
    val prev = UrlNorm.snapshotByUrl(snap(
      ("http://a.com/1", "a.com", 11L, 1L),
      ("http://a.com/2", "a.com", 22L, 2L),
      ("http://a.com/3", "a.com", 33L, 3L),
      ("http://b.com/1", "b.com", 44L, 4L)))
    val curr = UrlNorm.snapshotByUrl(snap(
      ("http://a.com/1", "a.com", 11L, 1L), // unchanged
      ("http://a.com/2", "a.com", 99L, 2L), // changed
      // /3 vanished
      ("http://a.com/4", "a.com", 55L, 5L), // new
      ("http://b.com/1", "b.com", 44L, 4L)))
    val got = UrlNorm.crawlDelta(prev, curr)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got("a.com") === ((1L, 1L, 1L, 1L, 750000L)))
    assert(got("b.com") === ((0L, 0L, 0L, 1L, 0L)))
  }

  test("snapshot election: refetches of one canonical URL resolve to " +
      "the smallest fetch ord on both sides, so a stable refetch is " +
      "not a phantom change") {
    val prev = UrlNorm.snapshotByUrl(snap(
      ("http://a.com/1", "a.com", 11L, 5L),
      ("http://a.com/1", "a.com", 77L, 9L))) // later refetch ignored
    val curr = UrlNorm.snapshotByUrl(snap(
      ("http://a.com/1", "a.com", 11L, 3L),
      ("http://a.com/1", "a.com", 88L, 8L)))
    val got = UrlNorm.crawlDelta(prev, curr)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq === Seq(("a.com", 0L, 0L, 0L, 1L, 0L)))
  }

  test("a fully-vanished domain reports churn 1e6 (the drop-from-" +
      "frontier signal); a fully-new domain likewise") {
    val prev = UrlNorm.snapshotByUrl(snap(
      ("http://dead.com/1", "dead.com", 1L, 1L),
      ("http://dead.com/2", "dead.com", 2L, 2L)))
    val curr = UrlNorm.snapshotByUrl(snap(
      ("http://born.com/1", "born.com", 3L, 3L)))
    val got = UrlNorm.crawlDelta(prev, curr)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._6))).toMap
    assert(got("dead.com") === ((0L, 2L, 1000000L)))
    assert(got("born.com") === ((1L, 0L, 1000000L)))
  }
}
