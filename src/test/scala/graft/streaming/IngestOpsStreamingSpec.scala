package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{HtmlExtract, UrlNorm}

/** The web-ingest operators (content extraction, outlink extraction,
  * URL canonicalization) are stateless projections — so the SAME
  * operator call must run unchanged over a Structured Streaming
  * source and produce exactly the batch answer. This is the claim
  * "ingest ops compose with the bus pipeline" made concrete: no
  * rewrite, no state store, no watermark needed.
  */
class IngestOpsStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def streamOf(rows: Seq[(Long, String)], cols: (String, String)) = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    ms.addData(rows: _*)
    (ms, ms.toDF().toDF(cols._1, cols._2))
  }

  private def drain(df: org.apache.spark.sql.DataFrame, name: String) = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  test("extract + extractLinks + canonicalize run unchanged on a stream") {
    val pages = (1L to 30L).map(i =>
      (i, s"<h1>Heading number $i of page</h1><p>body text for doc $i " +
        s"with enough characters</p><a href=\"/doc/${i * 3 % 20}\">see " +
        s"${i * 3 % 20}</a><footer>legal</footer>"))
    val (_, sdf) = streamOf(pages, ("doc_id", "html"))

    val gotContent = drain(HtmlExtract.extract(sdf), "s_extract")
      .select($"doc_id", $"content", $"n_blocks_kept")
    val expContent = HtmlExtract.extract(pages.toDF("doc_id", "html"))
      .select($"doc_id", $"content", $"n_blocks_kept")
    assert(gotContent.exceptAll(expContent).isEmpty &&
      expContent.exceptAll(gotContent).isEmpty)

    val (_, sdf2) = streamOf(pages, ("doc_id", "html"))
    val gotLinks = drain(HtmlExtract.extractLinks(sdf2), "s_links")
    val expLinks = HtmlExtract.extractLinks(pages.toDF("doc_id", "html"))
    assert(gotLinks.exceptAll(expLinks).isEmpty &&
      expLinks.exceptAll(gotLinks).isEmpty)

    val urls = (1L to 30L).map(i =>
      (i, s"HTTP://Example$i.COM:80/p/$i?utm_s=x&b=$i&a=1#f"))
    runUrlLeg(urls)
  }

  private def runUrlLeg(urls: Seq[(Long, String)]): Unit = {
    val (_, sdf3) = streamOf(urls, ("doc_id", "url"))
    val gotUrls = drain(UrlNorm.canonicalize(sdf3), "s_urls")
      .select($"doc_id", $"canonical_url", $"domain")
    val expUrls = UrlNorm.canonicalize(urls.toDF("doc_id", "url"))
      .select($"doc_id", $"canonical_url", $"domain")
    assert(gotUrls.exceptAll(expUrls).isEmpty &&
      expUrls.exceptAll(gotUrls).isEmpty)
  }

  test("robots gating runs unchanged over a streaming frontier " +
      "(complete mode)") {
    val rows = Seq(
      ("http://a.example.com/articles/item-10", "example.com"),
      ("http://a.example.com/articles/item-2", "example.com"),
      ("http://b.example.com.au/articles/item-12", "example.com.au"),
      ("http://b.example.com.au/about", "example.com.au"),
      ("http://s.district.k12.ca.us/x", "district.k12.ca.us"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    ms.addData(rows: _*)
    val sdf = ms.toDF().toDF("canonical_url", "domain")
    val q = UrlNorm.robotsGate(sdf, UrlNorm.RobotsRules)
      .writeStream.format("memory").queryName("s_robots")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("s_robots")
    val exp = UrlNorm.robotsGate(
      rows.toDF("canonical_url", "domain"), UrlNorm.RobotsRules)
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("KMV distinct sketch maintains itself over a stream and lands " +
      "on the batch estimate exactly") {
    // the sketch's set-typed state is what makes this work: the
    // streaming agg merges per-batch partial sketches in whatever
    // order micro-batches arrive, and the k-minima SET is merge-order
    // independent — so the final streamed estimate must be
    // bit-identical to the one-shot batch estimate
    val rows = Seq.tabulate(600)(i => (s"g${i % 3}", s"url-$i/page"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val sdf = ms.toDF().toDF("g", "v")
    // the sketch-only form: countDistinct is unsupported on streams
    // for exactly the reason the sketch exists (unbounded state)
    val q = graft.operators.Profiling.kmvSketch(sdf, "g", "v", k = 16)
      .writeStream.format("memory").queryName("s_kmv")
      .outputMode("complete").start()
    try {
      // three micro-batches so cross-batch state MERGE is exercised,
      // not just one batch's fold
      rows.grouped(200).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("s_kmv")
    val exp = graft.operators.Profiling.kmvSketch(
      rows.toDF("g", "v"), "g", "v", k = 16)
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("frontier discovery counts maintain themselves over a link stream") {
    // the q118 aggregation leg as a STREAMING aggregation (complete
    // mode): discovery counts and earliest discoverer stay correct as
    // link batches arrive — the live-crawl-scheduler shape
    val pages = (1L to 40L).map(i =>
      (i, s"""<p><a href="/doc/${i % 7}">see ${i % 7}</a> and """ +
        s"""<a href="/doc/${(i * 3) % 7}">see ${(i * 3) % 7}</a></p>"""))
    def frontier(links: org.apache.spark.sql.DataFrame) = links
      .select($"doc_id".as("src"),
        expr("try_cast(regexp_extract(href, '/doc/([0-9]+)', 1) " +
          "as bigint)").as("dst"))
      .filter($"dst".isNotNull)
      .groupBy($"dst")
      .agg(count(lit(1)).as("n_discoveries"),
        min($"src").as("first_discoverer"))
    val (_, sdf) = streamOf(pages, ("doc_id", "html"))
    val q = frontier(HtmlExtract.extractLinks(sdf))
      .writeStream.format("memory").queryName("s_frontier")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("s_frontier")
    val exp = frontier(HtmlExtract.extractLinks(pages.toDF("doc_id", "html")))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("Count-Min sketch maintains itself over a stream: the streamed " +
      "matrix is bit-identical to the batch matrix under any " +
      "micro-batch split") {
    // additive merge (commutative, associative) is what makes this
    // work: per-batch partial matrices add in arrival order and the
    // result cannot depend on the split — the exact-frequency
    // groupBy(item).count() alternative would hold unbounded state
    val rows = Seq.tabulate(900)(i => s"item-${i % 57}")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val sdf = ms.toDF().toDF("v")
    val q = graft.operators.Profiling.cmsSketch(sdf, "v", 4, 64)
      .writeStream.format("memory").queryName("s_cms")
      .outputMode("complete").start()
    try {
      rows.grouped(300).foreach { chunk =>
        ms.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("s_cms").as[Array[Long]].head().toSeq
    val exp = graft.operators.Profiling.cmsSketch(
      rows.toDF("v"), "v", 4, 64).as[Array[Long]].head().toSeq
    assert(got === exp)
  }
}
