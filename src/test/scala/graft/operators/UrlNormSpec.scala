package graft.operators

import graft.SparkSpec

/** Rule-by-rule contract for URL canonicalization: every rule proven
  * on a crafted URL where only that rule fires, plus combined cases.
  */
class UrlNormSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): (String, String, String, Long) = {
    val r = UrlNorm.canonicalize(Seq((1L, url)).toDF("doc_id", "url"))
      .select($"canonical_url", $"host", $"domain", $"n_params")
      .head()
    (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))
  }

  test("fragment drops; scheme and host lowercase; path survives as-is") {
    assert(canon("HTTPS://WWW.Example.COM/A/B?x=1#frag")._1 ===
      "https://www.example.com/A/B?x=1")
  }

  test("default ports strip per scheme; explicit ports survive") {
    assert(canon("http://a.example.com:80/p")._1 === "http://a.example.com/p")
    assert(canon("https://a.example.com:443/p")._1 === "https://a.example.com/p")
    assert(canon("http://a.example.com:8080/p")._1 ===
      "http://a.example.com:8080/p")
    // :443 is NOT http's default — it must survive on http
    assert(canon("http://a.example.com:443/p")._1 ===
      "http://a.example.com:443/p")
  }

  test("empty path becomes /; query params sort; utm_* drop") {
    val (u, _, _, n) = canon("http://e.com?z=2&utm_source=x&a=1&utm_medium=y")
    assert(u === "http://e.com/?a=1&z=2")
    assert(n === 2L)
    // all params tracking -> no query at all
    assert(canon("http://e.com/p?utm_source=x")._1 === "http://e.com/p")
  }

  test("unlisted TLD: domain is the last two host labels; port never leaks") {
    val (_, host, domain, _) = canon("http://Deep.Sub.Example.ORG:8080/x")
    assert(host === "deep.sub.example.org:8080")
    assert(domain === "example.org")
    assert(canon("http://localhost/x")._3 === "localhost")
  }

  test("registered domain honors the public-suffix list, longest match first") {
    // the bbc.co.uk class: last-two-labels would merge every .co.uk
    // site into one "domain"
    assert(canon("https://www.bbc.co.uk/news")._3 === "bbc.co.uk")
    assert(canon("https://News.BBC.CO.UK/x")._3 === "bbc.co.uk")
    assert(canon("http://a.b.example.com.au/")._3 === "example.com.au")
    // 3-label suffix beats its embedded 2-label parent
    assert(canon("http://school.district.k12.ca.us/x")._3 ===
      "district.k12.ca.us")
    assert(canon("http://x.y.wa.edu.au/")._3 === "y.wa.edu.au")
    // a host that IS a public suffix maps to itself
    assert(canon("http://co.uk/")._3 === "co.uk")
    assert(canon("http://k12.ca.us/")._3 === "k12.ca.us")
    // one label above the suffix is already registered
    assert(canon("http://bbc.co.uk/")._3 === "bbc.co.uk")
  }

  test("canonicalization is idempotent") {
    val once = canon("HTTP://A.Example.COM:80/x?utm_a=1&b=2&a=1#f")._1
    assert(canon(once)._1 === once)
  }

  test("equivalent messy URLs collapse to one canonical form") {
    val variants = Seq(
      "http://News.Example.com/story?b=2&a=1",
      "HTTP://news.example.COM:80/story?a=1&b=2#top",
      "http://news.example.com/story?utm_campaign=x&b=2&a=1")
    assert(variants.map(canon(_)._1).distinct.size === 1)
  }

  test("the operator is a shuffle-free projection") {
    val plan = UrlNorm.canonicalize(Seq((1L, "http://e.com/x"))
        .toDF("doc_id", "url"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("q118 frontier: discoveries conserve the link count; one row per URL") {
    val frontier = UrlNorm.q118FrontierDedup(spark, sf)
      .localCheckpoint(true) // pin without touching the session cache
    val totalLinks = GraphRank.linkEdges(spark, sf)
      .agg(org.apache.spark.sql.functions.sum($"wt")).head().getLong(0)
    // every link occurrence is exactly one discovery
    assert(frontier.agg(org.apache.spark.sql.functions.sum($"n_discoveries"))
      .head().getLong(0) === totalLinks)
    // canonical URLs are unique (that IS the dedup) and each carries a
    // PSL-registered domain
    assert(frontier.select($"canonical_url").distinct().count() ===
      frontier.count())
    assert(frontier.filter($"domain".contains(".") === false).count() === 0L)
  }

  test("mirrorPairs: shared-fp counting, frequency cap, within-domain dedup") {
    val domFp = Seq(
      // a and b share fps 1,2; c shares fp 1 with both; fp 9 is on
      // every domain (boilerplate — capped out at maxFpDomains=2);
      // fp 2 duplicated WITHIN a (internal replication, counts once)
      ("a", 1L), ("a", 2L), ("a", 2L), ("a", 9L),
      ("b", 1L), ("b", 2L), ("b", 9L),
      ("c", 1L), ("c", 9L)).toDF("domain", "fp")
    val got = UrlNorm.mirrorPairs(domFp, minShared = 1L, maxFpDomains = 2L)
      .orderBy($"domain_a", $"domain_b")
      .as[(String, String, Long)].collect().toSeq
    // fp 1 is on 3 domains > cap 2 → dropped; fp 9 on 3 → dropped;
    // only fp 2 survives → (a,b) share exactly 1
    assert(got === Seq(("a", "b", 1L)))
  }

  test("resolveRedirects: chains resolve with exact hops, cycles never") {
    // 5→4→3→2→1→0 (terminal), a planted 3-cycle, and a self-contained
    // short chain into the cycle (enters the cycle → unresolved too)
    val rd = Seq(5L -> 4L, 4L -> 3L, 3L -> 2L, 2L -> 1L, 1L -> 0L,
      20L -> 21L, 21L -> 22L, 22L -> 20L, 30L -> 20L)
      .toDF("src", "dst")
    val got = UrlNorm.resolveRedirects(rd, maxRounds = 4)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
      .toMap
    assert(got(5L) === Some((0L, 5L)) && got(1L) === Some((0L, 1L)))
    assert(got(3L) === Some((0L, 3L)))
    assert(got(20L) === None && got(21L) === None && got(22L) === None)
    assert(got(30L) === None, "a chain entering a cycle is unresolved")
  }

  test("resolveRedirects: maxRounds bounds the resolvable chain at 2^R") {
    // straight chain 17→16→…→0: length-16 suffix resolves at R=4,
    // the length-17 head does not (and does at R=5)
    val rd = (1L to 17L).map(i => i -> (i - 1L)).toDF("src", "dst")
    val r4 = UrlNorm.resolveRedirects(rd, maxRounds = 4)
      .collect().map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
    assert(r4(16L) && !r4(17L))
    val r5 = UrlNorm.resolveRedirects(rd, maxRounds = 5)
      .collect().map(r => r.getLong(0) -> !r.isNullAt(1)).toMap
    assert(r5(17L))
  }

  test("mirrorClusters: transitive merge, canonical election, sizes") {
    // a~b, b~c chain (a scraper of a scraper) merges into one cluster
    // canonically labeled by its lexicographic min; (x,y) stays its
    // own 2-cluster; ordering is (canonical_domain, domain)
    val pairs = Seq(("b.com", "c.com"), ("a.com", "b.com"),
      ("x.org", "y.org")).toDF("domain_a", "domain_b")
    val got = UrlNorm.mirrorClusters(pairs)
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      ("a.com", "a.com", 3L, true),
      ("b.com", "a.com", 3L, false),
      ("c.com", "a.com", 3L, false),
      ("x.org", "x.org", 2L, true),
      ("y.org", "x.org", 2L, false)))
  }

  test("mirrorClusters: exactly one keeper per cluster; empty pairs ok") {
    val pairs = Seq(("d2", "d1"), ("d3", "d1"), ("d5", "d4"),
      ("d2", "d3")).toDF("a", "b")
    val keepers = UrlNorm.mirrorClusters(pairs)
      .groupBy($"canonical_domain")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when($"is_keeper", 1L)
          .otherwise(0L)).as("nk"))
      .as[(String, Long)].collect().toMap
    assert(keepers === Map("d1" -> 1L, "d4" -> 1L))
    assert(UrlNorm.mirrorClusters(
      Seq.empty[(String, String)].toDF("a", "b")).count() === 0L)
  }

  test("crawlWaves: per-domain deal, pressure priority, url tie-break") {
    val frontier = Seq(
      // d1: 4 urls — pressure ranks u9 first, then the 5-tie breaks
      // by url; perWave=2 deals ranks 1-2 into wave 0, ranks 3-4 into 1
      ("http://d1/u9", "d1", 9L), ("http://d1/ua", "d1", 5L),
      ("http://d1/ub", "d1", 5L), ("http://d1/uc", "d1", 1L),
      // d2: independent ranking — its single url is wave 0 regardless
      // of d1's queue depth
      ("http://d2/only", "d2", 2L))
      .toDF("canonical_url", "domain", "n_discoveries")
    val got = UrlNorm.crawlWaves(frontier, perWave = 2)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("http://d1/u9", "d1", 1L, 0L), ("http://d1/ua", "d1", 2L, 0L),
      ("http://d1/ub", "d1", 3L, 1L), ("http://d1/uc", "d1", 4L, 1L),
      ("http://d2/only", "d2", 1L, 0L)))
  }

  test("robotsGate: wildcard, domain-scoped, and / rules; multi-match count") {
    val frontier = Seq(
      // matches the global item-1 rule only
      ("http://a.example.com/articles/item-10", "example.com"),
      // item-2 escapes the item-1 prefix
      ("http://a.example.com/articles/item-2", "example.com"),
      // .com.au domain: /articles/ rule AND the global item-1 rule
      ("http://b.example.com.au/articles/item-12", "example.com.au"),
      // .com.au but outside /articles/
      ("http://b.example.com.au/about", "example.com.au"),
      // k12: the bare / rule blocks everything
      ("http://s.district.k12.ca.us/anything", "district.k12.ca.us"))
      .toDF("canonical_url", "domain")
    val got = UrlNorm.robotsGate(frontier, UrlNorm.RobotsRules)
      .as[(String, String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap
    assert(got("http://a.example.com/articles/item-10") === ((1L, false)))
    assert(got("http://a.example.com/articles/item-2") === ((0L, true)))
    assert(got("http://b.example.com.au/articles/item-12") === ((2L, false)))
    assert(got("http://b.example.com.au/about") === ((0L, true)))
    assert(got("http://s.district.k12.ca.us/anything") === ((1L, false)))
  }

  test("pathHierarchy: prefixes roll up, depth caps, bare paths drop") {
    val frontier = Seq(
      ("http://a/x/y/z/w", "a"),   // 4 segs: only depths 1..3 emit
      ("http://a/x/y/q", "a"),
      ("http://a/x", "a"),
      ("http://a/", "a"),          // bare path: contributes nothing
      ("http://b/x", "b"))         // same path, other domain: separate
      .toDF("canonical_url", "domain")
    val got = UrlNorm.pathHierarchy(frontier, maxDepth = 3)
      .as[(String, Long, String, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 1L, "/x", 3L),
      ("a", 2L, "/x/y", 2L),
      ("a", 3L, "/x/y/q", 1L),
      ("a", 3L, "/x/y/z", 1L),
      ("b", 1L, "/x", 1L)))
  }

  test("urlTemplates: digit runs collapse, families merge, sample is " +
      "the lexicographic min") {
    val frontier = Seq(
      ("http://a/product/123/review-4", "a"),
      ("http://a/product/9/review-12", "a"),
      ("http://a/about", "a"),
      ("http://a/", "a"),                  // bare path → '/', depth 0
      ("http://b/product/123/review-4", "b"))
      .toDF("canonical_url", "domain")
    val got = UrlNorm.urlTemplates(frontier)
      .as[(String, String, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      ("a", "/", 0L, 1L, "http://a/"),
      ("a", "/about", 1L, 1L, "http://a/about"),
      ("a", "/product/{n}/review-{n}", 3L, 2L,
        "http://a/product/123/review-4"),
      ("b", "/product/{n}/review-{n}", 3L, 1L,
        "http://b/product/123/review-4")))
  }

  test("q139 domain profile is consistent with its component queries") {
    val prof = UrlNorm.q139DomainProfile(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(prof.nonEmpty)
    prof.foreach { case (d, nUrls, nTpl, _, _, nAllowed, ticks) =>
      assert(nTpl >= 1L && nTpl <= nUrls, s"$d templates out of range")
      assert(nAllowed >= 0L && nAllowed <= nUrls, s"$d allowed range")
      assert(ticks === nAllowed * 1000000L / nUrls, s"$d ticks")
    }
    // cross-check against q118 (row budget) and q128 (allowed count)
    val frontierRows = UrlNorm.q118FrontierDedup(spark, sf).count()
    assert(prof.map(_._2).sum === frontierRows)
    val allowed128 = UrlNorm.q128RobotsGate(spark, sf)
      .filter($"allowed").count()
    assert(prof.map(_._6).sum === allowed128)
  }

  test("q115 fixture fires every rule somewhere") {
    val rows = UrlNorm.q115UrlCanon(spark, sf)
      .select($"canonical_url").as[String].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(u => u.startsWith("http://") || u.startsWith("https://")))
    assert(rows.forall(u => !u.contains("#") && !u.contains("utm_")))
    assert(rows.forall(u => !u.contains(":80/") && !u.contains(":443/")))
    assert(rows.exists(_.contains(":8080")), "explicit ports must survive")
    // sorted params: a= precedes z= everywhere a query survives
    assert(rows.filter(_.contains("?")).forall { u =>
      val q = u.substring(u.indexOf('?') + 1)
      q.split("&").toSeq === q.split("&").toSeq.sorted
    })
  }
}
