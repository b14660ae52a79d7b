package graft.operators

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def pages(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "html")

  private def doms(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "domain")

  private def run(p: org.apache.spark.sql.DataFrame,
      d: org.apache.spark.sql.DataFrame, pct: Int = 50) =
    HtmlExtract.domainBoilerplate(p, d, pct)
      .as[(Long, String, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap

  test("planted shares: all-pages line drops, exact-threshold line " +
      "drops, minority and unique lines survive in document order") {
    // 4 pages, one domain. "COOKIE" on 4/4; "MENU" on 2/4 (exactly
    // 50% — ≥ threshold, drops); "AD" on 1/4 (kept); unique bodies.
    val p = pages(
      1L -> "<p>COOKIE NOTICE</p><p>unique one</p><p>MENU BAR</p>",
      2L -> "<p>COOKIE NOTICE</p><p>AD SPOT</p><p>unique two</p>",
      3L -> "<p>MENU BAR</p><p>COOKIE NOTICE</p><p>unique three</p>",
      4L -> "<p>unique four</p><p>COOKIE NOTICE</p>")
    val d = doms(1L -> "a.com", 2L -> "a.com", 3L -> "a.com", 4L -> "a.com")
    val got = run(p, d)
    assert(got(1L) === (("unique one", 1L, 2L)))
    assert(got(2L) === (("AD SPOT\nunique two", 2L, 1L)))
    assert(got(3L) === (("unique three", 1L, 2L)))
    assert(got(4L) === (("unique four", 1L, 1L)))
  }

  test("presence not multiplicity: a line repeated within one page " +
      "does not inflate its share, but every occurrence drops once " +
      "the line IS boilerplate") {
    // "SPAM" 3× on page 1 only (1/4 pages → kept everywhere);
    // "FOOT" once per page (4/4 → dropped, including page 1's copy)
    val p = pages(
      1L -> "<p>SPAM</p><p>SPAM</p><p>SPAM</p><p>FOOT</p>",
      2L -> "<p>body two</p><p>FOOT</p>",
      3L -> "<p>body three</p><p>FOOT</p>",
      4L -> "<p>body four</p><p>FOOT</p>")
    val d = doms(1L -> "a.com", 2L -> "a.com", 3L -> "a.com", 4L -> "a.com")
    val got = run(p, d)
    assert(got(1L) === (("SPAM\nSPAM\nSPAM", 3L, 1L)))
    assert(got(2L) === (("body two", 1L, 1L)))
  }

  test("domain isolation: a line frequent on one domain stays content " +
      "on another; an all-boilerplate page survives with empty content") {
    val p = pages(
      1L -> "<p>PROMO</p><p>alpha</p>",
      2L -> "<p>PROMO</p>", // all boilerplate on a.com
      3L -> "<p>PROMO</p><p>beta</p>", // 1/4 b.com pages: stays content
      4L -> "<p>gamma</p>",
      5L -> "<p>PROMO</p><p>delta</p>",
      6L -> "<p>PROMO</p><p>epsilon</p>",
      7L -> "<p>zeta</p>",
      8L -> "<p>eta</p>")
    val d = doms(1L -> "a.com", 2L -> "a.com", 5L -> "a.com",
      6L -> "a.com", 3L -> "b.com", 4L -> "b.com", 7L -> "b.com",
      8L -> "b.com")
    val got = run(p, d)
    // a.com: PROMO on 4/4 pages ⇒ chrome; uniques are 1/4 ⇒ content
    assert(got(1L) === (("alpha", 1L, 1L)))
    assert(got(2L) === (("", 0L, 1L))) // row survives, empty content
    assert(got(5L) === (("delta", 1L, 1L)))
    // b.com: the SAME line on 1/4 pages ⇒ content there
    assert(got(3L) === (("PROMO\nbeta", 2L, 0L)))
    assert(got(4L) === (("gamma", 1L, 0L)))
  }

  test("normalization feeds frequency: inline markup and whitespace " +
      "variants of the same chrome line count as one line") {
    val p = pages(
      1L -> "<p>Cookie   <b>notice</b></p><p>alpha</p>",
      2L -> "<p>Cookie notice</p><p>beta</p>",
      3L -> "<p>Cookie  notice </p><p>gamma</p>")
    val d = doms(1L -> "a.com", 2L -> "a.com", 3L -> "a.com")
    val got = run(p, d)
    assert(got(1L) === (("alpha", 1L, 1L)))
    assert(got(2L) === (("beta", 1L, 1L)))
    assert(got(3L) === (("gamma", 1L, 1L)))
  }

  test("small-domain caveat is the documented semantics: on a 2-page " +
      "domain every unique line is 50% share and drops at pct=50") {
    val p = pages(
      1L -> "<p>solo one</p>",
      2L -> "<p>solo two</p>")
    val d = doms(1L -> "tiny.com", 2L -> "tiny.com")
    val got = run(p, d)
    assert(got(1L) === (("", 0L, 1L)))
    assert(got(2L) === (("", 0L, 1L)))
    // the guard is the threshold: pct=60 keeps them
    val strict = run(p, d, pct = 60)
    assert(strict(1L) === (("solo one", 1L, 0L)))
  }
}
