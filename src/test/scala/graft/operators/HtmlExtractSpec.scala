package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-boilerplate contract for the HTML main-content extractor:
  * chrome vanishes wholesale, prose survives byte-exact, the density
  * and min-length gates cut exactly at their integer boundaries, and
  * the whole operator stays a shuffle-free projection.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def one(html: String, minChars: Int = 10, minDensityPct: Int = 50) =
    HtmlExtract.extract(Seq((1L, html)).toDF("doc_id", "html"),
        minChars = minChars, minDensityPct = minDensityPct)
      .select($"content", $"n_blocks_total", $"n_blocks_kept",
        $"content_chars")
      .head()

  test("script, style, comments and chrome containers vanish wholesale") {
    val r = one(
      "<html><head><style>p{color:red}</style>" +
        "<script>var secret = 'leak me';</script></head><body>" +
        "<nav><a href=\"/\">HomeLink NavigationMenu</a></nav>" +
        "<!-- tracking: should never appear -->" +
        "<header>masthead branding banner</header>" +
        "<p>the actual article body text survives extraction</p>" +
        "<aside>related links sidebar</aside>" +
        "<footer>Copyright notice legal boilerplate</footer></body></html>")
    val content = r.getString(0)
    assert(content === "the actual article body text survives extraction")
    for (leak <- Seq("secret", "color:red", "HomeLink", "tracking",
        "masthead", "sidebar", "Copyright"))
      assert(!content.contains(leak), s"chrome leaked: $leak")
  }

  test("prose round-trips byte-exact and blocks keep document order") {
    val body = "alpha beta gamma delta epsilon zeta"
    val r = one(s"<h1>heading line of the article</h1><p>$body</p>")
    assert(r.getString(0) === s"heading line of the article\n$body")
    assert(r.getLong(2) === 2L) // n_blocks_kept
    assert(r.getLong(3) === r.getString(0).length.toLong)
  }

  test("link farms fail the density gate; attribute cruft is not text") {
    val r = one(
      "<p>a paragraph with enough characters to clear the gates</p>" +
        "<div class=\"share\"><a href=\"#\">share this page</a> " +
        "<a href=\"#\">tweet this page</a></div>")
    assert(r.getString(0) ===
      "a paragraph with enough characters to clear the gates")
  }

  test("minChars cuts exactly at the boundary") {
    // 9 text chars → dropped; 10 → kept (density 100% in both)
    assert(one("<p>123456789</p>").getString(0) === "")
    assert(one("<p>1234567890</p>").getString(0) === "1234567890")
  }

  test("density cuts exactly at the integer boundary") {
    // raw block "0123456789<b></b><i></i>" = 24 chars, text 10 chars:
    // 10*100 >= 50*24 ⇔ 1000 >= 1200 fails → dropped
    assert(one("<p>0123456789<b></b><i></i></p>").getString(0) === "")
    // raw 20 chars, text 10: 1000 >= 1000 holds → kept
    assert(one("<p>0123456789<b></b></p>").getString(0) === "0123456789")
  }

  test("chrome-only pages extract to empty, with block accounting") {
    val r = one("<html><body><nav><a href=\"/\">x</a></nav>" +
      "<footer>f</footer></body></html>")
    assert(r.getString(0) === "")
    assert(r.getLong(2) === 0L)
    assert(r.getLong(3) === 0L)
  }

  test("q111 synthetic page: content is heading + document text") {
    val df = Seq((3L, "plain document words repeated enough times here"))
      .toDF("doc_id", "text")
      .select($"doc_id",
        HtmlExtract.syntheticHtml($"doc_id", $"text").as("html"))
    val r = HtmlExtract.extract(df).select($"content").head().getString(0)
    assert(r === "Document number 3 of the corpus\n" +
      "plain document words repeated enough times here")
  }

  test("the operator is a shuffle-free whole-stage projection") {
    val df = Seq((1L, "<p>text</p>")).toDF("doc_id", "html")
    val plan = HtmlExtract.extract(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("extractLinks: document order, tag-stripped anchors, href-less <a> skipped") {
    val html = "<p>pre <a href=\"/x\">first</a> mid " +
      "<a class=\"z\" href=\"/y?q=1\">see <b>bold</b>  text</a> " +
      "<a name=\"no-href\">not a link</a> post</p>"
    val rows = HtmlExtract.extractLinks(
        Seq((9L, html)).toDF("doc_id", "html"))
      .orderBy($"link_pos")
      .as[(Long, Long, String, String)].collect()
    assert(rows.toSeq === Seq(
      (9L, 1L, "/x", "first"),
      (9L, 2L, "/y?q=1", "see bold text")))
  }

  test("extractLinks is shuffle-free (projection + generator only)") {
    val df = Seq((1L, "<a href=\"/a\">a</a>")).toDF("doc_id", "html")
    val plan = HtmlExtract.extractLinks(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("linked fixture: even docs repeat their first target, odd add a third") {
    val links = HtmlExtract.extractLinks(
      Seq((4L, "t"), (5L, "t")).toDF("doc_id", "text")
        .select($"doc_id",
          HtmlExtract.syntheticLinkedHtml($"doc_id", $"text").as("html")))
      .select($"doc_id", $"href")
      .as[(Long, String)].collect().groupBy(_._1)
    // doc 4: t1=(31)%500=31 twice + t2=63; doc 5: t1=38, t2=76, t3=162
    assert(links(4L).map(_._2).sorted.toSeq ===
      Seq("/doc/31", "/doc/31", "/doc/63"))
    assert(links(5L).map(_._2).sorted.toSeq ===
      Seq("/doc/162", "/doc/38", "/doc/76"))
  }

  test("anchorTermIndex: counts aggregate per target; ties break by term") {
    val pages = Seq(
      (1L, """<p><a href="/doc/9">alpha beta</a></p>"""),
      (2L, """<p><a href="/doc/9">alpha</a> and <a href="/x">noise</a></p>"""),
      (3L, """<p><a href="/doc/9">gamma</a><a href="/doc/7">delta</a></p>"""))
      .toDF("doc_id", "html")
    val got = HtmlExtract.anchorTermIndex(HtmlExtract.extractLinks(pages))
      .orderBy($"dst", $"rnk")
      .as[(Long, String, Long, Long)].collect().toSeq
    // target 9: alpha ×2 wins; beta/gamma tie at 1 → term order;
    // target 7: delta; the non-/doc/ href contributes nothing
    assert(got === Seq(
      (7L, "delta", 1L, 1L),
      (9L, "alpha", 2L, 1L), (9L, "beta", 1L, 2L), (9L, "gamma", 1L, 3L)))
  }

  test("anchorTermIndex: top-k cuts at k and inline markup is stripped") {
    val pages = Seq(
      (1L, """<a href="/doc/5">w1 w2</a><a href="/doc/5"><b>w3</b> w4</a>
             |<a href="/doc/5">w2 w3</a>""".stripMargin))
      .toDF("doc_id", "html")
    val got = HtmlExtract.anchorTermIndex(
        HtmlExtract.extractLinks(pages), k = 2)
      .orderBy($"rnk").as[(Long, String, Long, Long)].collect().toSeq
    // counts: w2=2, w3=2 (bold stripped), w1=1, w4=1 → top-2 = w2, w3
    assert(got === Seq((5L, "w2", 2L, 1L), (5L, "w3", 2L, 2L)))
  }

  test("Spark split and DuckDB string_split_regex agree on empty fragments") {
    // '<p>a</p><div>b</div>' → ['', 'a', '', 'b', ''] in DuckDB
    // (probed); Java split(…, -1) must produce the same 5 fragments
    // or every block index downstream drifts
    val frags = Seq(Tuple1("<p>a</p><div>b</div>")).toDF("h")
      .select(split($"h", HtmlExtract.BlockBoundaryRe).as("b"))
      .head().getSeq[String](0)
    assert(frags === Seq("", "a", "", "b", ""))
  }
}
