package graft.operators

import graft.SparkSpec

class SectionSegmentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(html: String) =
    HtmlExtract.sectionSegments(Seq((1L, html)).toDF("doc_id", "html"))
      .as[(Long, Long, String, String, Long)].collect()
      .map(r => (r._2, r._3, r._4, r._5)).toSeq.sortBy(_._1)

  test("headings split sections in order; the preamble is section 0 " +
      "with an empty heading; token counts follow the normalized text") {
    val got = run("<p>intro text</p>" +
      "<h2>First <b>part</b></h2><p>alpha beta</p>" +
      "<h3>Second</h3><p>gamma delta epsilon</p>")
    assert(got === Seq(
      (0L, "", "intro text", 2L),
      (1L, "First part", "alpha beta", 2L),
      (2L, "Second", "gamma delta epsilon", 3L)))
  }

  test("an empty preamble is dropped; an empty SECTION body survives " +
      "(the heading itself is the signal)") {
    val got = run("<h2>Only</h2><h2>Empty then</h2><p>tail</p>")
    assert(got === Seq(
      (1L, "Only", "", 0L),
      (2L, "Empty then", "tail", 1L)))
  }

  test("lenient close-tag parse: a mismatched </h3> still terminates " +
      "an <h2> heading (regex contract, documented)") {
    val got = run("<p>p</p><h2>Mismatch</h3><p>body</p>")
    assert(got === Seq(
      (0L, "", "p", 1L),
      (1L, "Mismatch", "body", 1L)))
  }

  test("chrome strips BEFORE the split: a heading inside <nav> never " +
      "creates a section") {
    val got = run("<nav><h2>Menu</h2></nav><p>pre</p>" +
      "<h2>Real</h2><p>content</p>")
    assert(got === Seq(
      (0L, "", "pre", 1L),
      (1L, "Real", "content", 1L)))
  }
}
