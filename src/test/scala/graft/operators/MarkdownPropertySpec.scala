package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Randomized differential check of the markdown structural ops: an
  * INDEPENDENT imperative reference (line scanner + manual fence
  * matcher, no regexes) implements the documented semantics —
  *
  *  - a CLOSED fence is ``` + optional lowercase tag + newline +
  *    backtick-free body + newline + ```;
  *  - sections split at `#{1,6} `-prefixed lines NOT inside a closed
  *    fence (closed fences collapse to a ` [CODE] ` placeholder
  *    first); the heading is the rest of that line, the content is
  *    everything to the next heading, whitespace-squeezed;
  *  - the heading census sees exactly the section headings with the
  *    `#`-run length as level
  *
  * — and random documents (tokens, headings at random levels, closed
  * and unterminated fences, stray `#`/backtick noise) must agree
  * operator-vs-reference row for row. This is the guard the planted
  * lattices can't give: the plants never produce a heading-like line
  * inside an unterminated fence, `#` runs without a space, or a
  * fence body ending in a backtick-adjacent newline.
  */
class MarkdownPropertySpec extends SparkSpec {
  import spark.implicits._

  // ---- independent reference ---------------------------------------

  /** Closed-fence spans [start, end) of `text`, by manual scan: find
    * "```", take the optional [a-z]* tag, require "\n", take the
    * longest backtick-free body, require "\n```". Non-overlapping,
    * left to right — the regex's leftmost-longest behavior.
    */
  private def refFences(text: String): Seq[(Int, Int, String, String)] = {
    val out = Seq.newBuilder[(Int, Int, String, String)]
    var i = 0
    while (i < text.length) {
      val s = text.indexOf("```", i)
      if (s < 0) { i = text.length }
      else {
        var j = s + 3
        while (j < text.length &&
          text.charAt(j) >= 'a' && text.charAt(j) <= 'z') j += 1
        val tag = text.substring(s + 3, j)
        if (j < text.length && text.charAt(j) == '\n') {
          var k = j + 1
          while (k < text.length && text.charAt(k) != '`') k += 1
          // [^`]* then \n``` — backtrack: body must END with \n before
          // the close; the regex takes the longest backtick-free run,
          // then requires the literal "\n```" — so the match succeeds
          // iff the run is followed by "``" (k at a backtick) and the
          // char before k is '\n'... but [^`]* includes that '\n', so
          // the regex engine backtracks one char: body = run minus the
          // trailing '\n'. Mirror exactly:
          // k >= j + 2: the closing '\n' must be a DIFFERENT char from
          // the opener's '\n' (the regex needs two newlines even for
          // an empty body)
          if (k + 2 < text.length + 1 && k >= j + 2 &&
            text.regionMatches(k, "```", 0, 3) && text.charAt(k - 1) == '\n') {
            out += ((s, k + 3, tag, text.substring(j + 1, k - 1)))
            i = k + 3
          } else i = s + 1 // regex find() retries from the next char
        } else i = s + 1
      }
    }
    out.result()
  }

  private def squeeze(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** Reference sections: strip closed fences to ` [CODE] `, then scan
    * lines; a section opens at every line starting with 1-6 `#` + a
    * space.
    */
  private def refSections(text: String): Seq[(Long, String, String, Long)] = {
    val fences = refFences(text)
    val sb = new StringBuilder
    var last = 0
    fences.foreach { case (s, e, _, _) =>
      sb.append(text.substring(last, s)).append(" [CODE] "); last = e
    }
    sb.append(text.substring(last))
    val stripped = sb.toString
    val lines = stripped.split("\n", -1)
    def headingLevel(l: String): Int = {
      var n = 0
      while (n < l.length && l.charAt(n) == '#') n += 1
      if (n >= 1 && n <= 6 && n < l.length && l.charAt(n) == ' ') n else 0
    }
    val rows = Seq.newBuilder[(Long, String, String, Long)]
    var idx = 0L
    var heading = ""
    var body = new StringBuilder
    def flush(): Unit = {
      val content = squeeze(body.toString)
      if (idx > 0 || content.nonEmpty) {
        val nTok = if (content.isEmpty) 0L else content.split(" ").length.toLong
        rows += ((idx, heading, content, nTok))
      }
      body = new StringBuilder
    }
    lines.foreach { l =>
      val lvl = headingLevel(l)
      if (lvl > 0) {
        flush()
        idx += 1
        heading = l.substring(lvl + 1)
      } else {
        body.append(l).append("\n")
      }
    }
    flush()
    rows.result()
  }

  /** Reference heading census: scan the fence-stripped lines for
    * 1-6-`#`-plus-space prefixes, keeping the run length as level.
    */
  private def refHeadings(text: String): Seq[(Long, Long, String)] = {
    val fences = refFences(text)
    val sb = new StringBuilder
    var last = 0
    fences.foreach { case (s, e, _, _) =>
      sb.append(text.substring(last, s)).append(" [CODE] "); last = e
    }
    sb.append(text.substring(last))
    sb.toString.split("\n", -1).toSeq.flatMap { l =>
      var n = 0
      while (n < l.length && l.charAt(n) == '#') n += 1
      if (n >= 1 && n <= 6 && n < l.length && l.charAt(n) == ' ')
        Some((n.toLong, l.substring(n + 1)))
      else None
    }.zipWithIndex.map { case ((lvl, h), i) => (i + 1L, lvl, h) }
  }

  private def randomDoc(rnd: Random): String = {
    val words = Array("alpha", "beta", "gamma", "delta", "#", "##",
      "`", "```", "#nospace", "x#y", "tok")
    val parts = Seq.newBuilder[String]
    for (_ <- 0 until rnd.nextInt(14)) {
      rnd.nextInt(6) match {
        case 0 => // heading at random level, sometimes 7 deep (not a heading)
          parts += "\n" + ("#" * (1 + rnd.nextInt(7))) + " head" +
            rnd.nextInt(50)
        case 1 => // closed fence, sometimes with a heading-like body line
          val tag = if (rnd.nextBoolean()) "python" else ""
          val body = if (rnd.nextBoolean()) "x = 1\n# inside" else "y()"
          parts += s"\n```$tag\n$body\n```"
        case 2 => // unterminated fence opener
          parts += "\n```scala\nunclosed v" + rnd.nextInt(10)
        case 3 => // heading with no space / hash runs in prose
          parts += "\n#" * (1 + rnd.nextInt(2)) + "x" + rnd.nextInt(9)
        case _ =>
          parts += " " + Seq.fill(1 + rnd.nextInt(5))(
            words(rnd.nextInt(words.length))).mkString(" ")
      }
    }
    parts.result().mkString("")
  }

  test("random markdown: sections() and headingCensus() agree with an " +
      "independent line-scanner reference on 120 random docs x 3 seeds") {
    for (seed <- Seq(164L, 165L, 166L)) {
      val rnd = new Random(seed)
      val docs = (0 until 120).map(i => (i.toLong, randomDoc(rnd)))
      val df = docs.toDF("doc_id", "text")

      val gotSec = Markdown.sections(df)
        .select($"doc_id", $"section_idx", $"heading", $"content",
          $"n_tokens")
        .as[(Long, Long, String, String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
      val gotHead = Markdown.headingCensus(df)
        .select($"doc_id", $"heading_idx", $"level", $"heading")
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap

      docs.foreach { case (id, text) =>
        val wantSec = refSections(text)
          .map { case (idx, h, c, n) => (id, idx, h, c, n) }
        assert(gotSec.getOrElse(id, Nil) === wantSec,
          s"seed $seed doc $id sections\n--- text:\n$text")
        val wantHead = refHeadings(text).map { case (i, l, h) => (id, i, l, h) }
        assert(gotHead.getOrElse(id, Nil) === wantHead,
          s"seed $seed doc $id headings\n--- text:\n$text")
      }
    }
  }
}
