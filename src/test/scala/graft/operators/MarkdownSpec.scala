package graft.operators

import graft.SparkSpec

/** Fenced code-block extraction (q160): closed-fence semantics,
  * unterminated negatives, ordering, and the planted corpus.
  */
class MarkdownSpec extends SparkSpec {
  import spark.implicits._

  private def fences(text: String) =
    Markdown.codeFences(Seq((1L, text)).toDF("doc_id", "text"))
      .select($"fence_idx", $"fence_lang", $"n_lines")
      .as[(Long, String, Long)].collect().toSeq

  test("closed fences extract with tag and line count; prose, " +
      "inline backticks, and unterminated fences yield nothing") {
    assert(fences("a ```python\nx = 1\ny = 2\n``` b") ===
      Seq((1L, "python", 2L)))
    assert(fences("a ```\njust code\n``` b") === Seq((1L, "", 1L)))
    assert(fences("no fences at all") === Nil)
    assert(fences("inline `code` span only") === Nil)
    assert(fences("open ```python\nnever closed") === Nil)
    // adjacent fences: the greedy body class cannot cross a fence
    // marker, so two pairs yield two rows, never one merged span
    assert(fences("```python\nA\n``` mid ```\nB\n```")
      .map(f => (f._2, f._3)) === Seq(("python", 1L), ("", 1L)))
  }

  test("multiple fences keep document order; the body fingerprint " +
      "matches the shared portable fingerprint of the body text") {
    val got = Markdown.codeFences(
      Seq((7L, "p ```python\naa\n``` q ```sql\nbb\ncc\n``` r"))
        .toDF("doc_id", "text"))
      .select($"fence_idx", $"fence_lang", $"n_lines", $"body_fp")
      .as[(Long, String, Long, Long)].collect().toSeq
    def fp(s: String): Long = Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.fingerprint($"t")).head().getLong(0)
    assert(got === Seq((1L, "python", 1L, fp("aa")),
      (2L, "sql", 2L, fp("bb\ncc"))))
  }

  test("link extraction: prose and image links extract in document " +
      "order with the image flag; bare URLs and unbalanced brackets " +
      "yield nothing") {
    def links(text: String) =
      Markdown.extractLinks(Seq((1L, text)).toDF("doc_id", "text"))
        .select($"link_idx", $"is_image", $"anchor", $"url")
        .as[(Long, Boolean, String, String)].collect().toSeq
    assert(links("a [see](http://x.com/p) b ![img](http://y.com/q) c") ===
      Seq((1L, false, "see", "http://x.com/p"),
        (2L, true, "img", "http://y.com/q")))
    assert(links("bare http://x.com/p in prose") === Nil)
    assert(links("[no close](http://x.com/p") === Nil)
    assert(links("[](http://x.com/p)") ===
      Seq((1L, false, "", "http://x.com/p"))) // empty anchor is legal
  }

  test("q161 planted corpus: every planted link canonicalizes " +
      "through the shared URL rules; the bare-URL plant is absent") {
    val rows = Markdown.q161MarkdownLinks(spark, sf)
      .select($"doc_id", $"link_idx", $"is_image", $"anchor")
      .as[(Long, Long, Boolean, String)].collect()
    val ids = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    for (id <- ids) {
      val got = rows.filter(_._1 == id).sortBy(_._2)
        .map(r => (r._3, r._4)).toSeq
      val want =
        (if (id % 4 == 0) Seq((false, "see"), (false, "go")) else Nil) ++
          (if (id % 9 == 0) Seq((true, "fig")) else Nil)
      assert(got === want, s"doc $id")
    }
    assert(ids.exists(id => id % 11 == 0 && id % 4 != 0 && id % 9 != 0))
  }

  test("q162 shared-snippet corpus: groups match a driver-side " +
      "reference over the same plants — every group is one of the 23 " +
      "snippet buckets and cell counts reconcile to the plant lattice") {
    val got = Markdown.q162DupCodeCells(spark, sf)
      .select($"fence_lang", $"n_cells", $"n_docs", $"min_doc")
      .as[(String, Long, Long, Long)].collect().toSeq
    val ids = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    val byBucket = ids.filter(_ % 8 == 0).groupBy(_ % 23)
      .filter(_._2.length > 1)
    assert(got.length === byBucket.size)
    assert(got.forall(_._1 == "python"))
    assert(got.map(r => (r._2, r._4)).sorted ===
      byBucket.values.map(v => (v.length.toLong, v.min)).toSeq.sorted)
    assert(got.forall(r => r._2 === r._3)) // one fence per doc
  }

  test("pipe tables: header + separator + data lines census; a " +
      "header without a separator, or pipe-less prose, is not a table") {
    def tables(text: String) =
      Markdown.pipeTables(Seq((1L, text)).toDF("doc_id", "text"))
        .select($"table_idx", $"n_cols", $"n_rows")
        .as[(Long, Long, Long)].collect().toSeq
    assert(tables("\n|a|b|c|\n|---|---|---|\n|1|2|3|\n|4|5|6|\n") ===
      Seq((1L, 3L, 2L)))
    assert(tables("\n|a|b|\n|--|--|\n") === Seq((1L, 2L, 0L))) // headers only
    assert(tables("\n|a|b|\nno separator under it\n") === Nil)
    assert(tables("plain prose") === Nil)
    // two adjacent tables stay two tables, in order
    assert(tables("\n|a|\n|--|\n|1|\n\n|x|y|\n|--|--|\n") ===
      Seq((1L, 1L, 1L), (2L, 2L, 0L)))
  }

  test("q163 planted corpus: every planted table reports exact " +
      "column/row counts on its lattice; the separator-less plant " +
      "never appears") {
    val rows = Markdown.q163PipeTables(spark, sf)
      .select($"doc_id", $"table_idx", $"n_cols", $"n_rows")
      .as[(Long, Long, Long, Long)].collect()
    val ids = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    for (id <- ids) {
      val got = rows.filter(_._1 == id).sortBy(_._2)
        .map(r => (r._3, r._4)).toSeq
      val want =
        (if (id % 5 == 0) Seq((3L, 2L)) else Nil) ++
          (if (id % 12 == 0) Seq((2L, 1L)) else Nil)
      assert(got === want, s"doc $id")
    }
    assert(ids.exists(id => id % 13 == 0 && id % 5 != 0 && id % 12 != 0))
  }

  test("q160 planted corpus: every closed plant yields its row on " +
      "its lattice, the unterminated plant never does, and overlap " +
      "docs yield both fences in planted order") {
    val rows = Markdown.q160CodeFences(spark, sf)
      .select($"doc_id", $"fence_idx", $"fence_lang", $"n_lines")
      .as[(Long, Long, String, Long)].collect()
    val ids = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    for (id <- ids) {
      val got = rows.filter(_._1 == id).sortBy(_._2).map(r => (r._3, r._4))
      val want =
        (if (id % 6 == 0) Seq(("python", 2L)) else Nil) ++
          (if (id % 10 == 0) Seq(("", 1L)) else Nil)
      assert(got.toSeq === want, s"doc $id")
    }
    // the %15 lattice minus overlaps is PRESENT in the corpus but
    // absent from the output — the negative control actually ran
    assert(ids.exists(id => id % 15 == 0 && id % 6 != 0 && id % 10 != 0))
  }

  test("sections: heading split with preamble at idx 0, heading text " +
      "and token counts exact; a # line inside a closed fence never " +
      "opens a section and the fence collapses to one [CODE] token") {
    val docs = Seq(
      (1L, "intro words\n## Alpha\none two three\n# Beta\nfour five"),
      // heading at position 0: no preamble row
      (2L, "# Top\nonly body"),
      // fake heading protected by a fence; fence becomes [CODE]
      (3L, "start\n# Real\nbefore ```python\nx = 1\n# fake\n``` after"),
      // empty-bodied section between two headings
      (4L, "pre\n## Empty\n## Full\nbody here"))
      .toDF("doc_id", "text")
    val got = Markdown.sections(docs)
      .orderBy($"doc_id", $"section_idx")
      .as[(Long, Long, String, String, Long)].collect().toSeq
    assert(got.filter(_._1 == 1L) === Seq(
      (1L, 0L, "", "intro words", 2L),
      (1L, 1L, "Alpha", "one two three", 3L),
      (1L, 2L, "Beta", "four five", 2L)))
    assert(got.filter(_._1 == 2L) === Seq(
      (2L, 1L, "Top", "only body", 2L)))
    // doc 3: ONE heading section; the fenced # never splits and the
    // fence text is the placeholder token
    assert(got.filter(_._1 == 3L) === Seq(
      (3L, 0L, "", "start", 1L),
      (3L, 1L, "Real", "before [CODE] after", 3L)))
    assert(got.filter(_._1 == 4L) === Seq(
      (4L, 0L, "", "pre", 1L),
      (4L, 1L, "Empty", "", 0L),
      (4L, 2L, "Full", "body here", 2L)))
  }

  test("q164 planted corpus: three headed parts per doc with exact " +
      "token counts, the %5 empty section reports 0 tokens, and the " +
      "%6 fenced fake heading never yields a section") {
    val rows = Markdown.q164MdSections(spark, sf)
      .as[(Long, Long, String, String, Long)].collect()
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    // token count the way the operator normalizes: join, squeeze
    // whitespace, trim, split — robust to empty-token edges
    def cnt(parts: Seq[String]): Long = {
      val j = parts.mkString(" ").replaceAll("\\s+", " ").trim
      if (j.isEmpty) 0L else j.split(" ").length.toLong
    }
    for ((id, text) <- docs) {
      val toks = text.split(" ", -1).toSeq
      val nt = toks.length
      val k = (nt - nt % 3) / 3
      val got = rows.filter(_._1 == id).sortBy(_._2)
      val headings = got.map(_._3).toSeq
      val wantHeadings =
        Seq("", s"Part 1 of doc $id", s"Part 2 of doc $id") ++
          (if (id % 5 == 0) Seq(s"Empty section $id") else Nil) ++
          Seq(s"Part 3 of doc $id") ++
          (if (id % 7 == 0) Seq(s"Setext part of doc $id") else Nil) ++
          (if (id % 11 == 0) Seq(s"Setext sub of doc $id") else Nil)
      assert(headings === wantHeadings, s"doc $id")
      assert(got.head._4 === s"Doc $id intro")
      // the negative-control plants (thematic break, pipe table) open
      // no section — their text joins the LAST section's content
      val tails =
        (if (id % 9 == 0)
          Seq("---", "thematic break text not a heading") else Nil) ++
        (if (id % 13 == 0)
          Seq("| c1 | c2 |", "| --- | --- |", "| a | b |") else Nil)
      val part3 = toks.drop(2 * k) ++
        (if (id % 6 == 0) Seq("[CODE]") else Nil) ++
        (if (id % 7 == 0 || id % 11 == 0) Nil else tails)
      val wantCounts =
        Seq(3L, cnt(toks.take(k)), cnt(toks.slice(k, 2 * k))) ++
          (if (id % 5 == 0) Seq(0L) else Nil) ++
          Seq(cnt(part3)) ++
          (if (id % 7 == 0)
            Seq(cnt(Seq(s"underlined body for doc $id") ++
              (if (id % 11 == 0) Nil else tails)))
          else Nil) ++
          (if (id % 11 == 0)
            Seq(cnt(Seq("dashed body here") ++ tails)) else Nil)
      assert(got.map(_._5).toSeq === wantCounts, s"doc $id")
      if (id % 6 == 0) {
        assert(!got.exists(_._3.contains("fake")), s"doc $id")
      }
    }
  }

  test("heading census: level from the #-run, document order, fence " +
      "protection; q166 lattice — parts report levels 2/3/1 plus the " +
      "%5 empty heading, the fenced fake heading never appears") {
    val docs = Seq(
      (1L, "pre\n## Two\nbody\n# One\nx\n###### Six\ny"),
      (2L, "start ```python\nx\n# fake\n``` end\n## Real\nz"))
      .toDF("doc_id", "text")
    val got = Markdown.headingCensus(docs)
      .select($"doc_id", $"heading_idx", $"level", $"heading")
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    assert(got === Seq(
      (1L, 1L, 2L, "Two"), (1L, 2L, 1L, "One"), (1L, 3L, 6L, "Six"),
      (2L, 1L, 2L, "Real")))

    val rows = Markdown.q166HeadingCensus(spark, sf)
      .select($"doc_id", $"heading_idx", $"level", $"heading")
      .as[(Long, Long, Long, String)].collect()
    val ids = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    for (id <- ids) {
      val got = rows.filter(_._1 == id).sortBy(_._2).map(r => (r._3, r._4))
      val want =
        Seq((2L, s"Part 1 of doc $id"), (3L, s"Part 2 of doc $id")) ++
          (if (id % 5 == 0) Seq((2L, s"Empty section $id")) else Nil) ++
          Seq((1L, s"Part 3 of doc $id")) ++
          (if (id % 7 == 0) Seq((1L, s"Setext part of doc $id")) else Nil) ++
          (if (id % 11 == 0) Seq((2L, s"Setext sub of doc $id")) else Nil)
      assert(got.toSeq === want, s"doc $id")
      assert(!rows.exists(r => r._1 == id && r._4.contains("fake")))
      // the negative controls never census: no thematic-break text,
      // no table row, ever appears as a heading
      assert(!rows.exists(r => r._1 == id && (r._4.contains("thematic") ||
        r._4.contains("c1"))), s"doc $id")
    }
  }

  test("setext headings: =/- underlines segment and census like their " +
      "ATX forms; thematic breaks, table separators, bullets, and " +
      "fenced underlines never become headings") {
    val docs = Seq(
      // both setext levels, heading at position 0
      (1L, "Title One\n====\nbody a\nSub Head\n----\nbody b"),
      // negative: `---` after a blank line is a thematic break
      (2L, "para text\n\n---\nafter break"),
      // negative: pipe table header + separator row
      (3L, "intro\n| c1 | c2 |\n| --- | --- |\n| a | b |"),
      // negative: ATX heading followed by a dash run stays ATX +
      // thematic break; a `- item` bullet is not an underline
      (4L, "# Already ATX\n---\n- item one\nrest"),
      // fence-protected: an underline inside a closed fence is code
      (5L, "start\n```\nFake Head\n====\n```\nend"),
      // mixed: ATX and setext interleaved keep document order
      (6L, "Lead In\n====\nmid\n## Atx Sub\ntail"))
      .toDF("doc_id", "text")

    val secs = Markdown.sections(docs)
      .orderBy($"doc_id", $"section_idx")
      .as[(Long, Long, String, String, Long)].collect().toSeq
    assert(secs.filter(_._1 == 1L) === Seq(
      (1L, 1L, "Title One", "body a", 2L),
      (1L, 2L, "Sub Head", "body b", 2L)))
    assert(secs.filter(_._1 == 2L) === Seq(
      (2L, 0L, "", "para text --- after break", 5L)))
    assert(secs.filter(_._1 == 3L) === Seq(
      (3L, 0L, "", "intro | c1 | c2 | | --- | --- | | a | b |", 16L)))
    assert(secs.filter(_._1 == 4L) === Seq(
      (4L, 1L, "Already ATX", "--- - item one rest", 5L)))
    assert(secs.filter(_._1 == 5L) === Seq(
      (5L, 0L, "", "start [CODE] end", 3L)))
    assert(secs.filter(_._1 == 6L) === Seq(
      (6L, 1L, "Lead In", "mid", 1L),
      (6L, 2L, "Atx Sub", "tail", 1L)))

    val cens = Markdown.headingCensus(docs)
      .select($"doc_id", $"heading_idx", $"level", $"heading")
      .as[(Long, Long, Long, String)].collect().toSeq.sorted
    assert(cens === Seq(
      (1L, 1L, 1L, "Title One"), (1L, 2L, 2L, "Sub Head"),
      (4L, 1L, 1L, "Already ATX"),
      (6L, 1L, 1L, "Lead In"), (6L, 2L, 2L, "Atx Sub")))
  }

  test("q165 packing: bins respect the 64-token budget with next-fit " +
      "semantics per group; zero-token sections never pack") {
    val got = Markdown.q165MdSectionPacking(spark, sf)
      .as[(Long, Long, Long, Int, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.forall(_._3 > 0L)) // empty sections dropped
    // replay next-fit per group in (doc_id, chunk_id) order
    got.groupBy(_._4).foreach { case (grp, rowsUnsorted) =>
      val rows = rowsUnsorted.sortBy(r => (r._1, r._2))
      var bin = 0L; var fill = 0L
      rows.foreach { case (d, c, n, _, gotBin, gotFill) =>
        if (fill > 0 && fill + n > 64L) { bin += 1; fill = 0L }
        fill += n
        assert(gotBin === bin && gotFill === fill, s"grp $grp doc $d chunk $c")
      }
    }
  }
}
