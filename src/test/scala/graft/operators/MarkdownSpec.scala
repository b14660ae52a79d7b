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
}
