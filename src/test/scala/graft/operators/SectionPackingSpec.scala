package graft.operators

import graft.SparkSpec

class SectionPackingSpec extends SparkSpec {
  import spark.implicits._

  test("q150 composition: every packed chunk is a non-empty q149 " +
      "section, token totals reconcile, and no bin exceeds the " +
      "64-token budget (oversized single sections excepted — none " +
      "exist in the fixture)") {
    val dir = sf
    val packed = SequencePacking.q150SectionPacking(spark, dir)
      .as[PackedChunk].collect()
    val pages = graft.core.Tables.load(spark, dir, "documents")
      .select($"doc_id",
        HtmlExtract.syntheticSectionedHtml($"doc_id", $"text").as("html"))
    val secs = HtmlExtract.sectionSegments(pages)
      .filter($"n_tokens" > 0)
      .select($"doc_id", $"section_idx", $"n_tokens")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // bijection: packed chunks == non-empty sections, same tokens
    assert(packed.length === secs.size)
    for (p <- packed)
      assert(secs((p.doc_id, p.chunk_id)) === p.chunk_tokens)
    // bin budget: per (grp, bin) fill ≤ 64, and bin_fill is the
    // running fill (final row of a bin carries the bin total)
    val byBin = packed.groupBy(p => (p.grp, p.bin))
    for (((_, _), chunks) <- byBin) {
      val total = chunks.map(_.chunk_tokens).sum
      assert(total <= 64L, s"bin over budget: $total")
      assert(chunks.map(_.bin_fill).max === total)
    }
    // packing is dense: within a group, a chunk never starts a new
    // bin it could have avoided (next-fit: previous fill + chunk > 64)
    for ((_, chunks) <- packed.groupBy(_.grp)) {
      val ordered = chunks.sortBy(c => (c.doc_id, c.chunk_id))
      ordered.sliding(2).foreach {
        case Array(a, b) if b.bin == a.bin + 1 =>
          assert(a.bin_fill + b.chunk_tokens > 64L,
            s"needless bin break after fill ${a.bin_fill}")
        case _ =>
      }
    }
  }
}
