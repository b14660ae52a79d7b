package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SequencePackingSpec extends SparkSpec {
  import spark.implicits._

  private def mkChunks(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("doc_id", "chunk_id", "chunk_tokens")

  test("next-fit hand case: bins close when the next chunk overflows") {
    // one group (single doc): tokens 30,30,40,10,45 at budget 50
    // → bins [30], [30], [40,10], [45]
    val got = SequencePacking.pack(
        mkChunks(Seq((1L, 0L, 30L), (1L, 1L, 30L), (1L, 2L, 40L),
          (1L, 3L, 10L), (1L, 4L, 45L))),
        maxTokens = 50)
      .orderBy($"chunk_id")
      .collect().map(r => (r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq((0L, 30L), (1L, 30L), (2L, 40L), (2L, 50L), (3L, 45L)))
  }

  test("oversized chunk gets its own bin; packing continues after") {
    val got = SequencePacking.pack(
        mkChunks(Seq((1L, 0L, 80L), (1L, 1L, 20L), (1L, 2L, 20L))),
        maxTokens = 50)
      .orderBy($"chunk_id")
      .collect().map(r => (r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq((0L, 80L), (1L, 20L), (1L, 40L)))
  }

  test("invariants at sf: budget respected, bins dense, deterministic") {
    val chunks = TextStats.chunk(
      graft.core.Tables.load(spark, sf, "documents"))
    val packed = SequencePacking.pack(chunks).cache()
    // budget: no bin over 50 tokens unless it holds one oversized chunk
    val over = packed.groupBy($"grp", $"bin")
      .agg(sum($"chunk_tokens").as("tot"), count(lit(1)).as("n"))
      .filter($"tot" > 50 && $"n" > 1)
    assert(over.isEmpty)
    // bins dense per group: max(bin) + 1 == distinct bin count
    val dense = packed.groupBy($"grp")
      .agg(max($"bin").as("mx"), countDistinct($"bin").as("nb"))
      .filter($"mx" + 1 =!= $"nb")
    assert(dense.isEmpty)
    // every chunk packed exactly once
    assert(packed.count() == chunks.count())
    // deterministic under different input partitioning
    val again = SequencePacking.pack(chunks.repartition(7))
    assert(packed.exceptAll(again).isEmpty && again.exceptAll(packed).isEmpty)
    packed.unpersist(); ()
  }
}
