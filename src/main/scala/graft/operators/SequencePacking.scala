package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Output row of [[SequencePacking.pack]]. */
final case class PackedChunk(doc_id: Long, chunk_id: Long,
    chunk_tokens: Long, grp: Int, bin: Long, bin_fill: Long)

/** Sequence packing — grouping variable-length chunks into
  * fixed-token-budget training sequences (bins), the step between
  * chunking and batch assembly in a pretraining pipeline.
  *
  * Packing is inherently sequential (each bin decision depends on the
  * running fill), so a single global scan can't parallelize. The
  * scale contract: docs hash into `nGroups` independent packing
  * groups; within a group, chunks pack in deterministic
  * (doc_id, chunk_id) order with the NEXT-FIT rule (if the chunk
  * doesn't fit the open bin, close it and open a new one). Groups
  * pack in parallel — one shuffle on the group key, then one
  * streaming pass per partition over Tungsten's external sort (no
  * in-memory group materialization, so a group may exceed memory).
  * An oversized chunk (> maxTokens) gets a bin of its own.
  *
  * Deterministic end-to-end ⇒ DuckDB reproduces the packing with a
  * per-group recursive scan (q46's equality oracle) — recursion depth
  * is the largest group's chunk count, which nGroups keeps bounded.
  */
object SequencePacking {

  def pack(chunks: DataFrame, maxTokens: Long = 50,
      nGroups: Int = 32): DataFrame = {
    import chunks.sparkSession.implicits._
    // portable group hash (the q30 pivot-hash pattern): masked Knuth
    // multiplicative in plain BIGINT arithmetic — any oracle engine
    // recomputes it, and the 31-bit mask keeps the product < 2^63
    val grp = (((($"doc_id" % lit(2147483648L)) * lit(2654435761L))
      % lit(2147483648L)) % lit(nGroups.toLong)).cast("int")
    chunks
      .select($"doc_id", $"chunk_id", $"chunk_tokens", grp.as("grp"))
      .repartition(nGroups, $"grp")
      .sortWithinPartitions($"grp", $"doc_id", $"chunk_id")
      .as[(Long, Long, Long, Int)]
      .mapPartitions { it =>
        var curGrp = Int.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (d, c, n, g) =>
          if (g != curGrp) { curGrp = g; bin = 0L; fill = 0L }
          if (fill > 0 && fill + n > maxTokens) { bin += 1; fill = 0L }
          fill += n
          PackedChunk(d, c, n, g, bin, fill)
        }
      }
      .toDF()
  }

  /** Q46 — next-fit packing of the q43 chunks at a 50-token budget. */
  def q46PackedSequences(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pack(TextStats.chunk(Tables.load(spark, dir, "documents")))
      .orderBy($"grp", $"doc_id", $"chunk_id")
  }
}
