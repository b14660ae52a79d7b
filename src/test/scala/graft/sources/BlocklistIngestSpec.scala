package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Blocklist
import graft.store.VersionedTable

/** Composition of the bus seam with the BLOCKLIST family — the
  * scrub-at-ingest story: document batches arrive through the
  * offset-fenced exactly-once sink, each batch is gated against a
  * HARD catalog (any hit → the document never lands) and
  * cover-masked against a SOFT catalog (the occurrence lands
  * scrubbed), so the store only ever holds clean, redacted text.
  * Unlike the signature gate there is no standing index to probe —
  * both passes are stateless projections — so the leg's claim is
  * the exactly-once composition: replayed and re-split batches land
  * each admitted document once, already scrubbed, and the landed
  * store equals the brute-force reference over the unique arrivals.
  */
class BlocklistIngestSpec extends SparkSpec {
  import spark.implicits._

  test("gated + scrubbed exactly-once ingest: hard-catalog docs never " +
      "land, soft-catalog spans land masked, replays are fenced") {
    val hard = Seq("forbidden phrase")
    val soft = Seq("mask me", "me now")
    def textOf(i: Long): String = {
      val base = s"doc $i body tokens"
      val withSoft = if (i % 3 == 0) s"$base mask me now tail" else base
      if (i % 5 == 0) s"$withSoft forbidden phrase" else withSoft
    }
    val rows = (1L to 60L).map(i => (i, textOf(i)))
    val wire = WireFixtures.wireOf(
      rows.toDF("doc_id", "text"), "doc_id", Seq("doc_id", "text"))
      .cache()

    val table = new VersionedTable(
      spark, Files.createTempDirectory("blk-ingest").toString)
    val sink = new OffsetTrackedSink(table, "blk")
    val admit: DataFrame => DataFrame = df => {
      val docs = WireFixtures.parsePayload(df, "doc_id BIGINT, text STRING")
      Blocklist.redact(Blocklist.gate(docs, hard), soft)
    }
    sink.commitBatch(wire.filter($"offset" <= 25), admit)
    sink.commitBatch(wire.filter($"offset" <= 45), admit) // replay 1-25
    sink.commitBatch(wire.filter($"offset" > 40), admit)  // replay 41-45

    val landed = table.read()
    // replay-safe: one row per admitted doc
    assert(landed.count() ===
      landed.select($"doc_id").distinct().count())
    // brute-force reference over the unique arrivals
    def bruteMask(text: String): (String, Long, Long) = {
      val covered = Array.fill(text.length)(false)
      for (p <- soft; i <- 0 to text.length - p.length
           if text.regionMatches(i, p, 0, p.length);
           j <- i until i + p.length) covered(j) = true
      val masked = text.zipWithIndex
        .map { case (c, i) => if (covered(i)) '*' else c }.mkString
      val spans = (0 until text.length)
        .count(i => covered(i) && (i == 0 || !covered(i - 1))).toLong
      (masked, covered.count(identity).toLong, spans)
    }
    val want = rows.filter { case (_, t) =>
      !hard.exists(t.contains) }
      .map { case (i, t) =>
        val (m, nm, ns) = bruteMask(t)
        (i, m, nm, ns)
      }
    val got = landed.select($"doc_id", $"masked", $"n_masked", $"n_spans")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === want.sortBy(_._1))
    // non-vacuous: gates fired and scrubbing happened — the soft
    // catalog's overlapping pair ("mask me" + "me now") merged runs
    assert(rows.exists { case (i, _) => i % 5 == 0 })
    assert(got.exists(_._3 > 0))
    assert(got.forall { case (i, _, _, _) => i % 5 != 0 })
    assert(got.exists { case (_, m, _, ns) =>
      m.contains("*********** tail") && ns == 1 })
  }
}
