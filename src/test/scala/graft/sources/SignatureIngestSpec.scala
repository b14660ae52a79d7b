package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{ImageHash, IndexMaintenance}
import graft.store.VersionedTable

/** Composition of the bus seam with the STANDING SIGNATURE INDEX —
  * the ingest-time dedup story q159's gate exists for: media batches
  * arrive through the offset-fenced exactly-once sink, each batch's
  * signatures are gated against the index grown by all PRIOR batches
  * (broadcast probe, index never shuffles), only novel media land,
  * and the landed index is bit-identical to a fresh signature build
  * over exactly the admitted media. The purge leg then composes
  * [[IndexMaintenance.purge]] on the same index (signature rows are
  * media_id-keyed like every standing index family).
  */
class SignatureIngestSpec extends SparkSpec {
  import spark.implicits._

  test("gated exactly-once signature ingest: in-order admission, " +
      "replay-safe, grown index == fresh build over admitted media; " +
      "purge == fresh build over the reduced set") {
    // three arrival batches: bases; more bases + re-encoded copies of
    // batch-1 media; resized copies of batch-1 media + novel images
    val b1 = (0L until 40L).map(i => (i * 10, ImageHash.render(i, 1, "png")))
    val b2 = (40L until 80L).map(i => (i * 10, ImageHash.render(i, 1, "png"))) ++
      (0L until 40L by 5).map(i => (i * 10 + 2, ImageHash.render(i, 1, "bmp")))
    val b3 = (0L until 40L by 7).map(i =>
        (i * 10 + 1, ImageHash.render(i, 2, "png"))) ++
      (80L until 100L).map(i =>
        (i * 10 + 6, ImageHash.render(i + 1000000000L, 1, "png")))
    val arrivals = (b1 ++ b2 ++ b3).zipWithIndex
      .map { case ((m, p), i) => (i + 1L, m, p) }
    val wire = WireFixtures.wireOf(
      arrivals.toDF("arrival", "media_id", "payload"),
      "arrival", Seq("arrival", "media_id", "payload")).cache()

    val table = new VersionedTable(
      spark, Files.createTempDirectory("sig-ingest").toString)
    val sink = new OffsetTrackedSink(table, "sig")
    val gateAdmit: DataFrame => DataFrame = df => {
      val sig = ImageHash.signatures(WireFixtures.parsePayload(df,
        "arrival BIGINT, media_id BIGINT, payload BINARY"))
      if (table.currentVersion.isEmpty) sig
      else {
        val dupIds = ImageHash.nearDupGate(table.read(), sig)
          .select($"probe_id".as("media_id")).distinct()
        sig.join(broadcast(dupIds), Seq("media_id"), "left_anti")
      }
    }
    val cut1 = b1.length.toLong
    val cut2 = (b1.length + b2.length).toLong
    sink.commitBatch(wire.filter($"offset" <= cut1), gateAdmit)
    sink.commitBatch(wire.filter($"offset" <= cut2), gateAdmit) // replay b1
    sink.commitBatch(wire.filter($"offset" > cut2 - 3), gateAdmit) // replay tail

    // driver-side greedy reference: admit iff no admitted-so-far
    // signature within Hamming 3 (the gate's contract, brute force)
    def dh(p: Array[Byte]) = ImageHash.dHash(ImageHash.lumaGrid(p))
    val admitted = scala.collection.mutable.LinkedHashMap[Long, Long]()
    for ((m, p) <- b1 ++ b2 ++ b3) {
      val h = dh(p)
      if (!admitted.valuesIterator.exists(a =>
          java.lang.Long.bitCount(a ^ h) <= 3))
        admitted(m) = h
    }
    // batch-1 bases all admit; every re-encode and resize rejects
    assert(b1.forall { case (m, _) => admitted.contains(m) })
    assert((0L until 40L by 5).forall(i => !admitted.contains(i * 10 + 2)))
    assert((0L until 40L by 7).forall(i => !admitted.contains(i * 10 + 1)))

    val landed = table.read()
    assert(landed.count() ===
      landed.select($"media_id").distinct().count()) // replay-safe
    assert(landed.select($"media_id").as[Long].collect().toSet ===
      admitted.keySet.toSet)
    // landed == fresh signature build over exactly the admitted media
    val adm = (b1 ++ b2 ++ b3).filter(r => admitted.contains(r._1))
    val fresh = ImageHash.signatures(adm.toDF("media_id", "payload"))
    assert(landed.select($"media_id", $"dhash", $"ahash")
      .exceptAll(fresh).isEmpty && fresh.exceptAll(
      landed.select($"media_id", $"dhash", $"ahash")).isEmpty)

    // purge leg: taking down every 3rd admitted media repairs the
    // index to exactly a fresh build over the reduced set
    val takedown = admitted.keys.filter(_ % 3 == 0).toSeq.toDF("media_id")
    val purged = IndexMaintenance.purge(landed, takedown, "media_id")
      .select($"media_id", $"dhash", $"ahash")
    val reduced = ImageHash.signatures(
      adm.filter(_._1 % 3 != 0).toDF("media_id", "payload"))
    assert(purged.exceptAll(reduced).isEmpty &&
      reduced.exceptAll(purged).isEmpty)
  }
}
