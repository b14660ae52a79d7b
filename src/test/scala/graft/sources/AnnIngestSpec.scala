package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.operators.IvfIndex
import graft.store.VersionedTable

/** Composition of the bus seam with incremental ANN maintenance — the
  * 100 TB embedding-ingest story in one spec: wire-shaped JSON events
  * → offset-fenced exactly-once commit (replay-safe across re-split
  * batches) → cell assignment under a FROZEN coarse quantizer inside
  * the sink's post-fence transform → transactional append to the
  * cell-partitioned index table → the new vectors are immediately
  * queryable through the same [[IvfIndex.topK]] path as the base
  * corpus, with no index rebuild anywhere.
  */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  test("exactly-once bus ingest grows the IVF index; replayed vectors index once") {
    val emb = Tables.load(spark, sf, "embeddings")
    // quantizer frozen on the base corpus; the held-out quarter
    // arrives over the bus
    val base = emb.filter($"vec_id" % 4 =!= 0)
    val arriving = emb.filter($"vec_id" % 4 === 0)
    val (idx0, model) = IvfIndex.buildPivots(base)

    val wire = WireFixtures
      .wireOf(arriving, "vec_id", Seq("vec_id", "embedding")).cache()
    val n = wire.count()

    // post-fence parse + frozen-model assignment: the table holds
    // index-ready (vec_id, embedding, cell) rows
    val parseAssign: DataFrame => DataFrame = df =>
      IvfIndex.assign(
        WireFixtures.parsePayload(df, "vec_id BIGINT, embedding ARRAY<FLOAT>"),
        model)

    val table = new VersionedTable(
      spark, Files.createTempDirectory("ann-ingest").toString)
    val sink = new OffsetTrackedSink(table, "emb")
    // three deliveries with an overlapping replay in the middle — the
    // at-least-once bus shape the fence must absorb row-wise
    val cut1 = n / 3
    val cut2 = 2 * n / 3
    sink.commitBatch(wire.filter($"offset" < cut1), parseAssign)
    sink.commitBatch(wire.filter($"offset" < cut2), parseAssign)        // replays [0, cut1)
    sink.commitBatch(wire.filter($"offset" >= cut2 - 1), parseAssign)   // replays one row
    val ingested = table.read()

    // exactly once, despite the overlaps
    assert(ingested.count() == n, "each arriving vector indexed exactly once")
    assert(ingested.select($"vec_id").distinct().count() == n)
    // cells match the frozen-model assignment of the same vectors
    val expect = IvfIndex.assign(arriving, model)
      .select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = ingested.select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == expect, "ingested cells diverge from frozen-model assignment")

    // the grown index serves the just-ingested vectors through the
    // standard probe path (a vector's own cell is always probed)
    val grown = idx0.select($"vec_id", $"embedding", $"cell")
      .unionByName(ingested.select($"vec_id", $"embedding", $"cell"))
    val probes = arriving.limit(3)
    val probeIds = probes.select($"vec_id").as[Long].collect().toSet
    val selfHits = IvfIndex.topK(grown, model, probes, k = 5)
      .filter($"probe_id" === $"vec_id")
      .select($"probe_id").as[Long].collect().toSet
    assert(selfHits == probeIds, "bus-ingested vectors must be findable")
  }
}
