package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{MinHashDedup, NearDup}

/** One doc's residency in one LSH band bucket: its id, full band
  * vector (for lowest-colliding-band pair dedup), and exact shingle
  * set (for Jaccard verification).
  */
case class BandMember(docId: Long, bands: Array[Long], shs: Array[Long])

/** STREAMING MinHash-LSH near-dup gate — the cross-micro-batch
  * extension of [[graft.operators.MinHashDedup]]: as documents
  * arrive, flag each that is an exact-Jaccard near-dup of ANY
  * earlier-arrived document, without ever joining the stream against
  * the full corpus. [[StreamDedup]] catches exact copies; this
  * catches boilerplate/template near-copies at ingest, before they
  * hit storage.
  *
  * Shape: each arriving doc fans to its `numBands` (band, key) LSH
  * bucket rows; `flatMapGroupsWithState` keyed by bucket holds the
  * docs previously seen in that bucket. A new doc is compared only
  * against its bucket co-residents — candidate generation identical
  * to the batch operator's banding. Two dedup rules make the output
  * EQUAL to the batch pair set (not just approximately):
  *  - a pair colliding in several bands is emitted only from the
  *    LOWEST colliding band (each member carries its full band
  *    vector, so any bucket can decide locally whether it is that
  *    band) — the streaming analogue of the batch `.distinct()`;
  *  - candidates are verified with the exact sorted-merge shingle
  *    Jaccard before emission, so precision is 1 and the stream
  *    output is deterministic given arrival order.
  *
  * State: per bucket, the (id, bands, shs) of its residents — the
  * same postings the batch index materializes, held in the state
  * store instead of a shuffle.
  *
  * STATE GROWTH AND ITS TWO KNOBS (the 100 TB story): total state is
  * numBands signatures per corpus doc — corpus-PROPORTIONAL by
  * design, because batch-equal output means any future doc may match
  * any past one. (a) CAPACITY: run the query on the RocksDB provider
  * ([[graft.core.Sessions.RocksDbProvider]]) so that state lives on
  * executor disk, not heap — spec-checked end-to-end. (b) BOUND:
  * `maxPerBucket` caps every band bucket by evicting its OLDEST
  * residents (newest-first retention), turning the gate into a
  * trailing-horizon dedup — the standard production trade, since
  * recent arrivals dominate near-dup mass at ingest. A bounded run
  * flags a SUBSET of the unbounded pairs (never a false positive —
  * candidates still verify by exact Jaccard) and state is ≤
  * maxPerBucket·numBands·activeBuckets whatever the corpus;
  * maxPerBucket = ∞ keeps the exact ≡-batch equality the spec
  * checks.
  */
object StreamNearDup {

  /** Flagged pairs (doc_id, dup_of, jaccard_dist): `doc_id` arrived
    * after `dup_of` and matches it at Jaccard ≥ 1 − maxDistance.
    * Works on a streaming OR batch `(doc_id, text)` frame; arrival
    * order within a micro-batch is doc_id order (the equivalence
    * contract — across batches, arrival order is batch order).
    */
  def flagged(docs: DataFrame, maxDistance: Double = 0.5,
      numBands: Int = 24, rowsPerBand: Int = 1,
      seed: Long = 42L, maxPerBucket: Int = Int.MaxValue): DataFrame = {
    import docs.sparkSession.implicits._
    val tau = 1.0 - maxDistance
    MinHashDedup.setsWithBands(
        NearDup.shingleHashSets(docs), numBands, rowsPerBand, seed)
      .as[(Long, Array[Long], Array[Long])]
      .flatMap { case (id, shs, bands) =>
        bands.iterator.zipWithIndex.map { case (k, b) =>
          (b, k, id, bands, shs)
        }
      }
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        process(tau, maxPerBucket))
      .toDF("doc_id", "dup_of", "jaccard_dist")
  }

  private def process(tau: Double, maxPerBucket: Int)(
      key: (Int, Long),
      rows: Iterator[(Int, Long, Long, Array[Long], Array[Long])],
      state: GroupState[List[BandMember]])
      : Iterator[(Long, Long, Double)] = {
    val band = key._1
    var members = state.getOption.getOrElse(Nil)
    val out = List.newBuilder[(Long, Long, Double)]
    rows.toSeq.sortBy(_._3).foreach { case (_, _, id, bands, shs) =>
      if (!members.exists(_.docId == id)) { // re-delivery guard
        members.foreach { m =>
          // lowest band where the pair collides — emit only there
          var minBand = -1
          var j = 0
          while (j < bands.length && minBand < 0) {
            if (m.bands(j) == bands(j)) minBand = j
            j += 1
          }
          if (minBand == band) {
            val co = sortedIntersectSize(m.shs, shs)
            val jac = co.toDouble / (m.shs.length + shs.length - co)
            if (jac >= tau) out += ((id, m.docId, 1.0 - jac))
          }
        }
        // newest-first: the bound evicts the oldest residents (the
        // unbounded path stays O(1) prepend — no copy)
        val added = BandMember(id, bands, shs) :: members
        members =
          if (maxPerBucket == Int.MaxValue) added else added.take(maxPerBucket)
      }
    }
    state.update(members)
    out.result().iterator
  }

  /** Merge-intersect of two sorted-ascending Long arrays (the
    * [[NearDup.shingleHashSets]] output invariant) — the driver-free
    * twin of the codegen'd `sortedIntersectSize` Column expression.
    */
  private def sortedIntersectSize(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }
}
