package graft.operators

import graft.SparkSpec

/** Ingest-time perceptual near-dup gate (q159): banding exactness in
  * the asymmetric form, broadcast plan shape, planted end-to-end.
  */
class NearDupGateSpec extends SparkSpec {
  import spark.implicits._

  test("gate equals brute force: planted signatures at every Hamming " +
      "distance 0-5 from a probe — banding finds exactly the <= 3 set") {
    // corpus signatures at controlled distances from probe hash 0
    def hWith(bits: Int): Long = (0 until bits).map(1L << _).sum
    val corpus = (0 to 5).map(d => (100L + d, hWith(d), 0L))
      .toDF("media_id", "dhash", "ahash")
    val probe = Seq((900L, 0L, 0L)).toDF("media_id", "dhash", "ahash")
    val got = ImageHash.nearDupGate(corpus, probe)
      .select($"media_id", $"hamming").as[(Long, Int)].collect().sorted
    assert(got.toSeq === Seq((100L, 0), (101L, 1), (102L, 2), (103L, 3)))
  }

  test("gate plan: the probe side broadcasts and the corpus side " +
      "reaches the join with no Exchange — the index never shuffles") {
    val corpus = (0L until 64L).map(i => (i, i * 37L, i))
      .toDF("media_id", "dhash", "ahash")
    val probe = Seq((900L, 37L, 1L)).toDF("media_id", "dhash", "ahash")
    val df = ImageHash.nearDupGate(corpus, probe)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // below the join sit its two inputs: the corpus band stream and
    // the broadcast probe bands. The ONLY Exchange allowed there is
    // the BroadcastExchange of the probe — a hashpartitioning
    // Exchange would mean the index shuffled. (The distinct above
    // the join aggregates the gate OUTPUT — probe-batch-sized — and
    // may shuffle; it sits before the join in the printed tree.)
    val belowJoin = p.substring(p.indexOf("BroadcastHashJoin"))
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"corpus side shuffled before join:\n$p")
    assert(belowJoin.contains("BroadcastExchange"), p)
  }

  test("q159 end-to-end: every planted dup probe hits its base (and " +
      "the base's planted variants) at Hamming 0; novel probes pass " +
      "the gate unmatched") {
    val rows = ImageHash.q159NearDupGate(spark, sf)
      .select($"probe_id", $"media_id", $"hamming", $"a_hamming")
      .as[(Long, Long, Int, Int)].collect()
    val ids = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    val dupProbes = ids.filter(_ % 31 == 0).map(id => id * 10 + 5)
    val novelProbes = ids.filter(_ % 37 == 0).map(id => id * 10 + 6)
    assert(dupProbes.nonEmpty && novelProbes.nonEmpty)
    for (p <- dupProbes) {
      val hits = rows.filter(_._1 == p)
      // the base is always hit, exactly (Hamming 0 under both hashes)
      assert(hits.exists(h => h._2 == (p / 10) * 10 && h._3 == 0 && h._4 == 0),
        s"dup probe $p missed its base")
    }
    for (p <- novelProbes)
      assert(!rows.exists(_._1 == p), s"novel probe $p was flagged")
  }
}
