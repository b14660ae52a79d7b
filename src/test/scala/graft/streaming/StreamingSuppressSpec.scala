package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Privacy

/** [[StreamingSuppress]] — the hold-until-k gate: the house
  * batch ≡ stream contract (after ANY micro-batch split, the released
  * set equals `Privacy.kSuppress` over everything ingested), the
  * buffer-then-flush transition (a group's early rows emerge in the
  * micro-batch where its k-th row arrives, never before), the
  * releases-are-final invariant, and the O(k) buffer bound.
  */
class StreamingSuppressSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSuppress.{Obs, Released}

  private val rows = Seq(
    // (nation, segment, id) — group sizes: US/AUTO 3, US/BIKE 1,
    // DE/AUTO 3, NULL/AUTO 2
    ("US", "AUTO", 1L), ("US", "AUTO", 2L), ("US", "AUTO", 3L),
    ("US", "BIKE", 4L),
    ("DE", "AUTO", 5L), ("DE", "AUTO", 6L), ("DE", "AUTO", 7L),
    (null, "AUTO", 8L), (null, "AUTO", 9L))

  private def obsSeq: Seq[Obs] =
    StreamingSuppress.observations(
      rows.toDF("nation", "segment", "id"),
      Seq("nation", "segment"), $"id").collect().toSeq

  private def batchReleased(k: Long): Set[String] =
    Privacy.kSuppress(rows.toDF("nation", "segment", "id"),
        Seq("nation", "segment"), k)
      .select($"id".cast("string")).as[String].collect().toSet

  test("batch === stream across micro-batch splits: the released set " +
      "after everything ingested equals batch kSuppress, including " +
      "the NULL quasi group; under-k groups never emit") {
    implicit val sqlCtx = spark.sqlContext
    val obs = obsSeq
    for ((split, i) <- Seq(2, 5, obs.size).zipWithIndex) {
      val input = MemoryStream[Obs]
      val name = s"suppress_out_$i"
      val q = StreamingSuppress(input.toDS(), k = 3L)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      input.addData(obs.take(split)); q.processAllAvailable()
      if (split < obs.size) {
        input.addData(obs.drop(split)); q.processAllAvailable()
      }
      q.stop()
      val released = spark.table(name)
        .select($"payload").as[String].collect().toSet
      assert(released === batchReleased(3L), s"split after $split")
    }
  }

  test("a group's buffered rows emerge exactly in the micro-batch " +
      "where its k-th row arrives; later rows pass straight through; " +
      "nothing is ever emitted twice") {
    implicit val sqlCtx = spark.sqlContext
    val g = (id: Long) => Obs("US\u0001AUTO", id.toString)
    val input = MemoryStream[Obs]
    val q = StreamingSuppress(input.toDS(), k = 3L)
      .writeStream.format("memory").queryName("suppress_grow")
      .outputMode(OutputMode.Append()).start()
    input.addData(g(1), g(2)); q.processAllAvailable()
    assert(spark.table("suppress_grow").isEmpty) // 2 < k: held
    input.addData(g(3)); q.processAllAvailable()
    val afterFlush = spark.table("suppress_grow")
      .select($"payload").as[String].collect().sorted.toSeq
    assert(afterFlush === Seq("1", "2", "3")) // buffer flushed at k
    input.addData(g(4)); q.processAllAvailable()
    val afterPass = spark.table("suppress_grow")
      .select($"payload").as[String].collect().sorted.toSeq
    assert(afterPass === Seq("1", "2", "3", "4")) // pass-through, no re-emits
    q.stop()
  }

  test("the under-k buffer never holds k or more payloads (the " +
      "O(groups x k) state bound)") {
    implicit val sqlCtx = spark.sqlContext
    // drive the transition function directly: state after n < k rows
    // holds exactly n payloads; at n >= k it holds none
    val obs = (1L to 5L).map(i => Obs("g", i.toString))
    val input = MemoryStream[Obs]
    val q = StreamingSuppress(input.toDS(), k = 4L)
      .writeStream.format("memory").queryName("suppress_bound")
      .outputMode(OutputMode.Append()).start()
    obs.take(3).foreach { o => input.addData(o); q.processAllAvailable() }
    assert(spark.table("suppress_bound").isEmpty)
    input.addData(obs(3)); q.processAllAvailable()
    assert(spark.table("suppress_bound").count() === 4L)
    input.addData(obs(4)); q.processAllAvailable()
    assert(spark.table("suppress_bound").count() === 5L)
    q.stop()
  }

  test("event-time TTL: an under-k buffer expires to the DEAD-LETTER " +
      "leg when the watermark passes its newest event + ttl — never " +
      "released, never silently dropped — and a late k-th arrival " +
      "starts a FRESH group") {
    import StreamingSuppress.{Gated, ObsT}
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val input = MemoryStream[ObsT]
    val q = StreamingSuppress.withTtl(input.toDS(), k = 3L,
        ttlMs = 1000L)
      .writeStream.format("memory").queryName("ttl_gate")
      .outputMode(OutputMode.Append()).start()
    def table(): Seq[(String, String, Boolean)] =
      spark.table("ttl_gate")
        .as[(String, String, Boolean)].collect().toSeq
    // batch 1: group A buffers 2 of k=3; W is the watermark driver
    input.addData(Seq(ObsT("A", "a1", ts(1000L)), ObsT("A", "a2", ts(2000L)),
      ObsT("W", "w1", ts(500L))))
    q.processAllAvailable()
    // nothing reaches k in batch 1; W's own lone row (ts 500, so its
    // ttl point 1500 sits under the new 2000 watermark) may already
    // expire to the DLQ — never released either way
    assert(table().forall(r => !r._3), "nothing reaches k in batch 1")
    assert(table().forall(_._1 != "A"), "A's buffer holds in batch 1")
    // batch 2 pushes the watermark far past A's newest event + ttl;
    // the timeout fires in the NEXT batch (watermarks advance at
    // batch boundaries)
    input.addData(Seq(ObsT("W", "w2", ts(50000L))))
    q.processAllAvailable()
    input.addData(Seq(ObsT("W", "w3", ts(51000L))))
    q.processAllAvailable()
    val afterExpiry = table()
    assert(afterExpiry.filter(r => r._1 == "A" && !r._3)
      .map(_._2).toSet === Set("a1", "a2"),
      s"A's buffer must land on the DLQ leg, got $afterExpiry")
    assert(afterExpiry.filter(r => r._1 == "A" && r._3).isEmpty,
      "expired rows are never released")
    // late arrivals for A start a FRESH group: 3 new rows reach k and
    // release; the expired a1/a2 stay in quarantine; W never reaches
    // k=3 within any ttl window, so no W row ever releases
    input.addData(Seq(ObsT("A", "a3", ts(52000L)),
      ObsT("A", "a4", ts(52100L)), ObsT("A", "a5", ts(52200L))))
    q.processAllAvailable()
    q.stop()
    val fin = table()
    assert(fin.filter(r => r._1 == "A" && r._3).map(_._2).toSet ===
      Set("a3", "a4", "a5"))
    assert(fin.filter(r => r._1 == "A" && !r._3).map(_._2).toSet ===
      Set("a1", "a2"))
    assert(fin.filter(r => r._1 == "W" && r._3).isEmpty)
  }

  test("TTL gate without expiry pressure matches the plain gate: " +
      "released-true rows equal batch kSuppress over the prefix") {
    import StreamingSuppress.{Gated, ObsT}
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val obsT = obsSeq.zipWithIndex.map { case (o, i) =>
      ObsT(o.quasi, o.payload, ts(1000L + i)) }
    val input = MemoryStream[ObsT]
    val q = StreamingSuppress.withTtl(input.toDS(), k = 2L,
        ttlMs = 3600000L)
      .writeStream.format("memory").queryName("ttl_plain")
      .outputMode(OutputMode.Append()).start()
    input.addData(obsT.take(4)); q.processAllAvailable()
    input.addData(obsT.drop(4)); q.processAllAvailable()
    q.stop()
    val got = spark.table("ttl_plain")
      .as[(String, String, Boolean)].collect().toSeq
    assert(got.forall(_._3), "nothing expired under a huge ttl")
    assert(got.map(_._2).toSet === batchReleased(2L))
  }

}
