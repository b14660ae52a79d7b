package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.MinHashDedup

class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[(Long, String)]],
      name: String, maxPerBucket: Int = Int.MaxValue)
      : Seq[(Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamNearDup.flagged(input.toDF().toDF("doc_id", "text"),
        maxPerBucket = maxPerBucket)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  test("planted near-copy flagged, same batch and cross batch") {
    val a = (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
    val dup = (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10") // exact copy: jac 1
    val other = (3L, "x1 x2 x3 x4 x5 x6 x7 x8")
    val same = runStream(Seq(Seq(a, dup, other)), "snd_same")
    assert(same == Seq((2L, 1L, 0.0)))
    val cross = runStream(Seq(Seq(a), Seq(other), Seq(dup)), "snd_cross")
    assert(cross == Seq((2L, 1L, 0.0)))
  }

  test("maxPerBucket bounds state to a trailing horizon: subset, no false positives") {
    // three exact copies across three batches: the unbounded gate
    // flags (2,1), (3,1), (3,2); with one resident per bucket, doc 1
    // is evicted when doc 2 lands, so doc 3 matches only doc 2
    val t = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val batches = Seq(Seq((1L, t)), Seq((2L, t)), Seq((3L, t)))
    val unbounded = runStream(batches, "snd_unb").toSet
    assert(unbounded == Set((2L, 1L, 0.0), (3L, 1L, 0.0), (3L, 2L, 0.0)))
    val bounded = runStream(batches, "snd_bnd", maxPerBucket = 1).toSet
    assert(bounded == Set((2L, 1L, 0.0), (3L, 2L, 0.0)))
    assert(bounded.subsetOf(unbounded), "eviction may only drop pairs")
  }

  test("runs end-to-end on the RocksDB state store provider") {
    // the streaming 100 TB capacity knob (Sessions.RocksDbProvider):
    // same gate, state on disk — verify the provider actually engages
    // via its own progress metrics, not just that nothing crashed
    Class.forName(graft.core.Sessions.RocksDbProvider): Unit
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, graft.core.Sessions.RocksDbProvider)
    try {
      implicit val sqlCtx = spark.sqlContext
      val a = (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
      val dup = (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")
      val input = MemoryStream[(Long, String)]
      val q = StreamNearDup.flagged(input.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName("snd_rocks")
        .outputMode(OutputMode.Append()).start()
      input.addData(a); q.processAllAvailable()
      input.addData(dup); q.processAllAvailable()
      val metrics = q.lastProgress.stateOperators.apply(0)
        .customMetrics.keySet()
      q.stop()
      assert(spark.table("snd_rocks").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSeq == Seq((2L, 1L, 0.0)))
      assert(metrics.toString.toLowerCase.contains("rocksdb"),
        s"expected RocksDB state metrics, got $metrics")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("≡ batch MinHash pairs on documents, across micro-batch splits") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    val expect = MinHashDedup.nearDupPairs(
        graft.core.Tables.load(spark, sf, "documents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(expect.nonEmpty) // the q28 pair set — sanity that τ bites
    for ((nBatches, tag) <- Seq((1, "one"), (4, "four"))) {
      val size = math.ceil(docs.length.toDouble / nBatches).toInt
      val got = runStream(docs.grouped(size).toSeq, s"snd_eq_$tag")
        .map { case (id, of, d) => (math.min(id, of), math.max(id, of), d) }
        .toSet
      assert(got == expect, s"$nBatches micro-batches")
    }
  }
}
