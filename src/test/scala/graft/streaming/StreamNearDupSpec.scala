package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.MinHashDedup

class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(batches: Seq[Seq[(Long, String)]],
      name: String): Seq[(Long, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamNearDup.flagged(input.toDF().toDF("doc_id", "text"))
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
