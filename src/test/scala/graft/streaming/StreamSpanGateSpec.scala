package graft.streaming

import scala.collection.mutable
import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.SpanDedup

/** Incremental duplicated-span gate as a stream: each arriving
  * micro-batch is excised against the corpus n-gram index seen SO FAR
  * ([[SpanDedup.exciseAgainst]]), then its n-grams join the index —
  * the first-seen copy of a span survives, every later arrival loses
  * it. Replay over random micro-batch splits must equal a sequential
  * plain-Scala fold with the same split (the semantics are
  * order-defined, so the reference consumes identical batches).
  */
class StreamSpanGateSpec extends SparkSpec {
  import spark.implicits._

  private val n = 3

  /** Sequential reference: literal n-gram strings, same two-leg rule
    * (any previously-seen n-gram, or ≥ 2 occurrences within the
    * arriving batch).
    */
  private def refGate(batches: Seq[Seq[(Long, String)]])
      : Map[Long, (Long, Long, String)] = {
    val seen = mutable.HashSet.empty[Seq[String]]
    val out = mutable.Map.empty[Long, (Long, Long, String)]
    batches.foreach { batch =>
      val toks = batch.map { case (id, t) => id -> t.split(" ", -1) }
      val counts = mutable.HashMap.empty[Seq[String], Int]
      toks.foreach { case (_, ts) =>
        (0 to ts.length - n).foreach { i =>
          val g = ts.slice(i, i + n).toSeq
          counts(g) = counts.getOrElse(g, 0) + 1
        }
      }
      toks.foreach { case (id, ts) =>
        val covered = new Array[Boolean](ts.length)
        (0 to ts.length - n).foreach { i =>
          val g = ts.slice(i, i + n).toSeq
          if (seen.contains(g) || counts(g) >= 2)
            (i until i + n).foreach(covered(_) = true)
        }
        val kept = ts.indices.filterNot(covered).map(ts)
        out(id) = (ts.length.toLong, covered.count(identity).toLong,
          kept.mkString(" "))
      }
      toks.foreach { case (_, ts) =>
        (0 to ts.length - n).foreach(i => seen += ts.slice(i, i + n).toSeq)
      }
    }
    out.toMap
  }

  test("streamed gate with a growing index ≡ sequential reference") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(31, 32)) {
      val rnd = new Random(seed)
      val docs = (0 until 60).map { i =>
        val len = 1 + rnd.nextInt(20)
        (i.toLong, Seq.fill(len)(s"t${rnd.nextInt(5)}").mkString(" "))
      }
      // random micro-batch split
      val batches = mutable.ArrayBuffer.empty[Seq[(Long, String)]]
      var rest = docs.toSeq
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(15)
        batches += rest.take(take)
        rest = rest.drop(take)
      }
      var idx = SpanDedup
        .dupNgramIndex(Seq.empty[(Long, String)].toDF("doc_id", "text"), n)
        .localCheckpoint(true)
      val collected = mutable.Map.empty[Long, (Long, Long, String)]
      val input = MemoryStream[(Long, String)]
      val q = input.toDF().toDF("doc_id", "text")
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.DataFrame, _: Long) =>
            val frozen = idx
            collected ++= SpanDedup.exciseAgainst(frozen, b, n)
              .collect()
              .map(r => r.getLong(0) ->
                ((r.getLong(1), r.getLong(2), r.getString(3))))
            idx = frozen.union(SpanDedup.dupNgramIndex(b, n))
              .distinct().localCheckpoint(true)
            ()
        }.start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      assert(collected.toMap == refGate(batches.toSeq), s"seed=$seed")
    }
  }

  test("a re-arriving span is excised while first arrival survived") {
    implicit val sqlCtx = spark.sqlContext
    val span = (1 to 6).map(i => s"s$i").mkString(" ")
    val b1 = Seq(1L -> s"$span unique tail one")
    val b2 = Seq(2L -> s"other head $span")
    var idx = SpanDedup
      .dupNgramIndex(Seq.empty[(Long, String)].toDF("doc_id", "text"), n)
      .localCheckpoint(true)
    val collected = mutable.Map.empty[Long, String]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch {
        (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val frozen = idx
          collected ++= SpanDedup.exciseAgainst(frozen, b, n)
            .collect().map(r => r.getLong(0) -> r.getString(3))
          idx = frozen.union(SpanDedup.dupNgramIndex(b, n))
            .distinct().localCheckpoint(true)
          ()
      }.start()
    Seq(b1, b2).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    assert(collected(1L) == s"$span unique tail one") // first copy intact
    assert(collected(2L) == "other head")             // later copy excised
  }
}
