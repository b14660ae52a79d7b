package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.DpPrefix

/** Streaming continual release — the binary mechanism's node table is
  * a plain mergeable aggregation, so [[DpPrefix.nodeCounts]] runs on
  * a stream unchanged (Update mode) and [[DpPrefix.releases]] over
  * the maintained table IS the batch release: the house batch ≡
  * stream contract, by construction, verified here across micro-batch
  * splits.
  */
class StreamingDpPrefixSpec extends SparkSpec {
  import spark.implicits._

  private val ticks: Seq[Long] =
    (0L until 200L).map(i => (i * 37 % 293) + 1)

  private def latestNodes(table: String) =
    spark.table(table).collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1)
      // node counts only grow: max = the latest Update emission
      .map { case (k, rs) => (k._1, k._2, rs.map(_._2).max) }
      .toSeq

  test("stream-maintained node counts == batch at every micro-batch " +
      "split; releases over the maintained table == the batch release") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = ticks.toDF("tick")
    val expectedNodes = DpPrefix.nodeCounts(batchDf, $"tick", 9)
      .as[(Int, Long, Long)].collect().toSeq.sorted
    val expectedRelease = DpPrefix.dpPrefixCounts(batchDf, $"tick",
        levels = 9, epsilonTicks = 2000000L, seed = 11L)
      .as[(Long, Long)].collect().toSeq.sorted
    for ((split, i) <- Seq(50, 128, ticks.size).zipWithIndex) {
      val input = MemoryStream[Long]
      val name = s"dpp_nodes_$i"
      val q = DpPrefix.nodeCounts(input.toDF().toDF("tick"), $"tick", 9)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      input.addData(ticks.take(split)); q.processAllAvailable()
      if (split < ticks.size) {
        input.addData(ticks.drop(split)); q.processAllAvailable()
      }
      q.stop()
      val got = latestNodes(name)
      assert(got.sorted == expectedNodes, s"split after $split")
      val release = DpPrefix.releases(
          got.toDF("_l", "_j", "_n"), 9, 2000000L, 11L)
        .as[(Long, Long)].collect().toSeq.sorted
      assert(release == expectedRelease, s"release after split $split")
    }
  }
}
