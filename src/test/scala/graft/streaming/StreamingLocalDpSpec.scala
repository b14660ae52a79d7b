package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.LocalDp

/** Streaming local DP — [[LocalDp.rrReport]] is per-row against a
  * fixed dictionary, so the reported counts maintain themselves as a
  * plain streaming aggregation and [[LocalDp.estimates]] over the
  * maintained table is the batch release: batch ≡ stream across
  * micro-batch splits, the house contract.
  */
class StreamingLocalDpSpec extends SparkSpec {
  import spark.implicits._

  private val cats = IndexedSeq("c0", "c1", "c2", "c3")
  private val rows: Seq[(String, Long)] =
    (0L until 900L).map(i => (s"c${i % 4}", i)) :+ (("outside", 9999L))

  test("stream-maintained reported counts == batch at every split; " +
      "estimates over the maintained table == the batch release; " +
      "out-of-dictionary rows are dropped, not transported") {
    implicit val sqlCtx = spark.sqlContext
    val batchDf = rows.toDF("cat", "rk")
    val expectedCounts = LocalDp.rrReport(batchDf, $"cat", $"rk",
        cats, 1000000L, 21L)
      .groupBy("category").count()
      .as[(String, Long)].collect().toSeq.sorted
    val expectedRelease = LocalDp.rrFrequency(
        batchDf.filter($"cat" =!= "outside"), $"cat", $"rk",
        epsilonTicks = 1000000L, seed = 21L)
      .as[(String, Long, Long)].collect().toSeq.sorted
    for ((split, i) <- Seq(200, 700, rows.size).zipWithIndex) {
      val input = MemoryStream[(String, Long)]
      val name = s"ldp_counts_$i"
      val q = LocalDp.rrReport(input.toDF().toDF("cat", "rk"),
          $"cat", $"rk", cats, 1000000L, 21L)
        .groupBy("category").agg(count(lit(1)).as("reported_n"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      input.addData(rows.take(split)); q.processAllAvailable()
      if (split < rows.size) {
        input.addData(rows.drop(split)); q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (c, rs) => (c, rs.map(_._2).max) }
        .toSeq.sorted
      assert(got == expectedCounts, s"split after $split")
      val release = LocalDp.estimates(
          got.toDF("category", "reported_n"), 900L, cats, 1000000L)
        .as[(String, Long, Long)].collect().toSeq.sorted
      assert(release == expectedRelease, s"release after split $split")
    }
  }
}
