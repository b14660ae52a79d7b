package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.operators.Privacy

/** [[StreamingCensus]] — the incremental k-anonymity / l-diversity
  * census (r14 verdict missing #7): the house batch ≡ stream
  * contract. The LAST emitted census row per quasi group after any
  * micro-batch split must equal the batch census over everything
  * ingested, and the census REFRESHES as groups grow (a group that
  * was k-risky after batch 1 can turn safe in batch 2 without a
  * corpus re-scan).
  */
class StreamingCensusSpec extends SparkSpec {
  import spark.implicits._
  import StreamingCensus.Obs

  private val rows = Seq(
    // (nation, segment, sens) — mirrors PrivacySpec's fixture, with
    // a NULL quasi group and a repeated sensitive value
    ("US", "AUTO", 1L), ("US", "AUTO", 1L), ("US", "AUTO", 2L),
    ("US", "BIKE", 1L),
    ("DE", "AUTO", 1L), ("DE", "AUTO", 2L), ("DE", "AUTO", 3L),
    (null, "AUTO", 9L), (null, "AUTO", 9L))

  /** Batch census re-keyed on the stream's encoded quasi string so
    * the two sides compare directly.
    */
  private def batchCensus(data: Seq[(String, String, Long)], k: Long,
      l: Long): Map[String, (Long, Long, Boolean, Boolean)] = {
    val df = data.toDF("nation", "segment", "sens")
    Privacy.kAnonymityCensus(df, Seq("nation", "segment"), $"sens", k, l)
      .withColumn("quasi", concat_ws("\u0001",
        coalesce($"nation", lit("\u0002")),
        coalesce($"segment", lit("\u0002"))))
      .select($"quasi", $"group_n", $"l_div", $"k_risk", $"l_risk")
      .as[(String, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }

  private def lastPerKey(table: String)
      : Map[String, (Long, Long, Boolean, Boolean)] =
    spark.table(table)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
      .groupBy(_._1)
      .map { case (q, rs) =>
        // group counts only grow, so max group_n = latest emission
        // (no reliance on the memory sink's row order)
        val last = rs.maxBy(_._2)
        q -> ((last._2, last._3, last._4, last._5))
      }

  test("batch === stream across micro-batch splits, including the " +
      "NULL quasi group; census rows refresh as groups grow") {
    implicit val sqlCtx = spark.sqlContext
    val obs = StreamingCensus.observations(
      rows.toDF("nation", "segment", "sens"),
      Seq("nation", "segment"), $"sens").collect().toSeq
    for ((split, i) <- Seq(3, 5, rows.size).zipWithIndex) {
      val input = MemoryStream[Obs]
      val name = s"census_out_$i"
      val q = StreamingCensus(input.toDS(), k = 3L, l = 2L)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update()).start()
      input.addData(obs.take(split)); q.processAllAvailable()
      if (split < obs.size) {
        input.addData(obs.drop(split)); q.processAllAvailable()
      }
      q.stop()
      assert(lastPerKey(name) === batchCensus(rows, 3L, 2L),
        s"split after $split")
    }
  }

  test("a group crosses from k-risky to safe across batches without " +
      "a re-scan — the emitted row is the refreshed census") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Obs]
    val q = StreamingCensus(input.toDS(), k = 3L, l = 2L)
      .writeStream.format("memory").queryName("census_grow")
      .outputMode(OutputMode.Update()).start()
    val g = (s: Long) => Obs("US\u0001AUTO", s.toString)
    input.addData(g(1)); q.processAllAvailable()
    input.addData(g(1), g(2)); q.processAllAvailable()
    q.stop()
    val emitted = spark.table("census_grow")
      .collect().map(r => (r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4))).sortBy(_._1).toSeq
    // batch 1: n=1, l_div=1 -> both risky; batch 2: n=3, l_div=2 -> safe
    assert(emitted === Seq((1L, 1L, true, true), (3L, 2L, false, false)))
  }

  test("NULL sensitive counts as one value, matching the batch census") {
    implicit val sqlCtx = spark.sqlContext
    val df = Seq(("US", "AUTO", Option.empty[Long]),
      ("US", "AUTO", Some(5L)), ("US", "AUTO", Option.empty[Long]))
      .toDF("nation", "segment", "sens")
    val obs = StreamingCensus.observations(df,
      Seq("nation", "segment"), col("sens")).collect().toSeq
    val input = MemoryStream[Obs]
    val q = StreamingCensus(input.toDS(), k = 2L, l = 2L)
      .writeStream.format("memory").queryName("census_null_sens")
      .outputMode(OutputMode.Update()).start()
    input.addData(obs); q.processAllAvailable()
    q.stop()
    val got = lastPerKey("census_null_sens")
    // n=3, distinct sensitive = {NULL, 5} = 2 values
    assert(got.values.toSeq === Seq((3L, 2L, false, false)))
  }
}
