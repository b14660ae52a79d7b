package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import StatefulInference.{PEvent, Scored}

class StatefulInferenceSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)
  private val coef = Array(0.01, -0.02, 0.5)
  private val intercept = 3.0

  private val events = Seq(
    PEvent(1L, t("2024-01-01 10:00:00"), 100.0),
    PEvent(1L, t("2024-01-02 10:00:00"), 50.0),
    PEvent(1L, t("2024-01-03 10:00:00"), 80.0),
    PEvent(2L, t("2024-01-01 12:00:00"), 10.0),
    PEvent(2L, t("2024-01-02 12:00:00"), 20.0),
  )

  /** Plain-Scala replay of the reference loop (`inference.py:183-225`)
    * — the oracle for the distributed state pipeline.
    */
  private def referenceReplay(evs: Seq[PEvent]): Map[(Long, Long), Double] = {
    var state = Map.empty[Long, StatefulInference.CustomerState]
    evs.sortBy(e => (e.purchase_timestamp.getTime, e.purchase_value)).map { e =>
      val (s2, scored) = StatefulInference.step(coef, intercept)(
        state.get(e.customer_id), e)
      state += e.customer_id -> s2
      (e.customer_id, e.purchase_timestamp.getTime) -> scored.predicted_loyalty_score
    }.toMap
  }

  test("distributed stateful inference == sequential reference replay, any batch split") {
    val expected = referenceReplay(events)
    for (batchSize <- Seq(5, 2, 1)) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[PEvent]
      val q = StatefulInference(input.toDS(), coef, intercept)
        .writeStream.format("memory").queryName(s"si_out_$batchSize")
        .outputMode(OutputMode.Append()).start()
      events.grouped(batchSize).foreach { b =>
        input.addData(b); q.processAllAvailable()
      }
      q.stop()
      val got = spark.table(s"si_out_$batchSize").as[Scored].collect()
        .map(s => (s.customer_id, s.purchase_timestamp.getTime) ->
          s.predicted_loyalty_score).toMap
      assert(got.size == events.size)
      expected.foreach { case (k, v) =>
        assert(math.abs(got(k) - v) < 1e-12, s"batchSize=$batchSize key=$k")
      }
    }
  }

  test("second event's prediction uses the first event's updated state (sequencing)") {
    val expected = referenceReplay(events)
    // hand-check customer 2: e1 pred = .01*10 - .02*10 + .5*0 + 3
    val p1 = 0.01 * 10 - 0.02 * 10 + 0.5 * 0 + 3.0
    assert(math.abs(expected((2L, t("2024-01-01 12:00:00").getTime)) - p1) < 1e-12)
    // e2: avgP = 10 (seeded), avgL = p1 (seeded from pred)
    val p2 = 0.01 * 20 - 0.02 * 10 + 0.5 * p1 + 3.0
    assert(math.abs(expected((2L, t("2024-01-02 12:00:00").getTime)) - p2) < 1e-12)
  }
}
