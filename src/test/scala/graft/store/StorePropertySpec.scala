package graft.store

import java.nio.file.Files
import java.sql.Timestamp

import scala.util.Random

import graft.SparkSpec
import graft.operators.StateFold

/** Property-style checks (SURVEY.md §5.2-3) over seeded random cases:
  * latest-view newest-wins under arbitrary batch splits, append-only
  * history, and replay-determinism of the order-dependent fold.
  * (Plain seeded generation — the scalatest/scalacheck bridge isn't in
  * the offline dependency cache.)
  */
class StorePropertySpec extends SparkSpec {
  import spark.implicits._

  private def toDf(rows: List[(Long, Int, Double)]) =
    rows.map { case (k, t, v) =>
      (k, new Timestamp(1704067200000L + t * 1000L), v)
    }.toDF("customer_id", "purchase_timestamp", "avg_purchase_value")

  test("property: latest view == newest-wins fold, for random rows and batch splits") {
    val rnd = new Random(42)
    (1 to 8).foreach { _ =>
      // unique (key, ts) pairs so newest-wins is well-defined within a batch
      val rows = rnd.shuffle(
        (for (k <- 1L to 5L; t <- 0 until 20) yield (k, t)).toList)
        .take(1 + rnd.nextInt(25))
        .map { case (k, t) => (k, t, rnd.nextDouble() * 100) }
      val nBatches = 1 + rnd.nextInt(3)
      val fs = FeatureStore(spark,
        Files.createTempDirectory("fs-prop").toString,
        "customer_id", "purchase_timestamp")
      val batches = rows.grouped(
        math.max(1, (rows.size + nBatches - 1) / nBatches)).toList
      batches.foreach(b => fs.putRecords(toDf(b)))
      // expected: per key, max (ts, batch index) wins
      val expected = batches.zipWithIndex
        .flatMap { case (b, i) => b.map { case (k, t, v) => (k, t, i, v) } }
        .groupBy(_._1)
        .map { case (k, rs) => k -> rs.maxBy(r => (r._2, r._3))._4 }
      val got = fs.latestView().collect()
        .map(r => r.getLong(0) -> r.getDouble(2)).toMap
      assert(got == expected, s"rows=$rows batches=${batches.size}")
      assert(fs.offline().count() == rows.size) // append-only history
    }
  }

  test("property: the pairwise fold is replay-deterministic and bounded by min/max") {
    val rnd = new Random(7)
    (1 to 50).foreach { _ =>
      val vs = List.fill(1 + rnd.nextInt(30))(rnd.nextDouble() * 200 - 100)
      val a = StateFold.foldValues(vs)
      assert(a == StateFold.foldValues(vs))
      assert(a >= vs.min - 1e-9 && a <= vs.max + 1e-9)
    }
  }
}
