package graft.operators

import graft.SparkSpec

class StateFoldSpec extends SparkSpec {
  import spark.implicits._

  test("foldValues reproduces the reference pairwise average (feature_store_manager.py:260-264)") {
    // a1 = 10; a2 = (10+20)/2 = 15; a3 = (15+30)/2 = 22.5
    assert(StateFold.foldValues(Seq(10.0, 20.0, 30.0)) == 22.5)
    assert(StateFold.foldValues(Seq(7.0)) == 7.0) // cold start: avg = value
  }

  test("pairwise_avg UDAF == mapGroups fold (q14b == q14)") {
    val a = StateFold.q14StateFold(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val b = StateFold.q14bUdafFold(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(a == b)
  }

  test("q14 distributed fold matches a driver-side sequential replay") {
    val got = StateFold.q14StateFold(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val replay = graft.core.Tables.load(spark, sf, "events")
      .select($"user_id", $"ts", $"event_id", $"value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._2.getTime, t._2.getNanos, t._3))
      .groupBy(_._1)
      .map { case (uid, evs) =>
        (uid, (StateFold.foldValues(evs.map(_._4).toSeq), evs.length.toLong))
      }
    assert(got == replay)
  }
}
