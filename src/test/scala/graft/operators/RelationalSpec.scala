package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("q1 projects 3 columns, all lineitem rows") {
    val df = Relational.q1ScanProject(spark, sf)
    assert(df.columns.toSeq == Seq("l_orderkey", "qty", "l_extendedprice"))
    assert(df.count() > 1000)
  }

  test("q2 yields one row per distinct user (reference tests.py:72-74 invariant)") {
    val df = Relational.q2AggFeatures(spark, sf).cache()
    val users = graft.core.Tables.load(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(df.count() == users)
    assert(df.columns.toSeq ==
      Seq("user_id", "last_ts", "avg_value", "latest_value", "n"))
  }

  test("q2 latest_value equals the value at max ts per user") {
    val e = graft.core.Tables.load(spark, sf, "events")
    val expected = e.join(
      e.groupBy($"user_id").agg(max($"ts").as("ts")), Seq("user_id", "ts"))
      .select($"user_id", $"value".as("latest_value"))
    val got = Relational.q2AggFeatures(spark, sf)
      .select($"user_id", $"latest_value")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
  }

  test("q3 latest-per-key: one row per user, ts is that user's max") {
    val df = Relational.q3LatestPerKey(spark, sf).cache()
    assert(df.select($"user_id").distinct().count() == df.count())
    val maxTs = graft.core.Tables.load(spark, sf, "events")
      .groupBy($"user_id").agg(max($"ts").as("ts"))
    assert(df.select($"user_id", $"ts").except(maxTs).isEmpty)
  }

  test("q4 enrich: every event present; defaults branch never fires when history exists") {
    val df = Relational.q4EnrichJoin(spark, sf).cache()
    val n = graft.core.Tables.load(spark, sf, "events").count()
    assert(df.count() == n)
    assert(df.filter($"hist_n" === 0).count() == 0) // self-join: all keys have history
  }

  test("q5 exists + not_exists partition the orders table") {
    val ex = Relational.q5Exists(spark, sf).head().getLong(0)
    val nex = Relational.q5NotExists(spark, sf).head().getLong(0)
    val total = graft.core.Tables.load(spark, sf, "orders").count()
    assert(ex + nex == total && ex > 0)
  }

  test("q6 join chain groups by nation in ASIA") {
    val rows = Relational.q6JoinChain(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5) // 5 nations per region
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("q8 topk descending, 10 rows") {
    val prices = Relational.q8TopK(spark, sf).collect().map(_.getDouble(1))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q9 ISO format has microsecond precision") {
    val iso = Relational.q9TsFormat(spark, sf).head().getString(1)
    assert(iso.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}Z"""))
  }

  test("q10 window: prev_value is null on first row per user, run_avg matches prefix") {
    val df = Relational.q10WindowAnalytics(spark, sf).cache()
    val firstPerUser = df.groupBy($"user_id").agg(count(lit(1)).as("c"),
      count($"prev_value").as("nonNullPrev"))
    // exactly one null prev per user
    assert(firstPerUser.filter($"c" =!= $"nonNullPrev" + 1).count() == 0)
  }

  test("q11 except: returned customers have no orders") {
    val noOrders = Relational.q11Except(spark, sf)
    val o = graft.core.Tables.load(spark, sf, "orders")
      .select($"o_custkey".as("c_custkey"))
    assert(noOrders.intersect(o).isEmpty)
  }

  test("q12 rollup emits detail + subtotal + grand-total rows") {
    val rows = Relational.q12Rollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val detailN = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(4)).sum
    assert(grand.head.getLong(4) == detailN)
  }

  test("q13 doc stats covers all langs") {
    val langs = Relational.q13DocStats(spark, sf).collect().map(_.getString(0))
    assert(langs.length == langs.distinct.length && langs.nonEmpty)
  }

  test("q13 json extract parses props.k as numeric string") {
    val ks = Relational.q13JsonExtract(spark, sf).collect()
    assert(ks.forall(r => r.getString(1) != null && r.getString(1).forall(_.isDigit)))
  }
}
