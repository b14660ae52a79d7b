package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Relational

/** The engine's SQL surface: the same queries users write as ANSI SQL
  * over registered views must agree with the DataFrame formulations
  * (one Catalyst plan space — parity is expected, this spec guards
  * the registration path and name contract).
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("spark.sql over registered views == DataFrame API results (q6 shape)") {
    Tables.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT n_name, count(*) AS cnt, sum(o_totalprice) AS total
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""".stripMargin)
      .collect().toSeq
    val df = Relational.q6JoinChain(spark, sf).collect().toSeq
    assert(sql == df && sql.nonEmpty)
  }

  test("spark.sql window dedup == DataFrame latest-per-key (q3 shape)") {
    Tables.registerAll(spark, sf)
    val sql = spark.sql(
      """SELECT user_id, event_id FROM (
        |  SELECT user_id, event_id, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val df = Relational.q3LatestPerKey(spark, sf)
      .select($"user_id", $"event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sql == df && sql.nonEmpty)
  }
}
