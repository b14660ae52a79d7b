package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Ranks.globalRowNumber]] — the distributed rank must be
  * row-for-row identical to the single-window `row_number` it
  * replaces, at every partition count, and its busiest window task
  * must stay bounded under a planted hot leading key (the property
  * the single-reducer shape fails by construction: there EVERY row
  * lands in one task).
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // hot leading key: 40% of rows share k=1 (the SkewStressSpec
  // regime); id is the unique tie-breaker that makes the order total
  private def fixture(n: Long) = spark.range(n).select(
    when(pmod(col("id"), lit(5)) < 2, lit(1L))
      .otherwise(pmod(col("id") * 37, lit(997))).as("k"),
    col("id"))

  test("globalRowNumber == unpartitioned row_number, at 1 / 4 / 13 " +
      "range partitions (ranks are a pure function of the rows)") {
    val df = fixture(5000L)
    val expected = df.withColumn("rk", row_number().over(
        Window.orderBy(col("k").desc, col("id"))).cast("long"))
      .orderBy(col("id")).collect()
    for (p <- Seq(1, 4, 13)) {
      val got = Ranks.globalRowNumber(df,
          Seq(col("k").desc, col("id")), "rk", partitions = p)
        .orderBy(col("id")).collect()
      assert(got.toSeq == expected.toSeq, s"partitions=$p")
    }
  }

  test("empty input ranks to an empty frame") {
    val df = fixture(0L)
    assert(Ranks.globalRowNumber(df, Seq(col("id")), "rk").count() == 0L)
  }

  test("the rank window never funnels the data through one task: " +
      "under the 40% hot key the busiest window task reads <= 2x the " +
      "median (ties split across range partitions by the tie-breaker)") {
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    val rows = ArrayBuffer.empty[(Int, Long)]
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) rows.synchronized {
          rows += ((te.stageId,
            te.taskMetrics.shuffleReadMetrics.recordsRead)): Unit
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Ranks.globalRowNumber(fixture(40000L),
        Seq(col("k").desc, col("id")), "rk", partitions = 16).count()
      var last = -1; var stableMs = 0
      while (stableMs < 300) {
        Thread.sleep(50)
        val now = rows.synchronized(rows.size)
        if (now == last) stableMs += 50
        else { stableMs = 0; last = now }
      }
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
    // the stage that read the most shuffle rows is the rank stage
    // (40k rows through hashpartitioning(_rnk_pid)); the offsets
    // stage reads <= 16
    val stage = rows.synchronized(rows.toSeq).groupBy(_._1)
      .maxBy(_._2.map(_._2).sum)._2.map(_._2).filter(_ > 0)
    val busiest = stage.max
    val median = stage.sorted.apply(stage.size / 2)
    assert(busiest <= 2 * math.max(median, 1L),
      s"rank stage skewed: busiest=$busiest median=$median tasks=$stage")
  }

  test("plan shape: the only unpartitioned window runs over the " +
      "partition-count-sized offsets frame; the data window is " +
      "partitioned by the range-bucket id") {
    val df = Ranks.globalRowNumber(fixture(2000L),
      Seq(col("k").desc, col("id")), "rk", partitions = 8)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("windowspecdefinition(_rnk_pid"),
      s"data rank must window per range bucket:\n$p")
    // the offsets window is the one orderBy-first spec; its input is
    // the groupBy(_rnk_pid) count frame (<= partitions rows)
    val unpart =
      """windowspecdefinition\(_rnk_pid#\d+ ASC""".r.findFirstIn(p)
    assert(unpart.isDefined,
      s"offsets running sum should order by _rnk_pid:\n$p")
  }
}
