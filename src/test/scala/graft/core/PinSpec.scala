package graft.core

import java.nio.file.Files

import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** The pin-strategy contract (VERDICT r9 #1): reuse pins preserve
  * lineage (executor-loss recoverable), iterative/snapshot pins cut
  * it, snapshot pins survive mutation of their own source, and the
  * reliable-checkpoint path engages exactly when the session has a
  * checkpoint dir.
  */
class PinSpec extends SparkSpec {
  import spark.implicits._

  private def fresh() = (1 to 100).toDF("x")

  test("reuse pin (cluster form) is a lineage-preserving MEMORY_AND_DISK persist") {
    // auto resolves to localCheckpoint under a local master; the
    // cluster form is what `persist` mode forces — prove ITS contract
    spark.conf.set(Pin.ModeKey, "persist")
    try {
      val p = Pin.reuse(fresh())
      assert(p.storageLevel === StorageLevel.MEMORY_AND_DISK)
      assert(p.count() === 100L)
      // lineage retained: the logical plan still roots at the source,
      // not at a scanned-RDD stump — a lost block can recompute
      assert(!p.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
      p.unpersist(): Unit
    } finally spark.conf.unset(Pin.ModeKey)
  }

  test("auto reuse pin under a LOCAL master is a localCheckpoint") {
    // one JVM = no executor to lose; raw row blocks beat the columnar
    // cache 2-4x on task time (measured at sf0.1), so auto keeps the
    // fast form exactly where it is also the safe form
    assert(spark.sparkContext.isLocal)
    val p = Pin.reuse(fresh())
    assert(p.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    assert(p.count() === 100L)
  }

  test("iterative pin cuts lineage (localCheckpoint fallback, no dir)") {
    assert(spark.sparkContext.getCheckpointDir.isEmpty)
    val p = Pin.iterative(fresh())
    assert(p.count() === 100L)
    // lineage cut: plan roots at the checkpointed RDD
    assert(p.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
  }

  test("iterative + snapshot pins use RELIABLE checkpoint when a dir is set") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      for (p <- Seq(Pin.iterative(fresh()), Pin.snapshot(fresh()))) {
        assert(p.count() === 100L)
        assert(p.rdd.toDebugString.contains("ReliableCheckpointRDD"),
          "pin must recover from executor loss via reliable storage")
      }
    } finally spark.sparkContext.setCheckpointDir(null)
  }

  test("snapshot pin survives overwrite of its own source") {
    val src = Files.createTempDirectory("graft-snap").toString
    (1 to 50).toDF("x").write.mode("overwrite").parquet(src)
    val pinned = Pin.snapshot(spark.read.parquet(src))
    // mutate the source AFTER the pin — the read-merge-overwrite shape
    (100 to 102).toDF("x").write.mode("overwrite").parquet(src)
    assert(pinned.count() === 50L)
    assert(pinned.agg(org.apache.spark.sql.functions.sum($"x")).head.getLong(0)
      === (1 to 50).sum.toLong)
  }

  test("snapshot pin NEVER degrades to a lineage-preserving persist") {
    spark.conf.set(Pin.ModeKey, "persist")
    try {
      val p = Pin.snapshot(fresh())
      assert(p.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    } finally spark.conf.unset(Pin.ModeKey)
  }

  test("mode override: spark.graft.pin=localCheckpoint forces the r8 behavior") {
    spark.conf.set(Pin.ModeKey, "localCheckpoint")
    try {
      val p = Pin.reuse(fresh())
      assert(p.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    } finally spark.conf.unset(Pin.ModeKey)
  }

  test("pinned results are value-identical across strategies") {
    val expect = fresh().agg(org.apache.spark.sql.functions.sum($"x"))
      .head.getLong(0)
    for (mode <- Seq("auto", "persist", "localCheckpoint")) {
      spark.conf.set(Pin.ModeKey, mode)
      try {
        assert(Pin.reuse(fresh()).agg(
          org.apache.spark.sql.functions.sum($"x")).head.getLong(0) === expect)
      } finally spark.conf.unset(Pin.ModeKey)
    }
  }
}
