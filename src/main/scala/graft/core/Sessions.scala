package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory (SURVEY.md §7.1): one place for the engine's
  * execution defaults — UTC timestamps (oracle parity), shuffle
  * parallelism sized to local cores (not the 200 default), AQE left
  * on for runtime re-planning, graft's native SQL functions
  * registered.
  */
object Sessions {

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // keep bucketed scans bucketed: the auto-disable rule only looks
      // at join/agg distribution needs and would drop bucket PRUNING
      // for filter-only plans — the store's point-lookup path
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)
    spark
  }
}
