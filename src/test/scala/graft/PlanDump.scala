package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for named SparkEntry queries into
  * plans/<round>/<name>_<suffix>.txt — the optimization round's
  * before/after plan evidence. Test-scoped tooling.
  *
  * Run: `sbt "Test/runMain graft.PlanDump q180_mondrian,q121_hits
  * after /root/testdata/sf0.1 r17"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val suffix = args.lift(1).getOrElse("after")
    val sf = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val round = args.lift(3).getOrElse("r17")
    val spark = core.Sessions.local(appName = "plan-dump")
    // keep fixture stores lazy/inspectable, mirroring graft.Plans
    spark.conf.set("spark.graft.keepFixtureStores", "true")
    Files.createDirectories(Paths.get(s"plans/$round")): Unit
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/$round/${name}_$suffix.txt"),
        s"## $name ($suffix, explain formatted)\n\n$plan\n"): Unit
      println(s"dumped $name -> plans/$round/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
