package graft

import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for named SparkEntry queries into
  * plans/r16/<name>_<suffix>.txt — the optimization round's
  * before/after plan evidence. Test-scoped tooling.
  *
  * Run: `sbt "Test/runMain graft.PlanDump q180_mondrian,q121_hits
  * after /root/testdata/sf0.1"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val suffix = args.lift(1).getOrElse("after")
    val sf = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = core.Sessions.local(appName = "plan-dump")
    // keep fixture stores lazy/inspectable, mirroring graft.Plans
    spark.conf.set("spark.graft.keepFixtureStores", "true")
    Files.createDirectories(Paths.get("plans/r16")): Unit
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r16/${name}_$suffix.txt"),
        s"## $name ($suffix, explain formatted)\n\n$plan\n"): Unit
      println(s"dumped $name -> plans/r16/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
