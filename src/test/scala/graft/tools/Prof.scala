package graft.tools

import graft.operators._
import graft.core.Tables

/** Ad-hoc single-operator timing harness (test scope):
  * `sbt "Test/runMain graft.tools.Prof [sfDir]"`. Not part of the
  * engine; Bench.scala is the driver-contract benchmark.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local(appName = "graft-prof")
    val docs = Tables.load(spark, dir, "documents")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"TIMING $name%-30s ${(System.nanoTime - t0) / 1e9}%.2f s rows=$n")
    }
    docs.count()
    time("shingleSets")(NearDup.shingleHashSets(docs).count())
    time("shingleSets2")(NearDup.shingleHashSets(docs).count())
    time("q18_new")(NearDup.q18NgramJaccard(spark, dir).count())
    time("q18_new2")(NearDup.q18NgramJaccard(spark, dir).count())
    time("q28_new")(MinHashDedup.nearDupPairs(docs, maxDistance = 0.5).count())
    time("q28_new2")(MinHashDedup.nearDupPairs(docs, maxDistance = 0.5).count())
    time("q28_cand")(MinHashDedup.candidatePairs(docs).count())
    time("q29_new")(SimHash.nearDupPairs(docs, maxHamming = 3).count())
    spark.stop()
  }
}
