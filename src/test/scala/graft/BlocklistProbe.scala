package graft

import graft.operators.Blocklist

/** Catalog-size-independence probe (measurement aid, not a spec):
  * times the q169 census over sf0.1 at the 7-pattern fixture catalog
  * vs a 10k-pattern catalog — the automaton walks each character
  * once either way, so the walls should match. Run:
  * `sbt "Test/runMain graft.BlocklistProbe"`; numbers recorded in
  * BASELINE.md.
  */
object BlocklistProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(appName = "blk-probe")
    val docs = graft.core.Tables
      .load(spark, args.headOption.getOrElse("/root/testdata/sf0.1"),
        "documents").cache()
    docs.count()
    val rnd = new scala.util.Random(7)
    val pats10k = (Iterator.continually(
        (1 to (3 + rnd.nextInt(8)))
          .map(_ => ('a' + rnd.nextInt(8)).toChar).mkString)
      .distinct.take(10000).toList ++ Blocklist.q169Patterns).distinct
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
    }
    Blocklist.census(docs, Blocklist.q169Patterns).collect() // warm
    val t7 = Seq.fill(2)(
      time(Blocklist.census(docs, Blocklist.q169Patterns).collect())).min
    val t10k = Seq.fill(2)(
      time(Blocklist.census(docs, pats10k).collect())).min
    println(f"PROBE census sf0.1: 7 pats $t7%.3f s, " +
      f"${pats10k.size} pats $t10k%.3f s")
    spark.stop()
  }
}
