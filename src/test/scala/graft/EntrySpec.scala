package graft

/** Driver-contract smoke: `SparkEntry.entry` must return rows on
  * sf0.001 (the driver's t1 check), and every `oracleSql` key must
  * have a matching `queries` entry.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys; every query runs on sf0.001") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name) // executes the full plan; no exceptions
    }
  }
}
