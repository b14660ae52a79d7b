package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The `spark.sql.extensions` entry point installs graft's native SQL
  * functions in a session no Scala code ever touched.
  *
  * The session under test is constructed directly over the shared
  * SparkContext with the extensions applied (the same wiring
  * `spark.sql.extensions=graft.GraftExtensions` performs at startup)
  * — sidestepping the builder's global default-session state, which
  * races with concurrently-starting suites.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extensions-loaded session answers graft SQL functions") {
    val s = org.apache.spark.sql.classic.ExtensionTestSessions
      .withExtensions(spark.sparkContext, new GraftExtensions().apply)
    val cos = s.sql(
      "SELECT graft_cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS s")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val co = s.sql(
      "SELECT graft_sorted_intersect_size(array(1L, 3L, 5L), array(3L, 5L, 9L)) AS c")
      .head().getInt(0)
    assert(co == 2)
    val fp = s.sql("SELECT graft_fingerprint('x') AS f").head().getLong(0)
    assert(fp == 120L)
    // a plain session over the same context does NOT see the
    // functions — they came from the extensions, not global state
    val plain = spark.newSession()
    intercept[org.apache.spark.sql.AnalysisException] {
      plain.sql("SELECT graft_cosine_sim(array(1.0d), array(1.0d))").head()
    }
  }
}
