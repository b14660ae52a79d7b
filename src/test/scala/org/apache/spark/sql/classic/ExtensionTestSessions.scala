package org.apache.spark.sql.classic

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSessionExtensions

/** Test-scope bridge: build a SparkSession over an existing context
  * with a given extensions set applied — the same wiring
  * `spark.sql.extensions` performs at startup — without touching the
  * builder's global default/active session (which races with
  * concurrently-starting suites). The 6-arg constructor is
  * Scala-private but public in bytecode (javap), so the reflective
  * call needs no setAccessible.
  */
object ExtensionTestSessions {
  def withExtensions(sc: SparkContext,
      configure: SparkSessionExtensions => Unit): SparkSession = {
    val ext = new SparkSessionExtensions
    configure(ext)
    val ctor = classOf[SparkSession].getDeclaredConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(sys.error("6-arg SparkSession constructor not found"))
    ctor.newInstance(sc, None, None, ext,
        Map.empty[String, String], Map.empty[String, String])
      .asInstanceOf[SparkSession]
  }
}
