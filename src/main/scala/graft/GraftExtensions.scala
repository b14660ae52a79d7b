package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{CosineSimilarityExpr, FingerprintExpr, SortedIntersectSizeExpr}

/** Standard Spark extensions entry point — lets any deployment load
  * graft's native SQL functions without code changes:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * }}}
  *
  * Injects the same functions `graft.functions.registerAll` installs
  * programmatically (`graft_cosine_sim`, `graft_sorted_intersect_size`,
  * `graft_fingerprint`) into every session built with these
  * extensions — including pure-SQL clients that never touch the Scala
  * API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine_sim"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_cosine_sim takes 2 arguments")
        CosineSimilarityExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSizeExpr].getName,
        "graft_sorted_intersect_size"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 2,
          "graft_sorted_intersect_size takes 2 arguments")
        SortedIntersectSizeExpr(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[FingerprintExpr].getName,
        "graft_fingerprint"),
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_fingerprint takes 1 argument")
        FingerprintExpr(exprs.head)
      }))
  }
}
