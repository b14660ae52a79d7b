package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Fused cosine similarity over two `array<double>` columns as a
  * native Catalyst expression with whole-stage codegen: one loop
  * computing dot, |a|², |b|² — no intermediate arrays, no boxing, no
  * UDF serialization. The composable formulation (`zip_with` + three
  * `aggregate`s) allocates a zipped array per pair and walks each
  * input four times; this walks each input once. `array<float>`
  * inputs arrive via an analyzer-inserted implicit cast.
  *
  * Lives under `org.apache.spark.sql` because the Expression→Column
  * bridge (`classic.ExpressionUtils`) and `AbstractDataType` are
  * `private[sql]` — the documented pattern for native expression
  * libraries built against Spark. Public surface:
  * [[graft.functions.cosineSimilarity]].
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xa = x.getDouble(i); val xb = y.getDouble(i)
      dot += xa * xb; na += xa * xa; nb += xb * xb
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa")
      val xb = ctx.freshName("xb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xa = $a.getDouble($i);
         |  double $xb = $b.getDouble($i);
         |  $dot += $xa * $xb; $na += $xa * $xa; $nb += $xb * $xb;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarityExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register `graft_cosine_sim` for the SQL surface of a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine_sim",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2, "graft_cosine_sim takes 2 arguments")
        CosineSimilarityExpr(exprs(0), exprs(1))
      },
      "built-in")
}
