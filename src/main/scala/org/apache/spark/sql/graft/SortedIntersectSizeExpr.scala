package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/** |A ∩ B| for two SORTED-ascending distinct `array<bigint>` columns as
  * a native codegen'd expression: one linear merge scan, no per-row
  * hash-set allocation. The built-in `size(array_intersect(a, b))`
  * builds an OpenHashSet per row and materializes the intersection
  * array just to count it — on the near-dup verify path that is the
  * per-candidate hot loop (millions of candidate pairs × ~10²-element
  * shingle sets).
  *
  * Precondition: both inputs sorted ascending with distinct elements
  * (the shape [[graft.operators.NearDup.shingleHashSets]] emits).
  * Duplicates would count min-multiplicity matches; unsorted input
  * gives an undercount — callers own the contract. NULL elements are
  * skipped during the merge and counted as one match iff BOTH sides
  * contain one — `size(array_intersect(…))` semantics (null equals
  * null there) — rather than being read as garbage zeros.
  */
case class SortedIntersectSizeExpr(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    var i = 0; var j = 0; var c = 0
    var nullA = false; var nullB = false
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) { nullA = true; i += 1 }
      else if (y.isNullAt(j)) { nullB = true; j += 1 }
      else {
        val xa = x.getLong(i); val yb = y.getLong(j)
        if (xa < yb) i += 1
        else if (xa > yb) j += 1
        else { c += 1; i += 1; j += 1 }
      }
    }
    while (i < nx) { if (x.isNullAt(i)) nullA = true; i += 1 }
    while (j < ny) { if (y.isNullAt(j)) nullB = true; j += 1 }
    if (nullA && nullB) c + 1 else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      val na = ctx.freshName("nullA")
      val nb = ctx.freshName("nullB")
      s"""
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |boolean $na = false, $nb = false;
         |while ($i < $nx && $j < $ny) {
         |  if ($a.isNullAt($i)) { $na = true; $i++; }
         |  else if ($b.isNullAt($j)) { $nb = true; $j++; }
         |  else {
         |    long $xa = $a.getLong($i);
         |    long $yb = $b.getLong($j);
         |    if ($xa < $yb) { $i++; }
         |    else if ($xa > $yb) { $j++; }
         |    else { $c++; $i++; $j++; }
         |  }
         |}
         |while ($i < $nx) { if ($a.isNullAt($i)) $na = true; $i++; }
         |while ($j < $ny) { if ($b.isNullAt($j)) $nb = true; $j++; }
         |${ev.value} = ($na && $nb) ? $c + 1 : $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSizeExpr {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedIntersectSizeExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Register `graft_sorted_intersect_size` for the SQL surface. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_size",
      { exprs: Seq[Expression] =>
        require(exprs.length == 2,
          "graft_sorted_intersect_size takes 2 arguments")
        SortedIntersectSizeExpr(exprs(0), exprs(1))
      },
      "built-in")
}
