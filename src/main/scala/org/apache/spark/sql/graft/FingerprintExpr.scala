package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine-portable polynomial string fingerprint
  * (`acc = (acc·31 + ascii(char)) mod 1e9+7`, per character, 0 for
  * the empty string) as a native codegen'd expression.
  *
  * Why: the Column formulation ([[graft.operators.TextAnalysis
  * .fingerprint]]) is `aggregate(transform(sequence(1, length(s)),
  * i -> ascii(substr(s, i, 1))), …)` — three higher-order functions
  * with lambda closures, none codegen-able, allocating a boxed
  * per-character array per ROW. On per-row-heavy hash paths (q122's
  * shingle fingerprints were 3.4× slower through the HOF chain; the
  * typed-loop rewrite in `UrlNorm.mirrorPairs` exists for exactly
  * this) the fold belongs in tight generated code: one byte scan, no
  * allocation, whole-stage-codegen fused with its neighbors.
  *
  * Exact-equivalence contract with the Column form (spec'd on
  * randomized ASCII + multibyte + empty inputs): Spark's `ascii(c)`
  * returns the CODE POINT of the first character (233 for `é`,
  * 26085 for `日` — probed, not assumed), and `substr(s, i, 1)`
  * slices by code point — so an inline UTF-8 code-point decode over
  * the byte array reproduces the per-character fold bit-for-bit
  * with no String allocation. Truncated trailing sequences (cannot
  * occur in Spark-constructed UTF8Strings) terminate the scan.
  */
case class FingerprintExpr(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(s: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xFF
      var cp = 0
      var w = 1
      if (b0 < 0x80) { cp = b0 }
      else if ((b0 & 0xE0) == 0xC0) { cp = b0 & 0x1F; w = 2 }
      else if ((b0 & 0xF0) == 0xE0) { cp = b0 & 0x0F; w = 3 }
      else { cp = b0 & 0x07; w = 4 }
      if (i + w > n) return acc
      var j = 1
      while (j < w) { cp = (cp << 6) | (bytes(i + j) & 0x3F); j += 1 }
      acc = (acc * 31L + cp) % 1000000007L
      i += w
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b0 = ctx.freshName("b0")
      val cp = ctx.freshName("cp")
      val w = ctx.freshName("w")
      val j = ctx.freshName("j")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $acc = 0L;
         |int $n = $bytes.length;
         |int $i = 0;
         |while ($i < $n) {
         |  int $b0 = $bytes[$i] & 0xFF;
         |  int $cp; int $w;
         |  if ($b0 < 0x80) { $cp = $b0; $w = 1; }
         |  else if (($b0 & 0xE0) == 0xC0) { $cp = $b0 & 0x1F; $w = 2; }
         |  else if (($b0 & 0xF0) == 0xE0) { $cp = $b0 & 0x0F; $w = 3; }
         |  else { $cp = $b0 & 0x07; $w = 4; }
         |  if ($i + $w > $n) { break; }
         |  for (int $j = 1; $j < $w; $j++) {
         |    $cp = ($cp << 6) | ($bytes[$i + $j] & 0x3F);
         |  }
         |  $acc = ($acc * 31L + $cp) % 1000000007L;
         |  $i += $w;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): FingerprintExpr = copy(child = newChild)
}

object FingerprintExpr {
  def column(s: Column): Column =
    ExpressionUtils.column(FingerprintExpr(ExpressionUtils.expression(s)))

  /** Register `graft_fingerprint` for the SQL surface. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fingerprint",
      { exprs: Seq[Expression] =>
        require(exprs.length == 1, "graft_fingerprint takes 1 argument")
        FingerprintExpr(exprs.head)
      },
      "built-in")
}
