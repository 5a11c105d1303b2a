package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding hot path.
  *
  * `aggregate(zip_with(a, b, ...))` higher-order functions are
  * CodegenFallback (interpreted, per-element lambda invocation + boxing);
  * on the ANN path that interpreted fold was the bottleneck (~10×). This
  * BinaryExpression emits a tight primitive Java loop through whole-stage
  * codegen instead. Accumulation is sequential in double — bit-identical
  * to the HOF fold it replaces, so DuckDB oracle comparisons are
  * unaffected.
  *
  * Lives under org.apache.spark.sql because the Column⇄Expression bridge
  * (classic.ExpressionUtils) and AbstractDataType are private[sql] — the
  * standard placement for third-party native expressions.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable regardless of children: mismatched array lengths yield null
  // (keeps ev.isNull assignable in the generated code)
  override def nullable: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // mismatched lengths -> null, matching the zip_with/aggregate fold
    // this replaces (zip_with null-pads the shorter side, nulling the
    // sum): a truncated embedding must surface, not silently rank wrong
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-level dot product over two array<float> columns (codegen'd). */
  def floatDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
