package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions with the SQL function registry, so
  * `SELECT float_dot(a, b)` works from plain SQL (and from
  * `SQLTransformer` stages).
  *
  * Wire up with:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.floatDotDescriptor)
    ext.injectFunction(GraftExtensions.minhashSigDescriptor)
  }
}

object GraftExtensions {
  val floatDotDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("float_dot"),
    new ExpressionInfo(classOf[FloatDotProduct].getName, "float_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "float_dot requires exactly 2 arguments")
      FloatDotProduct(children.head, children(1))
    }
  )

  val minhashSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    MinHashExpressions.fromSql _
  )

  /** Register on an already-built session (builder extensions only apply
    * to new sessions; tests and notebooks usually have one already). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Seq(floatDotDescriptor, minhashSigDescriptor).foreach { case (id, info, builder) =>
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }
}
