package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared JVM kernel for the banded-minhash signature: tokenize (trim →
  * lower → \s+ split, mirroring TextAnalytics.tokens), FNV-1a hash each
  * distinct 3-token shingle, fold min over k splitmix64-mixed variants.
  * Static so generated code can call it directly (the StaticInvoke
  * pattern): the whole signature stage stays inside whole-stage codegen
  * on Tungsten rows — no Dataset object ser/de boundary, which is the
  * cost the typed-map formulation paid on every row.
  */
object MinHashKernel {
  private final val GOLD = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer (public-domain constants). */
  def mix64(z0: Long): Long = {
    var z = z0 + GOLD
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over a string. */
  def fnv64(str: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < str.length) { h ^= str.charAt(i).toLong; h *= 0x100000001B3L; i += 1 }
    h
  }

  // seeds depend only on k — cache the last one (k is a per-query literal)
  @volatile private var seedCache: (Int, Array[Long]) = (0, Array.empty)

  def seeds(k: Int): Array[Long] = {
    val c = seedCache
    if (c._1 == k) c._2
    else {
      val s = Array.tabulate(k)(i => mix64(0xC0FFEE1234567891L + i.toLong * GOLD))
      seedCache = (k, s)
      s
    }
  }

  /** Spark-parity trim: `trim(col)` strips only ASCII spaces (0x20),
    * unlike Java String.trim which strips every char <= 0x20 — tabs and
    * newlines at the edges must survive so the tokenization matches
    * TextAnalytics.tokens exactly. */
  private def sparkTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** k-wide signature; EMPTY array for documents with < 3 tokens (callers
    * filter on size, matching the typed form's skip). Tokenization is
    * bit-parity with `split(lower(trim(text)), "\\s+")`: space-only trim
    * and limit -1 (Spark's split keeps trailing empty strings). */
  def signature(text: String, k: Int): Array[Long] = {
    val toks = sparkTrim(text).toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    if (toks.length < 3) return Array.emptyLongArray
    val sd = seeds(k)
    val seen = new java.util.HashSet[Long]()
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i + 2 < toks.length) {
      val sh = fnv64(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      if (seen.add(sh)) {
        var j = 0
        while (j < k) {
          val v = mix64(sh ^ sd(j))
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    sig
  }

  /** Codegen entry point: UTF8String in, Tungsten array out. */
  def signatureArrayData(text: UTF8String, k: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(signature(text.toString, k))
}

/** `minhash_sig(text, k)` — native expression form of the signature
  * stage. The generated code is one static call on the Tungsten-backed
  * UTF8String; interpreted eval matches it exactly. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashKernel.signatureArrayData(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MinHashKernel.signatureArrayData($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpressions {
  /** Column-level minhash signature (codegen'd). */
  def minhashSig(text: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(text), k))

  /** SQL registry builder: `minhash_sig(text, k)` with a literal int k. */
  def fromSql(children: Seq[Expression]): Expression = {
    require(children.length == 2, "minhash_sig requires exactly 2 arguments")
    val k = children(1) match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"minhash_sig: k must be an integer literal, got $other")
    }
    MinHashSig(children.head, k)
  }
}
