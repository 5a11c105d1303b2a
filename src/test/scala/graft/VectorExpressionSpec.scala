package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{GraftExtensions, MinHashKernel, VectorExpressions}

/** Native FloatDotProduct expression: correctness vs the HOF fold it
  * replaced, null handling, and SQL registration via GraftExtensions. */
class VectorExpressionSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(0.5f, -1.5f, 2.5f)),
    (3L, Array(0.0f, 0.0f, 0.0f))
  ).toDF("id", "v")

  test("float_dot matches the interpreted zip_with/aggregate fold bit-for-bit") {
    val out = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        VectorExpressions.floatDot(col("a.v"), col("b.v")).as("native"),
        expr("aggregate(zip_with(a.v, b.v, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)").as("hof"))
      .collect()
    assert(out.length == 9)
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("float_dot of a vector with itself is its squared norm") {
    val n = vecs.where(col("id") === 1)
      .select(VectorExpressions.floatDot(col("v"), col("v"))).head().getDouble(0)
    assert(n == 14.0)
  }

  test("float_dot is null-intolerant (null in -> null out)") {
    val withNull = Seq((1L, Option(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("id", "a", "b")
    val r = withNull.select(VectorExpressions.floatDot(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("float_dot registers as a SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("vex_test")
    val out = spark.sql(
      "SELECT id, float_dot(v, v) AS sq FROM vex_test ORDER BY id").collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(14.0, 8.75, 0.0))
  }

  test("minhash_sig: SQL form matches the kernel; short docs yield empty") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, "alpha beta gamma delta"), (2L, "just two"))
      .toDF("doc_id", "text").createOrReplaceTempView("mh_test")
    val out = spark.sql(
      "SELECT doc_id, minhash_sig(text, 16) AS sig FROM mh_test ORDER BY doc_id")
      .collect()
    val sig1 = out(0).getSeq[Long](1)
    assert(sig1.length == 16)
    assert(sig1 == MinHashKernel.signature("alpha beta gamma delta", 16).toSeq)
    assert(out(1).getSeq[Long](1).isEmpty) // < 3 tokens
    // identical text -> identical signature through the whole SQL path
    val again = spark.sql(
      "SELECT minhash_sig('alpha beta gamma delta', 16)").head().getSeq[Long](0)
    assert(again == sig1)
  }
}
