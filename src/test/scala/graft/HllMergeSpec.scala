package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Pins the HLL sketch-merge contract the missing DuckDB oracle can't:
  * the sharded-union estimate equals the one-shot sketch estimate
  * (merge loses nothing), and both sit within the lgK=12 rsd envelope
  * of the exact distinct count the gate row carries alongside. */
class HllMergeSpec extends SparkTestBase {

  test("sharded union == one-shot sketch, both within the rsd envelope") {
    val got = Analytics.hllMerge(spark, sf).collect()
    assert(got.nonEmpty)
    val oneShot = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("est"))
      .toMap
    // lgK=12 → rsd ≈ 1.04 / √2^12 ≈ 1.6%; allow 3 standard errors
    val envelope = 3 * 1.04 / math.sqrt(1 << 12)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val est = r.getAs[Long]("est_distinct")
      val exact = r.getAs[Long]("exact_distinct")
      assert(est == oneShot(t),
        s"$t: sharded-union estimate $est != one-shot ${oneShot(t)}")
      assert(math.abs(est - exact).toDouble / exact <= envelope,
        s"$t: |$est - $exact| outside the ${envelope * 100}%% envelope")
      assert(r.getAs[Double]("rel_err") >= 0.0)
    }
  }

  test("verdict gate (r14 re-gate): contract booleans all true, integers exact") {
    val exact = Tables.events(spark, sf).groupBy("event_type")
      .agg(org.apache.spark.sql.functions.countDistinct(col("user_id")).as("d"),
        org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("d"), r.getAs[Long]("n"))).toMap
    val got = Analytics.hllMergeVerdict(spark, sf).collect()
    assert(got.length == exact.size)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Boolean]("merged_eq_oneshot"), s"$t: lossy union")
      assert(r.getAs[Boolean]("est_within_rsd"), s"$t: estimate out of envelope")
      assert(r.getAs[Long]("exact_distinct") == exact(t)._1, s"$t exact_distinct")
      assert(r.getAs[Long]("n_rows") == exact(t)._2, s"$t n_rows")
    }
  }
}
