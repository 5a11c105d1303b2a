package graft

import graft.operators.Analytics

/** The HLL profile sketch twin: estimates inside the rsd envelope of the
  * exact profile, null counts exact (shared plain sums). */
class ProfileSketchSpec extends SparkTestBase {

  test("sketch profile tracks the exact profile within the rsd envelope") {
    val exact = Analytics.profile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = Analytics.profileSketch(spark, sf, rsd = 0.02).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (c, (nRows, nNulls, est)) =>
      val (eRows, eNulls, eDistinct) = exact(c)
      assert(nRows == eRows, s"$c row count")
      assert(nNulls == eNulls, s"$c null count must be exact")
      // HLL++ rsd 0.02: allow a generous 5-sigma-ish envelope (and at
      // least ±2 for tiny cardinalities where the sketch is exact-ish)
      val tol = math.max(2.0, 0.10 * eDistinct)
      assert(math.abs(est - eDistinct) <= tol,
        s"$c: approx $est vs exact $eDistinct (tol $tol)")
    }
  }

  test("verdict gate (r14 re-gate): envelope booleans all true, integers match the exact profile") {
    val exact = Analytics.profile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = Analytics.profileSketchVerdict(spark, sf).collect()
    assert(got.map(_.getString(0)).toSet == exact.keySet)
    got.foreach { r =>
      val c = r.getString(0)
      val (eRows, eNulls, eDistinct) = exact(c)
      assert(r.getAs[Long]("n_rows") == eRows, s"$c n_rows")
      assert(r.getAs[Long]("n_nulls") == eNulls, s"$c n_nulls")
      assert(r.getAs[Long]("n_distinct_exact") == eDistinct, s"$c exact distinct")
      assert(r.getAs[Boolean]("est_within_rsd"), s"$c estimate out of envelope")
    }
  }
}
