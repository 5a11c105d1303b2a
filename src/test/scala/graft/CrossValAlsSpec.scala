package graft

import org.apache.spark.sql.functions._
import graft.ml.Pipelines

/** Model-selection (CrossValidator) and ALS recommendation contracts —
  * seeded JVM fits, so spec-pinned rather than oracled. */
class CrossValAlsSpec extends SparkTestBase {

  test("cross-validation scores every grid point and flags exactly one winner") {
    val out = Pipelines.crossValidate(spark, sf).collect()
    assert(out.length == 4, s"2x2 grid must give 4 rows, got ${out.length}")
    val chosen = out.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.length == 1, "exactly one grid point is chosen")
    val best = chosen.head.getAs[Double]("cv_rmse")
    out.foreach(r => assert(best <= r.getAs[Double]("cv_rmse") + 1e-12))
    out.foreach { r =>
      val rmse = r.getAs[Double]("cv_rmse")
      assert(!rmse.isNaN && rmse > 0, s"rmse must be finite positive: $rmse")
    }
    // rerun is bit-identical (seeded folds + seeded fits)
    val again = Pipelines.crossValidate(spark, sf).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("ALS covers every interacting user with one top-1 recommendation") {
    val out = Pipelines.alsRecommend(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 5)
    val covered = out.map(_.getAs[Long]("n_users_top1")).sum
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(covered == users,
      s"every interacting user gets a rec: covered=$covered users=$users")
    out.foreach(r => assert(r.getAs[Long]("n_users_top1") > 0))
  }
}
