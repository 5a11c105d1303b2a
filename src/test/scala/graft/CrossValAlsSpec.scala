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

  test("frequent itemsets obey downward closure and exact support counts") {
    val out = Pipelines.freqItemsets(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    // anti-monotonicity: a superset never outnumbers its subsets
    for ((set, freq) <- out; (sub, subFreq) <- out
        if sub != set && sub.split('+').forall(set.split('+').contains))
      assert(subFreq >= freq, s"$sub ($subFreq) < $set ($freq)")
    // singleton supports equal direct counts
    val clickUsers = Tables.events(spark, sf)
      .where(col("event_type") === "click").select("user_id").distinct().count()
    out.get("click").foreach(f => assert(f == clickUsers))
  }

  test("word2vec synonyms are deterministic, bounded, and exclude the probe") {
    val a = Pipelines.word2vec(spark, sf).collect()
    val b = Pipelines.word2vec(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "seeded single-partition fit must be bit-reproducible")
    assert(a.length == 5)
    a.foreach { r =>
      assert(r.getString(1) != "spark", "probe is not its own synonym")
      val sim = r.getAs[Double]("similarity")
      assert(sim >= -1.0 - 1e-9 && sim <= 1.0 + 1e-9)
    }
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
