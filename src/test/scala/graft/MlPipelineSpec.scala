package graft

import org.apache.spark.sql.functions._
import graft.etl.SensorEtl
import graft.ml.Pipelines

/** ML pipeline smoke tests (SURVEY.md §5.4): metrics finite and above a
  * floor, deterministic seeds, save/load round-trip (exercised inside
  * Pipelines.classification itself). */
class MlPipelineSpec extends SparkTestBase {

  test("flagship ETL wide table: static schema, no nulls after fill") {
    val wide = SensorEtl.wide(spark, sf)
    assert(wide.columns.toSet ==
      Set("code_id", "user_id", "day", "click", "error", "purchase", "view", "code_name"))
    val anyNull = wide.columns.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c))
    val counts = wide.agg(anyNull.head, anyNull.tail: _*).collect().head
    assert((0 until counts.length).forall(i => counts.getLong(i) == 0L))
  }

  test("PCA: descending explained variance, unit-norm sign-normalized loadings") {
    val out = Pipelines.pca(spark, sf).collect().sortBy(_.getAs[Int]("component"))
    assert(out.length == 2)
    val ev = out.map(_.getAs[Double]("explained_variance"))
    assert(ev(0) >= ev(1) && ev.forall(v => v >= 0.0 && v <= 1.0) && ev.sum <= 1.0 + 1e-9)
    out.foreach { r =>
      val l = Array("load_click", "load_error", "load_purchase", "load_view")
        .map(r.getAs[Double])
      assert(math.abs(math.sqrt(l.map(x => x * x).sum) - 1.0) < 1e-6)
      assert(l(l.indices.maxBy(i => math.abs(l(i)))) > 0.0) // sign-normalized
    }
  }

  test("PCA verdict gate (r14 re-gate): covariance matches a brute-force recompute, eigensolve booleans true") {
    val out = Pipelines.pcaVerdict(spark, sf).collect()
      .sortBy(_.getAs[Int]("component"))
    assert(out.length == 2)
    // brute-force sample covariance from the collected wide cells
    val feats = Array("click", "error", "purchase", "view")
    val rows = SensorEtl.wide(spark, sf)
      .select(feats.map(org.apache.spark.sql.functions.col).toSeq: _*)
      .collect().map(r => feats.indices.map(r.getAs[Double]).toArray)
    val n = rows.length
    val mean = feats.indices.map(i => rows.map(_(i)).sum / n)
    def bf(i: Int, j: Int): Double =
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / (n - 1)
    val names = for { i <- feats.indices; j <- i until feats.length }
      yield (s"cov_${feats(i)}_${feats(j)}", i, j)
    out.foreach { r =>
      names.foreach { case (nm, i, j) =>
        val got = r.getAs[Double](nm)
        assert(math.abs(got - bf(i, j)) <= 1e-6 * (math.abs(bf(i, j)) + 1),
          s"$nm: $got vs brute-force ${bf(i, j)}")
      }
      assert(r.getAs[Boolean]("resid_ok"), "C*v = lambda*v residual broke")
      assert(r.getAs[Boolean]("unit_ok"), "loading not unit-norm")
      assert(r.getAs[Boolean]("orth_ok"), "loadings not orthogonal")
      assert(r.getAs[Boolean]("ratio_ok"), "explained-variance ratios off")
      val tr = r.getAs[Double]("trace")
      val bfTrace = bf(0, 0) + bf(1, 1) + bf(2, 2) + bf(3, 3)
      assert(math.abs(tr - bfTrace) <= 1e-6 * (bfTrace + 1))
    }
  }

  test("classification pipeline (MLP + save/load) yields a finite f1") {
    val out = Pipelines.classification(spark, sf).collect()
    assert(out.nonEmpty)
    val f1 = out.head.getAs[Double]("f1")
    assert(java.lang.Double.isFinite(f1) && f1 >= 0.0 && f1 <= 1.0)
  }

  test("regression pipeline (GBT) yields finite rmse and importances summing to ~1") {
    val metrics = Pipelines.regression(spark, sf).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(java.lang.Double.isFinite(metrics("rmse")) && metrics("rmse") >= 0.0)
    val impSum = metrics.collect { case (k, v) if k.startsWith("importance_") => v }.sum
    assert(math.abs(impSum - 1.0) < 1e-6 || impSum == 0.0)
  }

  test("SQLTransformer stage derives the ratio feature") {
    val out = Pipelines.sqlTransformer(spark, sf)
    assert(out.columns.contains("view_click_ratio"))
    assert(out.where(col("view_click_ratio").isNull).count() == 0)
  }

  test("seeded randomSplit is reproducible (X1 fixed)") {
    val df = Tables.events(spark, sf)
    val a = df.randomSplit(Array(0.75, 0.25), seed = 42L)(0).count()
    val b = df.randomSplit(Array(0.75, 0.25), seed = 42L)(0).count()
    assert(a == b)
  }
}
