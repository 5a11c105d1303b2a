package graft

import graft.timeseries.ArForecast

/** CSS-refinement contract: descent never worsens the conditional SSE
  * (the by-construction invariant, checked on real series AND from a
  * deliberately perturbed start, where it must STRICTLY improve); the
  * procedure is bit-deterministic; and the gate's per-series rows all
  * carry improved = true. */
class ArimaCssSpec extends SparkTestBase {

  /** Planted ARMA(1,1): x_t = 0.6·x_{t-1} + e_t + 0.4·e_{t-1}, seeded
    * gaussian innovations — deterministic fixture. */
  private def plantedArma(n: Int): Array[Double] = {
    val rng = new scala.util.Random(4242)
    val x = Array.ofDim[Double](n)
    var ePrev = 0.0
    var t = 0
    while (t < n) {
      val e = rng.nextGaussian()
      x(t) = (if (t > 0) 0.6 * x(t - 1) else 0.0) + e + 0.4 * ePrev
      ePrev = e
      t += 1
    }
    x
  }

  test("refinement from the HR start never worsens, and strictly improves a perturbed start") {
    val x = plantedArma(300)
    val (mean, phi, theta) = ArForecast.hannanRissanen(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(x), 1, 1)
    val xc = Array.tabulate(x.length)(x(_) - mean)
    val hrMse = ArForecast.armaWalkForward(xc, 0, phi, theta)._1
    val (_, _, cssMse) = ArForecast.cssRefine(xc, phi, theta)
    assert(cssMse <= hrMse, "CSS must never worsen the start")

    // a start pushed off the optimum must be strictly repaired
    val badPhi = phi.map(_ + 0.15)
    val badMse = ArForecast.armaWalkForward(xc, 0, badPhi, theta)._1
    val (_, _, fixedMse) = ArForecast.cssRefine(xc, badPhi, theta)
    assert(fixedMse < badMse, "descent must strictly improve a perturbed start")
    assert(fixedMse <= hrMse * 1.10,
      "refined-from-perturbed should land near the HR-start optimum")
  }

  test("cssRefine is bit-deterministic") {
    val x = plantedArma(200)
    val (mean, phi, theta) = ArForecast.hannanRissanen(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(x), 2, 1)
    val xc = Array.tabulate(x.length)(x(_) - mean)
    val a = ArForecast.cssRefine(xc, phi, theta)
    val b = ArForecast.cssRefine(xc, phi.clone(), theta.clone())
    assert(a._1.toSeq == b._1.toSeq && a._2.toSeq == b._2.toSeq && a._3 == b._3)
  }

  test("gate rows all carry improved = true") {
    val out = ArForecast.arimaCss(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(!r.getAs[Boolean]("nan_winner"),
        s"fixture grew a degenerate (all-NaN-grid) series: $r")
      assert(r.getAs[Boolean]("improved"), s"descent worsened a series: $r")
      assert(r.getAs[Double]("css_mse") <= r.getAs[Double]("hr_mse") + 1e-6)
    }
  }
}
