package graft

import graft.timeseries.HoltForecast

/** Holt-Winters additive-seasonal contracts: a zero-trend exactly
  * period-m series is a FIXED POINT of the recurrences (initialization
  * is exact, every update leaves the state unchanged), so forecasts are
  * bit-exact continuations; on trended+seasonal data the forecasts
  * converge to the closed-form continuation; on seasonal data the
  * seasonal model beats plain Holt on holdout MSE; and the q_hw_seasonal
  * gate rows are internally consistent and deterministic. */
class HwSeasonalSpec extends SparkTestBase {
  import spark.implicits._

  private val pattern = Array(3.0, -1.0, -4.0, 2.0) // mean 0, m = 4

  test("zero-trend exact-seasonal series forecasts bit-exactly") {
    val m = pattern.length
    val ys = (0 until 40).map(t => 10.0 + pattern(t % m))
    val (level, trend, seas, phase) = HoltForecast.hwFit(ys, 0.5, 0.3, 0.3, m)
    assert(level == 10.0, "level must stay at the exact deseasonalized mean")
    assert(trend == 0.0, "trend must stay exactly zero")
    (1 to 8).foreach { h =>
      val expect = 10.0 + pattern((40 + h - 1) % m)
      assert(HoltForecast.hwForecastPoint(level, trend, seas, phase, h) == expect,
        s"step-$h forecast must continue the exact pattern")
    }
  }

  test("trended seasonal series converges to the closed-form continuation") {
    val m = pattern.length
    val b = 0.25
    val n = 400
    val ys = (0 until n).map(t => 5.0 + b * t + pattern(t % m))
    val (level, trend, seas, phase) = HoltForecast.hwFit(ys, 0.5, 0.3, 0.3, m)
    assert(math.abs(trend - b) < 1e-6, s"trend must converge to $b, got $trend")
    (1 to 8).foreach { h =>
      val expect = 5.0 + b * (n + h - 1).toDouble + pattern((n + h - 1) % m)
      val got = HoltForecast.hwForecastPoint(level, trend, seas, phase, h)
      assert(math.abs(got - expect) < 1e-4,
        s"step-$h forecast $got must converge to $expect")
    }
  }

  test("on seasonal data the seasonal model beats plain Holt on holdout MSE") {
    val m = pattern.length
    // deterministic LCG noise (no Math.random in specs)
    var seed = 42L
    def noise(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33).toDouble / (1L << 31).toDouble - 0.5) * 0.4
    }
    val full = (0 until 220).map(t => 20.0 + 0.1 * t + 4.0 * pattern(t % m) + noise())
    val (train, test0) = full.splitAt(200)
    val (lH, bH) = HoltForecast.holtFit(train, 0.5, 0.3)
    val (lW, bW, seas, phase) = HoltForecast.hwFit(train, 0.5, 0.3, 0.3, m)
    def mse(preds: Seq[Double]): Double =
      preds.zip(test0).map { case (p, y) => (p - y) * (p - y) }.sum / test0.length
    val holtMse = mse((1 to test0.length).map(h => lH + h * bH))
    val hwMse = mse((1 to test0.length).map(h =>
      HoltForecast.hwForecastPoint(lW, bW, seas, phase, h)))
    assert(hwMse < holtMse / 4,
      s"seasonal model must dominate on seasonal data (hw=$hwMse holt=$holtMse)")
  }

  test("q_hw_seasonal gate rows are consistent and deterministic") {
    val out = HoltForecast.hwForecast(spark, sf)
      .as[(Long, Int, Double, Double, Double, Double, Int)].collect().toSeq
    assert(out.nonEmpty, "no series reached two daily seasons")
    out.foreach { case (_, h, f, level, trend, seasonal, nObs) =>
      assert(f == level + h * trend + seasonal, "forecast must decompose exactly")
      assert(nObs >= 96, "gate must skip series shorter than two seasons")
    }
    out.groupBy(_._1).foreach { case (srs, rows) =>
      assert(rows.map(_._2).sorted == (1 to 6), s"series $srs must emit steps 1..6")
    }
    val rerun = HoltForecast.hwForecast(spark, sf)
      .as[(Long, Int, Double, Double, Double, Double, Int)].collect().toSeq
    assert(out.toSet == rerun.toSet, "gate must be bit-deterministic")
  }
}
