package graft.timeseries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** AR(p) point forecast for one series (d = differencing order applied). */
case class ArPoint(series: Long, step: Int, forecast: Double, p: Int, d: Int, n_obs: Int)

/** Holt grid-search result for one series. */
case class HoltFit(series: Long, alpha: Double, beta: Double, valMse: Double,
    step: Int, forecast: Double)

/** Autoregressive forecasting + per-series parameter grid search — the
  * engine's replacement for the reference's statsmodels ARIMA walk-forward
  * grid search (`/root/reference/pandas_timeseries_forecast.py:22-55,75-91`,
  * SURVEY §2.11 U2). Differencing (the "I") and the MA component are the
  * out-of-scope remainder; AR(p) via Yule-Walker covers the
  * autocorrelation structure the reference's grid actually searched over
  * (p ∈ {4,6,8,10}, d small, q small), and the grid-search harness itself
  * — fit on a train prefix, score MSE on a validation suffix, keep the
  * argmin — is implemented faithfully, distributed per series.
  *
  * All pure JVM math inside `flatMapGroups` — same execution shape as
  * HoltForecast (one shuffle on the series key, no Python/Arrow hop).
  */
object ArForecast {

  /** Yule-Walker AR(p) coefficients via Levinson-Durbin recursion on
    * biased sample autocovariances of the mean-centered series. */
  def yuleWalker(ys: IndexedSeq[Double], p: Int): Array[Double] = {
    val n = ys.length
    require(n > p + 1, s"need > ${p + 1} points for AR($p)")
    val mean = ys.sum / n
    val x = ys.map(_ - mean)
    val r = Array.tabulate(p + 1)(k =>
      (0 until n - k).foldLeft(0.0)((acc, t) => acc + x(t) * x(t + k)) / n)
    if (r(0) == 0.0) return Array.fill(p)(0.0) // constant series
    val phi = Array.ofDim[Double](p)
    var err = r(0)
    val prev = Array.ofDim[Double](p)
    var k = 0
    while (k < p) {
      var acc = r(k + 1)
      var j = 0
      while (j < k) { acc -= phi(j) * r(k - j); j += 1 }
      val refl = if (err == 0.0) 0.0 else acc / err
      Array.copy(phi, 0, prev, 0, k)
      phi(k) = refl
      j = 0
      while (j < k) { phi(j) = prev(j) - refl * prev(k - 1 - j); j += 1 }
      err *= (1 - refl * refl)
      k += 1
    }
    phi
  }

  /** Recursive h-step forecast from the fitted AR(p): predicted values
    * feed back into the lag window (the standard multi-step recursion). */
  def arForecast(ys: IndexedSeq[Double], phi: Array[Double], h: Int): Vector[Double] = {
    val p = phi.length
    val mean = ys.sum / ys.length
    val window = scala.collection.mutable.ArrayDeque.from(ys.takeRight(p).map(_ - mean))
    val out = Vector.newBuilder[Double]
    var i = 0
    while (i < h) {
      var pred = 0.0
      var j = 0
      while (j < p) { pred += phi(j) * window(window.length - 1 - j); j += 1 }
      out += pred + mean
      window.append(pred)
      window.removeHead()
      i += 1
    }
    out.result()
  }

  /** ARIMA(p, d, 0): difference `d` times, fit AR(p) by Yule-Walker on the
    * differenced series, forecast h steps, then integrate back — each
    * integration level is a cumulative sum anchored at that level's last
    * observed value. Covers the "I" the reference's grid searched over
    * (`pandas_timeseries_forecast.py:43-55`); the MA component remains
    * out of scope (documented, SURVEY §2.11). */
  def arimaForecast(ys: IndexedSeq[Double], p: Int, d: Int, h: Int): Vector[Double] = {
    require(d >= 0, s"differencing order must be >= 0, got $d")
    var cur = ys
    val lasts = Array.ofDim[Double](d)
    var k = 0
    while (k < d) {
      lasts(k) = cur.last
      val prev = cur
      cur = (1 until prev.length).map(i => prev(i) - prev(i - 1))
      k += 1
    }
    var fc = arForecast(cur, yuleWalker(cur, p), h)
    k = d - 1
    while (k >= 0) {
      var acc = lasts(k)
      fc = fc.map { z => acc += z; acc }
      k -= 1
    }
    fc
  }

  /** Distributed AR forecast over the events table (per-user series,
    * 30-min resampled like the Holt kernel). Emits one forecast track per
    * differencing order in `diffOrders` — d=0 is the plain AR(p) of round
    * 2, d=1 handles trending series (VERDICT r2 item 6). */
  def forecast(s: SparkSession, d: String, p: Int = 4, horizon: Int = 6,
      diffOrders: Seq[Int] = Seq(0, 1)): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id").as("series"),
        unix_timestamp(col("ts")).as("epochSec"), col("value"))
      .as[Reading]
      .groupByKey(_.series)
      .flatMapGroups { (k: Long, it: Iterator[Reading]) =>
        val ys = scala.collection.immutable.ArraySeq.unsafeWrapArray(
          HoltForecast.resampleArray(it.map(r => (r.epochSec, r.value))))
        diffOrders.iterator
          .filter(dd => ys.length > p + 1 + dd) // need > p+1 points AFTER differencing
          .flatMap { dd =>
            arimaForecast(ys, p, dd, horizon).iterator.zipWithIndex.map {
              case (f, i) => ArPoint(k, i + 1, f, p, dd, ys.length)
            }
          }
      }
      .toDF()
  }

  private val alphaGrid = Seq(0.2, 0.5, 0.8)
  private val betaGrid  = Seq(0.1, 0.3, 0.6)

  /** The reference's walk-forward grid search, distributed per series:
    * fit each (α, β) on the first 80% of the resampled series, score MSE
    * one-step-ahead over the last 20%, keep the argmin, forecast with it
    * (cf. `pandas_timeseries_forecast.py:75-91` — same harness, Holt
    * parameters instead of ARIMA orders).
    *
    * Each (α, β) is scored by ONE incremental O(N) pass
    * (`HoltForecast.holtWalkForward`) whose errors are bitwise-identical
    * to refitting on every growing prefix — the O(9·V·N) refit loop this
    * replaces was 60% of the round-2 bench (VERDICT r2 item 1). The pass
    * also yields the full-series (level, trend), so the winning combo
    * needs no refit before forecasting. */
  def holtGridSearch(s: SparkSession, d: String, horizon: Int = 3): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id").as("series"),
        unix_timestamp(col("ts")).as("epochSec"), col("value"))
      .as[Reading]
      .groupByKey(_.series)
      .flatMapGroups { (k: Long, it: Iterator[Reading]) =>
        val ys = HoltForecast.resampleArray(it.map(r => (r.epochSec, r.value)))
        val cut = (ys.length * 0.8).toInt
        if (cut < 3 || ys.length - cut < 1) Iterator.empty
        else {
          var bestA = 0.0; var bestB = 0.0
          var bestMse = Double.PositiveInfinity
          var bestLevel = 0.0; var bestTrend = 0.0
          for (a <- alphaGrid; b <- betaGrid) {
            val (mse, level, trend) = HoltForecast.holtWalkForward(ys, cut, a, b)
            // strict < keeps the first argmin, matching minBy on the grid order
            if (mse < bestMse) {
              bestMse = mse; bestA = a; bestB = b
              bestLevel = level; bestTrend = trend
            }
          }
          (1 to horizon).iterator.map(h =>
            HoltFit(k, bestA, bestB, bestMse, h, bestLevel + h * bestTrend))
        }
      }
      .toDF()
  }
}
