package graft.timeseries

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** One raw observation of one series. */
case class Reading(series: Long, epochSec: Long, value: Double)

/** One forecast point for one series. */
case class ForecastPoint(series: Long, step: Int, forecast: Double,
    level: Double, trend: Double, n_obs: Int)

/** Distributed grouped time-series forecasting — the Scala-Spark
  * replacement for the reference's GROUPED_MAP pandas UDF
  * (`/root/reference/spark_pandas_timeseries_forecast.py:28-50`): per
  * series, resample to 30-min means → linear-interpolate gaps → quantile
  * trim → fit Holt's linear-trend exponential smoothing → h-step forecast.
  *
  * Design: `Dataset[Reading].groupByKey(_.series).flatMapGroups` keeps the
  * whole kernel inside the executor JVM — no Arrow hop, no Python worker
  * (the boundary SURVEY.md §3 E3 deletes). One shuffle on the series key;
  * per-group state is O(series length after resampling), which is bounded
  * by the time range, not the corpus. Two reference bugs fixed (SURVEY §8):
  * grouping is by SERIES (the reference grouped by ('datetime','O2') —
  * near-per-row groups), and the forecast returns one array, not three.
  */
object HoltForecast {

  /** Holt's linear-trend recurrences (published closed form):
    * ℓ_t = αy_t + (1-α)(ℓ_{t-1}+b_{t-1}); b_t = β(ℓ_t-ℓ_{t-1}) + (1-β)b_{t-1}.
    * Returns (level, trend) after folding the series. */
  def holtFit(ys: IndexedSeq[Double], alpha: Double, beta: Double): (Double, Double) = {
    require(ys.nonEmpty)
    if (ys.length == 1) (ys.head, 0.0)
    else {
      var level = ys(0)
      var trend = ys(1) - ys(0)
      var i = 1
      while (i < ys.length) {
        val prev = level
        level = alpha * ys(i) + (1 - alpha) * (level + trend)
        trend = beta * (level - prev) + (1 - beta) * trend
        i += 1
      }
      (level, trend)
    }
  }

  /** Simple exponential smoothing (no trend), for comparison/tests. */
  def sesFit(ys: IndexedSeq[Double], alpha: Double): Double =
    ys.tail.foldLeft(ys.head)((l, y) => alpha * y + (1 - alpha) * l)

  /** One-pass walk-forward validation: fold Holt over ys[0, cut), then for
    * each i ≥ cut predict one step ahead, record the squared error, and
    * absorb ys(i) into the state. Because `holtFit` is a left fold, the
    * (level, trend) carried here just before absorbing ys(i) is
    * bitwise-identical to `holtFit(ys.take(i), α, β)` — so this one O(N)
    * pass produces exactly the same one-step-ahead errors as refitting on
    * every growing prefix (which is O(N·V) with a Vector copy per point).
    * Returns (validation MSE, final level, final trend); the final state
    * equals `holtFit(ys, α, β)`, so no refit is needed for forecasting.
    * Requires 2 ≤ cut < ys.length. */
  def holtWalkForward(ys: Array[Double], cut: Int,
      alpha: Double, beta: Double): (Double, Double, Double) = {
    require(cut >= 2 && cut < ys.length, s"need 2 <= cut < n, got cut=$cut n=${ys.length}")
    var level = ys(0)
    var trend = ys(1) - ys(0)
    var sse = 0.0
    var i = 1
    while (i < ys.length) {
      if (i >= cut) { val e = (level + trend) - ys(i); sse += e * e }
      val prev = level
      level = alpha * ys(i) + (1 - alpha) * (level + trend)
      trend = beta * (level - prev) + (1 - beta) * trend
      i += 1
    }
    (sse / (ys.length - cut), level, trend)
  }

  /** 30-min-bucket means, then linear interpolation over empty buckets —
    * the in-group mirror of pandas `resample('30T').mean().interpolate()`. */
  def resampleInterpolate(points: Seq[(Long, Double)], bucketSec: Long = 1800L): IndexedSeq[Double] = {
    if (points.isEmpty) return IndexedSeq.empty
    interpolateBuckets(points.groupBy(p => p._1 / bucketSec)
      .map { case (b, ps) => b -> ps.map(_._2).sum / ps.size })
  }

  /** Dense linear interpolation over a sparse bucket→mean map. Each gap is
    * filled with the DIRECT lerp `v0 + (v1 - v0) * ((i - i0) / (i1 - i0))`
    * between its two known neighbors — the same IEEE operation sequence a
    * SQL engine evaluates, so the output is bitwise-reproducible
    * cross-engine (the cascaded fill it replaces drifted by ULPs). Ends
    * are always known: lo and hi buckets contain data by construction. */
  def interpolateBuckets(byBucket: Map[Long, Double]): IndexedSeq[Double] = {
    if (byBucket.isEmpty) return IndexedSeq.empty
    val (lo, hi) = (byBucket.keys.min, byBucket.keys.max)
    val n = (hi - lo + 1).toInt
    val out = Array.ofDim[Double](n)
    val known = Array.ofDim[Boolean](n)
    byBucket.foreach { case (b, v) =>
      val i = (b - lo).toInt
      out(i) = v; known(i) = true
    }
    var i0 = 0 // most recent known index; index 0 is known by construction
    var i = 1
    while (i < n) {
      if (known(i)) {
        if (i - i0 > 1) {
          val v0 = out(i0); val span = (i - i0).toDouble
          var k = i0 + 1
          while (k < i) {
            out(k) = v0 + (out(i) - v0) * ((k - i0).toDouble / span)
            k += 1
          }
        }
        i0 = i
      }
      i += 1
    }
    out.toIndexedSeq
  }

  /** Iterator form of `resampleInterpolate`: folds raw (epochSec, value)
    * readings straight into per-bucket sums — O(buckets) per-group memory,
    * never a copy of the raw series — and returns the dense interpolated
    * series as a primitive array (the shape the Holt/AR kernels fold). */
  def resampleArray(it: Iterator[(Long, Double)], bucketSec: Long = 1800L): Array[Double] = {
    val sums = scala.collection.mutable.HashMap.empty[Long, (Double, Int)]
    it.foreach { case (t, v) =>
      val b = t / bucketSec
      val (s0, n0) = sums.getOrElse(b, (0.0, 0))
      sums(b) = (s0 + v, n0 + 1)
    }
    if (sums.isEmpty) Array.empty
    else interpolateBuckets(sums.view.mapValues { case (s0, n0) => s0 / n0 }.toMap).toArray
  }

  /** Trim values outside the [pLo, pHi] empirical quantiles (the pandas
    * `.quantile(.2)/.quantile(.8)` trim at
    * `spark_pandas_timeseries_forecast.py:37`). */
  def quantileTrim(ys: IndexedSeq[Double], pLo: Double = 0.2, pHi: Double = 0.8): IndexedSeq[Double] = {
    if (ys.length < 5) ys
    else {
      val sorted = ys.sorted
      def q(p: Double): Double = {
        val pos  = p * (sorted.length - 1)
        val lo   = pos.toInt
        val frac = pos - lo
        if (lo + 1 < sorted.length) sorted(lo) + (sorted(lo + 1) - sorted(lo)) * frac
        else sorted(lo)
      }
      val (qlo, qhi) = (q(pLo), q(pHi))
      val kept = ys.filter(y => y >= qlo && y <= qhi)
      if (kept.isEmpty) ys else kept
    }
  }

  /** The per-group kernel: resample → interpolate → trim → Holt → h steps.
    * The raw iterator folds straight into per-bucket sums — per-group
    * memory is O(resampled buckets), never O(raw series), and no sort of
    * the raw readings is needed (bucketing is order-insensitive). */
  def forecastGroup(series: Long, readings: Iterator[Reading],
      alpha: Double, beta: Double, horizon: Int,
      bucketSec: Long = 1800L): Iterator[ForecastPoint] = {
    val dense = resampleArray(readings.map(r => (r.epochSec, r.value)), bucketSec)
    if (dense.isEmpty) Iterator.empty
    else {
      val ys = quantileTrim(scala.collection.immutable.ArraySeq.unsafeWrapArray(dense))
      if (ys.isEmpty) Iterator.empty
      else {
        val (level, trend) = holtFit(ys, alpha, beta)
        (1 to horizon).iterator.map(h =>
          ForecastPoint(series, h, level + h * trend, level, trend, ys.length))
      }
    }
  }

  /** The forecast kernel's deterministic input path, exposed as an
    * oracle-checkable query (VERDICT r2 item 7): per-series 30-min bucket
    * means (order-independent DECIMAL mean, see `graft.operators` package
    * doc) fed through the SAME `interpolateBuckets` kernel the forecasts
    * consume, emitted as one dense row per (series, bucket). Both the
    * bucket means and the direct-lerp fill are bitwise-reproducible in
    * SQL, so a DuckDB oracle hash-matches the kernel's input end-to-end. */
  def prep(s: SparkSession, d: String, bucketSec: Long = 1800L): DataFrame = {
    import s.implicits._
    import graft.operators.exactAvg
    Tables.events(s, d)
      .groupBy(col("user_id").as("series"),
        expr(s"unix_timestamp(ts) div $bucketSec").as("b"))
      .agg(exactAvg(col("value")).as("y"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k: Long, it: Iterator[(Long, Long, Double)]) =>
        val byBucket = it.map(r => r._2 -> r._3).toMap
        if (byBucket.isEmpty) Iterator.empty
        else {
          val lo = byBucket.keys.min
          interpolateBuckets(byBucket).iterator.zipWithIndex.map {
            case (v, i) => (k, (lo + i) * bucketSec, v)
          }
        }
      }
      .toDF("series", "bucket", "y")
  }

  /** Holt-Winters ADDITIVE-seasonal recurrences (period m, published
    * closed form — Winters 1960; the triple-smoothing extension of
    * [[holtFit]]):
    *   ℓ_t = α(y_t − s_{t−m}) + (1−α)(ℓ_{t−1} + b_{t−1})
    *   b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)b_{t−1}
    *   s_t = γ(y_t − ℓ_t) + (1−γ)s_{t−m}
    * Standard initialization from the first two seasons: ℓ = mean of
    * season 1, b = (mean₂ − mean₁)/m, s_i = y_i − ℓ. A strict left fold
    * (deterministic, bit-reproducible — the [[holtFit]] discipline).
    * For a zero-trend series that is EXACTLY period-m additive, the
    * initialization is exact and every update is a fixed point, so the
    * forecasts are bit-exact continuations (HwSeasonalSpec pins this).
    * Returns (level, trend, seasonal index array, phase) where `phase`
    * is n % m — the seasonal slot the NEXT observation would land in. */
  def hwFit(ys: IndexedSeq[Double], alpha: Double, beta: Double,
      gamma: Double, m: Int): (Double, Double, Array[Double], Int) = {
    require(m >= 2, s"period must be >= 2, got $m")
    require(ys.length >= 2 * m, s"need >= 2 seasons (${2 * m}), got ${ys.length}")
    var mean1 = 0.0
    var mean2 = 0.0
    var i = 0
    while (i < m) { mean1 += ys(i); mean2 += ys(m + i); i += 1 }
    mean1 /= m; mean2 /= m
    var level = mean1
    var trend = (mean2 - mean1) / m
    val seas = Array.tabulate(m)(j => ys(j) - level)
    var t = m
    while (t < ys.length) {
      val sIdx = t % m
      val prevL = level
      level = alpha * (ys(t) - seas(sIdx)) + (1 - alpha) * (level + trend)
      trend = beta * (level - prevL) + (1 - beta) * trend
      seas(sIdx) = gamma * (ys(t) - level) + (1 - gamma) * seas(sIdx)
      t += 1
    }
    (level, trend, seas, ys.length % m)
  }

  /** h-step Holt-Winters forecast from a fitted state:
    * ŷ_{n+h} = ℓ + h·b + s_{(n+h−1) mod m}. */
  def hwForecastPoint(level: Double, trend: Double, seas: Array[Double],
      phase: Int, h: Int): Double =
    level + h * trend + seas((phase + h - 1) % seas.length)

  /** Whole-table entry: events → per-user Holt-Winters additive-seasonal
    * forecast over the 30-min resampled+interpolated grid, DAILY season
    * (m = 48 buckets), horizon steps. No quantile trim (trimming deletes
    * grid points and would de-align the seasonal index). Same
    * groupByKey/flatMapGroups shape as [[forecast]]: one shuffle on the
    * series key, O(buckets) per-group state; series shorter than two
    * seasons emit nothing. No oracle (float folds — the q_holt_forecast
    * class); HwSeasonalSpec pins exact-seasonal recovery, determinism,
    * and the seasonal-beats-Holt MSE ordering on planted data. */
  def hwForecast(s: SparkSession, d: String, alpha: Double = 0.5,
      beta: Double = 0.3, gamma: Double = 0.3, m: Int = 48,
      horizon: Int = 6, bucketSec: Long = 1800L): DataFrame = {
    import s.implicits._
    import graft.operators.exactAvg
    // DETERMINISM (round 12): same exactAvg + interpolateBuckets input
    // path as [[forecast]], so the triple-smoothing fold is
    // bit-reproducible and the DuckDB oracle replays it with a
    // LIST-carrying recursive CTE (`q_hw_seasonal` is hash-checked)
    Tables.events(s, d)
      .groupBy(col("user_id").as("series"),
        expr(s"unix_timestamp(ts) div $bucketSec").as("b"))
      .agg(exactAvg(col("value")).as("y"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k: Long, it: Iterator[(Long, Long, Double)]) =>
        val byBucket = it.map(r => r._2 -> r._3).toMap
        val ys = if (byBucket.isEmpty) IndexedSeq.empty[Double]
                 else interpolateBuckets(byBucket)
        if (ys.length < 2 * m) Iterator.empty
        else {
          val (level, trend, seas, phase) = hwFit(ys, alpha, beta, gamma, m)
          (1 to horizon).iterator.map { h =>
            (k, h, hwForecastPoint(level, trend, seas, phase, h),
              level, trend, seas((phase + h - 1) % m), ys.length)
          }
        }
      }
      .toDF("series", "step", "forecast", "level", "trend", "seasonal", "n_obs")
  }

  /** The deterministic dense-series input every whole-table forecast
    * entry consumes (round 12): per-(series = user, 30-min bucket)
    * DECIMAL-exact means (order-independent, unlike a float sum in
    * iterator order) grouped by series — the q_holt_prep path. Pair
    * with [[denseArray]] inside flatMapGroups. */
  def denseSeries(s: SparkSession, d: String, bucketSec: Long = 1800L)
      : org.apache.spark.sql.KeyValueGroupedDataset[Long, (Long, Long, Double)] = {
    import s.implicits._
    import graft.operators.exactAvg
    Tables.events(s, d)
      .groupBy(col("user_id").as("series"),
        expr(s"unix_timestamp(ts) div $bucketSec").as("b"))
      .agg(exactAvg(col("value")).as("y"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
  }

  /** Densify one [[denseSeries]] group: bucket means → the shared
    * [[interpolateBuckets]] direct-lerp fill. */
  def denseArray(it: Iterator[(Long, Long, Double)]): Array[Double] = {
    val byBucket = it.map(r => r._2 -> r._3).toMap
    if (byBucket.isEmpty) Array.empty[Double]
    else interpolateBuckets(byBucket).toArray
  }

  /** Whole-table entry: events → per-user Holt forecast, horizon steps of
    * 30 minutes each.
    *
    * DETERMINISM (round 12, the q_holt_prep path extended through the
    * kernel): bucket means come from the order-independent DECIMAL
    * exactAvg — not a float accumulation in iterator order — and
    * everything downstream ([[interpolateBuckets]] direct lerp,
    * [[quantileTrim]] type-7 lerp, the [[holtFit]] strict left fold) is
    * a fixed sequence of IEEE ops on those deterministic inputs, so the
    * whole forecast is bit-reproducible and the DuckDB oracle
    * (`q_holt_forecast`) replays the identical recurrence with a
    * recursive CTE and hash-matches. The raw-iterator kernel
    * ([[forecastGroup]]/[[resampleArray]]) remains for the streaming
    * form, where per-batch arrival order is the stream's own. */
  def forecast(s: SparkSession, d: String,
      alpha: Double = 0.5, beta: Double = 0.3, horizon: Int = 6): DataFrame = {
    import s.implicits._
    import graft.operators.exactAvg
    Tables.events(s, d)
      .groupBy(col("user_id").as("series"),
        expr("unix_timestamp(ts) div 1800").as("b"))
      .agg(exactAvg(col("value")).as("y"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (k: Long, it: Iterator[(Long, Long, Double)]) =>
        val byBucket = it.map(r => r._2 -> r._3).toMap
        if (byBucket.isEmpty) Iterator.empty
        else {
          val ys = quantileTrim(interpolateBuckets(byBucket))
          if (ys.isEmpty) Iterator.empty
          else {
            val (level, trend) = holtFit(ys, alpha, beta)
            (1 to horizon).iterator.map(h =>
              ForecastPoint(k, h, level + h * trend, level, trend, ys.length))
          }
        }
      }
      .toDF()
  }
}
