package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.timeseries.ArForecast

/** r15 verdict-point gates for the ARIMA composites (q_arima_gridsearch /
  * q_forecast_cv / q_arima_css): the exact integers — eligible-series
  * count and dense-length sum — are recomputed INDEPENDENTLY here from
  * the raw events via the kernel's length rule (floor(0.8·nb) ≥ 16 over
  * the 30-min bucket span), and every contract boolean must be TRUE.
  * The raw float-fold MSEs stay pinned by ArForecastSpec / ArimaCssSpec /
  * ForecastCvSpec through the original entry points. */
class ForecastVerdictSpec extends SparkTestBase {

  private def boolCols(r: Row, cols: Seq[String]): Unit =
    cols.foreach(c => assert(r.getAs[Boolean](c), s"$c must be TRUE"))

  /** Independent eligible-universe recompute (dense bucket spans). */
  private lazy val eligible: Seq[Long] = Tables.events(spark, sf)
    .groupBy(col("user_id"))
    .agg((max(expr("unix_timestamp(ts) div 1800")) -
      min(expr("unix_timestamp(ts) div 1800")) + 1).as("nb"))
    .collect().map(_.getAs[Long]("nb")).toSeq
    .filter(nb => math.floor(0.8 * nb).toLong >= 16)

  test("arima gridsearch verdict: grid literals, exact universe, contracts true") {
    val out = ArForecast.arimaGridSearchVerdict(spark, sf).collect()
    assert(out.length == 24)
    assert(out.map(r => (r.getAs[Int]("p"), r.getAs[Int]("d"),
      r.getAs[Int]("q"))).toSet ==
      (for { p <- Seq(4, 6, 8, 10); d <- Seq(1, 2); q <- Seq(0, 1, 2) }
        yield (p, d, q)).toSet)
    assert(eligible.nonEmpty, "fixture too short for the grid — test is vacuous")
    out.foreach { r =>
      assert(r.getAs[Int]("horizon") == 3)
      assert(r.getAs[Long]("n_series") == eligible.length.toLong)
      assert(r.getAs[Long]("sum_n_buckets") == eligible.sum)
      assert(r.getAs[Long]("nan_winner") == 0L,
        "fixture grew a degenerate (all-NaN-grid) series")
      boolCols(r, Seq("winner_in_grid_ok", "winner_mse_finite_ok",
        "winner_first_argmin_ok", "forecast_len_ok"))
    }
  }

  test("forecast cv verdict: universe exact, cross-gate lockstep booleans true") {
    val out = ArForecast.forecastCvVerdict(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_series") == eligible.length.toLong)
    assert(r.getAs[Long]("sum_n_buckets") == eligible.sum)
    assert(r.getAs[Long]("nan_winner") == 0L)
    boolCols(r, Seq("mses_finite_ok", "winner_consistent_ok",
      "ratio_exact_ok", "holt_mse_matches_family_ok",
      "arima_mse_matches_family_ok", "family_series_set_ok"))
  }

  test("arima css verdict: universe exact via n + d, descent contract true") {
    val out = ArForecast.arimaCssVerdict(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_series") == eligible.length.toLong)
    assert(r.getAs[Long]("sum_n_buckets") == eligible.sum)
    assert(r.getAs[Long]("nan_winner") == 0L)
    boolCols(r, Seq("orders_in_grid_ok", "css_le_hr_ok"))
  }
}
