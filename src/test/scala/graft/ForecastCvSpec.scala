package graft

import org.apache.spark.sql.functions._
import graft.timeseries.{ArForecast, Reading}

/** ARIMA-vs-Holt cross-validation contract: the verdict columns are
  * internally consistent, the per-family MSEs agree with the family
  * grid-search gates (shared kernels — this pins the refactor), the
  * result is deterministic, and a planted series whose winner is known
  * by construction (a pure sinusoid IS an AR(2) process; Holt's
  * level+trend state cannot track it) routes to ARIMA. */
class ForecastCvSpec extends SparkTestBase {
  import spark.implicits._

  test("winner and ratio are consistent and finite on sf0.001") {
    val out = ArForecast.forecastCv(spark, sf).collect()
    assert(out.nonEmpty, "no series survived the grid-length cut")
    out.foreach { r =>
      val h = r.getAs[Double]("holt_mse")
      val a = r.getAs[Double]("arima_mse")
      val w = r.getAs[String]("winner")
      val ratio = r.getAs[Double]("mse_ratio")
      assert(h > 0 && a > 0 && !h.isNaN && !a.isNaN && !h.isInfinite && !a.isInfinite)
      assert(w == (if (a < h) "arima" else "holt"))
      assert(math.abs(ratio - h / a) == 0.0, "ratio must be exactly holt/arima")
    }
  }

  test("per-family MSEs equal the family grid-search gates bit for bit") {
    val cv = ArForecast.forecastCv(spark, sf)
      .select(col("series"), col("holt_mse"), col("arima_mse"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val holt = ArForecast.holtGridSearch(spark, sf)
      .where(col("step") === 1)
      .select(col("series"), col("valMse"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val arima = ArForecast.arimaGridSearch(spark, sf)
      .where(col("step") === 1)
      .select(col("series"), col("valMse"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // cv emits exactly the series BOTH families can fit
    assert(cv.keySet == holt.keySet.intersect(arima.keySet))
    cv.foreach { case (k, (h, a)) =>
      assert(h == holt(k), s"series $k holt mse drifted from the family gate")
      assert(a == arima(k), s"series $k arima mse drifted from the family gate")
    }
  }

  test("a planted sinusoid (an exact AR(2) process) routes to arima") {
    // y_t = sin(2*pi*t/24): satisfies y_t = 2cos(w)y_{t-1} - y_{t-2}
    // exactly, so the AR grid (p >= 4 covers AR(2)) forecasts it to
    // machine precision while Holt's linear state cannot follow the
    // oscillation at any gridded (alpha, beta)
    val readings = (0 until 240).map(t =>
      Reading(1L, t.toLong * 1800L, math.sin(2 * math.Pi * t / 24.0)))
    val out = ArForecast.forecastCvReadings(readings.toDS()).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("winner") == "arima",
      s"sinusoid must route to arima (ratio=${r.getAs[Double]("mse_ratio")})")
    assert(r.getAs[Double]("mse_ratio") > 10.0,
      "AR(2)-exact series should beat Holt by orders of magnitude")
  }

  test("forecastCv is deterministic across runs") {
    val a = ArForecast.forecastCv(spark, sf).collect().sortBy(_.getLong(0))
    val b = ArForecast.forecastCv(spark, sf).collect().sortBy(_.getLong(0))
    assert(a.sameElements(b))
  }
}
