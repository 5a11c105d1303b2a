package graft

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.TimeWindows

/** Micro-fixtures for lead / resample / ffill / interpolate (FIXTURES.md §D,
  * mirroring pandas semantics in the reference forecast scripts). */
class TimeWindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("lead over series-partitioned window labels next day, last row dropped (W2)") {
    val daily = Seq(
      (1L, "2024-01-01", 10.0), (1L, "2024-01-02", 20.0), (1L, "2024-01-03", 30.0),
      (2L, "2024-01-01", 5.0)
    ).toDF("user_id", "day", "day_max")
    val w = Window.partitionBy("user_id").orderBy("day")
    val out = daily.withColumn("next", lead(col("day_max"), 1).over(w)).na.drop()
      .orderBy("user_id", "day").collect()
    // user 2 has a single day -> fully dropped; user 1 loses its last day
    assert(out.length == 2)
    assert(out(0).getAs[Double]("next") == 20.0 && out(1).getAs[Double]("next") == 30.0)
  }

  test("30-min resample means: bucket boundaries and means (W3/A7)") {
    val df = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10.0),
      (1L, ts("2024-01-01 00:25:00"), 20.0),  // same bucket as above
      (1L, ts("2024-01-01 00:35:00"), 30.0)   // next bucket
    ).toDF("user_id", "ts", "value")
    val out = df.groupBy(col("user_id"), window(col("ts"), "30 minutes"))
      .agg(avg("value").as("m"))
      .select(col("window.start").as("b"), col("m")).orderBy("b").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Timestamp]("b") == ts("2024-01-01 00:00:00"))
    assert(out(0).getAs[Double]("m") == 15.0)
    assert(out(1).getAs[Timestamp]("b") == ts("2024-01-01 00:30:00"))
    assert(out(1).getAs[Double]("m") == 30.0)
  }

  test("ffill carries last non-null forward within series (W4)") {
    val df = Seq(
      (1L, 1, Some(10.0)), (1L, 2, None), (1L, 3, None), (1L, 4, Some(40.0)),
      (2L, 1, None)
    ).toDF("series", "t", "v")
    val w = Window.partitionBy("series").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = df.withColumn("f", last(col("v"), ignoreNulls = true).over(w))
      .orderBy("series", "t").collect()
    assert(out.map(r => Option(r.getAs[java.lang.Double]("f")).map(_.toDouble)).toSeq ==
      Seq(Some(10.0), Some(10.0), Some(10.0), Some(40.0), None))
  }

  test("linear interpolation fills interior gap proportionally (W5)") {
    // gap of 2 between 10 and 40 -> 20, 30
    val out = TimeWindowsSpecHelper.interp(spark,
      Seq((1L, 0L, Some(10.0)), (1L, 1L, None), (1L, 2L, None), (1L, 3L, Some(40.0))))
    assert(out == Seq(10.0, 20.0, 30.0, 40.0))
  }

  test("whole-operator smoke on sf0.001: ffill has no leading nulls, interpolate bounded") {
    val ff = TimeWindows.ffill(spark, sf)
    assert(ff.where(col("filled").isNull).count() == 0)
    val ip = TimeWindows.interpolate(spark, sf)
    assert(ip.where(col("interp").isNull).count() == 0)
    val stats = ip.agg(min("interp"), max("interp")).collect().head
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 500.0)
  }

  test("seasonal decompose components: value = trend + seasonal_dev + resid (W6)") {
    val out = TimeWindows.seasonalDecompose(spark, sf)
    val bad = out.where(
      abs(col("day_avg") - (col("trend") + col("seasonal") + col("resid"))) > 1e-9)
    assert(bad.count() == 0)
  }

  test("seasonal decompose parameterized (period != 7): identity holds, keys in [0, period)") {
    // the reference's freq-365 shape, scaled to the 30-day testdata window
    val out = TimeWindows.seasonalDecompose(spark, sf, halfWindow = 5, period = 10)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val k = r.getAs[Int]("dow"); k >= 0 && k < 10
    })
    val bad = out.where(
      abs(col("day_avg") - (col("trend") + col("seasonal") + col("resid"))) > 1e-9)
    assert(bad.count() == 0)
  }
}

object TimeWindowsSpecHelper {
  import org.apache.spark.sql.SparkSession

  /** Reference-shaped interpolation on (series, t, v) tuples, returning
    * interpolated values ordered by t — the same expression tree
    * TimeWindows.interpolate uses, on an integer axis. */
  def interp(spark: SparkSession, rows: Seq[(Long, Long, Option[Double])]): Seq[Double] = {
    import spark.implicits._
    val df = rows.toDF("series", "t", "v")
    val back = Window.partitionBy("series").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("series").orderBy("t")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val markedT = when(col("v").isNotNull, col("t"))
    df.withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pb", last(markedT, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("nb", first(markedT, ignoreNulls = true).over(fwd))
      .withColumn("interp",
        when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("t") - col("pb")).cast("double") / (col("nb") - col("pb")).cast("double"))))
      .orderBy("t").select("interp").as[Double].collect().toSeq
  }
}
