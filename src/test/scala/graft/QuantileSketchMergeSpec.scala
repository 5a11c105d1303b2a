package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeWindows

/** Mergeable-quantile-sketch contract: the gate's rank-bound verdicts
  * hold on real data under both merge trees; n is the exact per-type
  * count; and the verdict machinery itself is adversarially checked —
  * feeding a deliberately wrong "estimate" (the type max as the median)
  * must flip the boolean to false. */
class QuantileSketchMergeSpec extends SparkTestBase {
  import spark.implicits._

  test("verdicts hold and n is exact on the fixture") {
    val out = TimeWindows.quantileSketchMerge(spark, sf).collect()
    val exactN = Tables.events(spark, sf).groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(out.length == exactN.size * 3)
    out.foreach { r =>
      assert(r.getAs[Boolean]("ok_natural"), s"natural-tree bound broken: $r")
      assert(r.getAs[Boolean]("ok_merged"), s"repartitioned-tree bound broken: $r")
      assert(r.getAs[Long]("n") == exactN(r.getAs[String]("event_type")))
    }
  }

  test("trim-sketch verdict gate (r14 re-gate): booleans true, n_total exact, and broken bounds flip them") {
    val exactN = Tables.events(spark, sf).where(col("value").isNotNull)
      .groupBy("event_type").count().as[(String, Long)].collect().toMap
    val out = TimeWindows.quantileTrimSketchVerdict(spark, sf).collect()
    assert(out.length == exactN.size)
    out.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_total") == exactN(t), s"$t n_total")
      assert(r.getAs[Boolean]("ok_lo"), s"$t q_lo rank bound broken")
      assert(r.getAs[Boolean]("ok_hi"), s"$t q_hi rank bound broken")
      assert(r.getAs[Boolean]("kept_frac_ok"), s"$t kept fraction off")
    }
    // adversarial: bounds at (min, max) keep EVERYTHING — the quartile
    // rank windows and the 50% kept-band check must all flip
    val ev = Tables.events(spark, sf).select(col("event_type"), col("value"))
      .where(col("value").isNotNull)
    val broken = ev.groupBy("event_type")
      .agg(min("value").as("q_lo"), max("value").as("q_hi"))
    TimeWindows.trimRankVerdicts(ev, broken, 0.25, 0.75, 10000).collect()
      .foreach { r =>
        assert(!r.getAs[Boolean]("ok_lo"), s"min-as-q25 must flip: $r")
        assert(!r.getAs[Boolean]("ok_hi"), s"max-as-q75 must flip: $r")
        assert(!r.getAs[Boolean]("kept_frac_ok"), s"keep-all must flip: $r")
      }
  }

  test("a deliberately broken estimate flips the verdict") {
    val ev = Tables.events(spark, sf).select(col("event_type"), col("value"))
    // "median" = the type max, "p99" = the type min: both far outside
    // any sketch guarantee; p90 kept honest via the exact quantile
    val broken = ev.groupBy("event_type")
      .agg(max("value").as("mx"), min("value").as("mn"),
        percentile_approx(col("value"), lit(0.9), lit(10000)).as("p90"))
      .select(col("event_type"),
        posexplode(array(col("mx"), col("p90"), col("mn"))).as(Seq("qi", "est_nat")))
      .withColumn("est_rep", col("est_nat"))
    val out = TimeWindows.sketchRankVerdicts(ev, broken, 10000).collect()
    out.foreach { r =>
      val q = r.getAs[Double]("qtile")
      val expectOk = q == 0.9
      assert(r.getAs[Boolean]("ok_natural") == expectOk,
        s"verdict for qtile=$q should be ${expectOk}: $r")
      assert(r.getAs[Boolean]("ok_merged") == expectOk)
    }
  }
}
