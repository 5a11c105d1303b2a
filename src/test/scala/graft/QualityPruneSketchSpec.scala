package graft

import graft.functions.TextAnalytics

/** The sketch twin of percentile quality pruning (VERDICT r6 #2): the
  * approx_percentile-threshold form must agree with the exact
  * percent_rank form on ≥ 99 % of the keep-set, and may differ only in
  * the threshold-tie band (the sketch keeps ALL docs at/above its
  * threshold; the exact form's doc_id tie-break can cut inside a tie).
  * Measured on the driver testdata: exact keeps 450, sketch keeps 451,
  * intersection 450 → agreement 0.9978 at both sf0.001 and sf0.01. */
class QualityPruneSketchSpec extends SparkTestBase {

  test("sketch keep-set agrees with the exact keep-set on >= 99% of docs") {
    val exact = TextAnalytics.qualityPrune(spark, sf).select("doc_id")
    val sketch = TextAnalytics.qualityPruneSketch(spark, sf).select("doc_id")
    val nExact = exact.count()
    val nSketch = sketch.count()
    val inter = exact.join(sketch, "doc_id").count()
    val agree = inter.toDouble / math.max(nExact, nSketch)
    assert(agree >= 0.99,
      s"keep-set agreement $agree (exact=$nExact sketch=$nSketch inter=$inter)")
  }

  test("every doc the sketch drops sits at the low-score tail") {
    // correctness of the threshold semantics: the sketch's kept scores
    // must all be >= its dropped scores (a pure threshold cut, no holes)
    val scored = TextAnalytics.unigramLogProb(spark, sf)
    val kept = TextAnalytics.qualityPruneSketch(spark, sf)
    val minKept = kept.agg(org.apache.spark.sql.functions.min("avg_logprob"))
      .head().getDouble(0)
    val droppedAbove = scored.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
      .where(org.apache.spark.sql.functions.col("avg_logprob") >= minKept)
      .count()
    assert(droppedAbove == 0,
      s"$droppedAbove dropped docs score >= the minimum kept score $minKept")
  }

  test("verdict gate (r14 re-gate): rank-contract booleans true, n_docs exact, and they FLIP on a broken threshold") {
    import org.apache.spark.sql.functions.{expr, lit}
    val row = TextAnalytics.qualityPruneSketchVerdict(spark, sf).head()
    val scored = TextAnalytics.unigramLogProb(spark, sf)
    assert(row.getAs[Long]("n_docs") == scored.count(), "n_docs")
    assert(row.getAs[Boolean]("thr_rank_ok"), "threshold rank out of contract")
    assert(row.getAs[Boolean]("keep_frac_ok"), "keep fraction out of contract")
    // sensitivity (guards against tautological booleans): a threshold at
    // the MEDIAN cannot satisfy the 10th-percentile rank contract
    val broken = TextAnalytics.qualityPruneVerdicts(scored,
      scored.agg(expr("percentile(avg_logprob, 0.5)").as("thr")),
      keepFrac = 0.9, accuracy = 10000).head()
    assert(!broken.getAs[Boolean]("thr_rank_ok"),
      "median-threshold verdict must flip thr_rank_ok")
    assert(!broken.getAs[Boolean]("keep_frac_ok"),
      "median-threshold verdict must flip keep_frac_ok")
    // and a threshold below every score keeps everything: rank contract
    // broken on the other side
    val tooLow = TextAnalytics.qualityPruneVerdicts(scored,
      scored.agg((org.apache.spark.sql.functions.min("avg_logprob") - lit(1.0))
        .as("thr")), keepFrac = 0.9, accuracy = 10000).head()
    assert(!tooLow.getAs[Boolean]("thr_rank_ok"))
  }

  test("no rank window anywhere in the sketch plan (the 100 TB contract)") {
    val plan = TextAnalytics.qualityPruneSketch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"sketch plan contains a window:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"sketch plan contains a global sort:\n$plan")
  }
}
