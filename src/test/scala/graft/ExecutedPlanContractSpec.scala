package graft

/** Closes PlanContractSpec's AQE blind spot (r13 verdict #3, watch item
  * #1): pre-execution plan strings render WholeStageCodegen only for
  * shuffle-free single-stage plans — AQE wraps everything else in
  * `AdaptiveSparkPlan isFinalPlan=false`, whose codegen spans appear
  * only once the plan is EXECUTED. A codegen break inside a
  * shuffle-bounded hot stage was therefore invisible at test time and
  * would only surface at the next bench.
  *
  * Here every gate's OWN QueryExecution is driven to completion
  * (`executedPlan.execute().count()` — running `df.count()` instead
  * would spawn a NEW QueryExecution and leave this one un-finalized,
  * which is precisely the blind spot), then the SAME object's final
  * plan string is asserted to contain `*(n)` codegen spans. This is
  * strictly stronger attribution than a QueryExecutionListener capture:
  * the listener bus is asynchronous and hands back the count-plan, not
  * the gate plan; driving the gate plan directly is synchronous and
  * unambiguous.
  *
  * Direction of the check: absence ⊆ allowlist. 209 of 218 gates render
  * codegen in their executed plan (measured r14); the 9 allowlisted
  * absences are driver-computed LocalTableScan RESULT frames — bounded
  * kernels (moment readouts, model summaries) whose corpus-scale work
  * ran in earlier Spark jobs with their own plans, leaving nothing to
  * codegen in the returned frame. A gate LEAVING the allowlist is an
  * improvement, never a failure.
  *
  * Cost: ~3 min at sf0.001 + the same surface again at sf0.01 (r15
  * verdict #5: AQE picks physical shapes from RUNTIME stats, so a
  * codegen floor asserted at one scale can silently flip at another —
  * sf0.01 is the driver's Verify scale, so both scales the artifacts
  * are produced at are now pinned; memo families share their fixpoint
  * builds via Memo like Verify does). */
class ExecutedPlanContractSpec extends SparkTestBase {

  /** Gates whose executed plan legitimately has NO WholeStageCodegen:
    * each returns a driver-side LocalTableScan of a bounded kernel's
    * result; the data-scale scans/aggregations feeding the kernel run
    * as separate jobs (covered by the pre-exec floor + bench receipts).
    * Scale-independent by construction (a LocalTableScan result frame
    * stays local at every sf — the r15 two-scale runs confirmed no
    * entry needed a per-scale reason). */
  private val noWscgOk: Map[String, String] = Map(
    "q_acf"         -> "LocalTableScan: per-type ACF from one collected exact-moment row",
    "q_ccf"         -> "LocalTableScan: cross-correlation from one collected exact-moment row",
    "q_correlation" -> "LocalTableScan: Pearson matrix from one collected exact-moment row",
    "q_cross_val"   -> "LocalTableScan: CV grid summary of seeded MLlib fits",
    "q_kmeans_topics" -> "LocalTableScan: k-means verdict row (r14 re-gate; corpus moments + fit collected bounded)",
    "q_ml_classification" -> "LocalTableScan: classification verdict rows (r14 re-gate; <= |classes| collected)",
    "q_ml_regression" -> "LocalTableScan: GBT metric rows from the fitted model",
    "q_pca"         -> "LocalTableScan: covariance+eigensolve verdict rows (1-row moment collect)",
    "q_word2vec"    -> "LocalTableScan: model-audit verdict row from the fitted model",
    // NOTE r16: q_holt_gridsearch became memo-backed (ExistingRDD scan of
    // the checkpointed family table) and STILL renders WSCG — the
    // ExistingRDD scan is codegen'd — so it stays OFF this allowlist.
    "q_arima_gridsearch" -> "LocalTableScan: grid-literal verdict rows (r15 re-gate; one bounded aggregate row collected)",
    "q_forecast_cv" -> "LocalTableScan: cross-gate lockstep verdict row (r15 re-gate; bounded aggregates collected)",
    "q_arima_css"   -> "LocalTableScan: descent-contract verdict row (r15 re-gate; one bounded aggregate row collected)")

  private val scales = Seq(
    "sf0.001 (suite scale)" -> "/root/testdata/sf0.001",
    "sf0.01 (the driver's Verify scale)" -> "/root/testdata/sf0.01")

  for ((label, dir) <- scales)
    test(s"every gate's EXECUTED (post-AQE) plan keeps WholeStageCodegen at $label, or is an allowlisted driver-result frame") {
      val wscgRe = """\*\(\d+\)""".r
      val broken = scala.collection.mutable.ListBuffer.empty[String]
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        try {
          val df = fn(spark, dir)
          // drive THIS QueryExecution (finalizes AQE on the object we read)
          df.queryExecution.executedPlan.execute().count()
          val plan = df.queryExecution.executedPlan.toString
          val hasWscg = wscgRe.findFirstIn(plan).nonEmpty
          if (!hasWscg && !noWscgOk.contains(name)) {
            broken += s"$name (top: ${plan.linesIterator.take(1).mkString.take(100)})"
          }
          // the allowlist must stay honest: an allowlisted gate that DOES
          // codegen now should leave the list
          if (hasWscg && noWscgOk.contains(name)) {
            broken += s"$name: allowlisted as codegen-free but renders WSCG — remove it from noWscgOk"
          }
          // sanity: an AQE-wrapped plan we claim to have executed must be final
          if (plan.contains("AdaptiveSparkPlan") && !plan.contains("isFinalPlan=true")) {
            broken += s"$name: AQE plan not finalized — the execute() didn't drive this QueryExecution"
          }
        } finally Memo.sweep(spark)
      }
      assert(broken.isEmpty,
        s"executed-plan codegen contract violations at $label:\n  ${broken.mkString("\n  ")}")
    }
}
