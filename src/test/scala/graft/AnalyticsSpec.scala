package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** Analytics battery: semantic invariants the oracle can't phrase (it
  * only proves result equality) plus the plan shapes that carry the
  * 100 TB claims. */
class AnalyticsSpec extends SparkTestBase {

  test("histogram broadcasts the 5-row range side and bins partition the rows") {
    val out = Analytics.histogram(spark, sf).cache()
    try {
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"range side must broadcast, not shuffle:\n$plan")
      // bins cover every row exactly once
      val binned = out.agg(sum("n")).collect()(0).getLong(0)
      assert(binned == Tables.events(spark, sf).count())
      // bin ids live in [0, 9]
      assert(out.where(col("bin") < 0 || col("bin") > 9).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("journeys prunes per-user history before aggregating (WindowGroupLimit)") {
    val out = Analytics.journeys(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"per-user top-k must prune before the window:\n$plan")
    assert(!plan.contains("Sort [ts"), "no global sort")
    // journey user counts total the user population
    val total = out.agg(sum("n_users")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).select("user_id").distinct().count())
    // no journey is longer than 5 hops
    assert(out.where(size(split(col("journey"), ">")) > 5).count() == 0)
  }

  test("funnel: conversions are a subset of clickers and lags are non-negative") {
    val out = Analytics.funnel(spark, sf).cache()
    try {
      val clickers = Tables.events(spark, sf)
        .where(col("event_type") === "click").select("user_id").distinct().count()
      assert(out.count() == clickers, "one funnel row per clicker")
      assert(out.where(col("converted") && col("lag_secs") < 0).count() == 0)
      assert(out.where(!col("converted") && col("first_purchase_ts").isNotNull)
        .count() == 0)
    } finally { out.unpersist(); () }
  }

  test("merge upsert: action counts reconcile with base and batch sizes") {
    val out = Analytics.mergeUpsert(spark, sf).cache()
    try {
      val base = Tables.events(spark, sf)
      val nBase = base.count()
      val nUpd = base.where(col("event_id") % 100 === 0).count()
      val byAction = out.groupBy("merge_action").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(byAction("updated") == nUpd)
      assert(byAction("inserted") == 50L)
      assert(byAction("unchanged") == nBase - nUpd)
      assert(out.count() == nBase + 50)
      // updated rows actually carry the patch
      assert(out.where(col("merge_action") === "updated"
        && col("event_type") =!= "patched").count() == 0)
    } finally { out.unpersist(); () }
  }

  test("running total: final prefix equals the user's exact total") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("running_n").desc)
    val last = Analytics.runningTotal(spark, sf)
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select(col("user_id"), col("running_value"))
    val expect = Tables.events(spark, sf).groupBy("user_id")
      .agg(graft.operators.exactSum(col("value")).as("running_value"))
    assert(last.except(expect).count() == 0)
    assert(expect.except(last).count() == 0)
  }

  test("k-anonymity flags exactly the under-k quasi-identifier groups") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // group A: 6 distinct users (safe at k=5); group B: 6 rows but only
    // 3 distinct users (suppressed — row count alone must NOT clear it);
    // group C: value 1000 lands in the clamped top bucket with 1 user
    val rows =
      (1L to 6L).map(u => (u, ts0, u, "click", 50.0)) ++
      (7L to 12L).map(u => (u, ts0, 100L + u % 3, "view", 250.0)) ++
      Seq((20L, ts0, 99L, "error", 1000.0))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.kAnonymityEvents(ev, k = 5)
      .select("event_type", "vbucket", "n", "n_users", "suppressed")
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("click") == ("click", 0L, 6L, 6L, false))
    assert(out("view") == ("view", 2L, 6L, 3L, true))
    assert(out("error") == ("error", 9L, 1L, 1L, true))
  }

  test("l-diversity: homogeneous groups fail, uniform groups pass, entropy matches") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // group A ("click"): 6 rows all in bucket 0 — k-anonymous by users
    // but HOMOGENEOUS: n_sensitive 1, entropy 0, both criteria fail.
    // group B ("view"): 2 rows each in buckets 0/1/2/3 — distinct-l 4,
    // entropy ln 4, clearly past both l = 3 thresholds (a 3-bucket
    // uniform group would sit exactly AT ln 3 — the boundary the raw
    // comparison exists for, deliberately avoided in a closed-form
    // fixture).
    // group C ("error"): 9 rows bucket 0 + 1 row bucket 9 — distinct-l 2
    // fails, and entropy 0.325 also fails (the skew case entropy-l is
    // stricter about).
    val rows =
      (1L to 6L).map(u => (u, ts0, u, "click", 50.0)) ++
      Seq((10L, ts0, 1L, "view", 50.0), (11L, ts0, 2L, "view", 60.0),
        (12L, ts0, 3L, "view", 150.0), (13L, ts0, 4L, "view", 160.0),
        (14L, ts0, 5L, "view", 250.0), (15L, ts0, 6L, "view", 260.0),
        (16L, ts0, 7L, "view", 350.0), (17L, ts0, 8L, "view", 360.0)) ++
      ((20L to 28L).map(u => (u, ts0, u, "error", 10.0)) :+
        ((29L, ts0, 29L, "error", 999.0)))
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Analytics.lDiversityEvents(ev, l = 3)
      .select("event_type", "n", "n_sensitive", "entropy", "diverse", "entropy_ok")
      .as[(String, Long, Long, Double, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("click") == ("click", 6L, 1L, 0.0, false, false))
    val lnN = BigDecimal(math.log(4.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("view") == ("view", 8L, 4L, lnN, true, true))
    val entC = BigDecimal(-(0.9 * math.log(0.9) + 0.1 * math.log(0.1)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("error") == ("error", 10L, 2L, entC, false, false))
  }
}
