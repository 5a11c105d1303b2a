package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Grouped top-k (VERDICT r5 #7 / r6 #7): per-key ranking must never
  * plan a global sort — the shuffle is hashpartitioning on the key and
  * Spark 4's WindowGroupLimit prunes each partition to k rows per key
  * before the final window. */
class TopkPerKeySpec extends SparkTestBase {

  test("per-user top-5 matches an independent groupBy derivation") {
    val k = 5
    val out = Relational.topkPerKey(spark, sf, k).cache()
    try {
      // every user contributes at most k rows, and exactly min(k, n_events)
      val perUser = out.groupBy("user_id").count()
      assert(perUser.where(col("count") > k).count() == 0)
      val expected = Tables.events(spark, sf).groupBy("user_id")
        .agg(least(count(lit(1)), lit(k.toLong)).as("expect_n"))
      val mismatched = perUser.join(expected, "user_id")
        .where(col("count") =!= col("expect_n")).count()
      assert(mismatched == 0)
      // rank-1 rows are exactly each user's max value
      val top1 = out.where(col("rank") === 1).select("user_id", "value")
      val maxes = Tables.events(spark, sf).groupBy("user_id")
        .agg(max("value").as("value"))
      assert(top1.except(maxes).count() == 0)
    } finally { out.unpersist(); () }
  }

  test("plan: WindowGroupLimit per-key pruning, no global sort") {
    val plan = Relational.topkPerKey(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pruning in:\n$plan")
    assert(!plan.contains("rangepartitioning"),
      s"per-key top-k must not global-sort:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"),
      s"expected key-hash exchange in:\n$plan")
  }
}
