package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Relational, TimeWindows}

/** Hand-computed micro-fixtures for the relational battery
  * (FIXTURES.md §D; semantics mirror /root/reference/sensor_data_etl.py). */
class RelationalSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("pivot with fixed value list + fillna defaults (A2/P11)") {
    // 2 groups, 3 event types, one type missing per group
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), "click", 1.0),
      (1L, ts("2024-01-01 11:00:00"), "error", 2.0),
      (2L, ts("2024-01-01 10:30:00"), "view", 3.0),
      (2L, ts("2024-01-01 12:00:00"), "click", 4.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val wide = df.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "view"))
      .agg(max(col("value")))
      .na.fill(Map("click" -> 0.0, "error" -> 0.0, "view" -> 21.0))
      .orderBy("user_id")
      .collect()
    assert(wide.length == 2)
    val r1 = wide(0)
    assert(r1.getAs[Double]("click") == 1.0 && r1.getAs[Double]("error") == 2.0
      && r1.getAs[Double]("view") == 21.0) // missing view -> O2-style default
    val r2 = wide(1)
    assert(r2.getAs[Double]("click") == 4.0 && r2.getAs[Double]("error") == 0.0
      && r2.getAs[Double]("view") == 3.0)
  }

  test("pivot first(ignoreNulls) keeps a non-null per group (A2 reference semantics)") {
    val df = Seq((1L, "a", Option.empty[Double]), (1L, "a", Some(5.0)))
      .toDF("k", "t", "v")
    val out = df.groupBy("k").pivot("t", Seq("a")).agg(first(col("v"), ignoreNulls = true))
      .collect().head
    assert(out.getAs[Double]("a") == 5.0)
  }

  test("when/otherwise normalization ('CO ' -> 'CO' analog, P8)") {
    val df = Seq("click", "view", "signup", "purchase").toDF("event_type")
    val out = df.select(
      when(col("event_type") === "click" || col("event_type") === "view", "browse")
        .when(col("event_type") === "signup", "onboard")
        .otherwise(col("event_type")).as("kind"))
      .as[String].collect().toSeq
    assert(out == Seq("browse", "browse", "onboard", "purchase"))
  }

  test("dropna drops exactly rows with any null (P12)") {
    val df = Seq((Some(1.0), Some(2.0)), (Some(1.0), None), (None, None))
      .toDF("a", "b")
    assert(df.na.drop().count() == 1)
  }

  test("orderBy+limit is deterministic top-k with unique tiebreak (O1/O2)") {
    val out = Relational.orderbyTopk(spark, sf).collect()
    assert(out.length == 100)
    val values = out.map(_.getAs[Double]("value")).toSeq
    assert(values == values.sorted(Ordering[Double].reverse))
  }

  test("broadcast join plan actually broadcasts the dim (J3)") {
    val plan = Relational.joinBroadcast(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin in:\n$plan")
  }

  test("filter + projection push down to the parquet scan (P1/P5)") {
    val plan = Relational.filterConj(spark, sf).queryExecution.executedPlan.toString
    // event_id/ts/event_type/value only — props and user_id pruned
    assert(!plan.contains("props"), "column pruning failed: props still read")
    assert(plan.contains("PushedFilters: ["), "no filters pushed to scan")
  }

  test("compound-key join matches single-key double-check (J1)") {
    val n = Relational.joinCompound(spark, sf).count()
    // every fact row matches exactly one dim row -> row count preserved
    assert(n == Tables.events(spark, sf).count())
  }

  test("sketch quantile trim approximates the exact ntile trim (A6 scale path)") {
    val exact = TimeWindows.quantileTrim(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val sketch = TimeWindows.quantileTrimSketch(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    exact.foreach { case (t, n) =>
      val ns = sketch(t)
      assert(math.abs(ns - n) <= math.max(10, n / 5), s"$t: exact $n vs sketch $ns")
    }
  }

  test("quantile trim keeps the middle half (A6)") {
    val trimmed = TimeWindows.quantileTrim(spark, sf)
    val byType = trimmed.collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val totals = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    byType.foreach { case (t, n) =>
      val total = totals(t)
      assert(math.abs(n - total / 2.0) <= 1.0, s"$t: trimmed $n of $total")
    }
  }

  test("json extraction: malformed documents yield nulls, aggregates skip them") {
    import spark.implicits._
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val df = Seq(("""{"k": 10}""", "a"), ("""{"k": 60}""", "a"), ("not json", "a"))
      .toDF("props", "event_type")
    val schema = StructType(Seq(StructField("k", LongType)))
    val out = df.withColumn("p", from_json(col("props"), schema))
      .select(col("event_type"), col("p.k").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("k_sum"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))
      .collect().head
    assert(out.getAs[Long]("n") == 3)       // count(*) counts the bad row
    assert(out.getAs[Long]("k_sum") == 70)  // sum skips its null
    assert(out.getAs[Long]("n_high") == 1)
  }

  test("approx distinct count is within HLL error of the exact count") {
    val exact = Relational.countDistinctUsers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val approx = Relational.approxDistinctUsers(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users_approx")).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.15, s"$k: approx $a vs exact $n")
    }
  }

  test("hash sampling is deterministic, partitioning-independent, and splits disjointly") {
    val s1 = Relational.hashSample(spark, sf, 0.2).collect().map(_.getLong(0)).toSet
    val s2 = Relational.hashSample(spark, sf, 0.2).collect().map(_.getLong(0)).toSet
    assert(s1 == s2)
    // repartitioned input yields the SAME sample (the point vs sampleBy)
    val ids3 = Tables.events(spark, sf).repartition(13)
      .where(pmod(xxhash64(col("user_id"), lit(42L)), lit(10000L)) < 2000L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(ids3 == s1)
    // complement bucket range is disjoint and the union covers everything
    val rest = Tables.events(spark, sf)
      .where(pmod(xxhash64(col("user_id"), lit(42L)), lit(10000L)) >= 2000L)
    assert(rest.count() + s1.size == Tables.events(spark, sf).count())
    // fraction lands near 20% of USERS (sampling is by user key)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    val sampledUsers = Relational.hashSample(spark, sf, 0.2)
      .select("user_id").distinct().count()
    assert(math.abs(sampledUsers.toDouble / users - 0.2) < 0.1,
      s"$sampledUsers of $users users")
  }
}
