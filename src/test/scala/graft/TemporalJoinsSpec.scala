package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

/** As-of / range join composition operators (the DuckDB oracle at the
  * gate checks them against native ASOF JOIN / BETWEEN-join semantics;
  * these specs pin the fine-grained tie and boundary rules). */
class TemporalJoinsSpec extends SparkTestBase {

  test("asof join: every event gets its own day's running max, never a future one") {
    val out = TemporalJoins.asofJoin(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    assert(out.count() == ev.count())          // left-preserving
    assert(out.where(col("asof_max").isNull).count() == 0)
    // the attached value is that user-day's max — join back and compare
    val dayMax = ev.groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max("value").as("expect_max"))
    val joined = out.withColumn("day", to_date(col("ts")))
      .join(dayMax, Seq("user_id", "day"))
    assert(joined.where(col("asof_max") =!= col("expect_max")).count() == 0)
    out.unpersist()
  }

  test("asof join tie rule: a right row at the same instant wins (ASOF >= semantics)") {
    import spark.implicits._
    // planted fixture: left row exactly at a right row's ts must see THAT
    // row, not the earlier one (and a left row before any right row gets
    // null). Fixture-based because the sf testdata may contain no
    // exactly-aligned timestamps, which would make a data-driven check
    // vacuous.
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 01:00:00")
    val tEarly = java.sql.Timestamp.valueOf("2023-12-31 23:00:00")
    val left = Seq((1L, 5L, t1), (2L, 5L, tEarly)).toDF("id", "k", "ts")
    val right = Seq((5L, t0, 100), (5L, t1, 200)).toDF("k", "ts", "state")
    val got = TemporalJoins.asofJoin(left, right, "k", "ts", Seq("state"))
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("state"))).toMap
    assert(got(1L).contains(200), s"same-instant right row must win: $got")
    assert(got(2L).isEmpty, s"left row before any right row must be null: $got")
    // a matched right row whose attach value is NULL must attach as NULL,
    // not be skipped for an older non-null value
    val rightWithNull = Seq((5L, t0, Some(100)), (5L, t1, None))
      .toDF("k", "ts", "state")
    val gotNull = TemporalJoins.asofJoin(left.where(col("id") === 1L),
        rightWithNull, "k", "ts", Seq("state"))
      .collect().map(r => Option(r.getAs[Any]("state"))).head
    assert(gotNull.isEmpty, s"NULL attach of the matched row must survive: $gotNull")
  }

  test("range join: counts match a direct between-filter per interval") {
    val out = TemporalJoins.rangeJoin(spark, sf).cache()
    val ev = Tables.events(spark, sf).cache()
    // brute-force expectation via plain (user) equi-join + filter
    val iv = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min("ts").as("s_ts"), max("ts").as("e_ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val expect = iv.join(clicks, Seq("user_id"), "left")
      .groupBy("user_id", "day", "s_ts", "e_ts")
      .agg(sum(when(col("c_ts") >= col("s_ts") && col("c_ts") <= col("e_ts"), 1L)
        .otherwise(0L)).as("expect_n"))
    val cmp = out.join(expect, Seq("user_id", "day", "s_ts", "e_ts"), "full")
    assert(cmp.where(col("n_clicks").isNull || col("expect_n").isNull
      || col("n_clicks") =!= col("expect_n")).count() == 0)
    out.unpersist(); ev.unpersist()
  }

  test("generic asof join matches per-row brute force on random fixtures") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val leftRows = (0 until 200).map { i =>
      (i.toLong, rnd.nextInt(5).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L),
        rnd.nextDouble())
    }
    // right: unique per (key, ts) by construction (distinct ts grid)
    val rightRows = (0 until 60).map { j =>
      (rnd.nextInt(5).toLong,
        new java.sql.Timestamp(1700000000000L + j * 1700 * 1000L),
        rnd.nextInt(1000))
    }.distinct
    val left = leftRows.toDF("id", "k", "ts", "v")
    val right = rightRows.toDF("k", "ts", "state")
    val got = TemporalJoins.asofJoin(left, right, by = "k", ts = "ts",
        attach = Seq("state")).collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[Any]("state")).map(_.asInstanceOf[Int])).toMap
    val byKey = rightRows.groupBy(_._1)
    leftRows.foreach { case (id, k, ts, _) =>
      val expect = byKey.getOrElse(k, Seq.empty)
        .filter(!_._2.after(ts))
        .sortBy(_._2.getTime)
        .lastOption.map(_._3)
      assert(got(id) == expect, s"row $id key $k ts $ts: got ${got(id)}, want $expect")
    }
  }

  test("broadcast asof equals the window asof and plans with zero Exchange") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(7).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(90000) * 1000L),
        rnd.nextDouble())
    }.toDF("id", "k", "ts", "v")
    val right = (0 until 50).map { j =>
      (rnd.nextInt(7).toLong,
        new java.sql.Timestamp(1700000000000L + j * 1900 * 1000L),
        rnd.nextInt(1000))
    }.distinct.toDF("k", "ts", "state")
    val viaWindow = TemporalJoins.asofJoin(left, right, "k", "ts", Seq("state"))
      .orderBy("id").collect().toSeq
    val viaBroadcast = TemporalJoins.asofJoinBroadcast(left, right, "k", "ts", Seq("state"))
      .orderBy("id").collect().toSeq
    assert(viaWindow == viaBroadcast)
    val plan = TemporalJoins.asofJoinBroadcast(left, right, "k", "ts", Seq("state"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free broadcast asof:\n$plan")
  }

  test("sessionize: session count = 1 + number of over-gap jumps per user") {
    val out = TemporalJoins.sessionize(spark, sf).cache()
    val ev = Tables.events(spark, sf)
    // every event lands in exactly one session
    assert(out.agg(sum("n_events")).collect().head.getLong(0) == ev.count())
    // sessions of one user never overlap: next session starts after prev ends
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_id")
    val overlap = out.withColumn("prev_end", lag("s_end", 1).over(w))
      .where(col("prev_end").isNotNull && col("s_start") <= col("prev_end"))
    assert(overlap.count() == 0)
    // gap property: consecutive sessions are separated by > 30 min
    val tight = out.withColumn("prev_end", lag("s_end", 1).over(w))
      .where(col("prev_end").isNotNull
        && unix_timestamp(col("s_start")) - unix_timestamp(col("prev_end")) <= 1800)
    assert(tight.count() == 0)
    out.unpersist()
  }

  test("rolling stats: frame bounds respected and min <= avg <= max") {
    val out = TemporalJoins.rollingStats(spark, sf).cache()
    assert(out.where(col("roll_min") > col("roll_avg") + 1e-9
      || col("roll_avg") > col("roll_max") + 1e-9).count() == 0)
    // first row of each user: frame is just itself
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val firsts = out.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
    assert(firsts.where(col("roll_avg") =!= col("value")
      || col("roll_min") =!= col("value") || col("roll_max") =!= col("value")).count() == 0)
    out.unpersist()
  }

  test("range join: interval rows with zero clicks survive with n_clicks = 0") {
    val out = TemporalJoins.rangeJoin(spark, sf)
    val iv = Tables.events(spark, sf).where(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day")).count()
    assert(out.count() == iv.count())          // interval-preserving
  }
}
