package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-series join operators a training-data/sensor pipeline needs but
  * vanilla Spark SQL lacks as first-class operators: as-of join (attach
  * the most recent dimension state ≤ each event's timestamp) and range
  * join (events within an interval). Both are built by COMPOSITION of
  * Spark operators (brief preference (a)) in shapes that survive 100 TB:
  *
  *  - as-of: union + per-series ordered window with `last(ignoreNulls)`.
  *    ONE shuffle on the series key, per-partition sort bounded by series
  *    length — the same cost as any series window, and strictly cheaper
  *    than the naive inequality join (which Catalyst can only run as a
  *    broadcast-nested-loop or a per-key sort-merge with range filter).
  *  - range: bin the time axis, explode each interval to the bins it
  *    covers (bounded fan-out = interval length / bin width), equi-join
  *    events to interval-bins on (key, bin), then exact-filter the
  *    containment. The inequality never reaches the join condition, so
  *    the plan is a plain shuffled hash/sort-merge join — the standard
  *    binned-range-join trick used by warehouse engines.
  *
  * Both queries oracle against DuckDB: the as-of result is checked
  * against DuckDB's native `ASOF JOIN`, proving the window composition
  * implements the canonical semantics.
  */
object TemporalJoins {

  /** Generic as-of join: attach to every left row the `attach` columns of
    * the latest right row with right.ts <= left.ts within the same `by`
    * key (same-instant right rows win, matching ASOF's `>=`).
    * Implemented as union + `last(ignoreNulls)` over (by ORDER BY ts,
    * kind DESC ROWS UNBOUNDED PRECEDING..CURRENT): right rows sort before
    * left rows at equal ts, so the carried value is exactly the as-of
    * match. ONE shuffle on the key — never an inequality join. Left rows
    * whose key has no prior right row keep nulls (ASOF's unmatched-drop
    * can be recovered by filtering them). */
  def asofJoin(left: DataFrame, right: DataFrame, by: String, ts: String,
      attach: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(attach.forall(!leftCols.contains(_)),
      s"attach columns $attach must not already exist on the left side")
    // canonical ASOF precondition: right must be unique per (by, ts) —
    // ties among right rows at the same instant would be order-undefined
    val kind = "__asof_kind"
    val state = "__asof_state"
    val l = attach.foldLeft(left.withColumn(kind, lit(0))) { (df, a) =>
      df.withColumn(a, lit(null).cast(right.schema(a).dataType))
    }
    val extra = leftCols.filterNot(c => c == by || c == ts)
    val r = extra.foldLeft(right.select((Seq(by, ts) ++ attach).map(col): _*)
      .withColumn(kind, lit(1))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols ++ attach :+ kind).map(col): _*)
    val w = Window.partitionBy(by)
      .orderBy(col(ts).asc, col(kind).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the matched right ROW as one struct, not per-column
    // last(ignoreNulls): a right row whose attach value is legitimately
    // NULL must be attached as NULL, not skipped in favor of an older
    // non-null value (the struct is non-null for every right row, so
    // ignoreNulls only skips the left rows' placeholder)
    l.select((leftCols ++ attach :+ kind).map(col): _*).unionAll(r)
      .withColumn(state, when(col(kind) === 1, struct(attach.map(col): _*)))
      .withColumn(state, last(col(state), ignoreNulls = true).over(w))
      .where(col(kind) === 0)
      .select(leftCols.map(col) ++ attach.map(a => col(s"$state.$a").as(a)): _*)
  }

  /** Broadcast as-of join — the plan to pick when the RIGHT side is
    * dim-sized: the window form above must shuffle the ENTIRE left side
    * on the key, but with the right side collected (sorted per key) and
    * broadcast, the as-of lookup is a per-row binary search in a narrow
    * map-only pass — zero shuffle of the fact table. The exact analog of
    * choosing BroadcastHashJoin over SortMergeJoin, hand-built because
    * Catalyst has no broadcast strategy for as-of semantics. Same
    * contract as [[asofJoin]]: latest right row with ts' <= ts per key,
    * right unique per (key, ts), unmatched rows keep nulls. Timestamps
    * compare at micros precision on both sides. */
  def asofJoinBroadcast(left: DataFrame, right: DataFrame, by: String,
      ts: String, attach: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(attach.forall(!leftCols.contains(_)),
      s"attach columns $attach must not already exist on the left side")
    val spark = left.sparkSession
    // a right row with NULL ts can never be an as-of match — drop before
    // collecting (sortBy would NPE on it); left NULL ts handled per row
    val rightRows = right
      .where(col(ts).isNotNull)
      .select(col(by) +: unix_micros(col(ts)).as("__us") +: attach.map(col): _*)
      .collect()
    val byKey: Map[Any, (Array[Long], Array[Array[Any]])] = rightRows
      .groupBy(_.get(0))
      .view.mapValues { rows =>
        val sorted = rows.sortBy(_.getLong(1))
        (sorted.map(_.getLong(1)),
          sorted.map(r => Array.tabulate[Any](attach.length)(i => r.get(2 + i))))
      }.toMap
    val bc = spark.sparkContext.broadcast(byKey)
    // attached fields must be nullable regardless of the right schema:
    // unmatched left rows carry nulls
    val outSchema = org.apache.spark.sql.types.StructType(
      left.schema.fields ++ attach.map(a => right.schema(a).copy(nullable = true)))
    val byIdx = leftCols.indexOf(by)
    val n = leftCols.length
    // helper-column name must not collide with a left column
    val usCol = Iterator.from(0).map(i => s"__asof_us$i")
      .dropWhile(leftCols.contains).next()
    val withUs = left.withColumn(usCol, unix_micros(col(ts)))
    val result = withUs.mapPartitions { it =>
      it.map { row =>
        val key = row.get(byIdx)
        val attached: Array[Any] = if (row.isNullAt(n)) {
          Array.fill[Any](attach.length)(null) // NULL left ts: no match
        } else bc.value.get(key) match {
          case None => Array.fill[Any](attach.length)(null)
          case Some((tss, vals)) =>
            // greatest index with tss(i) <= us (binary search)
            val us = row.getLong(n)
            var lo = 0
            var hi = tss.length - 1
            var found = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tss(mid) <= us) { found = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (found < 0) Array.fill[Any](attach.length)(null) else vals(found)
        }
        org.apache.spark.sql.Row.fromSeq(
          (0 until n).map(row.get) ++ attached)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    result.toDF()
  }

  /** The gate query: as-of join of every event to its user's most recent
    * day-state (per-(user, day) max(value) stamped at the day's
    * midnight), checked against DuckDB's native ASOF JOIN. */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val dim = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max("value").as("asof_max"))
      .select(col("user_id"), col("day").cast("timestamp").as("ts"),
        col("asof_max"))
    asofJoin(ev.select("event_id", "user_id", "ts", "value"), dim,
      by = "user_id", ts = "ts", attach = Seq("asof_max"))
  }

  /** FORWARD as-of join — attach the EARLIEST right row with ts' ≥ each
    * left ts (the "next scheduled change / next maintenance window"
    * lookup; [[asofJoin]] mirrored in time). Identical single-shuffle
    * union-window plan, with the per-series sort DESCENDING so the
    * running `last(ignoreNulls)` carries the nearest FOLLOWING right
    * row; the kind tiebreak keeps the match inclusive at equal
    * timestamps. Same contract: right unique per (key, ts), unmatched
    * left rows keep nulls. Oracled against DuckDB's native
    * `ASOF JOIN ... ON l.ts <= r.ts`, proving the mirrored composition
    * implements the canonical forward semantics. */
  def asofJoinForward(left: DataFrame, right: DataFrame, by: String,
      ts: String, attach: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(attach.forall(!leftCols.contains(_)),
      s"attach columns $attach must not already exist on the left side")
    val kind = "__asof_kind"
    val state = "__asof_state"
    val l = attach.foldLeft(left.withColumn(kind, lit(0))) { (df, a) =>
      df.withColumn(a, lit(null).cast(right.schema(a).dataType))
    }
    val extra = leftCols.filterNot(c => c == by || c == ts)
    val r = extra.foldLeft(right.select((Seq(by, ts) ++ attach).map(col): _*)
      .withColumn(kind, lit(1))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols ++ attach :+ kind).map(col): _*)
    val w = Window.partitionBy(by)
      .orderBy(col(ts).desc, col(kind).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select((leftCols ++ attach :+ kind).map(col): _*).unionAll(r)
      .withColumn(state, when(col(kind) === 1, struct(attach.map(col): _*)))
      .withColumn(state, last(col(state), ignoreNulls = true).over(w))
      .where(col(kind) === 0)
      .select(leftCols.map(col) ++ attach.map(a => col(s"$state.$a").as(a)): _*)
  }

  /** Gate form of [[asofJoinForward]]: each event looks UP to the next
    * day-start dimension row at-or-after it (same dim as [[asofJoin]],
    * so the two gates differ only in direction). */
  def asofForward(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val dim = ev
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(max("value").as("next_max"))
      .select(col("user_id"), col("day").cast("timestamp").as("ts"),
        col("next_max"))
    asofJoinForward(ev.select("event_id", "user_id", "ts", "value"), dim,
      by = "user_id", ts = "ts", attach = Seq("next_max"))
  }

  /** Trailing one-hour DISTINCT count per user — "how many distinct
    * event types did this user produce in the last hour", the
    * cardinality twin of [[rangeRollingStats]]. Plain window aggregates
    * cannot COUNT(DISTINCT) in Spark; `size(collect_set(..))` over the
    * same integer-micros RANGE frame is the exact declarative form —
    * per-frame state is bounded by the type alphabet, so the window
    * stays memory-safe at any fact volume (for unbounded-cardinality
    * columns the 100 TB variant swaps collect_set for an HLL partial —
    * same frame, the [[graft.operators.Analytics.profileSketch]]
    * trade). Same single user_id shuffle + per-series sort as every
    * series window. */
  def rangeDistinctTypes(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(-3600000000L, Window.currentRow)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("n_types_1h", size(collect_set(col("event_type")).over(w)))
      .withColumn("n_events_1h", count(lit(1)).over(w))
      .select("event_id", "user_id", "ts", "event_type",
        "n_types_1h", "n_events_1h")
  }

  /** Batch sessionization: split each user's event stream into sessions
    * at idle gaps > gapMinutes (the batch twin of the streaming
    * `EventStreams.sessionize` state machine). Classic two-window
    * composition: lag finds the gap, a running sum of the gap flags
    * numbers the sessions, then one aggregation per (user, session).
    * Both windows share one shuffle on the series key; the final agg adds
    * a partial-aggregated exchange on (user, session) — bounded by
    * session count, far below event count. Gap math
    * uses whole epoch seconds (unix_timestamp) so the DuckDB oracle's
    * floor(epoch(ts)) reproduces it exactly. */
  def sessionize(s: SparkSession, d: String, gapMinutes: Int = 30): DataFrame = {
    val ev = Tables.events(s, d)
    val wOrd = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev_ts").isNull
          || unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))
             > gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("session_id", sum("new_sess").over(wRun))
      .groupBy("user_id", "session_id")
      .agg(min("ts").as("s_start"), max("ts").as("s_end"),
        count(lit(1)).as("n_events"), exactSum(col("value")).as("value_sum"))
  }

  /** Rolling row-window statistics per series: mean/min/max over the
    * current row plus the nRows PRECEDING rows (frame size nRows + 1 —
    * the SQL `n PRECEDING AND CURRENT ROW` convention), ordered by
    * (ts, event_id) for a unique tiebreak. The mean uses the
    * DECIMAL-exact sum over the frame so the result is bit-reproducible
    * cross-engine. Same single-shuffle series window shape as every
    * other per-series operator here. */
  def rollingStats(s: SparkSession, d: String, nRows: Int = 3): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-nRows, Window.currentRow)
    Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("ts"), col("value"),
      (sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double")
        / count(lit(1)).over(w)).as("roll_avg"),
      min("value").over(w).as("roll_min"),
      max("value").over(w).as("roll_max"))
  }

  /** Rolling z-score anomaly detection: flag events whose value sits ≥ 3
    * sample standard deviations from the mean of the user's TRAILING
    * window (the `nRows` rows strictly before, so the tested value never
    * contaminates its own baseline). The moments come from exact DECIMAL
    * sums (Σv as DECIMAL(18,2), Σv² as the decimal product — both
    * order-independent), so mean/var/z are the same correctly-rounded
    * double chain in Spark and DuckDB and the |z| ≥ 3 cut can't flip on
    * partial-aggregation order. Windows shorter than `minN` emit no
    * verdict (a 3-row baseline flags everything).
    *
    * 100 TB shape: one series-partitioned window per user — shuffles by
    * user_id once, no global sort, no self-join; the standard monitoring
    * pass an events pipeline runs before ingestion. */
  def anomalyZscore(s: SparkSession, d: String, nRows: Int = 20,
      minN: Int = 10, cut: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(-nRows, -1)
    val dec = col("value").cast(DecimalType(18, 2))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        sum(dec).over(w).cast("double").as("s1"),
        sum(dec * dec).over(w).cast("double").as("s2"),
        count(lit(1)).over(w).as("n"))
      .where(col("n") >= minN)
      .withColumn("mean", col("s1") / col("n"))
      .withColumn("variance",
        (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
      .where(col("variance") > 0)
      .withColumn("z", (col("value") - col("mean")) / sqrt(col("variance")))
      .where(abs(col("z")) >= cut)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        round(col("mean"), 6).as("base_mean"),
        round(col("z"), 6).as("z"))
  }

  /** Binned range join: count each user-day's click events falling inside
    * that user-day's purchase window [min purchase ts, max purchase ts].
    * Intervals explode to the hour bins they cover (sequence over
    * floor(epoch/3600) — fan-out bounded by interval length), clicks carry
    * their single hour bin, and the join is a pure equi-join on
    * (user_id, bin) followed by the exact BETWEEN filter. Intervals with
    * zero matching clicks are restored by a left join (bounded dim side). */
  def rangeJoin(s: SparkSession, d: String, binSeconds: Long = 3600L): DataFrame = {
    val ev = Tables.events(s, d)
    val iv = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min("ts").as("s_ts"), max("ts").as("e_ts"))
    val ivBins = iv.withColumn("bin",
      explode(sequence(
        (unix_timestamp(col("s_ts")) / binSeconds).cast("long"),
        (unix_timestamp(col("e_ts")) / binSeconds).cast("long"))))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"),
        (unix_timestamp(col("ts")) / binSeconds).cast("long").as("bin"))
    // each click has exactly ONE bin, so a (click, interval) pair can
    // match at most once — no post-join dedup needed
    val matched = ivBins.join(clicks, Seq("user_id", "bin"))
      .where(col("c_ts") >= col("s_ts") && col("c_ts") <= col("e_ts"))
      .groupBy("user_id", "day", "s_ts", "e_ts")
      .agg(count(lit(1)).as("n_clicks"))
    iv.join(matched, Seq("user_id", "day", "s_ts", "e_ts"), "left")
      .select(col("user_id"), col("day"), col("s_ts"), col("e_ts"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
  }

  /** TIME-range rolling stats: per-user trailing ONE-HOUR window (RANGE
    * frame over event-time, not a row count) — the form monitoring
    * queries actually want ("events in the last hour"), and a shape
    * `rollingStats`' ROWS frame cannot express when series are
    * irregularly sampled. The frame bound is integer epoch-MICROS on
    * both engines (Spark `unix_micros` / DuckDB `epoch_us`), so frame
    * membership is exact integer comparison — no float time math — and
    * RANGE frames include all timestamp peers regardless of intra-tie
    * order, so the result is deterministic without a tiebreak column.
    * Same scale shape as any series window: one shuffle on user_id,
    * per-partition sort. */
  def rangeRollingStats(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(-hourUs, 0L)
    Tables.events(s, d).select(
      col("event_id"), col("user_id"), col("ts"), col("value"),
      count(lit(1)).over(w).as("n_1h"),
      sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double")
        .as("sum_1h"),
      (sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double")
        / count(lit(1)).over(w)).as("avg_1h"))
  }

  /** SCD2 (slowly-changing-dimension type 2) interval build — the CDC
    * primitive that turns an event log into a dimension history: per
    * user, consecutive runs of the same `event_type` collapse to one
    * row with [valid_from, valid_to) validity and an `is_current` flag
    * on the open interval. Three window passes over ONE shuffle on
    * user_id (lag → change flag, running sum → run id, lead over the
    * per-run aggregate → interval close); all arithmetic is
    * integer/timestamp-exact, so the gate oracles bit-for-bit. At
    * 100 TB this is the standard "latest-state + full history from an
    * append-only log" build, partitioned by the dimension key. */
  def scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val runs = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("chg",
        when(lag(col("event_type"), 1).over(byTs).isNull
          || lag(col("event_type"), 1).over(byTs) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val byRun = Window.partitionBy("user_id").orderBy(col("run_id"))
    runs.groupBy(col("user_id"), col("run_id"))
      .agg(min(col("event_type")).as("status"), // constant within a run
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("run_id"), col("status"),
        col("valid_from"), col("valid_to"), col("n_events"), col("is_current"))
  }

  /** Exact single-changepoint detection per series: the split k that
    * maximizes |mean(v[1..k]) − mean(v[k+1..n])| — the binary-segmentation
    * step of classic offline changepoint analysis, here as one window
    * pass (no recursion; recurse on the halves for multi-changepoint).
    *
    * Determinism recipe: values become integer cents (DECIMAL(18,2)
    * route), the running sum S_k is an exact BIGINT cumsum, and the
    * score's numerator |S_k·(n−k) − (S_n−S_k)·k| is computed in exact
    * integer arithmetic; ONE correctly-rounded long→double cast and ONE
    * division produce a bit-identical score on any IEEE engine, so the
    * per-series argmax (ties → smallest k) cannot flip cross-engine.
    * Windows partition by user_id (bounded series — the same contract as
    * [[rollingStats]]); nothing global. The BIGINT numerator holds to
    * ~2^63 ≈ series of 10^9 rows at 10^4-cent values — beyond that,
    * move the numerator to DECIMAL(38,0). */
  def changepoint(s: SparkSession, d: String, minN: Int = 8): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val cum = byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("user_id")
    val scored = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .withColumn("k", row_number().over(byTs).cast("long"))
      .withColumn("sk", sum("cents").over(cum))
      .withColumn("n", count(lit(1)).over(whole))
      .withColumn("stot", sum("cents").over(whole))
      .where(col("n") >= minN && col("k") < col("n"))
      .withColumn("score",
        abs(col("sk") * (col("n") - col("k")) - (col("stot") - col("sk")) * col("k"))
          .cast("double") / (col("k") * (col("n") - col("k"))).cast("double"))
    val best = Window.partitionBy("user_id").orderBy(col("score").desc, col("k").asc)
    scored.withColumn("rn", row_number().over(best)).where(col("rn") === 1)
      .select(col("user_id"), col("k").as("split_k"), col("n"),
        col("ts").as("split_ts"),
        round(col("sk").cast("double") / 100.0 / col("k"), 6).as("mean_left"),
        round((col("stot") - col("sk")).cast("double") / 100.0 / (col("n") - col("k")), 6)
          .as("mean_right"),
        round(col("score") / 100.0, 6).as("shift"))
  }

  /** Gaps-and-islands interval merge: each event opens a hold window
    * [ts, ts + holdSec), per-user overlapping/touching windows coalesce
    * into maximal "islands" — the canonical uptime/coverage-interval
    * consolidation (and the offline twin of session windows with a
    * fixed hold instead of an inactivity gap: an island's end is the
    * max END seen so far, which a plain lag-gap sessionizer gets wrong
    * whenever an early long interval swallows later short ones).
    *
    * Plan: ONE shuffle on user_id, one per-series sort; the island
    * boundary is `start > running max(end) over preceding rows`, the
    * island id a running sum of boundary flags, then a groupBy on
    * (user, island) that re-uses the same hashpartitioning — no second
    * shuffle. All arithmetic is exact epoch-micros LONGs, so the oracle
    * hash-matches with no rounding key. Per-user series are bounded
    * (the [[rollingStats]] contract); nothing global. */
  def mergeIntervals(s: SparkSession, d: String, holdSec: Long = 900L): DataFrame = {
    val byStart = Window.partitionBy("user_id").orderBy(col("st"), col("event_id"))
    val prior = byStart.rowsBetween(Window.unboundedPreceding, -1)
    val cum = byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("st"))
      .withColumn("en", col("st") + lit(holdSec * 1000000L))
      .withColumn("new_island",
        when(col("st") > coalesce(max(col("en")).over(prior), lit(Long.MinValue)), 1L)
          .otherwise(0L))
      .withColumn("island_id", sum(col("new_island")).over(cum))
      .groupBy(col("user_id"), col("island_id"))
      .agg(min(col("st")).as("island_start_us"),
        max(col("en")).as("island_end_us"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_sec",
        (col("island_end_us") - col("island_start_us")) / lit(1000000L))
  }
}
