package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-analytics battery: funnel conversion, cohort retention,
  * distribution histograms — the OLAP report shapes a production event
  * pipeline serves next to the relational/ML surface. All single-shuffle
  * declarative plans (partial-aggregated groupBys, co-partitioned or
  * broadcast joins), exact cross-engine math (integer counts, raw
  * double pass-through, identical IEEE expression trees). */
object Analytics {

  /** Click→purchase conversion funnel: per user with ≥ 1 click, the
    * first click, the first purchase AT OR AFTER that click, a
    * conversion flag, and the lag in whole seconds. The join explodes
    * each user's (first click × purchases) — bounded by per-user
    * purchase count, re-aggregated immediately; both sides hash on
    * user_id, so the join is one co-partitioned shuffle each at any
    * scale (the conditional min cannot be pre-aggregated because the
    * click anchor differs per user). */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val firstClick = ev.where(col("event_type") === "click")
      .groupBy("user_id").agg(min("ts").as("first_click_ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    firstClick.join(purchases, Seq("user_id"), "left")
      .groupBy("user_id", "first_click_ts")
      .agg(min(when(col("p_ts") >= col("first_click_ts"), col("p_ts")))
        .as("first_purchase_ts"))
      .withColumn("converted", col("first_purchase_ts").isNotNull)
      .withColumn("lag_secs",
        when(col("converted"),
          unix_timestamp(col("first_purchase_ts"))
            - unix_timestamp(col("first_click_ts"))))
  }

  /** Cohort retention: users grouped by their signup day (cohort), and
    * for each later day-offset the count of cohort members active that
    * day — the triangle every growth dashboard draws. The activity side
    * is pre-deduplicated to (user, day) BEFORE the join (one distinct
    * aggregate), so the join fan-out is bounded by active days per
    * user, not events; count_distinct at the end is exact (two-stage
    * aggregate). Offset 0 is signup-day activity; pre-signup activity
    * (possible for synthetic users with events before their signup
    * event) is excluded by the offset >= 0 guard. */
  def cohortRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cohort = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    cohort.join(active, Seq("user_id"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .where(col("day_offset") >= 0)
      .groupBy("cohort_day", "day_offset")
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** Per-user running total (cumulative balance): the ROWS UNBOUNDED
    * PRECEDING window every ledger/usage meter runs. Partitioned by
    * user — the shuffle is one hash exchange, each partition sorts its
    * own users' rows (no global sort). DECIMAL accumulation so the
    * running values are exact at every prefix, not just the total. */
  def runningTotal(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.events(s, d)
      .withColumn("running_value",
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .over(w).cast("double"))
      .withColumn("running_n", count(lit(1)).over(w))
      .select("user_id", "event_id", "ts", "value", "running_value", "running_n")
  }

  /** Week-over-week growth: weekly event totals per type with the
    * previous week's total (lag) and the growth delta — the trend
    * report shape. Weeks are epoch-day // 7 buckets (calendar-agnostic,
    * identical integer math on both engines); the lag window partitions
    * by type and holds |weeks| rows — bounded state at any scale. The
    * pct change divides two DECIMAL-exact doubles; rows with no prior
    * week carry NULLs through (lag's contract). The week bucket is true
    * FLOOR division of epoch-micros (subtract the always-non-negative
    * pmod remainder, then divide the exact multiple) — `div` alone
    * truncates toward zero and would disagree with a flooring engine on
    * pre-1970 timestamps; this form is sign-correct on both engines. */
  def wowGrowth(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("week")
    Tables.events(s, d)
      .withColumn("week", expr(
        "(unix_micros(ts) - pmod(unix_micros(ts), 604800000000)) div 604800000000"))
      .groupBy("event_type", "week")
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("value_sum"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .withColumn("n_delta", col("n") - col("prev_n"))
      .withColumn("pct_change",
        round((col("n") - col("prev_n")).cast("double") / col("prev_n") * 100.0, 6))
  }

  /** User journey signatures: each user's first `k` events as an ordered
    * type path ("click>view>purchase"), then the count of users per
    * distinct journey — the funnel-discovery / sequence-mining report.
    * The path is built from a WindowGroupLimit-pruned top-k per user
    * (rank ≤ k before any aggregation — no user's full history is ever
    * materialized), then one groupBy(user) with a POSITION-SORTED
    * array_join (sort_array on (rank, type) structs → deterministic
    * order regardless of shuffle arrival), then a journey-level count.
    * Two narrow aggregations; state bounded by k per user. */
  def journeys(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .groupBy("user_id")
      .agg(array_join(
        expr("transform(sort_array(collect_list(struct(rank, event_type))), x -> x.event_type)"),
        ">").as("journey"))
      .groupBy("journey")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Column profile — the ANALYZE TABLE / data-quality report: one row
    * per column with row count, null count, and EXACT distinct count.
    * All counts come from ONE aggregate over the table: Spark plans the
    * multi-count_distinct as a single Expand + two-stage aggregate (one
    * shuffle per distinct column set, one scan total — at 100 TB swap
    * exact for approx_count_distinct and it collapses to one partial-agg
    * pass; exact is kept here because the oracle can check it). The
    * 1-row aggregate is reshaped to long form LAZILY by a `stack`
    * generator over that row — no collect, nothing executes until the
    * report is acted on, and the reshape costs one Generate over one
    * row. `ts` profiles its epoch-micros projection so both engines
    * count the same precision. */
  def profile(s: SparkSession, d: String): DataFrame = {
    // the exact 1-row aggregate is session-shared with
    // [[profileSketchVerdict]] (r17): both gates paid their own Expand
    // multi-distinct pass over the identical aggregate before the memo
    val stackArgs = ProfileCols
      .map(c => s"'$c', `${c}__nulls`, `${c}__exact`").mkString(", ")
    memoProfileExact(s, d)
      .selectExpr("n_rows",
        s"stack(${ProfileCols.size}, $stackArgs) as " +
          "(column_name, n_nulls, n_distinct)")
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
  }

  /** The profiled column set, shared by the exact and sketch forms. */
  private val ProfileCols =
    Seq("event_id", "ts_us", "user_id", "event_type", "value", "props")

  /** Memoized 1-row exact profile aggregate (n_rows + per-column null and
    * exact-distinct counts) over the events table — ONE Expand
    * multi-distinct pass per session serves [[profile]] and
    * [[profileSketchVerdict]]. */
  private def memoProfileExact(s: SparkSession, d: String): DataFrame =
    graft.Memo.cached(s, s"profile_exact:$d") {
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val aggs = count(lit(1)).as("n_rows") +: ProfileCols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__exact")))
      ev.agg(aggs.head, aggs.tail: _*)
    }

  /** Key-skew diagnostic — the "will this groupBy/join skew?" report
    * every scale-out plan review starts with: per candidate key column,
    * the key count, row count, max/mean group size, interpolated
    * p50/p90/p99 of the group-size distribution, and the skew factor
    * (max/mean — the straggler multiplier a co-partitioned shuffle on
    * that key would suffer). Two partial-aggregated passes per key
    * (counts, then a percentile aggregate over |keys| rows); the
    * percentile interpolation and final divides are the identical IEEE
    * trees DuckDB's quantile_cont computes, so the report is
    * hash-exact cross-engine (the q_embed_neardup τ precedent). */
  def keySkew(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    def forKey(k: String): DataFrame =
      ev.groupBy(k).agg(count(lit(1)).as("cnt"))
        .agg(
          lit(k).as("key_col"),
          count(lit(1)).as("n_keys"),
          sum("cnt").as("n_rows"),
          max("cnt").as("max_n"),
          // mean/skew from EXACT integer sums (sum/count, max·count/sum)
          // — never an engine's incremental avg accumulator, whose float
          // order differs between engines
          round(sum("cnt").cast("double") / count(lit(1)), 6).as("mean_n"),
          round(expr("percentile(cnt, 0.5)"), 6).as("p50"),
          round(expr("percentile(cnt, 0.9)"), 6).as("p90"),
          round(expr("percentile(cnt, 0.99)"), 6).as("p99"),
          round(max("cnt").cast("double") * count(lit(1)) / sum("cnt"), 6)
            .as("skew"))
    forKey("user_id").unionByName(forKey("event_type"))
  }

  /** Sketch twin of [[profile]] — the shape [[profile]]'s own scaladoc
    * promises for 100 TB: approx_count_distinct (HyperLogLog++) instead
    * of exact count_distinct, which collapses the per-distinct-column-set
    * Expand + shuffle into ONE partial-aggregated pass whose state is a
    * fixed-size sketch per column (no key ever shuffles). No oracle —
    * HLL buckets come from JVM-side hashing — so the contract is pinned
    * by ProfileSketchSpec instead: every column's estimate within the
    * configured rsd envelope of the exact profile, null counts exact
    * (they are plain sums, shared with the exact form). */
  def profileSketch(s: SparkSession, d: String, rsd: Double = 0.02): DataFrame =
    profileAgg(s, d, "n_distinct_approx",
      c => approx_count_distinct(col(c), rsd).as(s"${c}__distinct"))

  /** Shared lazy body of [[profile]] / [[profileSketch]]: ONE aggregate
    * over the events table (n_rows + per-column null and distinct
    * counts), reshaped to the one-row-per-column report by a `stack`
    * generator over the single aggregate row. Fully lazy end to end —
    * the earlier driver-side reshape ran the aggregate at
    * DataFrame-construction time (r8 ADVICE), which both wasted the work
    * when the report was never acted on and broke the no-eager-collect
    * discipline the rest of the module keeps. */
  private def profileAgg(s: SparkSession, d: String, distinctName: String,
      distinctAgg: String => org.apache.spark.sql.Column): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("ts_us", unix_micros(col("ts")))
    val cols = Seq("event_id", "ts_us", "user_id", "event_type", "value", "props")
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        distinctAgg(c)))
    val stackArgs = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`").mkString(", ")
    ev.agg(aggs.head, aggs.tail: _*)
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) as (column_name, n_nulls, $distinctName)")
      .select(col("column_name"), col("n_rows"), col("n_nulls"), col(distinctName))
  }

  /** Pearson correlation matrix over the wide daily features — computed
    * from EXACT DECIMAL moment sums (n, Σx, Σy, Σxy, Σx², Σy²) rather
    * than ml.stat.Correlation's float accumulators, so the result is
    * bit-identical cross-engine and the whole matrix is one
    * partial-aggregated pass over the feature table (the moments for
    * all 6 pairs fold into a single aggregate — no per-pair scans, no
    * driver matrix). The inputs are the A2 pivot's (user, day) wide
    * counts; feature pairs are emitted in fixed lexicographic order.
    * r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²ᵗ)(n·Σy² − Σy²ᵗ)). */
  def correlationMatrix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val feats = Seq("click", "error", "purchase", "view")
    // per-(user, day) type counts — integer cells, so every moment sum
    // is exact LONG arithmetic (magnitudes stay far under 2^53, so the
    // final integer→double conversions are exact on both engines)
    val cells = feats.map(f =>
      sum(when(col("event_type") === f, 1L).otherwise(0L)).as(f))
    val wide = Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(cells.head, cells.tail: _*)
    val moments =
      count(lit(1)).as("n") +:
      feats.map(f => sum(col(f)).as(s"s_$f")) ++:
      feats.map(f => sum(col(f) * col(f)).as(s"ss_$f")) ++:
      (for { i <- feats.indices; j <- feats.indices if i < j }
        yield sum(col(feats(i)) * col(feats(j)))
          .as(s"sp_${feats(i)}_${feats(j)}"))
    val row = wide.agg(moments.head, moments.tail: _*).collect()(0)
    // the driver-side products n·Σxy and Σx·Σy would overflow Long once
    // n·Σxy ≥ 2^63 (with per-cell counts ≤ C that happens around
    // n ≈ 3e9/C rows) — so the six-number-per-pair combine runs in
    // BigInt, which is exact at ANY scale; for every scale where Long
    // would not have overflowed the BigInt value is identical, and
    // BigInt.toDouble rounds to nearest like the oracle's integer→DOUBLE
    // cast, so gate results are unchanged
    def lv(name: String): BigInt = BigInt(row.getAs[Long](name))
    val n = lv("n")
    val pairs = for { i <- feats.indices; j <- feats.indices if i < j } yield {
      val (x, y) = (feats(i), feats(j))
      // numerator and variance terms stay in exact integers; the only
      // float ops are the final divide and sqrt — identical IEEE trees
      // in the oracle, so the raw double needs no rounding key
      val cov = (n * lv(s"sp_${x}_$y") - lv(s"s_$x") * lv(s"s_$y")).toDouble
      val vx = (n * lv(s"ss_$x") - lv(s"s_$x") * lv(s"s_$x")).toDouble
      val vy = (n * lv(s"ss_$y") - lv(s"s_$y") * lv(s"s_$y")).toDouble
      (x, y, cov / math.sqrt(vx * vy))
    }
    pairs.toDF("feature_x", "feature_y", "pearson_r")
  }

  /** Per-user Shannon entropy of the event-type distribution — the
    * behavioral-diversity score (and the same formula a corpus-mix
    * monitor runs over source shares). Counts pivot into FIXED columns
    * (one conditional sum per type), the entropy sums its ≤ 5 terms in
    * fixed left-to-right order — no float-order hazard anywhere, so the
    * oracle matches bit-exact. One partial-aggregated groupBy. */
  def typeEntropy(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val counts = Tables.events(s, d)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        types.map(t => sum(when(col("event_type") === t, 1L).otherwise(0L))
          .as(s"n_$t")): _*)
    val terms = types.map { t =>
      val p = col(s"n_$t").cast("double") / col("n_events")
      when(col(s"n_$t") > 0, -p * log(p)).otherwise(lit(0.0))
    }
    counts.withColumn("entropy", round(terms.reduceLeft(_ + _), 6))
      .select("user_id", "n_events", "entropy")
  }

  /** Robust outlier report per event type: median / MAD (median absolute
    * deviation) with the 1.4826 normal-consistency constant — the
    * heavy-tail-safe twin of q_anomaly_zscore's mean/stddev cut (one
    * extreme value drags a mean; it cannot drag a median). Two exact
    * percentile passes (the q_quantile machinery: sort-based exact
    * aggregate per type, |types| groups) joined back onto one conditional
    * count; med/mad are rounded to 4 dp BEFORE the cut on both engines so
    * the cut constant is bit-identical (the q_quantile rounding
    * discipline — raw exact-percentile doubles can differ by ULPs across
    * engines). Output is |types| rows. */
  def madOutliers(s: SparkSession, d: String, k: Double = 3.0): DataFrame = {
    val ev = Tables.events(s, d).select("event_type", "value")
    val med = ev.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
    val mad = ev.join(med, Seq("event_type"))
      .groupBy("event_type")
      .agg(round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"),
        count(lit(1)).as("n"))
    ev.join(med, Seq("event_type"))
      .join(mad.select("event_type", "mad"), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(abs(col("value") - col("med")) >
          lit(k) * lit(1.4826) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
      .select("event_type", "n", "med", "mad", "n_outliers")
  }

  /** MERGE / upsert — the lakehouse write primitive (MERGE INTO ... WHEN
    * MATCHED UPDATE / WHEN NOT MATCHED INSERT) expressed as one full
    * outer join + per-column coalesce: updates win where keys collide,
    * base rows survive untouched, new keys append. The update batch here
    * is synthesized deterministically from the base (every event_id
    * divisible by 100 gets value+1000 and a 'patched' type; 50 brand-new
    * ids above the max key insert) so both engines derive the identical
    * batch and the whole merge is oracle-able. Scale shape: ONE
    * co-partitioned full outer join on the key — the update batch is
    * usually tiny (broadcast) but the full-outer form is the general
    * one; a real table format (Delta/Iceberg) adds file-level pruning on
    * top, the row-level semantics are exactly this plan. */
  def mergeUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.events(s, d)
      .select("event_id", "user_id", "event_type", "value")
    val updates = base.where(col("event_id") % 100 === 0)
      .select(col("event_id"), col("user_id"),
        lit("patched").as("event_type"), (col("value") + 1000.0).as("value"))
    // max key rides in lazily as a broadcast 1-row aggregate (no eager
    // collect at plan-construction time, and an empty base table yields
    // max_id = 0 instead of an NPE)
    val maxId = base.agg(coalesce(max("event_id"), lit(0L)).as("max_id"))
    val s2 = s
    import s2.implicits._
    val inserts = (1L to 50L).toDF("off")
      .crossJoin(broadcast(maxId))
      .select((col("max_id") + col("off")).as("event_id"),
        (col("off") % 97).as("user_id"),
        lit("inserted").as("event_type"),
        (col("off").cast("double") / 10.0).as("value"))
    val batch = updates.unionByName(inserts).select(
      col("event_id").as("u_event_id"), col("user_id").as("u_user_id"),
      col("event_type").as("u_event_type"), col("value").as("u_value"))
    base.join(batch, col("event_id") === col("u_event_id"), "full_outer")
      .select(coalesce(col("event_id"), col("u_event_id")).as("event_id"),
        coalesce(col("u_user_id"), col("user_id")).as("user_id"),
        coalesce(col("u_event_type"), col("event_type")).as("event_type"),
        coalesce(col("u_value"), col("value")).as("value"),
        when(col("u_event_id").isNotNull && col("event_id").isNotNull, "updated")
          .when(col("event_id").isNull, "inserted").otherwise("unchanged")
          .as("merge_action"))
  }

  /** Equi-width value histogram per event type: 10 bins over the
    * per-type [min, max] range, closed on the right edge (the max lands
    * in bin 9 via least()). Two passes: a 5-row min/max aggregate
    * broadcast back onto the stream, then one partial-aggregated
    * groupBy on (type, bin) — the profile-a-column primitive at any
    * scale. Bin arithmetic is the identical IEEE expression tree on
    * both engines (floor((v − mn) / ((mx − mn) / 10.0))), so bins are
    * bit-exact; mn/mx ride along raw (no re-aggregation). A degenerate
    * range (every value equal, mx == mn) would make the bin expression
    * 0.0/0.0 = NaN — Spark's non-ANSI cast silently maps NaN to 0 while
    * an ANSI engine errors — so that case is guarded to bin 0 explicitly
    * on both engines. */
  def histogram(s: SparkSession, d: String, nBins: Int = 10): DataFrame = {
    val ev = Tables.events(s, d)
    val ranges = ev.groupBy("event_type")
      .agg(min("value").as("mn"), max("value").as("mx"))
    ev.join(broadcast(ranges), Seq("event_type"))
      .withColumn("bin",
        when(col("mx") === col("mn"), 0L).otherwise(
          least(floor((col("value") - col("mn"))
            / ((col("mx") - col("mn")) / nBins.toDouble)).cast("long"),
            lit((nBins - 1).toLong))))
      .groupBy("event_type", "bin", "mn", "mx")
      .agg(count(lit(1)).as("n"))
  }

  /** HLL sketch-merge distinct counts — the DISTINCT twin of
    * [[statsMerge]]'s exact moments: moments merge losslessly in
    * integer space, but distinct counts have no finite exact mergeable
    * state, so the incremental-rollup form is a DataSketches HLL
    * partial per shard unioned upward (`hll_sketch_agg` →
    * `hll_union_agg` → `hll_sketch_estimate`, Spark 3.5+ built-ins,
    * codegen'd — no UDF). The gate builds per-(type, shard) sketches,
    * merges across shards per type, and carries the EXACT distinct
    * count beside the estimate so the report shows its own error; the
    * union path is what a 100 TB daily rollup stores (a few KB per
    * key-day) instead of re-scanning history. The exact-distinct
    * column is GATE EVIDENCE (a second scan + the very distinct-key
    * shuffle the sketch exists to avoid) — a production rollup ships
    * only the sketch path; the report carries the exact twin so its
    * error is visible, the same deal as q_countmin/q_profile_sketch.
    * No DuckDB oracle (sketch buckets are murmur-hashed JVM-side —
    * the q_profile_sketch class); HllMergeSpec pins estimate-vs-exact
    * within the configured lgK = 12 rsd envelope and merged ≡
    * one-shot sketch equality. */
  def hllMerge(s: SparkSession, d: String): DataFrame = {
    val partials = Tables.events(s, d)
      .groupBy(col("event_type"), (col("event_id") % 4).as("shard"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
        count(lit(1)).as("n"))
    partials.groupBy("event_type")
      .agg(sum(col("n")).as("n_rows"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_distinct"))
      .join(Tables.events(s, d).groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("exact_distinct")),
        Seq("event_type"))
      .select(col("event_type"), col("n_rows"), col("exact_distinct"),
        col("est_distinct"),
        round(abs(col("est_distinct") - col("exact_distinct"))
          / col("exact_distinct"), 6).as("rel_err"))
  }

  /** [[hllMerge]] re-gated at its VERDICT POINT (r13 verdict #2, the
    * compaction-plan precedent): the HLL estimates themselves are
    * murmur-hashed JVM state no other engine reproduces, but the
    * sketch's CONTRACT is engine-free — the sharded union must equal
    * the one-shot sketch (merge loses nothing) and both must sit inside
    * the published lgK = 12 rsd envelope of the exact distinct count.
    * The gate emits exactly-derivable integers (n_rows, exact_distinct)
    * plus those contract booleans; the DuckDB oracle derives the
    * integers and pins the booleans to literal TRUE — an estimate
    * outside its guarantee, or a lossy union, flips a boolean and fails
    * the hash (the q_quantile_sketch_merge pattern). The exact-distinct
    * scan remains GATE EVIDENCE, as in [[hllMerge]]. Envelope: 3
    * standard errors at rsd = 1.04/√2¹² ≈ 1.6% (HllMergeSpec's bound,
    * deterministic for a fixed corpus — the hash function is fixed). */
  def hllMergeVerdict(s: SparkSession, d: String): DataFrame = {
    val envelope = 3 * 1.04 / math.sqrt((1 << 12).toDouble)
    val partials = Tables.events(s, d)
      .groupBy(col("event_type"), (col("event_id") % 4).as("shard"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"),
        count(lit(1)).as("n"))
    val merged = partials.groupBy("event_type")
      .agg(sum(col("n")).as("n_rows"),
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_merged"))
    val oneShot = Tables.events(s, d).groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
          .as("est_oneshot"),
        count_distinct(col("user_id")).as("exact_distinct"))
    merged.join(oneShot, Seq("event_type"))
      .select(col("event_type"), col("n_rows"), col("exact_distinct"),
        (col("est_merged") === col("est_oneshot")).as("merged_eq_oneshot"),
        (abs(col("est_merged") - col("exact_distinct")).cast("double")
          / col("exact_distinct") <= envelope).as("est_within_rsd"))
  }

  /** [[profileSketch]] re-gated at its VERDICT POINT (r13 verdict #2):
    * n_rows / n_nulls / exact distinct per column are DuckDB-derivable
    * integers; the HLL++ estimate is emitted only as a boolean asserting
    * it sits inside ProfileSketchSpec's envelope (max(2, 10% of exact)
    * at rsd = 0.02 — ~5σ).
    *
    * TWO aggregate passes over the scan, not one: mixing the 6-column
    * multi-distinct (which plans through Expand — 6 projections per
    * row) with 6 HLL++ buffers in a single aggregate makes Spark carry
    * and merge every sketch buffer across the EXPANDED input — measured
    * 51 s at sf1 vs 1.4 s (exact form) + 1.6 s (sketch form) run
    * separately (r14 bench diff). Keeping each aggregate in its proven
    * shape and joining the two 1-row frames restores additive cost. */
  def profileSketchVerdict(s: SparkSession, d: String,
      rsd: Double = 0.02): DataFrame = {
    val ev = Tables.events(s, d).withColumn("ts_us", unix_micros(col("ts")))
    val cols = ProfileCols
    val estAggs = cols.map(c => approx_count_distinct(col(c), rsd).as(s"${c}__est"))
    // exact side rides the session memo shared with [[profile]] (r17)
    val joined = memoProfileExact(s, d)
      .crossJoin(broadcast(ev.agg(estAggs.head, estAggs.tail: _*))) // 1-row × 1-row
    val stackArgs = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__exact`, `${c}__est`")
      .mkString(", ")
    joined
      .selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) as " +
          "(column_name, n_nulls, n_distinct_exact, est)")
      .select(col("column_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct_exact"),
        (abs(col("est") - col("n_distinct_exact")).cast("double")
          <= greatest(lit(2.0), lit(0.10) * col("n_distinct_exact")))
          .as("est_within_rsd"))
  }

  /** One-pass POISSON bootstrap confidence interval for the per-type
    * mean — the bootstrap that actually runs at 100 TB: classical
    * resampling draws n rows WITH replacement per replicate (B full
    * shuffles of the corpus); the Poisson approximation gives every row
    * an independent Poisson(1) multiplicity per replicate instead, so
    * all B replicates ride ONE scan (row × replicate-id fan-out, weight
    * computed on the fly, map-side-combined weighted partials — the
    * shuffle carries only types × B rows). Determinism: the Poisson
    * draw is an LCG-mixed uniform (the stratified-split recipe, keyed
    * by (event_id, replicate)) pushed through the Poisson(1) inverse
    * CDF as fixed double-literal thresholds — identical integer + IEEE
    * arithmetic on both engines, so the weights, the replicate means
    * (DECIMAL-exact weighted sums), and the interpolated percentile CI
    * all hash-match the DuckDB oracle. */
  def bootstrapCi(s: SparkSession, d: String, b: Int = 48): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val pcdf = Seq( // P(Poisson(1) <= k) for k = 0..5; weight 6 beyond
      0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183)
    val m = pmod(
      pmod(col("event_id"), lit(2147483648L)) * lit(1103515245L)
        + lit(12345L) + col("b") * lit(2654435761L),
      lit(2147483648L))
    val u = m.cast("double") / lit(2147483648.0)
    val w = pcdf.zipWithIndex.foldRight(lit(6): Column) {
      case ((cdf, k), rest) => when(u < cdf, k).otherwise(rest)
    }
    val reps = Tables.events(s, d)
      .select(col("event_id"), col("event_type"),
        col("value").cast(DecimalType(18, 2)).as("v"))
      .withColumn("b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("w", w)
      .groupBy("event_type", "b")
      .agg((sum(col("w") * col("v")).cast("double")
        / sum(col("w"))).as("rep_mean"))
    reps.groupBy("event_type")
      .agg(count(lit(1)).as("n_reps"),
        round(expr("percentile(rep_mean, 0.5)"), 6).as("boot_median"),
        round(expr("percentile(rep_mean, 0.025)"), 6).as("ci_lo"),
        round(expr("percentile(rep_mean, 0.975)"), 6).as("ci_hi"))
  }

  /** Welch two-sample t-test between two event types' value
    * distributions — the A/B-readout report. Everything derives from
    * exact moments (n as BIGINT; Σv, Σv² as DECIMAL — value carries 2
    * decimals, so v² is exact in DECIMAL(37,4) and the sums never see a
    * float until the final expression tree), then mean/variance/t/df
    * are one fixed IEEE tree evaluated identically by both engines:
    * t = (μA−μB)/√(s²A/nA + s²B/nB), Welch–Satterthwaite df. The same
    * single-pass moment discipline as [[correlationMatrix]] — one
    * aggregate over the filtered pair, no second scan for variances. */
  def abTest(s: SparkSession, d: String, groupA: String = "click",
      groupB: String = "view"): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val ev = Tables.events(s, d)
      .where(col("event_type").isin(groupA, groupB))
      .select(col("event_type"), col("value").cast(DecimalType(18, 2)).as("v"))
    val moments = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      .select(col("event_type"), col("n"),
        (col("s1").cast("double") / col("n")).as("mean"),
        ((col("s2").cast("double")
          - col("s1").cast("double") * col("s1").cast("double") / col("n"))
          / (col("n") - 1)).as("variance"))
    val a = moments.where(col("event_type") === groupA)
      .select(col("n").as("n_a"), col("mean").as("mean_a"),
        col("variance").as("var_a"))
    val bb = moments.where(col("event_type") === groupB)
      .select(col("n").as("n_b"), col("mean").as("mean_b"),
        col("variance").as("var_b"))
    val se2a = col("var_a") / col("n_a")
    val se2b = col("var_b") / col("n_b")
    a.crossJoin(bb)
      .select(lit(groupA).as("group_a"), lit(groupB).as("group_b"),
        col("n_a"), col("n_b"),
        round(col("mean_a"), 6).as("mean_a"),
        round(col("mean_b"), 6).as("mean_b"),
        round((col("mean_a") - col("mean_b"))
          / sqrt(se2a + se2b), 6).as("t_stat"),
        round((se2a + se2b) * (se2a + se2b)
          / (se2a * se2a / (col("n_a") - 1)
            + se2b * se2b / (col("n_b") - 1)), 6).as("welch_df"))
  }

  /** Mergeable partial-aggregate states — the incremental-rollup
    * discipline a 100 TB pipeline lives on: yesterday's per-source
    * stats must combine with today's batch WITHOUT rescanning
    * yesterday. The device is keeping the moments in EXACT integer
    * space (n, Σx, Σx², min, max over n_chars) — integer moment
    * vectors merge associatively with zero error, unlike float
    * mean/M2 states which need Chan's correction and still drift.
    * The gate computes each source's stats through a two-shard merge
    * (doc_id parity halves → partials → merged) and derives
    * mean/variance from the merged exact moments with a fixed IEEE
    * expression tree; the oracle computes the same stats ONE-SHOT —
    * a hash-match proves merge ≡ direct, which is the whole
    * contract. Σx² fits BIGINT through ~petascale character counts
    * (n_chars ≤ 10⁴ → x² ≤ 10⁸; 9.2×10¹⁸ bound ⇒ ~10¹⁰ docs per
    * source); past that the partials move to DECIMAL(38,0) at the
    * same plan shape. */
  def statsMerge(s: SparkSession, d: String): DataFrame = {
    val partials = Tables.documents(s, d)
      .groupBy(col("source"), (col("doc_id") % 2).as("shard"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("s1"),
        sum(col("n_chars") * col("n_chars")).as("s2"),
        min(col("n_chars")).as("mn"),
        max(col("n_chars")).as("mx"))
    val merged = partials.groupBy("source")
      .agg(sum("n").as("n_docs"), sum("s1").as("sum_chars"),
        sum("s2").as("sumsq_chars"),
        min("mn").as("min_chars"), max("mx").as("max_chars"))
    merged.select(col("source"), col("n_docs"),
      col("sum_chars"), col("sumsq_chars"),
      col("min_chars"), col("max_chars"),
      (col("sum_chars").cast("double") / col("n_docs")).as("mean_chars"),
      ((col("sumsq_chars").cast("double")
        - col("sum_chars").cast("double") * col("sum_chars").cast("double")
          / col("n_docs"))
        / (col("n_docs") - 1)).as("var_chars"))
  }

  /** Autocorrelation function per event-type series: Pearson r between
    * the value series and its lag-k shift, k = 1..maxLag — the
    * seasonality probe that decides a forecast model's (p, q) orders
    * (cf. /root/reference's forecast grid search, which assumes the
    * orders; this computes the evidence for them).
    *
    * One window sort produces ALL maxLag lead columns (Spark evaluates
    * the k lead() calls over one partition-sort), then a TWO-LEVEL
    * aggregate reduces them to 6 exact moments per (type, lag) — values
    * ride as integer cents. Level 1 groups by (type, hash-bucket of
    * event_id, B = 4096 buckets) with plain LONG sums — whole-stage
    * codegen'd, no per-row BigDecimal (a flat DECIMAL(38,0) aggregate
    * here measured 4× the wall cost at 10 M rows). Level 2 sums the
    * ≤ nTypes × B partial rows through DECIMAL(38,0), where the cast is
    * per-bucket, not per-row, so it is free. Safety: per-row products
    * are ≤ 10¹⁰ at the dq-contract value ceiling of 10⁵ cents, so a
    * bucket's LONG Σxy stays exact while the bucket holds ≤ 9.2×10⁸
    * rows — i.e. ~3.7×10¹² rows per type at B = 4096, two orders past
    * the 100 TB design point — and the level-2 plan ASSERTS that bound
    * (assert_true on the max bucket count): past it the query fails
    * loudly instead of wrapping silently, and B is the dial. The
    * driver-side combine is over exactly nTypes × maxLag moment rows
    * (contractually bounded, same as [[correlationMatrix]]) and runs in
    * BigInt, so n·Σxy never overflows either; the only float ops are
    * one divide and one sqrt — the identical IEEE tree the oracle
    * computes from HUGEINT. Series are per-type partitioned: no global
    * sort, no driver data. */
  def acf(s: SparkSession, d: String, maxLag: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val buckets = 4096
    // LONG-safe bucket row bound: Σ(x·y) ≤ n_bucket · 10¹⁰ < 2⁶³
    val bucketRowBound = 920000000L
    val byTs = Window.partitionBy("event_type").orderBy(col("ts"), col("event_id"))
    val lags = 1 to maxLag
    var laggy = Tables.events(s, d)
      .select(col("event_type"), col("ts"), col("event_id"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("x"))
    for (k <- lags) laggy = laggy.withColumn(s"y$k", lead(col("x"), k).over(byTs))
    val partialMoments = lags.flatMap { k =>
      val y = col(s"y$k")
      val p = y.isNotNull
      Seq(sum(when(p, 1L).otherwise(0L)).as(s"n$k"),
        sum(when(p, col("x")).otherwise(0L)).as(s"sx$k"),
        sum(when(p, y).otherwise(0L)).as(s"sy$k"),
        sum(when(p, col("x") * y).otherwise(0L)).as(s"sxy$k"),
        sum(when(p, col("x") * col("x")).otherwise(0L)).as(s"sxx$k"),
        sum(when(p, y * y).otherwise(0L)).as(s"syy$k"))
    }
    val partials = laggy
      .groupBy(col("event_type"),
        pmod(xxhash64(col("event_id")), lit(buckets.toLong)).as("bkt"))
      .agg(count(lit(1)).as("nb"), partialMoments: _*)
    val mergeMoments = lags.flatMap { k =>
      Seq(sum(col(s"n$k")).as(s"n$k"),
        sum(col(s"sx$k")).as(s"sx$k"),
        sum(col(s"sy$k")).as(s"sy$k"),
        sum(col(s"sxy$k").cast(dec)).as(s"sxy$k"),
        sum(col(s"sxx$k").cast(dec)).as(s"sxx$k"),
        sum(col(s"syy$k").cast(dec)).as(s"syy$k"))
    } :+ assert_true(max(col("nb")) <= bucketRowBound,
      lit(s"acf: a hash bucket exceeded $bucketRowBound rows — raise " +
        "`buckets` to keep the LONG partial moments exact")).as("ovf_guard")
    val rows = partials.groupBy("event_type").agg(mergeMoments.head, mergeMoments.tail: _*)
      .collect()
    val out = for (r <- rows; k <- lags) yield {
      def lv(p: String): BigInt = r.get(r.fieldIndex(s"$p$k")) match {
        case l: java.lang.Long => BigInt(l)
        case bd: java.math.BigDecimal => BigInt(bd.toBigIntegerExact)
      }
      val n = lv("n")
      val cov = (n * lv("sxy") - lv("sx") * lv("sy")).toDouble
      val vx = (n * lv("sxx") - lv("sx") * lv("sx")).toDouble
      val vy = (n * lv("syy") - lv("sy") * lv("sy")).toDouble
      (r.getAs[String]("event_type"), k, n.toLong, cov / math.sqrt(vx * vy))
    }
    import s.implicits._
    out.toSeq.toDF("event_type", "lag", "n_pairs", "acf_r")
  }

  /** Chi-square independence readout for the event_type × day-of-week
    * contingency table — "is traffic mix stable across the week", the
    * categorical twin of [[abTest]]. Emits one row per cell (observed,
    * expected, (o−e)²/e contribution) plus a __TOTAL__ row whose
    * `contrib` is the χ² statistic and `expected` the degrees of
    * freedom.
    *
    * Determinism: counts and marginals are exact LONGs from one
    * groupBy; expected and contribution are per-row IEEE trees (no
    * cross-row float sum); the total sums the contributions AFTER
    * rounding to 6 dp as DECIMAL — order-independent, so the one float
    * reduction in the query is exact on both engines. Two broadcast
    * joins against the (≤ 7-row / ≤ |types|-row) marginals; the cell
    * table itself is |types|×7 however big the input. */
  def chiSquare(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = Tables.events(s, d)
      .select(col("event_type"), dayofweek(col("ts")).as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("observed"))
    val rowTot = cells.groupBy("event_type").agg(sum("observed").as("r_tot"))
    val colTot = cells.groupBy("dow").agg(sum("observed").as("c_tot"))
    val grand = cells.agg(sum("observed").as("n_total"))
    val scored = cells
      .join(broadcast(rowTot), Seq("event_type"))
      .join(broadcast(colTot), Seq("dow"))
      .crossJoin(broadcast(grand))
      .withColumn("expected",
        (col("r_tot") * col("c_tot")).cast("double") / col("n_total"))
      .withColumn("contrib",
        (col("observed").cast("double") - col("expected"))
          * (col("observed").cast("double") - col("expected")) / col("expected"))
    val cellRows = scored.select(col("event_type"), col("dow"),
      col("observed"), col("expected"), col("contrib"))
    val total = scored.agg(
        sum(round(col("contrib"), 6).cast(DecimalType(18, 6))).as("chi2"),
        max(col("n_total")).as("n"),
        count_distinct(col("event_type")).as("nr"),
        count_distinct(col("dow")).as("nc"))
      .select(lit("__TOTAL__").as("event_type"), lit(0).as("dow"),
        col("n").as("observed"),
        ((col("nr") - 1) * (col("nc") - 1)).cast("double").as("expected"),
        col("chi2").cast("double").as("contrib"))
    cellRows.unionByName(total)
  }

  /** Declarative data-quality constraint suite (the Deequ/expectations
    * shape): one aggregate pass over events computes every check's
    * metric — completeness, key uniqueness, domain membership, value
    * range, payload well-formedness — then a codegen'd `stack` reshapes
    * the single moment row into (check, metric, threshold, passed)
    * verdict rows. No second scan, no collect: the reshape is lazy over
    * the aggregate (the q_profile discipline). Each metric is a ratio
    * of two exact LONGs — one correctly-rounded divide per row, so the
    * report hash-matches any IEEE engine. The distinct-key count is the
    * one shuffle; at 100 TB swap it for approx_count_distinct and a
    * tolerance-threshold check (the [[profileSketch]] trade) at the
    * same plan shape. */
  def dqChecks(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val agg = Tables.events(s, d).agg(
      count(lit(1)).as("n"),
      count(col("value")).as("n_value"),
      count_distinct(col("event_id")).as("n_key"),
      sum(when(col("event_type").isin(types.map(x => x: Any): _*), 1L)
        .otherwise(0L)).as("n_domain"),
      sum(when(col("value") >= 0.0 && col("value") <= 1000.0, 1L)
        .otherwise(0L)).as("n_range"),
      sum(when(col("props").startsWith("{") && col("props").endsWith("}"), 1L)
        .otherwise(0L)).as("n_json"))
    val checks = Seq(
      ("completeness_value", "n_value", 1.0),
      ("uniqueness_event_id", "n_key", 1.0),
      ("domain_event_type", "n_domain", 1.0),
      ("range_value_0_1000", "n_range", 0.999),
      ("wellformed_props", "n_json", 1.0))
    val arms = checks.map { case (name, c, thr) =>
      s"'$name', CAST($c AS DOUBLE) / n, CAST($thr AS DOUBLE)"
    }.mkString(", ")
    agg.selectExpr(
        s"stack(${checks.size}, $arms) AS (check_name, metric, threshold)")
      .withColumn("passed", col("metric") >= col("threshold"))
  }

  /** First-order Markov transition matrix over each user's event-type
    * sequence: counts and row-normalized probabilities for every
    * (from → to) step — the user-flow / next-action readout (and the
    * sequence prior a session-based recommender starts from). One
    * per-series lag window (the user_id shuffle), one |types|²-bounded
    * groupBy, a broadcast join for the row totals; p is one exact
    * integer divide. */
  def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byTs = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byTs))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = steps.groupBy("from_type").agg(sum("n").as("row_n"))
    steps.join(broadcast(totals), Seq("from_type"))
      .withColumn("p", col("n").cast("double") / col("row_n"))
      .select("from_type", "to_type", "n", "row_n", "p")
  }

  /** Cross-correlation function between the hourly click and purchase
    * count series, lags 0..maxLag hours — "does click volume lead
    * purchase volume, and by how much": the causal-direction probe next
    * to [[acf]]'s self-similarity. The series live on the DENSE hourly
    * grid (missing hours are genuine zeros — skipping them would bias
    * every moment), built by exploding `sequence(min_bucket,
    * max_bucket)`: the grid is CALENDAR-bounded (≤ ~10⁵ rows per
    * decade of hours), so the no-partition lead window over it is safe
    * at any fact volume — the fact table only ever feeds the two
    * groupBys. Exact LONG moments, BigInt driver combine over
    * maxLag+1 rows, one divide + one sqrt — the [[acf]] recipe. */
  def ccf(s: SparkSession, d: String, maxLag: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hourUs = 3600000000L
    val ev = Tables.events(s, d)
      .select(col("event_type"),
        expr(s"unix_micros(ts) div $hourUs").as("b"))
    def series(t: String, as: String) =
      ev.where(col("event_type") === t).groupBy("b")
        .agg(count(lit(1)).as(as))
    val grid = ev.agg(min("b").as("mn"), max("b").as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("b"))
    val dense = grid
      .join(series("click", "x"), Seq("b"), "left")
      .join(series("purchase", "y"), Seq("b"), "left")
      .select(col("b"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    val byB = Window.orderBy("b") // calendar-bounded grid — see scaladoc
    val lags = 0 to maxLag
    var laggy = dense
    for (k <- lags)
      laggy = laggy.withColumn(s"y$k",
        if (k == 0) col("y") else lead(col("y"), k).over(byB))
    val moments = lags.flatMap { k =>
      val y = col(s"y$k")
      val p = y.isNotNull
      Seq(sum(when(p, 1L).otherwise(0L)).as(s"n$k"),
        sum(when(p, col("x")).otherwise(0L)).as(s"sx$k"),
        sum(when(p, y).otherwise(0L)).as(s"sy$k"),
        sum(when(p, col("x") * y).otherwise(0L)).as(s"sxy$k"),
        sum(when(p, col("x") * col("x")).otherwise(0L)).as(s"sxx$k"),
        sum(when(p, y * y).otherwise(0L)).as(s"syy$k"))
    }
    val row = laggy.agg(moments.head, moments.tail: _*).collect()(0)
    val out = lags.map { k =>
      def lv(pfx: String): BigInt = BigInt(row.getAs[Long](s"$pfx$k"))
      val n = lv("n")
      val cov = (n * lv("sxy") - lv("sx") * lv("sy")).toDouble
      val vx = (n * lv("sxx") - lv("sx") * lv("sx")).toDouble
      val vy = (n * lv("syy") - lv("sy") * lv("sy")).toDouble
      (k, n.toLong, cov / math.sqrt(vx * vy))
    }
    import s.implicits._
    out.toDF("lag_hours", "n_pairs", "ccf_r")
  }

  /** Population Stability Index per event type between the first and
    * second half of the time range — the standard "has the serving
    * distribution drifted from the reference window" monitor a feature
    * pipeline runs on every refresh. The epoch split point is integer
    * micros ((min+max) div 2, exact cross-engine); bins are a FIXED
    * `bins`×(1000/bins) grid — 10×100 at the default, matching the
    * oracle — over the dq-contracted [0,1000] value range (fixed
    * bins, not quantile bins, so the bin edges are constants and the
    * whole report is one partial-aggregated groupBy — no percentile
    * pass, no second scan). PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref)
    * with +0.5/bin smoothing so empty bins stay finite; all
    * probabilities derive from exact integer counts, and because the
    * bin count is a FIXED literal the whole report is one groupBy(type)
    * carrying 2·bins conditional counts — the pivot-fixed-list
    * discipline — with PSI as one fixed LEFT-ASSOCIATED 10-term
    * ln/multiply tree (the q_type_entropy discipline; no row-order-
    * dependent double sum anywhere), rounded at 6 dp. Scale shape: one
    * min/max pre-pass (timestamp column only) + ONE fact scan into a
    * |types|-group aggregate; every bin term — including bins empty in
    * both halves, whose smoothed p's still differ whenever the half
    * totals do — is a projection over that one row. */
  def psi(s: SparkSession, d: String, bins: Int = 10): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_type"),
      expr("unix_micros(ts)").as("us"), col("value"))
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    // bin width derives from the parameter over the dq-contracted
    // [0,1000] value range — bins=10 gives the oracle's 10x100 grid,
    // and any other bins value bins consistently (ADVICE r11: the
    // width was hardcoded 100.0, silently mis-binning bins != 10)
    val binCol = least(floor(col("value") / lit(1000.0 / bins)), lit(bins - 1L))
    val isRef = col("us") <= col("mid")
    val aggCols = (0 until bins).flatMap { b =>
      Seq(sum(when(isRef && binCol === b, 1L).otherwise(0L)).as(s"nr$b"),
        sum(when(!isRef && binCol === b, 1L).otherwise(0L)).as(s"nc$b"))
    }
    val counts = ev.crossJoin(broadcast(mid))
      .groupBy("event_type")
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("tr", (0 until bins).map(b => col(s"nr$b")).reduceLeft(_ + _))
      .withColumn("tc", (0 until bins).map(b => col(s"nc$b")).reduceLeft(_ + _))
    val terms = (0 until bins).map { b =>
      val pr = (col(s"nr$b").cast("double") + lit(0.5)) /
        (col("tr").cast("double") + lit(0.5) * bins)
      val pc = (col(s"nc$b").cast("double") + lit(0.5)) /
        (col("tc").cast("double") + lit(0.5) * bins)
      (pc - pr) * log(pc / pr)
    }
    counts
      .withColumn("psi_value", round(terms.reduceLeft(_ + _), 6))
      .select(col("event_type"), col("tr").as("n_ref"), col("tc").as("n_cur"),
        col("psi_value"), (col("psi_value") > lit(0.2)).as("drifted"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the click and view
    * value distributions — the non-parametric "same distribution?"
    * readout next to [[abTest]]'s mean-difference t. D = max |F_a −
    * F_b| over the pooled distinct values: counts per (value, side),
    * two running integer sums over the value-ordered grid, one divide
    * each, max of the abs difference. The no-partition window is safe
    * at any fact volume because it runs on the DISTINCT-value grid,
    * which the 2-dp [0,1000] dq contract bounds at ≤ 10⁵ rows (the
    * [[ccf]] calendar-grid argument, in value space) — the fact table
    * only feeds the first groupBy. `ks_scaled` = D·√(n·m/(n+m)), the
    * scale-free statistic compared against c(α) (1.358 at α=.05). */
  def ksTest(s: SparkSession, d: String,
             typeA: String = "click", typeB: String = "view"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.events(s, d)
      .where(col("event_type").isin(typeA, typeB))
      .groupBy("value")
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("cb"))
    val byV = Window.orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts.agg(sum("ca").as("na"), sum("cb").as("nb"))
    counts
      .withColumn("fa", sum("ca").over(byV))
      .withColumn("fb", sum("cb").over(byV))
      .crossJoin(broadcast(tot)) // 1-row totals — the scalar-threshold pattern
      .agg(max("na").as("n_a"), max("nb").as("n_b"),
        max(abs(col("fa").cast("double") / col("na") -
          col("fb").cast("double") / col("nb"))).as("d_raw"))
      .select(col("n_a"), col("n_b"), round(col("d_raw"), 6).as("d_stat"),
        round(col("d_raw") * sqrt(col("n_a").cast("double") * col("n_b") /
          (col("n_a") + col("n_b"))), 6).as("ks_scaled"))
  }

  /** Winsorized per-type mean — the robust-location twin of
    * [[madOutliers]]: clamp every value into the ROUNDED exact
    * [p01, p99] band, count what clipped on each side, and average the
    * clamped column through an exact DECIMAL(18,4) sum (clamped values
    * are 2-dp data or the 4-dp rounded fences, so the sum is exact and
    * the single final divide is the only IEEE step). Same pass
    * structure as q_quantile_trim (one percentile pass per type + one
    * conditional aggregate), |types| groups end to end; where the trim
    * DROPS the tails, winsorizing PINS them to the fence — the version
    * that keeps n constant for downstream ratios. */
  def winsorize(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("event_type", "value")
    val fences = ev.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.01)"), 4).as("lo"),
        round(expr("percentile(value, 0.99)"), 4).as("hi"))
    ev.join(fences, Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max("lo").as("lo"), max("hi").as("hi"),
        sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        round(sum(least(greatest(col("value"), col("lo")), col("hi"))
          .cast("decimal(18,4)")).cast("double") / count(lit(1)), 6)
          .as("wmean"))
      .select("event_type", "n", "lo", "hi", "n_clip_lo", "n_clip_hi", "wmean")
  }

  /** k-anonymity audit over quasi-identifier groups — the privacy gate
    * that runs BEFORE an event extract is released for training
    * (alongside [[graft.etl.CorpusPipeline.forgetAudit]]'s deletion
    * propagation and the redaction pass): a released row is k-anonymous
    * iff at least k distinct individuals share its quasi-identifier
    * combination (Sweeney 2002, public). Quasi-identifiers here:
    * (event_type, day, fixed-width value bucket) — fixed 100-unit
    * buckets over the dq-contract 0..1000 range rather than quantile
    * bins, so the bucket edges are literals on both engines. One
    * partial-aggregated groupBy over the fact table (count + exact
    * distinct-user count per group); `suppressed` flags the groups a
    * release must drop or generalize. Group cardinality is bounded by
    * |types| × days × 10 buckets, so the output never scales with the
    * fact volume — the same bounded-grid argument as [[psi]]/[[ksTest]]. */
  def kAnonymity(s: SparkSession, d: String, k: Int = 5): DataFrame =
    kAnonymityEvents(Tables.events(s, d), k)

  /** [[kAnonymity]] over an arbitrary events frame — the testable form. */
  private[graft] def kAnonymityEvents(ev: DataFrame, k: Int): DataFrame =
    ev.withColumn("day", to_date(col("ts")))
      .withColumn("vbucket",
        least(greatest(floor(col("value") / 100), lit(0L)), lit(9L)))
      .groupBy("event_type", "day", "vbucket")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("suppressed", col("n_users") < k)

  /** l-diversity audit — the release gate [[kAnonymity]] does NOT cover:
    * a quasi-identifier group can hold ≥ k distinct users yet leak the
    * sensitive attribute outright when every row agrees on it
    * (homogeneity attack, Machanavajjhala et al. 2007 — public). QI
    * groups are (event_type, day); the sensitive attribute is the
    * 10-bucket value grid (a salary-band stand-in). Per group: row
    * count, DISTINCT-l (how many sensitive buckets appear; `diverse` =
    * ≥ l), and ENTROPY-l (−Σ p·ln p over the buckets; `entropy_ok` =
    * entropy ≥ ln l, the stricter criterion that catches 99-to-1
    * skew distinct-l misses).
    *
    * Scale/determinism shape: the sensitive domain is the FIXED
    * 10-bucket literal grid, so the whole audit is ONE partial-
    * aggregated groupBy carrying 10 conditional counts (the psi /
    * pivot-fixed-list discipline), and n, distinct-l, and every
    * entropy p derive from exact integers — entropy is one fixed
    * LEFT-ASSOCIATED 10-term ln tree, so the DuckDB oracle hash-matches
    * (`q_l_diversity`). Output is bounded by |types| × days, never by
    * fact volume. */
  def lDiversity(s: SparkSession, d: String, l: Int = 3): DataFrame =
    lDiversityEvents(Tables.events(s, d), l)

  /** [[lDiversity]] over an arbitrary events frame — the testable form. */
  private[graft] def lDiversityEvents(ev: DataFrame, l: Int): DataFrame = {
    val withB = ev.withColumn("day", to_date(col("ts")))
      .withColumn("vbucket",
        least(greatest(floor(col("value") / 100), lit(0L)), lit(9L)))
    val cnts = (0 until 10).map(b =>
      sum(when(col("vbucket") === b, 1L).otherwise(0L)).as(s"c$b"))
    val nSens = (0 until 10)
      .map(b => when(col(s"c$b") > 0, 1L).otherwise(0L)).reduceLeft(_ + _)
    val ent = (0 until 10).map { b =>
      val p = col(s"c$b").cast("double") / col("n").cast("double")
      when(col(s"c$b") > 0, -p * log(p)).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    withB.groupBy("event_type", "day").agg(cnts.head, cnts.tail: _*)
      .withColumn("n", (0 until 10).map(b => col(s"c$b")).reduceLeft(_ + _))
      .withColumn("n_sensitive", nSens)
      // the threshold compares the RAW entropy (identical expression
      // tree in both engines → identical double → identical verdict);
      // comparing the display-rounded value would flip exactly-uniform
      // groups, whose entropy sits AT ln(l) up to one ulp
      .withColumn("entropy_raw", ent)
      .select(col("event_type"), col("day"), col("n"), col("n_sensitive"),
        round(col("entropy_raw"), 6).as("entropy"),
        (col("n_sensitive") >= l).as("diverse"),
        (col("entropy_raw") >= log(lit(l.toDouble))).as("entropy_ok"))
  }
}
