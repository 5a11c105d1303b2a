package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast
import OracleCtes._

/** Event-analytics reports: funnel, cohort, histogram, profile,
  * correlation, entropy, key-skew — gate rows: `queries` entries + their DuckDB
  * oracles (keys without an oracle are spec-pinned; see SparkEntry
  * scaladoc for the determinism contract). */
object AnalyticsGates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // click→purchase conversion funnel (first-touch attribution report)
    "q_funnel"         -> (graft.operators.Analytics.funnel _),
    // signup-cohort retention triangle (distinct active users per offset)
    "q_cohort"         -> (graft.operators.Analytics.cohortRetention _),
    // per-type equi-width value histogram (bit-exact bin arithmetic)
    "q_histogram"      -> ((s: SparkSession, d: String) => graft.operators.Analytics.histogram(s, d)),
    // robust median/MAD outlier report (the heavy-tail-safe twin of
    // q_anomaly_zscore's mean/stddev cut; med/mad rounded before the cut)
    "q_mad_outliers"   -> ((s: SparkSession, d: String) => graft.operators.Analytics.madOutliers(s, d)),
    // ANALYZE-style column profile (one-pass multi-distinct aggregate)
    "q_profile"        -> (graft.operators.Analytics.profile _),
    // per-user cumulative balance (DECIMAL-exact running window)
    "q_running_total"  -> (graft.operators.Analytics.runningTotal _),
    // weekly totals + lag + growth (trend report, epoch-week buckets)
    "q_wow_growth"     -> (graft.operators.Analytics.wowGrowth _),
    // first-k event-type paths per user, counted per distinct journey
    "q_journeys"       -> ((s: SparkSession, d: String) => graft.operators.Analytics.journeys(s, d)),
    // Pearson matrix from exact integer moment sums (one aggregate pass)
    "q_correlation"    -> (graft.operators.Analytics.correlationMatrix _),
    // per-user Shannon entropy of the type distribution (fixed-order sum)
    "q_type_entropy"   -> (graft.operators.Analytics.typeEntropy _),
    // HLL sketch twin of q_profile, re-gated at its verdict point (r14):
    // exact integers + estimate-within-envelope booleans, oracle-exact;
    // the raw estimate form stays pinned by ProfileSketchSpec
    "q_profile_sketch" -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.profileSketchVerdict(s, d)),
    // key-skew diagnostic (group-size distribution + straggler factor per
    // candidate key) — exact integer sums, cross-engine percentiles
    "q_key_skew" -> (graft.operators.Analytics.keySkew _),
    // salted exact distinct-count (single-hot-key skew rewrite; oracle
    // pins it against a plain COUNT(DISTINCT))
    "q_salted_distinct" -> ((s: SparkSession, d: String) =>
      graft.operators.Layout.saltedDistinctCount(
        graft.Tables.events(s, d), "event_type", "user_id")),
    // mergeable exact integer moment states (two-shard merge == one-shot
    // — the incremental-rollup contract, pinned by the one-shot oracle)
    "q_stats_merge"    -> (graft.operators.Analytics.statsMerge _),
    // TTL retention planner over day partitions (expired/retained under
    // a data-anchored watermark; the DROP PARTITION review report)
    "q_retention"      -> ((s: SparkSession, d: String) =>
      graft.operators.Layout.retentionPlan(s, d)),
    // compaction planner at its idempotence point: the plan LISTING
    // re-run over the compacted layout + read-back row counts — every
    // column is an integer the oracle derives from the raw table (the
    // grouped rewrite makes the file layout deterministic). The
    // pre-compaction plan over the ragged ingest layout stays
    // spec-pinned (CompactionPlanSpec): its file counts/bytes are
    // scheduling/encoding-specific, unoracleable by construction.
    "q_compaction_plan" -> ((s: SparkSession, d: String) =>
      graft.operators.Layout.compactionAudit(s, d)),
    // compaction EXECUTOR: one-shuffle rewrite to the planned file
    // groups + the data-preservation report (counts + DECIMAL sums),
    // which IS the oracle — compaction changes files, never rows
    "q_compaction_exec" -> ((s: SparkSession, d: String) =>
      graft.operators.Layout.compactionExec(s, d)),
    // one-pass Poisson bootstrap CI (LCG-keyed Poisson(1) weights, all
    // replicates on one scan — the 100 TB bootstrap)
    "q_bootstrap_ci"   -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.bootstrapCi(s, d)),
    // Welch two-sample t-test from exact DECIMAL moments (A/B readout)
    "q_ab_test"        -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.abTest(s, d)),
    // DataSketches HLL partial-sketch merge (the distinct-count twin of
    // q_stats_merge), re-gated at its verdict point (r14): exact
    // integers + merged==one-shot and within-rsd booleans, oracle-exact;
    // the raw estimate form stays pinned by HllMergeSpec
    "q_hll_merge"      -> (graft.operators.Analytics.hllMergeVerdict _),
    // per-type autocorrelation function, lags 1..5 (exact LONG moments
    // from one window sort; BigInt combine — the correlation recipe)
    "q_acf"            -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.acf(s, d)),
    // chi-square independence cells for event_type x day-of-week, plus
    // the rounded-DECIMAL χ² total row (the categorical A/B readout)
    "q_chi_square"     -> (graft.operators.Analytics.chiSquare _),
    // declarative data-quality constraint suite (one aggregate pass +
    // lazy stack reshape into check verdict rows)
    "q_dq_checks"      -> (graft.operators.Analytics.dqChecks _),
    // k-anonymity audit over (event_type, day, value-bucket)
    // quasi-identifier groups (exact distinct-user counts; bounded-grid
    // output) — the pre-release privacy gate next to forget_audit
    "q_k_anonymity"    -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.kAnonymity(s, d)),
    // l-diversity audit (distinct-l + entropy-l over the fixed 10-bucket
    // sensitive grid per (type, day) QI group) — the homogeneity-attack
    // gate k-anonymity misses; one fixed-literal groupBy, oracle-exact
    "q_l_diversity"    -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.lDiversity(s, d)),
    // first-order Markov transition matrix over user event sequences
    // (counts + row-normalized p; |types|²-bounded output)
    "q_transition_matrix" -> (graft.operators.Analytics.transitionMatrix _),
    // cross-correlation click→purchase on the DENSE hourly grid,
    // lags 0..5 (missing hours are genuine zeros; acf's exact recipe)
    "q_ccf"            -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.ccf(s, d)),
    // PSI drift monitor per type between time halves (fixed 10-bin grid,
    // smoothed probabilities from exact counts)
    "q_psi"            -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.psi(s, d)),
    // two-sample Kolmogorov–Smirnov D between click and view values
    // (running sums over the ≤10⁵-row distinct-value grid)
    "q_ks_test"        -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.ksTest(s, d)),
    // winsorized per-type mean at the rounded exact [p01, p99] fences
    // (DECIMAL-exact sum of the clamped column)
    "q_winsorize"      -> (graft.operators.Analytics.winsorize _),
  )

  val oracles: Map[String, String] = Map(
    // comparisons run on epoch MICROS (Spark's ts is µs-truncated, and
    // trunc commutes with min); lag floors both ends to whole seconds
    "q_funnel" ->
      """WITH fc AS (
        |  SELECT user_id, min(ts) AS first_click_ts FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |fp AS (
        |  SELECT fc.user_id, min(p.ts) AS first_purchase_ts
        |  FROM fc JOIN events p ON p.user_id = fc.user_id
        |    AND p.event_type = 'purchase'
        |    AND epoch_us(p.ts) >= epoch_us(fc.first_click_ts)
        |  GROUP BY 1)
        |SELECT fc.user_id, fc.first_click_ts, fp.first_purchase_ts,
        |  fp.first_purchase_ts IS NOT NULL AS converted,
        |  CASE WHEN fp.first_purchase_ts IS NOT NULL
        |    THEN CAST(floor(epoch(fp.first_purchase_ts)) AS BIGINT)
        |      - CAST(floor(epoch(fc.first_click_ts)) AS BIGINT) END AS lag_secs
        |FROM fc LEFT JOIN fp ON fc.user_id = fp.user_id""".stripMargin,

    "q_cohort" ->
      """WITH c AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT cohort_day, CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM c JOIN a USING (user_id)
        |WHERE a.day >= c.cohort_day
        |GROUP BY 1, 2""".stripMargin,

    // identical IEEE expression tree on both engines → bit-exact bins;
    // degenerate mx = mn range pinned to bin 0 (mirrors the Spark guard
    // — unguarded it is NaN, which ANSI CAST rejects)
    "q_histogram" ->
      """WITH b AS (
        |  SELECT event_type, min(value) AS mn, max(value) AS mx
        |  FROM events GROUP BY 1)
        |SELECT e.event_type,
        |  CASE WHEN b.mx = b.mn THEN 0 ELSE
        |    LEAST(CAST(floor((e.value - b.mn) / ((b.mx - b.mn) / 10.0)) AS BIGINT),
        |      9) END AS bin,
        |  b.mn, b.mx, count(*) AS n
        |FROM events e JOIN b USING (event_type)
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q_profile" ->
      """SELECT 'event_id' AS column_name, count(*) AS n_rows,
        |  count(*) - count(event_id) AS n_nulls,
        |  count(DISTINCT event_id) AS n_distinct FROM events
        |UNION ALL SELECT 'ts_us', count(*), count(*) - count(ts),
        |  count(DISTINCT epoch_us(ts)) FROM events
        |UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id),
        |  count(DISTINCT user_id) FROM events
        |UNION ALL SELECT 'event_type', count(*), count(*) - count(event_type),
        |  count(DISTINCT event_type) FROM events
        |UNION ALL SELECT 'value', count(*), count(*) - count(value),
        |  count(DISTINCT value) FROM events
        |UNION ALL SELECT 'props', count(*), count(*) - count(props),
        |  count(DISTINCT props) FROM events""".stripMargin,

    // sketch twin re-gated at its verdict point (r14): exact integers
    // derivable here; the estimate appears only as booleans the Spark
    // side computes against its published envelope — pinned to TRUE
    "q_profile_sketch" ->
      """SELECT 'event_id' AS column_name, count(*) AS n_rows,
        |  count(*) - count(event_id) AS n_nulls,
        |  count(DISTINCT event_id) AS n_distinct_exact,
        |  TRUE AS est_within_rsd FROM events
        |UNION ALL SELECT 'ts_us', count(*), count(*) - count(ts),
        |  count(DISTINCT epoch_us(ts)), TRUE FROM events
        |UNION ALL SELECT 'user_id', count(*), count(*) - count(user_id),
        |  count(DISTINCT user_id), TRUE FROM events
        |UNION ALL SELECT 'event_type', count(*), count(*) - count(event_type),
        |  count(DISTINCT event_type), TRUE FROM events
        |UNION ALL SELECT 'value', count(*), count(*) - count(value),
        |  count(DISTINCT value), TRUE FROM events
        |UNION ALL SELECT 'props', count(*), count(*) - count(props),
        |  count(DISTINCT props), TRUE FROM events""".stripMargin,

    // HLL merge re-gated at its verdict point (r14): merged == one-shot
    // and estimate-within-rsd are contract booleans pinned to TRUE;
    // n_rows / exact_distinct are plain exact aggregates
    "q_hll_merge" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(DISTINCT user_id) AS exact_distinct,
        |  TRUE AS merged_eq_oneshot, TRUE AS est_within_rsd
        |FROM events GROUP BY 1""".stripMargin,

    // moment sums are exact BIGINTs (integer cells, < 2^53), so the only
    // float ops are the final divide + sqrt — identical IEEE trees, raw
    // doubles compare bit-exact with no rounding key
    "q_correlation" ->
      """WITH wide AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    count(*) FILTER (WHERE event_type = 'click') AS click,
        |    count(*) FILTER (WHERE event_type = 'error') AS "error",
        |    count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |    count(*) FILTER (WHERE event_type = 'view') AS "view"
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT count(*) AS n,
        |    sum(click) AS s_c, sum("error") AS s_e,
        |    sum(purchase) AS s_p, sum("view") AS s_v,
        |    sum(click*click) AS ss_c, sum("error"*"error") AS ss_e,
        |    sum(purchase*purchase) AS ss_p, sum("view"*"view") AS ss_v,
        |    sum(click*"error") AS sp_ce, sum(click*purchase) AS sp_cp,
        |    sum(click*"view") AS sp_cv, sum("error"*purchase) AS sp_ep,
        |    sum("error"*"view") AS sp_ev, sum(purchase*"view") AS sp_pv
        |  FROM wide)
        |SELECT feature_x, feature_y,
        |  CAST(n*sp - sx*sy AS DOUBLE)
        |    / sqrt(CAST(n*ssx - sx*sx AS DOUBLE) * CAST(n*ssy - sy*sy AS DOUBLE))
        |    AS pearson_r
        |FROM (
        |  SELECT 'click' AS feature_x, 'error' AS feature_y,
        |    n, CAST(sp_ce AS BIGINT) AS sp, CAST(s_c AS BIGINT) AS sx,
        |    CAST(s_e AS BIGINT) AS sy, CAST(ss_c AS BIGINT) AS ssx,
        |    CAST(ss_e AS BIGINT) AS ssy FROM m
        |  UNION ALL SELECT 'click', 'purchase', n, CAST(sp_cp AS BIGINT),
        |    CAST(s_c AS BIGINT), CAST(s_p AS BIGINT),
        |    CAST(ss_c AS BIGINT), CAST(ss_p AS BIGINT) FROM m
        |  UNION ALL SELECT 'click', 'view', n, CAST(sp_cv AS BIGINT),
        |    CAST(s_c AS BIGINT), CAST(s_v AS BIGINT),
        |    CAST(ss_c AS BIGINT), CAST(ss_v AS BIGINT) FROM m
        |  UNION ALL SELECT 'error', 'purchase', n, CAST(sp_ep AS BIGINT),
        |    CAST(s_e AS BIGINT), CAST(s_p AS BIGINT),
        |    CAST(ss_e AS BIGINT), CAST(ss_p AS BIGINT) FROM m
        |  UNION ALL SELECT 'error', 'view', n, CAST(sp_ev AS BIGINT),
        |    CAST(s_e AS BIGINT), CAST(s_v AS BIGINT),
        |    CAST(ss_e AS BIGINT), CAST(ss_v AS BIGINT) FROM m
        |  UNION ALL SELECT 'purchase', 'view', n, CAST(sp_pv AS BIGINT),
        |    CAST(s_p AS BIGINT), CAST(s_v AS BIGINT),
        |    CAST(ss_p AS BIGINT), CAST(ss_v AS BIGINT) FROM m) t""".stripMargin,

    // entropy terms pivot into fixed columns and sum left-to-right —
    // the same float-order discipline as q_bm25
    "q_type_entropy" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n_events,
        |    count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |    count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |    count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |    count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |    count(*) FILTER (WHERE event_type = 'view') AS n_view
        |  FROM events GROUP BY 1)
        |SELECT user_id, n_events, round(
        |  (CASE WHEN n_click > 0 THEN -(CAST(n_click AS DOUBLE) / n_events)
        |    * ln(CAST(n_click AS DOUBLE) / n_events) ELSE 0.0 END)
        |  + (CASE WHEN n_error > 0 THEN -(CAST(n_error AS DOUBLE) / n_events)
        |    * ln(CAST(n_error AS DOUBLE) / n_events) ELSE 0.0 END)
        |  + (CASE WHEN n_purchase > 0 THEN -(CAST(n_purchase AS DOUBLE) / n_events)
        |    * ln(CAST(n_purchase AS DOUBLE) / n_events) ELSE 0.0 END)
        |  + (CASE WHEN n_signup > 0 THEN -(CAST(n_signup AS DOUBLE) / n_events)
        |    * ln(CAST(n_signup AS DOUBLE) / n_events) ELSE 0.0 END)
        |  + (CASE WHEN n_view > 0 THEN -(CAST(n_view AS DOUBLE) / n_events)
        |    * ln(CAST(n_view AS DOUBLE) / n_events) ELSE 0.0 END), 6)
        |  AS entropy
        |FROM c""".stripMargin,

    // running DECIMAL sums are exact at every prefix on both engines
    "q_running_total" ->
      """SELECT user_id, event_id, ts, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    AS running_value,
        |  count(*) OVER w AS running_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    // epoch-week = true FLOOR(epoch_us / week_us): the non-negative
    // remainder is subtracted first so the division is an exact multiple
    // — sign-correct on both engines even for pre-1970 timestamps
    "q_wow_growth" ->
      """WITH wk AS (
        |  SELECT event_type,
        |    (epoch_us(ts) - ((epoch_us(ts) % 604800000000 + 604800000000)
        |      % 604800000000)) // 604800000000 AS week,
        |    count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, week, n, value_sum,
        |  lag(n, 1) OVER w AS prev_n,
        |  n - lag(n, 1) OVER w AS n_delta,
        |  round((n - lag(n, 1) OVER w) / CAST(lag(n, 1) OVER w AS DOUBLE)
        |    * 100.0, 6) AS pct_change
        |FROM wk
        |WINDOW w AS (PARTITION BY event_type ORDER BY week)""".stripMargin,

    // string_agg ORDER BY (ts, event_id) within the per-user top-5 rank
    "q_journeys" ->
      """WITH r AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rank
        |  FROM events),
        |j AS (
        |  SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY rank) AS journey
        |  FROM r WHERE rank <= 5 GROUP BY 1)
        |SELECT journey, count(*) AS n_users FROM j GROUP BY 1""".stripMargin,

    // mean/skew from exact integer sums; percentiles are the same
    // interpolated quantile on identical integer-valued doubles
    "q_key_skew" ->
      """WITH cu AS (SELECT user_id AS k, count(*) AS cnt
        |  FROM events GROUP BY 1),
        |ce AS (SELECT event_type AS k, count(*) AS cnt
        |  FROM events GROUP BY 1)
        |SELECT 'user_id' AS key_col, count(*) AS n_keys,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(max(cnt) AS BIGINT) AS max_n,
        |  round(CAST(sum(cnt) AS DOUBLE) / count(*), 6) AS mean_n,
        |  round(quantile_cont(cnt, 0.5), 6) AS p50,
        |  round(quantile_cont(cnt, 0.9), 6) AS p90,
        |  round(quantile_cont(cnt, 0.99), 6) AS p99,
        |  round(CAST(max(cnt) AS DOUBLE) * count(*)
        |    / CAST(sum(cnt) AS DOUBLE), 6) AS skew
        |FROM cu
        |UNION ALL
        |SELECT 'event_type', count(*), CAST(sum(cnt) AS BIGINT),
        |  CAST(max(cnt) AS BIGINT),
        |  round(CAST(sum(cnt) AS DOUBLE) / count(*), 6),
        |  round(quantile_cont(cnt, 0.5), 6),
        |  round(quantile_cont(cnt, 0.9), 6),
        |  round(quantile_cont(cnt, 0.99), 6),
        |  round(CAST(max(cnt) AS DOUBLE) * count(*)
        |    / CAST(sum(cnt) AS DOUBLE), 6)
        |FROM ce""".stripMargin,

    // the salted two-phase rewrite must EQUAL the plain distinct count
    // (each distinct user hashes into exactly one salt bucket)
    "q_salted_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1""".stripMargin,

    // ONE-SHOT stats per source: hash-matching the two-shard merged
    // form proves the integer moment states merge losslessly. Sums of
    // BIGINT must come back down from HUGEINT; mean/var are the same
    // IEEE expression tree over the exact integer moments
    "q_stats_merge" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_chars * n_chars) AS BIGINT) AS sumsq_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        |  CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*) AS mean_chars,
        |  (CAST(CAST(sum(n_chars * n_chars) AS BIGINT) AS DOUBLE)
        |    - CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
        |      * CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) / count(*))
        |    / (count(*) - 1) AS var_chars
        |FROM documents GROUP BY source""".stripMargin,

    // expiry anchored at the corpus' own max day — deterministic, and
    // the policy must change lifecycle labels, never the per-day stats
    // the compacted layout must hold exactly the raw table's rows —
    // per-day counts + DECIMAL-exact sums; "partition" quoted (reserved)
    "q_compaction_exec" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS "partition", count(*) AS n_rows,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1""".stripMargin,

    // post-compaction audit: the grouped rewrite lands each day in its
    // planned ⌈bytes/128 MiB⌉ groups = 1 at every verify scale (a day's
    // parquet bytes stay far under one target file well past sf30 —
    // ~30 MB/day there), so the whole report is integers derivable from
    // the raw table: one file per day, one target group, nothing left
    // to compact, counts preserved. The single-group assumption is
    // PINNED by CompactionPlanSpec's oracle-scale bound test at sf0.01
    // (pointed failure instead of an opaque hash mismatch — r13 ADVICE #2)
    "q_compaction_plan" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS "partition",
        |  CAST(1 AS BIGINT) AS n_files, count(*) AS n_rows,
        |  CAST(1 AS BIGINT) AS n_target_groups,
        |  FALSE AS needs_compaction
        |FROM events GROUP BY 1""".stripMargin,

    "q_retention" ->
      """WITH days AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |  FROM events GROUP BY 1),
        |anchor AS (SELECT max(day) AS max_day FROM days)
        |SELECT day, n, value_sum,
        |  CAST(date_diff('day', day, max_day) AS INT) AS age_days,
        |  date_diff('day', day, max_day) >= 21 AS expired
        |FROM days, anchor""".stripMargin,

    // same LCG-keyed Poisson(1) inverse-CDF weights, DECIMAL-exact
    // weighted replicate means, interpolated percentile CI — every
    // float op is an identical IEEE tree, so the CI hash-matches
    "q_bootstrap_ci" ->
      """WITH reps AS (
        |  SELECT e.event_type, r.b,
        |    CAST(((e.event_id % 2147483648) * 1103515245 + 12345
        |      + r.b * 2654435761) % 2147483648 AS DOUBLE)
        |      / 2147483648.0 AS u,
        |    CAST(e.value AS DECIMAL(18,2)) AS v
        |  FROM events e
        |  CROSS JOIN (SELECT unnest(generate_series(0, 47)) AS b) r),
        |w AS (
        |  SELECT event_type, b, v,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4
        |         WHEN u < 0.9994058151824183 THEN 5
        |         ELSE 6 END AS w
        |  FROM reps),
        |rm AS (
        |  SELECT event_type, b,
        |    CAST(sum(w * v) AS DOUBLE) / CAST(sum(w) AS BIGINT) AS rep_mean
        |  FROM w GROUP BY 1, 2)
        |SELECT event_type, count(*) AS n_reps,
        |  round(quantile_cont(rep_mean, 0.5), 6) AS boot_median,
        |  round(quantile_cont(rep_mean, 0.025), 6) AS ci_lo,
        |  round(quantile_cont(rep_mean, 0.975), 6) AS ci_hi
        |FROM rm GROUP BY 1""".stripMargin,

    // Welch t from exact DECIMAL moments; one fixed IEEE tree on both
    // engines (see q_correlation for the moment discipline)
    // exact interpolated percentiles agree to the 4-dp rounding (the
    // q_quantile class); the cut uses the ROUNDED med/mad so the
    // boundary constant is bit-identical cross-engine
    "q_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, round(quantile_cont(value, 0.5), 4) AS med
        |  FROM events GROUP BY 1),
        |mad AS (
        |  SELECT e.event_type,
        |    round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
        |SELECT e.event_type, count(*) AS n, max(m.med) AS med, max(d.mad) AS mad,
        |  CAST(SUM(CASE WHEN abs(e.value - m.med) > 3.0 * 1.4826 * d.mad
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
        |GROUP BY 1""".stripMargin,

    "q_ab_test" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS s1,
        |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS s2
        |  FROM events WHERE event_type IN ('click', 'view') GROUP BY 1),
        |mm AS (
        |  SELECT event_type, n, CAST(s1 AS DOUBLE) / n AS mean,
        |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
        |      / (n - 1) AS variance
        |  FROM m),
        |a AS (SELECT n AS n_a, mean AS mean_a, variance AS var_a
        |  FROM mm WHERE event_type = 'click'),
        |b AS (SELECT n AS n_b, mean AS mean_b, variance AS var_b
        |  FROM mm WHERE event_type = 'view')
        |SELECT 'click' AS group_a, 'view' AS group_b, n_a, n_b,
        |  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
        |  round((mean_a - mean_b)
        |    / sqrt(var_a / n_a + var_b / n_b), 6) AS t_stat,
        |  round((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
        |    / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
        |      + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6) AS welch_df
        |FROM a, b""".stripMargin,

    // moments are exact BIGINTs; the r-combine runs in HUGEINT (the
    // oracle's BigInt) so n·Σxy can never overflow — one divide + one
    // sqrt, the identical IEEE tree the Spark driver-side combine uses
    "q_acf" ->
      """WITH base AS (
        |  SELECT event_type, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM events),
        |l AS (
        |  SELECT event_type, x,
        |    lead(x, 1) OVER w AS y1, lead(x, 2) OVER w AS y2,
        |    lead(x, 3) OVER w AS y3, lead(x, 4) OVER w AS y4,
        |    lead(x, 5) OVER w AS y5
        |  FROM base WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
        |m AS (
        |  SELECT event_type,
        |    CAST(count(y1) AS BIGINT) AS n1, CAST(count(y2) AS BIGINT) AS n2,
        |    CAST(count(y3) AS BIGINT) AS n3, CAST(count(y4) AS BIGINT) AS n4,
        |    CAST(count(y5) AS BIGINT) AS n5,
        |    sum(x) FILTER (y1 IS NOT NULL) AS sx1, sum(y1) AS sy1,
        |      sum(x*y1) AS sxy1, sum(x*x) FILTER (y1 IS NOT NULL) AS sxx1,
        |      sum(y1*y1) AS syy1,
        |    sum(x) FILTER (y2 IS NOT NULL) AS sx2, sum(y2) AS sy2,
        |      sum(x*y2) AS sxy2, sum(x*x) FILTER (y2 IS NOT NULL) AS sxx2,
        |      sum(y2*y2) AS syy2,
        |    sum(x) FILTER (y3 IS NOT NULL) AS sx3, sum(y3) AS sy3,
        |      sum(x*y3) AS sxy3, sum(x*x) FILTER (y3 IS NOT NULL) AS sxx3,
        |      sum(y3*y3) AS syy3,
        |    sum(x) FILTER (y4 IS NOT NULL) AS sx4, sum(y4) AS sy4,
        |      sum(x*y4) AS sxy4, sum(x*x) FILTER (y4 IS NOT NULL) AS sxx4,
        |      sum(y4*y4) AS syy4,
        |    sum(x) FILTER (y5 IS NOT NULL) AS sx5, sum(y5) AS sy5,
        |      sum(x*y5) AS sxy5, sum(x*x) FILTER (y5 IS NOT NULL) AS sxx5,
        |      sum(y5*y5) AS syy5
        |  FROM l GROUP BY 1),
        |long AS (
        |  SELECT event_type, 1 AS lag, n1 AS n_pairs, CAST(sx1 AS HUGEINT) AS sx,
        |    CAST(sy1 AS HUGEINT) AS sy, CAST(sxy1 AS HUGEINT) AS sxy,
        |    CAST(sxx1 AS HUGEINT) AS sxx, CAST(syy1 AS HUGEINT) AS syy FROM m
        |  UNION ALL SELECT event_type, 2, n2, CAST(sx2 AS HUGEINT),
        |    CAST(sy2 AS HUGEINT), CAST(sxy2 AS HUGEINT),
        |    CAST(sxx2 AS HUGEINT), CAST(syy2 AS HUGEINT) FROM m
        |  UNION ALL SELECT event_type, 3, n3, CAST(sx3 AS HUGEINT),
        |    CAST(sy3 AS HUGEINT), CAST(sxy3 AS HUGEINT),
        |    CAST(sxx3 AS HUGEINT), CAST(syy3 AS HUGEINT) FROM m
        |  UNION ALL SELECT event_type, 4, n4, CAST(sx4 AS HUGEINT),
        |    CAST(sy4 AS HUGEINT), CAST(sxy4 AS HUGEINT),
        |    CAST(sxx4 AS HUGEINT), CAST(syy4 AS HUGEINT) FROM m
        |  UNION ALL SELECT event_type, 5, n5, CAST(sx5 AS HUGEINT),
        |    CAST(sy5 AS HUGEINT), CAST(sxy5 AS HUGEINT),
        |    CAST(sxx5 AS HUGEINT), CAST(syy5 AS HUGEINT) FROM m)
        |SELECT event_type, lag, n_pairs,
        |  CAST(CAST(n_pairs AS HUGEINT)*sxy - sx*sy AS DOUBLE)
        |    / sqrt(CAST(CAST(n_pairs AS HUGEINT)*sxx - sx*sx AS DOUBLE)
        |         * CAST(CAST(n_pairs AS HUGEINT)*syy - sy*sy AS DOUBLE)) AS acf_r
        |FROM long""".stripMargin,

    // per-cell IEEE trees (no cross-row float sum); the total row sums
    // contributions AFTER round-to-6dp as DECIMAL — order-independent
    "q_chi_square" ->
      """WITH cells AS (
        |  SELECT event_type, dayofweek(ts) + 1 AS dow, count(*) AS observed
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, sum(observed) AS r_tot FROM cells GROUP BY 1),
        |ct AS (SELECT dow, sum(observed) AS c_tot FROM cells GROUP BY 1),
        |g AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM cells),
        |sc AS (
        |  SELECT c.event_type, c.dow, c.observed,
        |    CAST(CAST(r_tot AS BIGINT) * CAST(c_tot AS BIGINT) AS DOUBLE)
        |      / n_total AS expected
        |  FROM cells c JOIN rt USING (event_type) JOIN ct USING (dow)
        |  CROSS JOIN g),
        |sc2 AS (
        |  SELECT *, (CAST(observed AS DOUBLE) - expected)
        |    * (CAST(observed AS DOUBLE) - expected) / expected AS contrib
        |  FROM sc)
        |SELECT event_type, CAST(dow AS INT) AS dow, observed, expected, contrib
        |FROM sc2
        |UNION ALL
        |SELECT '__TOTAL__', 0, (SELECT n_total FROM g),
        |  CAST((SELECT (count(DISTINCT event_type) - 1)
        |    * (count(DISTINCT dow) - 1) FROM cells) AS DOUBLE),
        |  CAST(sum(CAST(round(contrib, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |FROM sc2""".stripMargin,

    // fixed-width literal bucket edges; counts and distinct counts are
    // exact integers, so the whole row hash-matches with no rounding
    "q_k_anonymity" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  LEAST(GREATEST(CAST(floor(value / 100) AS BIGINT), 0), 9) AS vbucket,
        |  count(*) AS n,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  count(DISTINCT user_id) < 5 AS suppressed
        |FROM events
        |GROUP BY 1, 2, 3""".stripMargin,

    // fixed 10-bucket sensitive grid per (type, day) QI group: counts
    // and distinct-l are exact integers; entropy is the same
    // left-associated 10-term ln tree as the Spark plan (q_psi
    // discipline), rounded at 6 dp; entropy_ok compares the rounded
    // value against ln(3) computed identically in both engines
    "q_l_diversity" -> {
      val cnt = (0 until 10)
        .map(b => s"count(*) FILTER (WHERE b = $b) AS c$b").mkString(",\n    ")
      val n = (0 until 10).map(b => s"c$b").mkString(" + ")
      val nSens = (0 until 10)
        .map(b => s"(CASE WHEN c$b > 0 THEN 1 ELSE 0 END)").mkString(" + ")
      def p(b: Int) = s"(CAST(c$b AS DOUBLE) / CAST(n AS DOUBLE))"
      val ent = (0 until 10)
        .map(b => s"(CASE WHEN c$b > 0 THEN (-${p(b)}) * ln(${p(b)}) ELSE 0.0 END)")
        .mkString("\n    + ")
      s"""WITH e AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day,
         |    LEAST(GREATEST(CAST(floor(value / 100) AS BIGINT), 0), 9) AS b
         |  FROM events),
         |c AS (
         |  SELECT event_type, day,
         |    $cnt
         |  FROM e GROUP BY 1, 2),
         |w AS (SELECT c.*, $n AS n FROM c)
         |SELECT event_type, day, n,
         |  CAST($nSens AS BIGINT) AS n_sensitive,
         |  round($ent, 6) AS entropy,
         |  $nSens >= 3 AS diverse,
         |  ($ent) >= ln(3) AS entropy_ok
         |FROM w""".stripMargin
    },

    // each metric is a ratio of two exact integers — one correctly-
    // rounded divide per row, no rounding key needed
    "q_dq_checks" ->
      """WITH m AS (
        |  SELECT count(*) AS n, count(value) AS n_value,
        |    count(DISTINCT event_id) AS n_key,
        |    count(*) FILTER (event_type IN
        |      ('click','error','purchase','signup','view')) AS n_domain,
        |    count(*) FILTER (value >= 0.0 AND value <= 1000.0) AS n_range,
        |    count(*) FILTER (props LIKE '{%' AND props LIKE '%}') AS n_json
        |  FROM events)
        |SELECT check_name, metric, threshold, metric >= threshold AS passed
        |FROM (
        |  SELECT 'completeness_value' AS check_name,
        |    CAST(n_value AS DOUBLE) / n AS metric,
        |    CAST(1.0 AS DOUBLE) AS threshold FROM m
        |  UNION ALL SELECT 'uniqueness_event_id',
        |    CAST(n_key AS DOUBLE) / n, CAST(1.0 AS DOUBLE) FROM m
        |  UNION ALL SELECT 'domain_event_type',
        |    CAST(n_domain AS DOUBLE) / n, CAST(1.0 AS DOUBLE) FROM m
        |  UNION ALL SELECT 'range_value_0_1000',
        |    CAST(n_range AS DOUBLE) / n, CAST(0.999 AS DOUBLE) FROM m
        |  UNION ALL SELECT 'wellformed_props',
        |    CAST(n_json AS DOUBLE) / n, CAST(1.0 AS DOUBLE) FROM m)""".stripMargin,

    "q_transition_matrix" ->
      """WITH st AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, count(*) AS n FROM st
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS row_n FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n, t.row_n,
        |  CAST(c.n AS DOUBLE) / t.row_n AS p
        |FROM c JOIN t USING (from_type)""".stripMargin,

    // the dense-grid CCF: generate_series fills genuine-zero hours, the
    // moment combine runs in HUGEINT — the q_acf recipe, two series
    "q_ccf" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS b FROM events),
        |cx AS (SELECT b, count(*) AS x FROM ev
        |  WHERE event_type = 'click' GROUP BY 1),
        |cy AS (SELECT b, count(*) AS y FROM ev
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |bounds AS (SELECT min(b) AS mn, max(b) AS mx FROM ev),
        |grid AS (SELECT unnest(generate_series(mn, mx)) AS b FROM bounds),
        |dense AS (
        |  SELECT g.b, coalesce(cx.x, CAST(0 AS BIGINT)) AS x,
        |    coalesce(cy.y, CAST(0 AS BIGINT)) AS y
        |  FROM grid g LEFT JOIN cx ON g.b = cx.b LEFT JOIN cy ON g.b = cy.b),
        |l AS (
        |  SELECT x, y AS y0, lead(y, 1) OVER w AS y1, lead(y, 2) OVER w AS y2,
        |    lead(y, 3) OVER w AS y3, lead(y, 4) OVER w AS y4,
        |    lead(y, 5) OVER w AS y5
        |  FROM dense WINDOW w AS (ORDER BY b)),
        |m AS (
        |  SELECT
        |    CAST(count(y0) AS BIGINT) AS n0, CAST(count(y1) AS BIGINT) AS n1,
        |    CAST(count(y2) AS BIGINT) AS n2, CAST(count(y3) AS BIGINT) AS n3,
        |    CAST(count(y4) AS BIGINT) AS n4, CAST(count(y5) AS BIGINT) AS n5,
        |    sum(x) FILTER (y0 IS NOT NULL) AS sx0, sum(y0) AS sy0,
        |      sum(x*y0) AS sxy0, sum(x*x) FILTER (y0 IS NOT NULL) AS sxx0,
        |      sum(y0*y0) AS syy0,
        |    sum(x) FILTER (y1 IS NOT NULL) AS sx1, sum(y1) AS sy1,
        |      sum(x*y1) AS sxy1, sum(x*x) FILTER (y1 IS NOT NULL) AS sxx1,
        |      sum(y1*y1) AS syy1,
        |    sum(x) FILTER (y2 IS NOT NULL) AS sx2, sum(y2) AS sy2,
        |      sum(x*y2) AS sxy2, sum(x*x) FILTER (y2 IS NOT NULL) AS sxx2,
        |      sum(y2*y2) AS syy2,
        |    sum(x) FILTER (y3 IS NOT NULL) AS sx3, sum(y3) AS sy3,
        |      sum(x*y3) AS sxy3, sum(x*x) FILTER (y3 IS NOT NULL) AS sxx3,
        |      sum(y3*y3) AS syy3,
        |    sum(x) FILTER (y4 IS NOT NULL) AS sx4, sum(y4) AS sy4,
        |      sum(x*y4) AS sxy4, sum(x*x) FILTER (y4 IS NOT NULL) AS sxx4,
        |      sum(y4*y4) AS syy4,
        |    sum(x) FILTER (y5 IS NOT NULL) AS sx5, sum(y5) AS sy5,
        |      sum(x*y5) AS sxy5, sum(x*x) FILTER (y5 IS NOT NULL) AS sxx5,
        |      sum(y5*y5) AS syy5
        |  FROM l),
        |long AS (
        |  SELECT 0 AS lag_hours, n0 AS n_pairs, CAST(sx0 AS HUGEINT) AS sx,
        |    CAST(sy0 AS HUGEINT) AS sy, CAST(sxy0 AS HUGEINT) AS sxy,
        |    CAST(sxx0 AS HUGEINT) AS sxx, CAST(syy0 AS HUGEINT) AS syy FROM m
        |  UNION ALL SELECT 1, n1, CAST(sx1 AS HUGEINT), CAST(sy1 AS HUGEINT),
        |    CAST(sxy1 AS HUGEINT), CAST(sxx1 AS HUGEINT), CAST(syy1 AS HUGEINT)
        |    FROM m
        |  UNION ALL SELECT 2, n2, CAST(sx2 AS HUGEINT), CAST(sy2 AS HUGEINT),
        |    CAST(sxy2 AS HUGEINT), CAST(sxx2 AS HUGEINT), CAST(syy2 AS HUGEINT)
        |    FROM m
        |  UNION ALL SELECT 3, n3, CAST(sx3 AS HUGEINT), CAST(sy3 AS HUGEINT),
        |    CAST(sxy3 AS HUGEINT), CAST(sxx3 AS HUGEINT), CAST(syy3 AS HUGEINT)
        |    FROM m
        |  UNION ALL SELECT 4, n4, CAST(sx4 AS HUGEINT), CAST(sy4 AS HUGEINT),
        |    CAST(sxy4 AS HUGEINT), CAST(sxx4 AS HUGEINT), CAST(syy4 AS HUGEINT)
        |    FROM m
        |  UNION ALL SELECT 5, n5, CAST(sx5 AS HUGEINT), CAST(sy5 AS HUGEINT),
        |    CAST(sxy5 AS HUGEINT), CAST(sxx5 AS HUGEINT), CAST(syy5 AS HUGEINT)
        |    FROM m)
        |SELECT lag_hours, n_pairs,
        |  CAST(CAST(n_pairs AS HUGEINT)*sxy - sx*sy AS DOUBLE)
        |    / sqrt(CAST(CAST(n_pairs AS HUGEINT)*sxx - sx*sx AS DOUBLE)
        |         * CAST(CAST(n_pairs AS HUGEINT)*syy - sy*sy AS DOUBLE)) AS ccf_r
        |FROM long""".stripMargin,

    // split point is integer micros (floor div — exact cross-engine);
    // mirrors the Spark plan's fixed-literal shape: 20 conditional
    // counts per type, then one LEFT-ASSOCIATED 10-term ln tree (SQL +
    // parses left-assoc, matching reduceLeft) — generated so both
    // engines carry the identical expression per bin
    "q_psi" -> {
      val cnt = (0 until 10).flatMap(b => Seq(
        s"count(*) FILTER (WHERE us <= mid AND bin = $b) AS nr$b",
        s"count(*) FILTER (WHERE us > mid AND bin = $b) AS nc$b"))
        .mkString(",\n    ")
      val tr = (0 until 10).map(b => s"nr$b").mkString(" + ")
      val tc = (0 until 10).map(b => s"nc$b").mkString(" + ")
      def p(n: String, t: String) =
        s"(CAST($n AS DOUBLE) + 0.5) / (CAST($t AS DOUBLE) + 5.0)"
      val terms = (0 until 10).map(b =>
        s"(${p(s"nc$b", "tc")} - ${p(s"nr$b", "tr")})" +
          s" * ln(${p(s"nc$b", "tc")} / ${p(s"nr$b", "tr")})")
        .mkString("\n    + ")
      s"""WITH e AS (
         |  SELECT event_type, epoch_us(ts) AS us,
         |    least(floor(value / 100.0), 9.0) AS bin
         |  FROM events),
         |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
         |c AS (
         |  SELECT event_type,
         |    $cnt
         |  FROM e, mid GROUP BY 1),
         |w AS (SELECT c.*, $tr AS tr, $tc AS tc FROM c)
         |SELECT event_type, tr AS n_ref, tc AS n_cur,
         |  round($terms, 6) AS psi_value,
         |  round($terms, 6) > 0.2 AS drifted
         |FROM w""".stripMargin
    },

    // running integer sums over the distinct-value grid; one divide per
    // side, max |ΔF| — identical IEEE tree to the Spark plan
    "q_ks_test" ->
      """WITH c AS (
        |  SELECT value,
        |    count(*) FILTER (WHERE event_type = 'click') AS ca,
        |    count(*) FILTER (WHERE event_type = 'view') AS cb
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY 1),
        |cum AS (
        |  SELECT
        |    sum(ca) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fa,
        |    sum(cb) OVER (ORDER BY value
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fb
        |  FROM c),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM c),
        |m AS (
        |  SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |    max(abs(CAST(fa AS DOUBLE) / na - CAST(fb AS DOUBLE) / nb))
        |      AS d_raw
        |  FROM cum, t)
        |SELECT n_a, n_b, round(d_raw, 6) AS d_stat,
        |  round(d_raw * sqrt(CAST(n_a AS DOUBLE) * n_b / (n_a + n_b)), 6)
        |    AS ks_scaled
        |FROM m""".stripMargin,

    // fences are the ROUNDED exact percentiles (the q_quantile class);
    // the clamped sum runs in DECIMAL(18,4) so the only IEEE step is
    // the final divide
    "q_winsorize" ->
      """WITH f AS (
        |  SELECT event_type,
        |    round(quantile_cont(value, 0.01), 4) AS lo,
        |    round(quantile_cont(value, 0.99), 4) AS hi
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n, max(f.lo) AS lo, max(f.hi) AS hi,
        |  CAST(sum(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(sum(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi,
        |  round(CAST(sum(CAST(least(greatest(e.value, f.lo), f.hi)
        |      AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS wmean
        |FROM events e JOIN f USING (event_type)
        |GROUP BY 1""".stripMargin,
  )
}
