package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Layout, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast
import OracleCtes._

/** Scans, projections, filters, joins, aggregations, sorts, set ops,
  * format roundtrips and lakehouse upsert — gate rows: `queries` entries + their DuckDB
  * oracles (keys without an oracle are spec-pinned; see SparkEntry
  * scaladoc for the determinism contract). */
object RelationalGates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // scans / projections / filters / scalars (S1-S2, S5, P1-P13)
    "q_scan_project"   -> (Relational.scanProject _),
    "q_filter_conj"    -> (Relational.filterConj _),
    "q_when_otherwise" -> (Relational.whenOtherwise _),
    "q_cast_date_unix" -> (Relational.castDateUnix _),
    "q_isin"           -> (Relational.isinFilter _),
    "q_csv_roundtrip"  -> (Relational.csvRoundtrip _),
    // joins (J1-J4)
    "q_join_compound"  -> (Relational.joinCompound _),
    "q_join_using"     -> (Relational.joinUsing _),
    "q_join_broadcast" -> (Relational.joinBroadcast _),
    // aggregations (A1-A8)
    "q_groupby_max"    -> (Relational.groupbyMax _),
    "q_groupby_daily"  -> (Relational.groupbyDaily _),
    "q_pivot_fill"     -> (Relational.pivotFill _),
    "q_dropna"         -> (Relational.pivotDropna _),
    // sorts / top-k (O1-O2)
    "q_orderby_topk"   -> (Relational.orderbyTopk _),
    // grouped ranking: per-user top-5 by value (WindowGroupLimit plan —
    // no global sort; TopkPerKeySpec asserts the plan shape)
    "q_topk_per_key"   -> ((s: SparkSession, d: String) => Relational.topkPerKey(s, d)),
    // set operations (INTERSECT / EXCEPT / UNION DISTINCT, labeled legs)
    "q_set_ops"        -> (Relational.setOps _),
    // left SEMI / ANTI join as first-class shapes (EXISTS / NOT EXISTS)
    "q_semi_anti"      -> (Relational.semiAnti _),
    // FULL OUTER join of two keyed aggregates (1:1, coalesced zeros)
    "q_join_outer"     -> (Relational.joinOuter _),
    // row_number/rank/dense_rank/percent_rank/ntile battery, unique
    // tiebreak, every-97th-row sample AFTER the window
    "q_rank_family"    -> (Relational.rankFamily _),
    // CUBE grouping sets over (event_type, day) — one-shuffle all-slices
    "q_cube_daily"     -> (Relational.cubeDaily _),
    // explicit GROUPING SETS subset ((type, day), (day), ()) + bitmask
    // grouping_id — one Expand + one shuffle for all three levels
    "q_grouping_sets"  -> (Relational.groupingSetsDaily _),
    // ROLLUP prefix chain (type, day) -> (type) -> () — completes the
    // cube / grouping-sets / rollup trilogy
    "q_rollup_daily"   -> (Relational.rollupDaily _),
    // UNPIVOT (melt): the A2 pivot inverted back to long rows
    "q_unpivot"        -> (Relational.unpivotDaily _),
    // Morton z-order clustering key (the OPTIMIZE ZORDER primitive)
    "q_zorder"         -> (Relational.zorderKey _),
    // MERGE INTO semantics as full-outer join + coalesce (lakehouse
    // upsert; deterministic synthesized batch → fully oracle-able)
    "q_merge_upsert"   -> (graft.operators.Analytics.mergeUpsert _),
    // deterministic per-key LCG sampling (oracle-able, WindowGroupLimit)
    "q_per_key_sample" -> ((s: SparkSession, d: String) => Relational.perKeySample(s, d)),
    // deterministic stratified train/val/test split report (LCG bucket —
    // identical integer math on both engines, fully oracled)
    "q_stratified_split" -> (Relational.stratifiedSplit _),
    // deterministic global training-order permutation — two-level
    // bucket construction, no global row_number window; oracle = the
    // plain ROW_NUMBER() OVER (ORDER BY mix, doc_id) it must equal
    "q_train_order"    -> (Relational.trainOrder _),
    // JSONL sink + explicit-schema scan roundtrip (content-md5 extrema
    // prove lossless escaping, not just row counts)
    "q_jsonl_roundtrip" -> (Relational.jsonlRoundtrip _),
    // ORC sink + scan roundtrip (Spark's other native columnar format)
    "q_orc_roundtrip"  -> (Relational.orcRoundtrip _),
    "q_count_distinct" -> (Relational.countDistinctUsers _),
    "q_json_extract"   -> (Relational.jsonExtract _),
    // array HOFs (transform/filter/aggregate/zip_with) as a gate row —
    // float→double-first lambdas + left folds match DuckDB list_* exactly
    "q_array_hof"      -> (Relational.arrayHof _),
    // hash-based sampling is deterministic by KEY (not partitioning);
    // the hash is JVM-side, so the gate emits the sampler's CONTRACT as
    // oracle-pinned verdicts (repartitioned re-run equality, exact
    // complement, loose fraction envelope) beside exact totals
    "q_hash_sample"    -> ((s: SparkSession, d: String) => Relational.hashSampleAudit(s, d)),
    // date-partitioned write + statically pruned read (PartitionFilters
    // — LayoutSpec asserts only the first week's directories are opened)
    "q_partition_prune" -> (Layout.partitionPrunedDaily _),
    // bucketed saveAsTable × 2 + exchange-free co-located SMJ
    "q_bucket_join"    -> (Layout.bucketJoin _),
    // 16-way salted skew join; oracle = the plain join (semantics-free)
    "q_salted_join"    -> (Layout.saltedTypeJoin _),
    // DYNAMIC partition pruning: runtime dim-driven directory pruning
    // (dynamicpruningexpression in the fact scan — LayoutGatesSpec)
    "q_dpp"            -> (Layout.dppJoin _),
    // runtime Bloom-filter pushdown on a shuffle semi-join (row-level
    // sibling of q_dpp; might_contain plan-asserted in LayoutGatesSpec)
    "q_bloom_join"     -> (Layout.bloomPrunedJoin _),
    // parquet schema-evolution roundtrip (two staged generations read
    // with mergeSchema; old files null-fill the accreted column)
    "q_schema_evolution" -> (Relational.schemaEvolution _),
    // AQE skew-join split (the AUTOMATIC half of the skew story next to
    // q_salted_join; skew=true plan-asserted in LayoutGatesSpec)
    "q_aqe_skew"       -> (Layout.aqeSkewJoin _),
  )

  val oracles: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT event_id, user_id AS terminal_id, value FROM events",

    // the sampler's membership is JVM-hashed (no cross-engine oracle);
    // the oracle pins the exact totals and every contract verdict to
    // literal TRUE — a sampler that depends on partitioning, leaks rows
    // between split halves, or mis-sizes the cut flips a boolean
    "q_hash_sample" ->
      """SELECT event_type, count(*) AS n_total,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  TRUE AS rerun_equal, TRUE AS complement_exact,
        |  TRUE AS user_frac_in_bounds
        |FROM events GROUP BY 1""".stripMargin,

    // the same first-week bound the operator computes driver-side; the
    // partitioned layout must change IO, not answers
    "q_partition_prune" ->
      """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
        |  event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events
        |WHERE CAST(ts AS DATE) <= (SELECT min(CAST(ts AS DATE)) + 6 FROM events)
        |GROUP BY 1, 2""".stripMargin,

    // bucketing must change the plan (no Exchange), never the rows
    "q_bucket_join" ->
      """WITH clicks AS (
        |  SELECT user_id, count(*) AS n_clicks,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS click_sum
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |others AS (
        |  SELECT user_id, count(*) AS n_other
        |  FROM events WHERE event_type <> 'click' GROUP BY 1)
        |SELECT user_id, n_clicks, click_sum, n_other
        |FROM clicks JOIN others USING (user_id)""".stripMargin,

    // runtime pruning must change IO, never answers: oracle recomputes
    // the same half-mean busy-day bound over the raw table
    "q_dpp" ->
      """WITH days AS (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS event_date,
        |    count(*) AS n_day
        |  FROM events GROUP BY 1),
        |cut AS (SELECT CAST(sum(n_day) AS DOUBLE) / (2.0 * count(*)) AS half_mean
        |  FROM days),
        |busy AS (SELECT event_date, n_day FROM days, cut
        |  WHERE CAST(n_day AS DOUBLE) >= half_mean)
        |SELECT strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS event_date,
        |  e.event_type, count(*) AS n,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
        |  max(b.n_day) AS n_day
        |FROM events e
        |JOIN busy b ON strftime(CAST(e.ts AS DATE), '%Y-%m-%d') = b.event_date
        |GROUP BY 1, 2""".stripMargin,

    // a Bloom filter has no false negatives: the injected runtime filter
    // is semantics-free, so the oracle is the plain EXISTS semi-join
    "q_bloom_join" ->
      """SELECT user_id, count(*) AS n_browse,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS browse_sum
        |FROM events e
        |WHERE event_type IN ('click', 'view')
        |  AND EXISTS (SELECT 1 FROM events p
        |    WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
        |      AND p.value >= 180.0)
        |GROUP BY user_id""".stripMargin,

    // schema merge must change file-level schemas, never answers: the
    // oracle rebuilds both generations with the deterministic parity
    // split (v2 rows carry floor(value) as the evolved integer score)
    "q_schema_evolution" ->
      """SELECT event_type, count(*) AS n,
        |  count(CASE WHEN event_id % 2 = 1 THEN 1 END) AS n_scored,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
        |  CAST(sum(CASE WHEN event_id % 2 = 1
        |    THEN CAST(floor(value) AS BIGINT) ELSE 0 END) AS BIGINT)
        |    AS score_sum
        |FROM events GROUP BY 1""".stripMargin,

    // runtime skew splitting must be semantics-free: oracle = the plain
    // fact-to-generated-dim join
    "q_aqe_skew" ->
      """WITH fact AS (
        |  SELECT event_id, value,
        |    CASE WHEN event_id % 10 < 7 THEN 'hot'
        |      ELSE 'cold_' || CAST(event_id % 97 AS VARCHAR) END AS skew_key
        |  FROM events),
        |dim AS (
        |  SELECT CASE WHEN i = 0 THEN 'hot'
        |      ELSE 'cold_' || CAST(i - 1 AS VARCHAR) END AS skew_key,
        |    i * 10 AS dim_payload
        |  FROM (SELECT unnest(generate_series(0, 97)) AS i))
        |SELECT f.event_id, f.skew_key, f.value, d.dim_payload
        |FROM fact f JOIN dim d USING (skew_key)""".stripMargin,

    // salting must be semantics-free: oracle = the plain unsalted join
    "q_salted_join" ->
      """WITH dim AS (
        |  SELECT event_type, count(*) AS type_n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS type_mean
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value, dim.type_n, dim.type_mean,
        |  e.value - dim.type_mean AS dev_from_mean
        |FROM events e JOIN dim USING (event_type)""".stripMargin,

    "q_filter_conj" ->
      """SELECT event_id, ts, event_type, value FROM events
        |WHERE value < 100.0 AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND NOT (event_type = 'error')""".stripMargin,

    "q_when_otherwise" ->
      """SELECT event_id,
        |  CASE WHEN event_type = 'click' OR event_type = 'view' THEN 'browse'
        |       WHEN event_type = 'signup' THEN 'onboard'
        |       ELSE event_type END AS kind
        |FROM events""".stripMargin,

    "q_cast_date_unix" ->
      """SELECT event_id, CAST(ts AS DATE) AS event_date,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
        |FROM events""".stripMargin,

    "q_isin" ->
      "SELECT event_id, event_type, value FROM events WHERE event_type IN ('purchase', 'signup')",

    "q_csv_roundtrip" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY event_type""".stripMargin,

    "q_join_compound" ->
      """WITH dim AS (
        |  SELECT user_id, event_type, count(*) AS type_count, max(value) AS type_max
        |  FROM events GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.event_type, dim.type_count, dim.type_max
        |FROM events e JOIN dim
        |  ON e.user_id = dim.user_id AND e.event_type = dim.event_type""".stripMargin,

    "q_join_using" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS day_max
        |  FROM events GROUP BY 1, 2),
        |cnts AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS day_n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, day, day_max, day_n FROM daily JOIN cnts USING (user_id, day)""".stripMargin,

    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS cust_cnt,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin,

    "q_groupby_max" ->
      """SELECT user_id, CAST(ts AS DATE) AS day, event_type, max(value) AS max_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "q_groupby_daily" ->
      """SELECT CAST(ts AS DATE) AS day, max(value) AS max_value, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1""".stripMargin,

    "q_pivot_fill" ->
      """SELECT user_id, CAST(ts AS DATE) AS day,
        |  COALESCE(max(value) FILTER (WHERE event_type = 'click'), 0.0) AS click,
        |  COALESCE(max(value) FILTER (WHERE event_type = 'error'), 0.0) AS "error",
        |  COALESCE(max(value) FILTER (WHERE event_type = 'purchase'), 0.0) AS purchase,
        |  COALESCE(max(value) FILTER (WHERE event_type = 'view'), 21.0) AS "view"
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_dropna" ->
      """SELECT * FROM (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    max(value) FILTER (WHERE event_type = 'click') AS click,
        |    max(value) FILTER (WHERE event_type = 'error') AS "error",
        |    max(value) FILTER (WHERE event_type = 'purchase') AS purchase,
        |    max(value) FILTER (WHERE event_type = 'view') AS "view"
        |  FROM events GROUP BY 1, 2) t
        |WHERE click IS NOT NULL AND "error" IS NOT NULL
        |  AND purchase IS NOT NULL AND "view" IS NOT NULL""".stripMargin,

    "q_orderby_topk" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |ORDER BY value DESC, event_id ASC LIMIT 100""".stripMargin,

    "q_topk_per_key" ->
      """SELECT user_id, rank, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id ASC) AS INTEGER) AS rank
        |  FROM events) t
        |WHERE rank <= 5""".stripMargin,

    "q_set_ops" ->
      """SELECT 'click_and_purchase' AS set_op, user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT user_id FROM events WHERE event_type = 'purchase')
        |UNION ALL
        |SELECT 'view_not_error', user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'view'
        |  EXCEPT
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |UNION ALL
        |SELECT 'signup_or_purchase', user_id FROM (
        |  SELECT user_id FROM events WHERE event_type = 'signup'
        |  UNION
        |  SELECT user_id FROM events WHERE event_type = 'purchase')""".stripMargin,

    "q_semi_anti" ->
      """WITH open AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT 'has_open_order' AS kind, c_custkey, c_mktsegment, c_acctbal
        |FROM customer WHERE c_custkey IN (SELECT o_custkey FROM open)
        |UNION ALL
        |SELECT 'no_open_order', c_custkey, c_mktsegment, c_acctbal
        |FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM open)""".stripMargin,

    "q_join_outer" ->
      """WITH c AS (
        |  SELECT user_id, count(*) AS n_clicks FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT user_id, count(*) AS n_purchases FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT COALESCE(c.user_id, p.user_id) AS user_id,
        |  COALESCE(n_clicks, 0) AS n_clicks,
        |  COALESCE(n_purchases, 0) AS n_purchases,
        |  CASE WHEN n_clicks IS NULL THEN 'purchase_only'
        |       WHEN n_purchases IS NULL THEN 'click_only'
        |       ELSE 'both' END AS kind
        |FROM c FULL OUTER JOIN p ON c.user_id = p.user_id""".stripMargin,

    // ranks computed over the FULL partition, sampled after — the same
    // window spec both engines run; unique event_id tiebreak
    "q_rank_family" ->
      """SELECT event_id, event_type, value,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  round(percent_rank() OVER w, 6) AS prnk,
        |  ntile(4) OVER w AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id)
        |QUALIFY event_id % 97 = 0""".stripMargin,

    "q_cube_daily" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
        |SELECT event_type, day, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM e GROUP BY CUBE (event_type, day)""".stripMargin,

    // GROUPING() returns the same first-arg-most-significant bitmask as
    // Spark's grouping_id()
    "q_grouping_sets" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
        |SELECT event_type, day,
        |  CAST(GROUPING(event_type, day) AS BIGINT) AS gid, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM e GROUP BY GROUPING SETS ((event_type, day), (day), ())""".stripMargin,

    "q_rollup_daily" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
        |SELECT event_type, day,
        |  CAST(GROUPING(event_type, day) AS BIGINT) AS gid, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM e GROUP BY ROLLUP (event_type, day)""".stripMargin,

    // pivot∘unpivot with null-drop is exactly the long-form aggregate —
    // the oracle checks the roundtrip against the direct groupBy
    "q_unpivot" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    // both engines synthesize the identical update batch from the base
    // table, so the whole MERGE (update/insert/unchanged) is checkable
    "q_merge_upsert" ->
      """WITH base AS (
        |  SELECT event_id, user_id, event_type, value FROM events),
        |upd AS (
        |  SELECT event_id, user_id, 'patched' AS event_type,
        |    value + 1000.0 AS value
        |  FROM base WHERE event_id % 100 = 0),
        |ins AS (
        |  SELECT COALESCE((SELECT max(event_id) FROM base), 0) + off AS event_id,
        |    off % 97 AS user_id, 'inserted' AS event_type,
        |    CAST(off AS DOUBLE) / 10.0 AS value
        |  FROM (SELECT unnest(generate_series(1, 50)) AS off)),
        |batch AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT COALESCE(b.event_id, u.event_id) AS event_id,
        |  COALESCE(u.user_id, b.user_id) AS user_id,
        |  COALESCE(u.event_type, b.event_type) AS event_type,
        |  COALESCE(u.value, b.value) AS value,
        |  CASE WHEN u.event_id IS NOT NULL AND b.event_id IS NOT NULL
        |      THEN 'updated'
        |    WHEN b.event_id IS NULL THEN 'inserted'
        |    ELSE 'unchanged' END AS merge_action
        |FROM base b FULL OUTER JOIN batch u ON b.event_id = u.event_id""".stripMargin,

    // Morton interleave as pure shift/mask integer sums; inputs are
    // non-negative so % matches Spark's pmod
    "q_zorder" ->
      """WITH z AS (
        |  SELECT event_id, user_id % 4096 AS zx,
        |    CAST(floor(value) AS BIGINT) % 4096 AS zy
        |  FROM events)
        |SELECT event_id, zx, zy,
        |  CAST(list_sum(list_transform(generate_series(0, 11),
        |    i -> (((zx >> i) & 1) << (2*i)) + (((zy >> i) & 1) << (2*i+1))))
        |    AS BIGINT) AS zval
        |FROM z""".stripMargin,

    // LCG mix in exact BIGINT arithmetic ((id mod 2^31)·1103515245 stays
    // below 2^63) — the oracle-able twin of the xxhash64 hash sample
    "q_per_key_sample" ->
      """WITH k AS (
        |  SELECT user_id, event_id, event_type, value,
        |    ((event_id % 2147483648) * 1103515245 + 12345) % 2147483648
        |      AS sample_key
        |  FROM events)
        |SELECT user_id, rank, event_id, event_type, value, sample_key FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY user_id
        |    ORDER BY sample_key, event_id) AS INTEGER) AS rank FROM k) t
        |WHERE rank <= 2""".stripMargin,

    // the LCG bucket is the q_per_key_sample mix mod 100 — pure integer
    // ops, identical on both engines; window sum cast to BIGINT (HUGEINT
    // hazard) and the fraction is the identical final IEEE divide
    "q_stratified_split" ->
      """WITH b AS (
        |  SELECT event_type,
        |    CASE WHEN ((event_id % 2147483648) * 1103515245 + 12345)
        |        % 2147483648 % 100 < 80 THEN 'train'
        |      WHEN ((event_id % 2147483648) * 1103515245 + 12345)
        |        % 2147483648 % 100 < 90 THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM events),
        |g AS (SELECT event_type, split, count(*) AS n FROM b GROUP BY 1, 2)
        |SELECT event_type, split, n,
        |  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS stratum_n,
        |  round(CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT), 6)
        |    AS fraction
        |FROM g""".stripMargin,

    "q_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

    // the oracle states the SEMANTICS (one global rank over (mix,
    // doc_id)); the Spark side must reproduce it from the two-level
    // bucket construction — that equivalence is exactly what the hash
    // check proves. Same LCG as q_stratified_split
    "q_train_order" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    ((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648 AS mix
        |  FROM documents)
        |SELECT doc_id, mix,
        |  CAST(row_number() OVER (ORDER BY mix, doc_id) AS BIGINT) AS pos
        |FROM m""".stripMargin,

    // sums cast to BIGINT: DuckDB's sum(integer) returns HUGEINT, which
    // the driver's pandas conversion degrades to float64 ("69.0" vs "69"
    // → hash mismatch, CORRECTNESS_r04); Spark's LongType sum is BIGINT
    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS BIGINT) > 50
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_high
        |FROM events GROUP BY 1""".stripMargin,

    // list_reduce seeds with the first element; Spark's aggregate seeds
    // 0.0D — identical left folds since 0.0 + x ≡ x, and every lambda
    // casts float→double (exact) before any arithmetic
    "q_array_hof" ->
      """SELECT vec_id,
        |  CAST(len(embedding) AS INTEGER) AS n_dims,
        |  CAST(len(list_filter(embedding, x -> x > 0.0)) AS INTEGER) AS n_pos,
        |  round(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE)), (a, x) -> a + x), 6) AS sum_all,
        |  round(list_reduce(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x), 6)
        |    AS sum_sq,
        |  round(list_reduce(list_transform(embedding,
        |    (x, i) -> CAST(x AS DOUBLE)
        |      * CAST(embedding[len(embedding) - i + 1] AS DOUBLE)),
        |    (a, x) -> a + x), 6) AS rev_dot
        |FROM embeddings""".stripMargin,

    // the oracle aggregates the parquet table directly: if Spark's JSONL
    // write/read corrupted any value, the md5 extrema would diverge
    "q_jsonl_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        |  min(md5(text)) AS min_text_md5, max(md5(text)) AS max_text_md5
        |FROM documents GROUP BY 1""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT source, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
        |  min(md5(text)) AS min_text_md5, max(md5(text)) AS max_text_md5
        |FROM documents GROUP BY 1""".stripMargin,
  )
}
