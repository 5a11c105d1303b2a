package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast
import OracleCtes._

/** spark.ml pipelines: classification, regression, CV, ALS, FPGrowth,
  * Word2Vec, PCA — gate rows: `queries` entries + their DuckDB
  * oracles (keys without an oracle are spec-pinned; see SparkEntry
  * scaladoc for the determinism contract). */
object MlGates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ML pipelines (M1-M10) — the whole seeded-fit family re-gated at
    // its verdict points (r14, the q_pca/q_word2vec move): exact
    // DuckDB-derivable integers from the frames AROUND the fit +
    // contract booleans over the fit itself; the seeded numbers stay
    // visible through the original Pipelines entry points and their
    // specs (MlPipelineSpec, CrossValAlsSpec, KmeansTopicsSpec)
    "q_ml_classification" -> (Pipelines.classificationVerdict _),
    "q_ml_regression"  -> (Pipelines.regressionVerdict _),
    // K-fold CV over the GBT (maxDepth, maxIter) grid, parallel fits
    "q_cross_val"      -> (Pipelines.crossValidateVerdict _),
    // ALS implicit-feedback recommender over (user, event_type) counts
    "q_als_recommend"  -> (Pipelines.alsRecommendVerdict _),
    // FPGrowth frequent itemsets — exact counts over an enumerable item
    // universe, so the miner's output is fully oracle-checked
    "q_freq_itemsets"  -> ((s: SparkSession, d: String) => Pipelines.freqItemsets(s, d)),
    // Word2Vec re-gated at its parallelism-independent verdict point
    // (r14 determinism receipt): exact vocab size + model-contract
    // booleans, oracle-exact — MLlib's vocab tie order follows
    // defaultParallelism, so the synonym ROWS are not cross-parallelism
    // stable (they stay pinned by CrossValAlsSpec via word2vecSynonyms)
    "q_word2vec"       -> ((s: SparkSession, d: String) => Pipelines.word2vecAudit(s, d)),
    "q_sql_transformer" -> (Pipelines.sqlTransformer _),
    // PCA re-gated at its covariance point (r14): exact integer-cents
    // covariance matrix + eigensolve-contract booleans, oracle-exact;
    // the loading matrix itself stays pinned by MlPipelineSpec
    "q_pca"            -> ((s: SparkSession, d: String) => Pipelines.pcaVerdict(s, d)),
    // seeded k-means re-gated at its verdict point (exact corpus
    // integers + fit-contract booleans incl. cost <= total-SS;
    // KmeansTopicsSpec keeps the planted-cluster recovery pin)
    "q_kmeans_topics"  -> ((s: SparkSession, d: String) => Pipelines.kmeansTopicsVerdict(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // classification at its verdict point (r14): the class universe and
    // per-class counts derive from the same wide-table CTE as q_etl_wide
    // (alphabetAsc label ids = alphabetical rank); the fit appears only
    // as contract booleans pinned to TRUE
    "q_ml_classification" ->
      """WITH enriched AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_type, value,
        |    CAST(json_extract_string(props, 'k') AS INTEGER) % 7 AS code_id
        |  FROM events WHERE value >= 0.0),
        |target AS (
        |  SELECT user_id, day, max(code_id) AS code_id FROM enriched GROUP BY 1, 2),
        |codes(code_id, code_name) AS (
        |  VALUES (0, 'Normal'), (1, 'GasHighAlarm'), (2, 'GasLowAlarm'), (3, 'GasAlarm'),
        |         (4, 'Maintenance'), (5, 'Calibration'), (6, 'Offline')),
        |cls AS (
        |  SELECT c.code_name AS target, CAST(count(*) AS BIGINT) AS n_class
        |  FROM target t JOIN codes c ON t.code_id = c.code_id GROUP BY 1)
        |SELECT target, n_class,
        |  CAST(rank() OVER (ORDER BY target) - 1 AS INTEGER) AS label_id,
        |  TRUE AS split_exhaustive_ok, TRUE AS preds_in_universe_ok,
        |  TRUE AS f1_unit_ok, TRUE AS pred_count_ok,
        |  TRUE AS indexer_alphabetical_ok
        |FROM cls""".stripMargin,

    // regression at its verdict point (r14): the labeled frame is the
    // q_lead_window spine; exact row count + integer-cents label sum
    // (value carries 2 decimals — the q_pca device); fit booleans TRUE
    "q_ml_regression" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS day_max
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT * FROM (
        |    SELECT user_id, day, day_max,
        |      lead(day_max, 1) OVER (PARTITION BY user_id ORDER BY day) AS next_day_max
        |    FROM daily) t
        |  WHERE next_day_max IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_labeled,
        |  CAST(sum(CAST(CAST(next_day_max AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS label_cents_sum,
        |  3 AS features_dim, TRUE AS r2_le_1_ok, TRUE AS rmse_nonneg_ok,
        |  TRUE AS rmse_mse_consistent_ok, TRUE AS importances_ok,
        |  TRUE AS split_exhaustive_ok
        |FROM l""".stripMargin,

    // CV at its verdict point (r14): the grid is re-enumerated as
    // literals, the labeled-frame count derives from the same lead
    // spine; selection-contract booleans TRUE
    "q_cross_val" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS day_max
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT * FROM (
        |    SELECT user_id, day,
        |      lead(day_max, 1) OVER (PARTITION BY user_id ORDER BY day) AS next_day_max
        |    FROM daily) t
        |  WHERE next_day_max IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_labeled FROM l)
        |SELECT g.max_depth, g.max_iter, n.n_labeled,
        |  TRUE AS rmse_finite_pos_ok, CAST(1 AS BIGINT) AS n_at_min,
        |  TRUE AS spark_chose_argmin_ok
        |FROM (VALUES (2, 5), (2, 10), (4, 5), (4, 10)) g(max_depth, max_iter), n""".stripMargin,

    // ALS at its verdict point (r14): the interaction universe is exact
    // (distinct users per event type); recommendation-contract booleans
    // TRUE (full coverage, one rec per user, items in the 5-item universe)
    "q_als_recommend" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_observed,
        |  TRUE AS rec_coverage_ok, TRUE AS rec_items_valid_ok,
        |  TRUE AS one_rec_per_user_ok
        |FROM events GROUP BY 1""".stripMargin,

    // k-means at its verdict point (r14): exact corpus count + dims;
    // fit booleans TRUE (partition property, <= k clusters, cost >= 0,
    // cost <= total SS about the global mean)
    "q_kmeans_topics" ->
      """SELECT 8 AS k, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(max(len(embedding)) AS INTEGER) AS dims,
        |  TRUE AS sizes_sum_ok, TRUE AS n_clusters_le_k_ok,
        |  TRUE AS cost_nonneg_ok, TRUE AS cost_le_totalss_ok
        |FROM embeddings""".stripMargin,

    // all 31 possible itemsets enumerated by bitmask; list_has_all
    // tests basket containment; integer freq >= minSupport*n is exactly
    // MLlib's freq >= ceil(minSupport*n) for integer freq
    "q_freq_itemsets" ->
      """WITH u AS (
        |  SELECT user_id,
        |    list_sort(list_distinct(list(event_type))) AS items
        |  FROM events GROUP BY 1),
        |n AS (SELECT count(*) AS n_users FROM u),
        |sets AS (
        |  SELECT list_filter(['click', 'error', 'purchase', 'signup', 'view'],
        |    (t, i) -> ((mask >> (i - 1)) & 1) = 1) AS s
        |  FROM (SELECT unnest(generate_series(1, 31)) AS mask))
        |SELECT array_to_string(s, '+') AS itemset,
        |  CAST(count(*) AS BIGINT) AS freq
        |FROM sets JOIN u ON list_has_all(u.items, sets.s), n
        |GROUP BY 1, n.n_users
        |HAVING count(*) >= 0.3 * n.n_users""".stripMargin,

    "q_sql_transformer" ->
      """WITH enriched AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_type, value,
        |    CAST(json_extract_string(props, 'k') AS INTEGER) % 7 AS code_id
        |  FROM events WHERE value >= 0.0),
        |features AS (
        |  SELECT user_id, day,
        |    COALESCE(max(value) FILTER (WHERE event_type = 'click'), 0.0) AS click,
        |    COALESCE(max(value) FILTER (WHERE event_type = 'error'), 0.0) AS "error",
        |    COALESCE(max(value) FILTER (WHERE event_type = 'purchase'), 0.0) AS purchase,
        |    COALESCE(max(value) FILTER (WHERE event_type = 'view'), 21.0) AS "view"
        |  FROM enriched GROUP BY 1, 2)
        |SELECT user_id, day, click, "error", purchase, "view",
        |  "view" / (click + 1.0) AS view_click_ratio
        |FROM features""".stripMargin,

    // Word2Vec at its parallelism-independent verdict point (r14):
    // vocab_size is the minCount-filtered exact token-count vocabulary
    // (same tokenizer CTE as q_unigram_logprob); the fit appears only
    // as contract booleans pinned to TRUE
    "q_word2vec" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tc AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM tc WHERE c >= 5)
        |SELECT 'spark' AS probe, v.vocab_size, 16 AS vector_dims,
        |  LEAST(5, v.vocab_size - 1) AS n_synonyms,
        |  TRUE AS sims_unit_ok, TRUE AS probe_excluded,
        |  TRUE AS synonyms_in_vocab
        |FROM v""".stripMargin,

    // PCA at its covariance point (r14): value carries 2 decimals, so
    // integer-cents moments are exact HUGEINT sums and each covariance
    // entry is ONE exact expression cast to DOUBLE at the end — the
    // same IEEE tree Pipelines.pcaVerdict computes from its DECIMAL
    // moments. The eigensolve appears only as booleans pinned to TRUE.
    "q_pca" ->
      """WITH enriched AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, event_type, value,
        |    CAST(json_extract_string(props, 'k') AS INTEGER) % 7 AS code_id
        |  FROM events WHERE value >= 0.0),
        |target AS (
        |  SELECT user_id, day, max(code_id) AS code_id FROM enriched GROUP BY 1, 2),
        |features AS (
        |  SELECT user_id, day,
        |    COALESCE(max(value) FILTER (WHERE event_type = 'click'), 0.0) AS click,
        |    COALESCE(max(value) FILTER (WHERE event_type = 'error'), 0.0) AS "error",
        |    COALESCE(max(value) FILTER (WHERE event_type = 'purchase'), 0.0) AS purchase,
        |    COALESCE(max(value) FILTER (WHERE event_type = 'view'), 21.0) AS "view"
        |  FROM enriched GROUP BY 1, 2),
        |codes(code_id) AS (VALUES (0), (1), (2), (3), (4), (5), (6)),
        |cells AS (
        |  SELECT
        |    CAST(CAST(f.click AS DECIMAL(18,2)) * 100 AS BIGINT) AS x0,
        |    CAST(CAST(f."error" AS DECIMAL(18,2)) * 100 AS BIGINT) AS x1,
        |    CAST(CAST(f.purchase AS DECIMAL(18,2)) * 100 AS BIGINT) AS x2,
        |    CAST(CAST(f."view" AS DECIMAL(18,2)) * 100 AS BIGINT) AS x3
        |  FROM features f JOIN target t USING (user_id, day)
        |  JOIN codes c ON t.code_id = c.code_id),
        |m AS (
        |  SELECT count(*) AS n,
        |    sum(x0) AS s0, sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3,
        |    sum(x0*x0) AS s0_0, sum(x0*x1) AS s0_1, sum(x0*x2) AS s0_2,
        |    sum(x0*x3) AS s0_3, sum(x1*x1) AS s1_1, sum(x1*x2) AS s1_2,
        |    sum(x1*x3) AS s1_3, sum(x2*x2) AS s2_2, sum(x2*x3) AS s2_3,
        |    sum(x3*x3) AS s3_3
        |  FROM cells),
        |c AS (
        |  SELECT
        |    CAST(n*s0_0 - s0*s0 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_click_click,
        |    CAST(n*s0_1 - s0*s1 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_click_error,
        |    CAST(n*s0_2 - s0*s2 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_click_purchase,
        |    CAST(n*s0_3 - s0*s3 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_click_view,
        |    CAST(n*s1_1 - s1*s1 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_error_error,
        |    CAST(n*s1_2 - s1*s2 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_error_purchase,
        |    CAST(n*s1_3 - s1*s3 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_error_view,
        |    CAST(n*s2_2 - s2*s2 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_purchase_purchase,
        |    CAST(n*s2_3 - s2*s3 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_purchase_view,
        |    CAST(n*s3_3 - s3*s3 AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) / 10000.0 AS cov_view_view
        |  FROM m)
        |SELECT comp.component, c.*,
        |  c.cov_click_click + c.cov_error_error + c.cov_purchase_purchase
        |    + c.cov_view_view AS trace,
        |  TRUE AS resid_ok, TRUE AS unit_ok, TRUE AS orth_ok, TRUE AS ratio_ok
        |FROM c CROSS JOIN (VALUES (0), (1)) comp(component)""".stripMargin,
  )
}
