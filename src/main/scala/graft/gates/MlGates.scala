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
    // ML pipelines (M1-M10)
    "q_ml_classification" -> (Pipelines.classification _),
    "q_ml_regression"  -> (Pipelines.regression _),
    // K-fold CV over the GBT (maxDepth, maxIter) grid, parallel fits
    // (no oracle: seeded JVM fits; CrossValSpec pins the contract)
    "q_cross_val"      -> (Pipelines.crossValidate _),
    // ALS implicit-feedback recommender over (user, event_type) counts
    // (no oracle: seeded JVM fits; AlsSpec pins the contract)
    "q_als_recommend"  -> (Pipelines.alsRecommend _),
    // FPGrowth frequent itemsets — exact counts over an enumerable item
    // universe, so the miner's output is fully oracle-checked
    "q_freq_itemsets"  -> ((s: SparkSession, d: String) => Pipelines.freqItemsets(s, d)),
    // Word2Vec skip-gram + synonym probe (no oracle: seeded JVM fit;
    // CrossValAlsSpec pins determinism and bounds)
    "q_word2vec"       -> ((s: SparkSession, d: String) => Pipelines.word2vec(s, d)),
    "q_sql_transformer" -> (Pipelines.sqlTransformer _),
    "q_pca"            -> ((s: SparkSession, d: String) => Pipelines.pca(s, d)),
    // seeded k-means topic-balance report over embeddings (no oracle:
    // JVM-seeded init; KmeansTopicsSpec pins planted-cluster recovery)
    "q_kmeans_topics"  -> ((s: SparkSession, d: String) => Pipelines.kmeansTopics(s, d)),
  )

  val oracles: Map[String, String] = Map(
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
  )
}
