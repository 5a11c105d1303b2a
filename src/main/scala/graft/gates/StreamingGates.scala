package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast
import OracleCtes._

/** Structured Streaming family — gate rows: `queries` entries + their DuckDB
  * oracles (keys without an oracle are spec-pinned; see SparkEntry
  * scaladoc for the determinism contract). */
object StreamingGates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // streaming ingest gate: stream-static anti join vs the corpus hash
    // index + within-stream dedup (watermark-bounded state)
    "q_stream_ingest_dedup" -> (graft.streaming.EventStreams.streamIngestDedup _),
    // streaming (extension): windowed means via Structured Streaming in
    // Update mode, foreachBatch replace-by-key merged into parquet
    // snapshots (running-total semantics, no driver materialization) —
    // oracle-checked against the SAME SQL as the batch resample
    "q_stream_resample" -> (graft.streaming.EventStreams.streamResample _),
    // streaming exact dedup: events streamed twice (two unioned file
    // sources), dropDuplicatesWithinWatermark must recover the table
    "q_stream_dedup"   -> (graft.streaming.EventStreams.streamDedup _),
    // production sink path: Append mode -> parquet files + checkpoint,
    // read back; oracle = the watermark-closed window subset
    "q_stream_sink"    -> (graft.streaming.EventStreams.streamSink _),
    // streaming sessionization via native session_window (event-time gap
    // sessions), Append mode -> parquet sink, projected to the settled
    // region; oracled at full timestamp precision
    "q_stream_sessionize" -> (graft.streaming.EventStreams.streamSessionize _),
    // stream-STREAM inner interval join (click→purchase attribution);
    // drained inner join == batch interval join, which is the oracle
    "q_stream_stream_join" -> (graft.streaming.EventStreams.streamStreamJoin _),
    // streaming Misra-Gries via flatMapGroupsWithState (term-sharded
    // keyed state across micro-batches) + exact candidate recount —
    // equals the exact form, so it SHARES q_heavy_hitters' oracle
    "q_stream_heavy_hitters" -> ((s: SparkSession, d: String) =>
      graft.streaming.EventStreams.streamHeavyHitters(s, d)),
    // streaming z-score anomalies via bounded keyed state (trailing
    // cents ring per user) — equals the batch operator exactly, so it
    // SHARES q_anomaly_zscore's oracle
    "q_stream_anomaly" -> (graft.streaming.EventStreams.streamAnomaly _),
    // watermark late-data semantics: a days-late replay batch must be
    // dropped entirely and only watermark-closed windows finalize —
    // both pinned by a DuckDB oracle over the raw table
    "q_stream_late"    -> (graft.streaming.EventStreams.streamLateDrop _),
    // chained stateful stages (dedup -> windowed agg) in one query; the
    // doubled source must leave no trace — shares q_stream_sink's oracle
    "q_stream_dedup_agg" -> (graft.streaming.EventStreams.streamDedupAgg _),
    // foreachBatch incremental MERGE into versioned gold snapshots;
    // DECIMAL partials make N merges == the one-shot batch aggregate
    "q_stream_upsert"  -> (graft.streaming.EventStreams.streamUpsertGold _),
    // stream-STATIC broadcast enrichment join (stateless per-batch hash
    // probe, no state store); drained sink == batch join = the oracle
    "q_stream_static_join" -> (graft.streaming.EventStreams.streamStaticJoin _),
    // stream-stream LEFT OUTER interval join: unmatched clicks emit via
    // watermark state EVICTION; gate projects to the settled region
    // (click_ts <= max ts − 2 h) where match-or-evict is proven
    "q_stream_join_outer" ->
      (graft.streaming.EventStreams.streamStreamOuterJoin _),
  )

  /** The watermark-closed window subset of the batch resample — shared
    * verbatim by q_stream_sink (parquet sink path) and
    * q_stream_dedup_agg (chained dedup→agg): Append-mode emission must
    * land on this exact set whatever the upstream stages are. */
  private val ClosedWindowsOracle: String =
    """WITH cutoff AS (
      |  SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM events),
      |agg AS (
      |  SELECT user_id, time_bucket(INTERVAL '30 minutes', ts) AS bucket,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
      |    count(*) AS n, max(value) AS max_value
      |  FROM events GROUP BY 1, 2)
      |SELECT user_id, bucket, avg_value, n, max_value
      |FROM agg, cutoff
      |WHERE bucket + INTERVAL 30 MINUTE <= wm""".stripMargin

  val oracles: Map[String, String] = Map(
    // the streaming run saw on-time traffic (day ≥ min+3) first, then a
    // days-late replay of the first three days: the replay must vanish
    // (below the watermark) and append mode finalizes exactly the
    // on-time windows whose end ≤ max ts − 10 min
    "q_stream_late" ->
      """WITH on_time AS (
        |  SELECT * FROM events
        |  WHERE CAST(ts AS DATE) >= (SELECT min(CAST(ts AS DATE)) + 3 FROM events)),
        |wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM on_time),
        |agg AS (
        |  SELECT user_id, time_bucket(INTERVAL '30 minutes', ts) AS bucket,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
        |    count(*) AS n, max(value) AS max_value
        |  FROM on_time GROUP BY 1, 2)
        |SELECT user_id, bucket, avg_value, n, max_value
        |FROM agg, wm WHERE bucket + INTERVAL 30 MINUTE <= wm.w""".stripMargin,

    // streaming result must equal the batch resample — same oracle
    "q_stream_resample" ->
      """SELECT user_id, time_bucket(INTERVAL '30 minutes', ts) AS bucket,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
        |  count(*) AS n, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // the streaming dedup saw every row twice; dropping duplicates by
    // event_id must recover exactly the base table
    "q_stream_dedup" ->
      "SELECT event_id, ts, user_id, event_type, value FROM events",

    // the parquet sink holds exactly the windows the final watermark
    // (max event time - 10 min) closed: Append emits a window when
    // watermark passes its END. Window ends sit on the 30-min grid and
    // the cutoff carries the max ts's sub-second offset, so < vs <= at
    // the boundary cannot matter
    // gold after any batching == the one-shot aggregate (DECIMAL partials)
    "q_stream_upsert" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY 1""".stripMargin,

    "q_stream_sink" -> ClosedWindowsOracle,
    // chained dedup→agg must land on the SAME closed-window subset: the
    // doubled stream leaves no trace in the hash
    "q_stream_dedup_agg" -> ClosedWindowsOracle,

    // session_window semantics: new session when ts > prev + gap at FULL
    // timestamp precision — an event landing exactly on the gap boundary
    // still merges (verified by spec). The batch q_sessionize oracle
    // instead floors epochs to whole seconds (reference-lineage
    // semantics); both use the strict > split. The gate's Append-mode
    // parquet sink emits only watermark-closed sessions, projected to the
    // settled region (s_end <= max ts - 1 h, exact integer micros) where
    // emission is engine-boundary-proof; closed sessions are a prefix of
    // each user's sequence, so the full cumulative numbering filtered by
    // the same bound matches the gate's renumbering of the projected rows.
    "q_stream_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR ts > prev_ts + INTERVAL '30 minutes'
        |    THEN 1 ELSE 0 END AS new_sess FROM o),
        |s AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM f),
        |sess AS (
        |  SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end,
        |    count(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |  FROM s GROUP BY 1, 2),
        |mx AS (SELECT max(epoch_us(ts)) - 3600000000 AS bound_us FROM events)
        |SELECT user_id, session_id, s_start, s_end, n_events, value_sum
        |FROM sess, mx WHERE epoch_us(s_end) <= mx.bound_us""".stripMargin,

    // drained inner stream-stream join == the batch interval join; the
    // join condition runs on epoch MICROS (Spark's ts is µs-truncated
    // from the nanos file, epoch_us() floors the same way), and the lag
    // floors both sides to whole seconds (floor composes: ns→µs→s)
    "q_stream_stream_join" ->
      """WITH c AS (
        |  SELECT event_id AS click_id, epoch_us(ts) AS c_us, user_id
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS purchase_id, epoch_us(ts) AS p_us, user_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, p.purchase_id,
        |  p.p_us // 1000000 - c.c_us // 1000000 AS lag_secs
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 1800000000""".stripMargin,

    // the LEFT OUTER form inside the settled region (integer-micros
    // bound) — unmatched clicks carry NULL purchase_id / lag_secs,
    // exactly the rows Spark emits via watermark state eviction
    "q_stream_join_outer" ->
      """WITH mx AS (
        |  SELECT max(epoch_us(ts)) - 7200000000 AS bound_us FROM events),
        |c AS (
        |  SELECT event_id AS click_id, ts AS click_ts, epoch_us(ts) AS c_us,
        |    user_id
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT event_id AS purchase_id, epoch_us(ts) AS p_us, user_id
        |  FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.click_id, c.click_ts, p.purchase_id,
        |  p.p_us // 1000000 - c.c_us // 1000000 AS lag_secs
        |FROM c LEFT JOIN p ON c.user_id = p.user_id
        |  AND p.p_us >= c.c_us AND p.p_us <= c.c_us + 1800000000
        |CROSS JOIN mx
        |WHERE c.c_us <= mx.bound_us""".stripMargin,

    // the streaming MG + exact-recount path provably equals the exact
    // form (see EventStreams.streamHeavyHitters) — third share of the
    // same oracle
    "q_stream_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        |SELECT term, cnt, total FROM c, tot WHERE cnt * 30 >= total""".stripMargin,

    // kept content after the stream-static anti join (corpus re-arrivals
    // dropped) and within-stream hash dedup (rn = 1 picks one survivor
    // per hash — which one is order-dependent in the stream, so the
    // compared columns are all survivor-INdependent content aggregates)
    "q_stream_ingest_dedup" ->
      """WITH ex AS (SELECT text FROM documents WHERE doc_id % 10 < 8),
        |inc AS (
        |  SELECT doc_id, text, lang, n_chars FROM documents WHERE doc_id % 10 >= 8
        |  UNION ALL SELECT doc_id + 100000 AS doc_id, text, lang, n_chars FROM documents
        |    WHERE doc_id % 10 < 8 AND doc_id % 100 = 1
        |  UNION ALL SELECT doc_id + 200000 AS doc_id, text, lang, n_chars FROM documents
        |    WHERE doc_id % 10 >= 8 AND doc_id % 100 = 98),
        |keep AS (
        |  SELECT lang, n_chars, text,
        |    row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM inc WHERE sha256(text) NOT IN (SELECT sha256(text) FROM ex))
        |SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        |  min(md5(text)) AS min_text_md5, max(md5(text)) AS max_text_md5
        |FROM keep WHERE rn = 1 GROUP BY 1""".stripMargin,

    // the drained streaming anomaly stream must equal the batch
    // trailing-window operator — literally the same oracle SQL
    "q_stream_anomaly" -> WindowGates.oracles("q_anomaly_zscore"),

    // stream-static enrichment must equal the plain batch join: every
    // event row enriched with its type's stats, no loss, no dup
    "q_stream_static_join" ->
      """WITH dim AS (
        |  SELECT event_type, count(*) AS type_n,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |      / count(*) AS type_mean
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, e.value, dim.type_n, dim.type_mean,
        |  e.value - dim.type_mean AS dev_from_mean
        |FROM events e JOIN dim USING (event_type)""".stripMargin,
  )
}
