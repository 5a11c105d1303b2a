package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast
import OracleCtes._

/** ETL spine, corpus pipeline composition and sequence packing — gate rows: `queries` entries + their DuckDB
  * oracles (keys without an oracle are spec-pinned; see SparkEntry
  * scaladoc for the determinism contract). */
object EtlGates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the ETL spine, deterministic variant (flagship = entry())
    "q_etl_wide"       -> (SensorEtl.wide _),
    // composed flagship: quality gate -> exact dedup -> near-dup dedup
    "q_corpus_clean"   -> (graft.etl.CorpusPipeline.corpusClean _),
    // quality-tiered epoch mixing (upsampling weights before packing)
    "q_corpus_mix"     -> (graft.etl.CorpusPipeline.mix _),
    // corpus-composition report (docs/tokens per lang × quality tier)
    "q_corpus_stats"   -> (graft.etl.CorpusPipeline.corpusStats _),
    // same report with ROLLUP subtotals + grand total in one shuffle
    "q_corpus_stats_rollup" -> (graft.etl.CorpusPipeline.corpusStatsRollup _),
    // composed tail: clean -> pack (ragged doc_ids through the prefix sum)
    "q_corpus_pack"    -> (graft.etl.CorpusPipeline.corpusPack _),
    // per-shard provenance manifest (lineage record next to each shard)
    "q_shard_manifest" -> (graft.etl.CorpusPipeline.shardManifest _),
    // snapshot-to-snapshot diff report (added/removed/changed/unchanged)
    "q_snapshot_diff"  -> (graft.etl.CorpusPipeline.snapshotDiff _),
    // docs ↔ embeddings referential-integrity audit (linked / doc_only /
    // vec_only with id ranges — the pre-training dangling-reference gate)
    "q_integrity"      -> (graft.etl.CorpusPipeline.integrityAudit _),
    // right-to-be-forgotten propagation: anti-join the deletion list
    // through docs + aligned embeddings, stage the purged tables, audit
    // before/requested/after counts and a re-read leak count (must be 0)
    "q_forget_audit"   -> ((s: SparkSession, d: String) =>
      graft.etl.CorpusPipeline.forgetAudit(s, d)),
    // α=0.5 temperature-resampled language mixing weights + keep rates
    "q_lang_sample"    -> (graft.etl.CorpusPipeline.langSample _),
    // sequence packing: token-budget shards (two-level distributed
    // prefix sum) + greedy per-shard packing (bounded sequential kernel)
    "q_pack_shards"    -> (graft.etl.Packing.shards _),
    "q_pack_greedy"    -> (graft.etl.Packing.greedy _),
    // per-language pack-utilization audit (chained through the same
    // recursive greedy CTE as q_pack_greedy)
    "q_pack_efficiency" -> ((s: SparkSession, d: String) =>
      graft.etl.Packing.packEfficiency(s, d)),
    // length-bucketed inference batching (chunk-local batch ids — every
    // window partition bounded by chunkDocs)
    "q_length_batches" -> ((s: SparkSession, d: String) =>
      graft.etl.Packing.lengthBatches(s, d)),
    // canonical-URL dedup: fragment/www./utm_* normalization (scalar
    // regex chain, codegen) + keep lowest doc_id per canonical URL
    "q_url_canonical"  -> (graft.etl.CorpusPipeline.urlCanonical _),
    // per-registrable-domain document caps (anti-domain-dominance):
    // top-15 by n_chars DESC, doc_id tiebreak; per-domain kept/dropped
    "q_domain_cap"     -> ((s: SparkSession, d: String) =>
      graft.etl.CorpusPipeline.domainCap(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q_etl_wide" ->
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
        |codes(code_id, code_name) AS (
        |  VALUES (0, 'Normal'), (1, 'GasHighAlarm'), (2, 'GasLowAlarm'), (3, 'GasAlarm'),
        |         (4, 'Maintenance'), (5, 'Calibration'), (6, 'Offline'))
        |SELECT t.code_id, f.user_id, f.day, f.click, f."error", f.purchase, f."view",
        |  c.code_name
        |FROM features f JOIN target t USING (user_id, day) JOIN codes c ON t.code_id = c.code_id""".stripMargin,

    // composed training-data recipe: quality gate -> exact dedup ->
    // near-dup components, all over the SAME base the Spark pipeline uses
    "q_corpus_clean" ->
      s"""WITH RECURSIVE $CorpusCleanCtes
        |SELECT e.doc_id, e.lang, e.n_chars, e.n_tokens
        |FROM exdedup e JOIN keepers k ON e.doc_id = k.id""".stripMargin,

    // the composed recipe's tail: token-budget shards over the cleaned
    // corpus (non-dense surviving doc_ids drive the chunked prefix sum)
    "q_corpus_pack" ->
      s"""WITH RECURSIVE $CorpusCleanCtes,
        |$PackCtes
        |SELECT doc_id, lang, n_tokens, shard FROM pack""".stripMargin,

    // the manifest must agree with the pack assignment row for row, so it
    // extends the SAME pack CTE block
    "q_shard_manifest" ->
      s"""WITH RECURSIVE $CorpusCleanCtes,
        |$PackCtes
        |SELECT p.lang, p.shard, d.source, count(*) AS n_docs,
        |  CAST(sum(p.n_tokens) AS BIGINT) AS tokens
        |FROM pack p JOIN documents d USING (doc_id)
        |GROUP BY 1, 2, 3""".stripMargin,

    // v2 synthesized with the same arithmetic as the operator; the diff
    // classes are exact keyed-join + content-hash logic
    "q_snapshot_diff" ->
      """WITH v1 AS (SELECT doc_id, text, source FROM documents),
        |v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text,
        |    source
        |  FROM v1 WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT -doc_id - 1, 'new ' || text, source FROM v1 WHERE doc_id % 7 = 0),
        |j AS (
        |  SELECT coalesce(a.source, b.source) AS source,
        |    CASE WHEN b.doc_id IS NULL THEN 'removed'
        |         WHEN a.doc_id IS NULL THEN 'added'
        |         WHEN md5(a.text) <> md5(b.text) THEN 'changed'
        |         ELSE 'unchanged' END AS change_type
        |  FROM v1 a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id)
        |SELECT source, change_type, count(*) AS n FROM j GROUP BY 1, 2""".stripMargin,

    // plain keyed full-outer + status CASE; the vec side carries the
    // same synthesized drift as the operator (every-9th backlog +
    // offset orphans) so all three statuses are exercised
    "q_integrity" ->
      """WITH v AS (
        |  SELECT vec_id FROM embeddings WHERE vec_id % 9 <> 0
        |  UNION ALL
        |  SELECT vec_id + 100000 FROM embeddings WHERE vec_id % 50 = 0),
        |j AS (
        |  SELECT coalesce(d.doc_id, v.vec_id) AS id,
        |    CASE WHEN d.doc_id IS NOT NULL AND v.vec_id IS NOT NULL THEN 'linked'
        |         WHEN d.doc_id IS NOT NULL THEN 'doc_only'
        |         ELSE 'vec_only' END AS status
        |  FROM documents d FULL OUTER JOIN v ON d.doc_id = v.vec_id)
        |SELECT status, count(*) AS n, min(id) AS min_id, max(id) AS max_id
        |FROM j GROUP BY 1""".stripMargin,

    // deletion-propagation audit: one anti-join per surface; counts are
    // integers, n_leaked is 0 by the anti-join semantics the gate
    // re-verifies from the staged files
    "q_forget_audit" ->
      """WITH del AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0)
        |SELECT 'documents' AS tbl,
        |  (SELECT count(*) FROM documents) AS n_before,
        |  (SELECT count(*) FROM documents WHERE doc_id IN (SELECT doc_id FROM del)) AS n_requested,
        |  (SELECT count(*) FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM del)) AS n_after,
        |  CAST(0 AS BIGINT) AS n_leaked
        |UNION ALL
        |SELECT 'embeddings' AS tbl,
        |  (SELECT count(*) FROM embeddings) AS n_before,
        |  (SELECT count(*) FROM embeddings WHERE vec_id IN (SELECT doc_id FROM del)) AS n_requested,
        |  (SELECT count(*) FROM embeddings WHERE vec_id NOT IN (SELECT doc_id FROM del)) AS n_after,
        |  CAST(0 AS BIGINT) AS n_leaked""".stripMargin,

    // share is one exact division of exact integer sums; weight is IEEE
    // sqrt (correctly rounded on both engines) — both raw. target_share
    // and keep_rate divide by sum(weight), a |langs|-double sum with
    // engine-unspecified order, so they carry round(·, 6) keys — same
    // accepted risk class as the round(cos, 6) rank keys
    "q_lang_sample" ->
      """WITH t AS (
        |  SELECT lang,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |per AS (
        |  SELECT lang, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        |  FROM t GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot_tokens FROM per),
        |sh AS (
        |  SELECT per.lang, per.n_docs, per.n_tokens,
        |    CAST(per.n_tokens AS DOUBLE) / tot.tot_tokens AS share,
        |    sqrt(CAST(per.n_tokens AS DOUBLE) / tot.tot_tokens) AS weight
        |  FROM per CROSS JOIN tot),
        |sw AS (SELECT sum(weight) AS sum_w FROM sh)
        |SELECT lang, n_docs, n_tokens, share, weight,
        |  round(weight / sum_w, 6) AS target_share,
        |  round(LEAST(1.0, (weight / sum_w) / share), 6) AS keep_rate
        |FROM sh CROSS JOIN sw""".stripMargin,

    // epoch fan-out via generate_series; tier thresholds mirror the
    // Spark-side CASE exactly (same token/alpha expressions as textStats)
    "q_corpus_mix" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS alpha_ratio
        |  FROM documents),
        |tiers AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CASE WHEN alpha_ratio >= 0.7 AND n_tokens >= 20 THEN 'hi'
        |         WHEN alpha_ratio >= 0.5 AND n_tokens >= 5 THEN 'mid'
        |         ELSE 'low' END AS tier
        |  FROM t),
        |w AS (
        |  SELECT *, CASE tier WHEN 'hi' THEN 2 WHEN 'mid' THEN 1 ELSE 0 END AS epochs
        |  FROM tiers)
        |SELECT doc_id, lang, tier, n_tokens,
        |  CAST(unnest(generate_series(1, epochs)) AS INTEGER) AS epoch
        |FROM w WHERE epochs >= 1""".stripMargin,

    // same tier CASE as q_corpus_mix; sums/min/max BIGINT-cast, mean
    // derived from the exact integer aggregates
    "q_corpus_stats" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS alpha_ratio
        |  FROM documents),
        |tiers AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CASE WHEN alpha_ratio >= 0.7 AND n_tokens >= 20 THEN 'hi'
        |         WHEN alpha_ratio >= 0.5 AND n_tokens >= 5 THEN 'mid'
        |         ELSE 'low' END AS tier
        |  FROM t)
        |SELECT lang, tier, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens,
        |  CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens
        |FROM tiers GROUP BY 1, 2""".stripMargin,

    // ROLLUP grouping sets match Spark's (lang, tier) → (lang) → ()
    // levels; NULL keys mark subtotal rows identically on both engines
    "q_corpus_stats_rollup" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS alpha_ratio
        |  FROM documents),
        |tiers AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CASE WHEN alpha_ratio >= 0.7 AND n_tokens >= 20 THEN 'hi'
        |         WHEN alpha_ratio >= 0.5 AND n_tokens >= 5 THEN 'mid'
        |         ELSE 'low' END AS tier
        |  FROM t)
        |SELECT lang, tier, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  min(n_tokens) AS min_tokens, max(n_tokens) AS max_tokens
        |FROM tiers GROUP BY ROLLUP (lang, tier)""".stripMargin,

    // running token total (HUGEINT in DuckDB) and its derived shard are
    // cast to BIGINT to match Spark's long columns; `//`/div is integer
    // division on both engines
    "q_pack_shards" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS shard
        |FROM c""".stripMargin,

    // the greedy recurrence (new pack when the budget would overflow) as a
    // recursive CTE advancing every (lang, shard) group in lockstep by
    // per-group row_number; seed row = each group's first doc
    "q_pack_greedy" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t),
        |sd AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST((cum - n_tokens) // 2048 AS BIGINT) AS shard,
        |    CAST(row_number() OVER (PARTITION BY lang, (cum - n_tokens) // 2048
        |      ORDER BY doc_id) AS BIGINT) AS rn
        |  FROM c),
        |st AS (
        |  SELECT doc_id, lang, shard, rn, n_tokens, n_tokens AS acc,
        |    CAST(0 AS BIGINT) AS pack
        |  FROM sd WHERE rn = 1
        |  UNION ALL
        |  SELECT sd.doc_id, sd.lang, sd.shard, sd.rn, sd.n_tokens,
        |    CASE WHEN st.acc + sd.n_tokens <= 2048 THEN st.acc + sd.n_tokens
        |         ELSE sd.n_tokens END,
        |    CASE WHEN st.acc + sd.n_tokens <= 2048 THEN st.pack
        |         ELSE st.pack + 1 END
        |  FROM st JOIN sd ON sd.lang = st.lang AND sd.shard = st.shard
        |    AND sd.rn = st.rn + 1)
        |SELECT doc_id, lang, shard, pack, n_tokens FROM st""".stripMargin,

    // the same recursive greedy chain, aggregated to the utilization
    // report — exact integer sums, one final divide per row
    "q_pack_efficiency" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t),
        |sd AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST((cum - n_tokens) // 2048 AS BIGINT) AS shard,
        |    CAST(row_number() OVER (PARTITION BY lang, (cum - n_tokens) // 2048
        |      ORDER BY doc_id) AS BIGINT) AS rn
        |  FROM c),
        |st AS (
        |  SELECT doc_id, lang, shard, rn, n_tokens, n_tokens AS acc,
        |    CAST(0 AS BIGINT) AS pack
        |  FROM sd WHERE rn = 1
        |  UNION ALL
        |  SELECT sd.doc_id, sd.lang, sd.shard, sd.rn, sd.n_tokens,
        |    CASE WHEN st.acc + sd.n_tokens <= 2048 THEN st.acc + sd.n_tokens
        |         ELSE sd.n_tokens END,
        |    CASE WHEN st.acc + sd.n_tokens <= 2048 THEN st.pack
        |         ELSE st.pack + 1 END
        |  FROM st JOIN sd ON sd.lang = st.lang AND sd.shard = st.shard
        |    AND sd.rn = st.rn + 1),
        |pk AS (
        |  SELECT lang, shard, pack, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
        |    count(*) AS n_docs
        |  FROM st GROUP BY 1, 2, 3)
        |SELECT lang, count(*) AS n_packs,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(pack_tokens) AS DOUBLE) / (count(*) * 2048), 6)
        |    AS mean_util,
        |  CAST(sum(CASE WHEN pack_tokens > 2048 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overflow
        |FROM pk GROUP BY 1""".stripMargin,

    "q_length_batches" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents)
        |SELECT doc_id, lang, n_tokens,
        |  n_tokens // 64 AS len_bucket, doc_id // 1024 AS chunk,
        |  (row_number() OVER (PARTITION BY n_tokens // 64, doc_id // 1024
        |    ORDER BY doc_id) - 1) // 16 AS batch_idx
        |FROM t""".stripMargin,

    // the synthesized raw_url and every canonicalization step mirror the
    // Spark chain 1:1; none of the regexes use backreferences and each
    // pattern matches at most once per URL, so Java-regex
    // (replace-all) and RE2 (replace-first) agree byte-for-byte
    "q_url_canonical" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 5 = 0 THEN 'HTTPS://' ELSE 'https://' END)
        |    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
        |    || source || '-Example'
        |    || (['.com','.org','.net','.dev'])[CAST(doc_id % 4 AS INT) + 1]
        |    || '/A/b' || CAST(doc_id % 7 AS VARCHAR)
        |    || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 11 AS VARCHAR)
        |             WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 11 AS VARCHAR) || '&utm_campaign=x'
        |             ELSE '' END)
        |    || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS raw_url
        |  FROM documents),
        |c1 AS (SELECT doc_id, raw_url,
        |    regexp_replace(raw_url, '#[^#]*$', '') AS u1 FROM raw),
        |c2 AS (SELECT doc_id, raw_url, u1,
        |    lower(regexp_extract(u1, '^[A-Za-z]+://[^/?#]*', 0)) AS pre0 FROM c1),
        |c3 AS (SELECT doc_id, raw_url,
        |    replace(pre0, '://www.', '://') AS pre,
        |    substr(u1, CAST(length(pre0) + 1 AS INT)) AS rest FROM c2),
        |c4 AS (SELECT doc_id, raw_url, pre,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(rest,
        |      '&utm_[a-z]+=[^&]*', '', 'g'), '\?utm_[a-z]+=[^&]*&', '?'),
        |      '\?utm_[a-z]+=[^&]*$', ''),
        |      '/\?', '?'), '/$', '') AS rest2 FROM c3),
        |canon AS (SELECT doc_id, raw_url, pre || rest2 AS canon_url FROM c4)
        |SELECT doc_id, raw_url, canon_url,
        |  (row_number() OVER (PARTITION BY canon_url ORDER BY doc_id)) = 1 AS keep
        |FROM canon""".stripMargin,

    "q_domain_cap" ->
      """WITH raw AS (
        |  SELECT doc_id, n_chars,
        |    (CASE WHEN doc_id % 5 = 0 THEN 'HTTPS://' ELSE 'https://' END)
        |    || (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END)
        |    || source || '-Example'
        |    || (['.com','.org','.net','.dev'])[CAST(doc_id % 4 AS INT) + 1]
        |    || '/A/b' || CAST(doc_id % 7 AS VARCHAR)
        |    || (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END)
        |    || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 11 AS VARCHAR)
        |             WHEN doc_id % 4 = 1 THEN '?id=' || CAST(doc_id % 11 AS VARCHAR) || '&utm_campaign=x'
        |             ELSE '' END)
        |    || (CASE WHEN doc_id % 6 = 0 THEN '#sec' ELSE '' END) AS raw_url
        |  FROM documents),
        |c2 AS (SELECT doc_id, n_chars,
        |    regexp_replace(raw_url, '#[^#]*$', '') AS u1 FROM raw),
        |c3 AS (SELECT doc_id, n_chars, u1,
        |    lower(regexp_extract(u1, '^[A-Za-z]+://[^/?#]*', 0)) AS pre0 FROM c2),
        |canon AS (SELECT doc_id, n_chars,
        |    replace(pre0, '://www.', '://')
        |      || regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |           substr(u1, CAST(length(pre0) + 1 AS INT)),
        |           '&utm_[a-z]+=[^&]*', '', 'g'), '\?utm_[a-z]+=[^&]*&', '?'),
        |           '\?utm_[a-z]+=[^&]*$', ''),
        |           '/\?', '?'), '/$', '') AS canon_url FROM c3),
        |h AS (SELECT doc_id, n_chars,
        |    regexp_extract(regexp_extract(canon_url, '^https?://([^/?#]*)', 1),
        |      '[^.]+\.[^.]+$', 0) AS domain FROM canon),
        |r AS (SELECT domain, n_chars, doc_id,
        |    row_number() OVER (PARTITION BY domain
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn FROM h)
        |SELECT domain, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN rn <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN rn <= 15 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars,
        |  min(CASE WHEN rn <= 15 THEN n_chars END) AS min_kept_chars
        |FROM r GROUP BY 1""".stripMargin,
  )
}
