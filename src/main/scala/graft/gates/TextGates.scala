package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast
import OracleCtes._

/** Text-analysis family: stats, language id, LM scoring, quality
  * pruning, heavy hitters, BM25, TF-IDF — gate rows: `queries` entries + their DuckDB
  * oracles (keys without an oracle are spec-pinned; see SparkEntry
  * scaladoc for the determinism contract). */
object TextGates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LLM-pipeline: text analysis
    "q_text_stats"     -> (TextAnalytics.textStats _),
    "q_lang_id"        -> (TextAnalytics.langId _),
    "q_token_count"    -> (TextAnalytics.tokenCount _),
    // Heaps'-law vocab-growth curve via the first-occurrence trick
    "q_vocab_growth"   -> ((s: SparkSession, d: String) => TextAnalytics.vocabGrowth(s, d)),
    // overlapping token-window chunking (doc -> training/embedding rows)
    "q_chunk"          -> (TextAnalytics.chunk _),
    "q_fingerprint"    -> (TextAnalytics.fingerprint _),
    // Gopher-style repetition quality filters (top-bigram share +
    // duplicate-trigram fraction)
    "q_repetition"     -> ((s: SparkSession, d: String) => TextAnalytics.repetitionStats(s, d)),
    // whitespace/case normalization + email/digit-run redaction over a
    // deterministically synthesized noisy input
    "q_normalize_redact" -> (TextAnalytics.normalizeRedact _),
    // corpus-wide top-k n-gram vocabulary report
    "q_topk_ngrams"    -> ((s: SparkSession, d: String) => TextAnalytics.topkNgrams(s, d)),
    // corpus-unigram LM quality proxy (CCNet-style perplexity filter)
    "q_unigram_logprob" -> (TextAnalytics.unigramLogProb _),
    // bigram conditional-LM score (word-order-sensitive quality axis)
    "q_bigram_logprob" -> (TextAnalytics.bigramLogProb _),
    // percentile prune on the LM score (keep top 90%)
    "q_quality_prune"  -> ((s: SparkSession, d: String) => TextAnalytics.qualityPrune(s, d)),
    // 100 TB twin: threshold from approx_percentile broadcast as a scalar
    // filter — no rank window anywhere. Re-gated at its verdict point
    // (r14): exact n_docs + threshold-rank/keep-frac booleans,
    // oracle-exact; the raw keep-set form stays pinned by
    // QualityPruneSketchSpec (>=99% agreement with the exact form)
    "q_quality_prune_sketch" -> ((s: SparkSession, d: String) => TextAnalytics.qualityPruneSketchVerdict(s, d)),
    // first-iteration BPE merge candidates (adjacent char-pair counts)
    "q_bpe_merges"     -> ((s: SparkSession, d: String) => TextAnalytics.bpeMergeCandidates(s, d)),
    // distribution-shift report between two corpus halves (integer-exact
    // cross-multiplied ranking — no float near the top-N cut)
    "q_corpus_drift"   -> ((s: SparkSession, d: String) => TextAnalytics.corpusDrift(s, d)),
    // weighted quality-signal ensemble histogram (fixed-width buckets,
    // no global ordered window)
    "q_quality_ensemble" -> (TextAnalytics.qualityEnsemble _),
    // exact φ=1/30 heavy hitters (integer-threshold cut, no float share)
    "q_heavy_hitters"  -> ((s: SparkSession, d: String) => TextAnalytics.heavyHitters(s, d)),
    // Misra-Gries candidates + exact recount: provably EQUAL to the
    // exact form, so it shares the same oracle — the vocabulary never
    // shuffles, only ≤ k candidates per partition do
    "q_heavy_hitters_sketch" -> ((s: SparkSession, d: String) => TextAnalytics.heavyHittersSketch(s, d)),
    // Okapi BM25 against a fixed query term set (fixed-order term sum)
    "q_bm25"           -> ((s: SparkSession, d: String) => TextAnalytics.bm25(s, d)),
    "q_tfidf"          -> ((s: SparkSession, d: String) => TextAnalytics.tfidfTopTerms(s, d)),
    // per-doc fraction of distinct shingles first seen in this doc
    // (crawl-order novelty attribution; linear inverted-index pass)
    "q_ngram_novelty"  -> ((s: SparkSession, d: String) => TextAnalytics.ngramNovelty(s, d)),
    // temperature-scaled per-language sampling schedule (p^alpha,
    // DECIMAL-exact normalizer)
    "q_mix_temperature" -> ((s: SparkSession, d: String) => TextAnalytics.mixTemperature(s, d)),
    // CountMin grid probed at the exact heavy hitters: exact top-k
    // counts + the sketch-contract verdicts (est >= exact, overcount
    // <= eps*N), oracle-pinned to TRUE — the estimate VALUE stays
    // JVM-side (Murmur3 cells), its contract rides the hash check
    "q_countmin"       -> ((s: SparkSession, d: String) => TextAnalytics.countMinChecked(s, d)),
    // tokenize-to-ids: top-64 frequency vocab (TakeOrdered cut, 64-row
    // id window) broadcast against the corpus; docs become position-
    // ordered id arrays with UNK=0 — the loader handoff format. The
    // gate serializes the id array to a ','-joined string: the driver's
    // hash compare row-sorts via pandas, which cannot hash an
    // array<int> cell (r9's one red row), so array columns leave the
    // gate as deterministic scalars (same discipline as the other
    // array-valued gates). The operator itself keeps the typed array.
    "q_tokenize_ids"   -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.functions._
      TextAnalytics.tokenizeIds(s, d).select(col("doc_id"),
        col("n_tokens"), col("n_oov"),
        array_join(transform(col("ids"), x => x.cast("string")), ",")
          .as("ids_csv"))
    }),
    // PMI collocations (integer minCount cut, six-ln fixed-order tree)
    "q_collocations"   -> ((s: SparkSession, d: String) =>
      TextAnalytics.collocationsPmi(s, d)),
  )

  val oracles: Map[String, String] = Map(
    // same per-doc signal formulas as q_text_stats; the score chain is
    // one fixed expression tree so the bucket cut can't flip
    "q_quality_ensemble" ->
      """WITH perdoc AS (
        |  SELECT doc_id,
        |    0.25 * least(1.0, CAST(length(text) AS DOUBLE) / 1000.0)
        |    + 0.4 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |        / length(text))
        |    + 0.35 * (CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
        |        / len(string_split_regex(lower(trim(text)), '\s+'))) AS score
        |  FROM documents),
        |b AS (
        |  SELECT least(9, CAST(floor(score * 10) AS BIGINT)) AS bucket,
        |    round(score, 6) AS r FROM perdoc)
        |SELECT bucket, count(*) AS n, min(r) AS min_score, max(r) AS max_score,
        |  CAST(SUM(CAST(r AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_score
        |FROM b GROUP BY 1""".stripMargin,

    // same whitespace tokenizer as every text oracle; BIGINT casts keep
    // DuckDB's HUGEINT sums off the comparison path
    "q_corpus_drift" ->
      """WITH toks AS (
        |  SELECT doc_id % 2 = 0 AS half_a,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents),
        |counts AS (
        |  SELECT token,
        |    CAST(sum(CASE WHEN half_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |    CAST(sum(CASE WHEN NOT half_a THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
        |  FROM toks WHERE len(token) > 0 GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
        |    CAST(sum(cnt_b) AS BIGINT) AS tot_b FROM counts)
        |SELECT token, cnt_a, cnt_b,
        |  CAST(cnt_a AS DOUBLE) / tot_a AS p_a,
        |  CAST(cnt_b AS DOUBLE) / tot_b AS p_b,
        |  abs(cnt_a * tot_b - cnt_b * tot_a) AS score
        |FROM counts, tot
        |ORDER BY score DESC, token
        |LIMIT 20""".stripMargin,

    "q_tfidf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    round(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 6) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, rank, term, tf, df, score FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INTEGER) AS rank
        |  FROM scored) WHERE rank <= 3""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id, len_chars, n_tokens, alpha_ratio, stop_ratio, mean_token_len,
        |  (n_tokens >= 5 AND n_tokens <= 100000 AND alpha_ratio >= 0.5
        |    AND stop_ratio >= 0.01) AS quality_ok
        |FROM (
        |  SELECT doc_id,
        |    length(text) AS len_chars,
        |    len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
        |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS alpha_ratio,
        |    CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS DOUBLE)
        |      / len(string_split_regex(lower(trim(text)), '\s+')) AS stop_ratio,
        |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |      / len(string_split_regex(lower(trim(text)), '\s+')) AS mean_token_len
        |  FROM documents) t""".stripMargin,

    "q_lang_id" ->
      """SELECT doc_id, lang, en_hits, de_hits, es_hits, fr_hits,
        |  CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
        |       WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
        |       WHEN es_hits >= fr_hits THEN 'es'
        |       ELSE 'fr' END AS pred_lang,
        |  (CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
        |       WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
        |       WHEN es_hits >= fr_hits THEN 'es'
        |       ELSE 'fr' END) = lang AS is_match
        |FROM (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> list_contains(['the','a','of','and','to','in','is','it'], t))) AS en_hits,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> list_contains(['der','die','das','und','ist','ein','nicht'], t))) AS de_hits,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> list_contains(['el','la','de','que','y','los','es'], t))) AS es_hits,
        |    len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |      t -> list_contains(['le','la','les','et','des','un','est'], t))) AS fr_hits
        |  FROM documents) t""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens
        |FROM documents""".stripMargin,

    // exact distinct-vocab per ingestion decile via min-first-occurrence
    "q_vocab_growth" ->
      """WITH m AS (SELECT max(doc_id) AS mx FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
        |  FROM documents),
        |firsts AS (SELECT token, min(doc_id) AS first_doc FROM tok GROUP BY 1),
        |perdoc AS (
        |  SELECT doc_id, len(string_split_regex(lower(trim(text)), '\s+')) AS n_tok
        |  FROM documents),
        |thr AS (SELECT k, ((mx + 1) * k) // 10 AS c FROM range(1, 11) r(k), m),
        |dt AS (
        |  SELECT t.k, count(*) AS n_docs, CAST(SUM(p.n_tok) AS BIGINT) AS n_tokens
        |  FROM thr t JOIN perdoc p ON p.doc_id < t.c GROUP BY t.k),
        |vc AS (
        |  SELECT t.k, count(*) AS vocab FROM thr t
        |  JOIN firsts f ON f.first_doc < t.c GROUP BY t.k)
        |SELECT CAST(dt.k AS INTEGER) AS decile, n_docs, n_tokens, vocab
        |FROM dt JOIN vc USING (k)""".stripMargin,

    // chunk 64 / overlap 16 / stride 48; DuckDB list slices are
    // inclusive-bounds and clamp at the list end like Spark's slice()
    "q_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |n AS (
        |  SELECT doc_id, t, len(t) AS nt,
        |    GREATEST(1, (len(t) - 16 + 47) // 48) AS n_chunks
        |  FROM toks WHERE len(t) >= 1),
        |c AS (
        |  SELECT doc_id, t, nt,
        |    unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
        |  FROM n)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(LEAST(64, nt - chunk_idx * 48) AS BIGINT) AS n_chunk_tokens,
        |  array_to_string(t[chunk_idx * 48 + 1 : chunk_idx * 48 + 64], ' ') AS chunk_text
        |FROM c""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(
        |    string_split_regex(lower(trim(text)), '\s+'))), ' ')) AS fp,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split_regex(lower(trim(text)), '\s+'),
        |        t -> list_reduce(
        |          list_prepend(CAST(7 AS BIGINT),
        |            list_transform(string_split(t, ''), c -> CAST(unicode(c) AS BIGINT))),
        |          (a, b) -> (a * 131 + b) % 1000000007))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp_roll
        |FROM documents""".stripMargin,

    // counts are BIGINT-cast (DuckDB HUGEINT sums degrade to float64 in
    // the driver's pandas hash); ratio math is identical double division
    "q_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(t) - 1), i -> array_to_string(t[i:i+1], ' '))) AS sh
        |  FROM toks WHERE len(t) >= 3),
        |tg AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(t) - 2), i -> array_to_string(t[i:i+2], ' '))) AS sh
        |  FROM toks WHERE len(t) >= 3),
        |bgc AS (SELECT doc_id, sh, count(*) AS c FROM bg GROUP BY 1, 2),
        |bstat AS (
        |  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n,
        |    CAST(sum(c) AS BIGINT) AS n_bigrams
        |  FROM bgc GROUP BY 1),
        |tgc AS (SELECT doc_id, sh, count(*) AS c FROM tg GROUP BY 1, 2),
        |tstat AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct_trigrams,
        |    CAST(sum(c) AS BIGINT) AS n_trigrams
        |  FROM tgc GROUP BY 1)
        |SELECT b.doc_id, top_bigram_n, n_bigrams,
        |  CAST(top_bigram_n AS DOUBLE) / n_bigrams AS top_bigram_ratio,
        |  1.0 - CAST(n_distinct_trigrams AS DOUBLE) / n_trigrams AS dup_trigram_ratio,
        |  (CAST(top_bigram_n AS DOUBLE) / n_bigrams > 0.18
        |    OR 1.0 - CAST(n_distinct_trigrams AS DOUBLE) / n_trigrams > 0.30) AS repetitive
        |FROM bstat b JOIN tstat USING (doc_id)""".stripMargin,

    // same synthesized noisy input on both sides; DuckDB regexp_replace
    // needs the 'g' flag to match Spark's replace-all default
    "q_normalize_redact" ->
      """WITH synth AS (
        |  SELECT doc_id, concat(upper(text), '  Contact: user', CAST(doc_id AS VARCHAR),
        |    '@example.com  call 555', CAST(doc_id AS VARCHAR), ' now') AS s0
        |  FROM documents),
        |norm AS (
        |  SELECT doc_id, CAST(length(s0) AS INTEGER) AS raw_len,
        |    lower(trim(regexp_replace(s0, '\s+', ' ', 'g'))) AS n0
        |  FROM synth)
        |SELECT doc_id, raw_len,
        |  regexp_replace(regexp_replace(n0,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<email>', 'g'),
        |    '[0-9]{3,}', '<num>', 'g') AS redacted
        |FROM norm""".stripMargin,

    // bigrams over the same >= 3-token domain as q_repetition; rank ties
    // break on the gram string so the top-k is total-ordered
    "q_topk_ngrams" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(
        |    generate_series(1, len(t) - 1), i -> array_to_string(t[i:i+1], ' '))) AS gram
        |  FROM toks WHERE len(t) >= 3),
        |c AS (SELECT gram, count(*) AS n FROM bg GROUP BY 1)
        |SELECT rank, gram, n FROM (
        |  SELECT gram, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, gram) AS INTEGER) AS rank
        |  FROM c) ranked
        |WHERE rank <= 20""".stripMargin,

    // the mean sums ~doc-length ln() doubles (order unpinned on either
    // engine) — round(·, 6) key, same accepted class as q_tfidf's scores
    "q_unigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tc AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM toks)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(sum(ln(CAST(c AS DOUBLE) / n)) / count(*), 6) AS avg_logprob
        |FROM toks JOIN tc USING (term) CROSS JOIN tot
        |GROUP BY 1""".stripMargin,

    // adjacent-pair zip via DuckDB's parallel unnest (equal-length list
    // slices zip positionally); prefix counts make p(w2|w1) sum to 1
    "q_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    unnest(t[1:len(t)-1]) AS w1,
        |    unnest(t[2:len(t)]) AS w2
        |  FROM toks WHERE len(t) >= 2),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(sum(ln(CAST(c2 AS DOUBLE) / c1)) / count(*), 6)
        |    AS avg_bigram_logprob
        |FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        |GROUP BY 1""".stripMargin,

    // percent_rank is the exact (rank-1)/(n-1) on both engines; the
    // ordering key is the rounded avg_logprob + doc_id tie-break, so
    // ranks are cross-engine stable
    "q_quality_prune" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tc AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT count(*) AS n FROM toks),
        |scored AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |    round(sum(ln(CAST(c AS DOUBLE) / n)) / count(*), 6) AS avg_logprob
        |  FROM toks JOIN tc USING (term) CROSS JOIN tot
        |  GROUP BY 1)
        |SELECT doc_id, n_tokens, avg_logprob, pctl FROM (
        |  SELECT *, percent_rank() OVER (ORDER BY avg_logprob, doc_id) AS pctl
        |  FROM scored) ranked
        |WHERE pctl >= 0.09999999999999998""".stripMargin,

    // sketch twin re-gated at its verdict point (r14): n_docs from the
    // same tokenizer CTE as q_unigram_logprob; the GK threshold appears
    // only as rank-contract booleans pinned to TRUE
    "q_quality_prune_sketch" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |scored AS (SELECT doc_id FROM toks GROUP BY 1)
        |SELECT count(*) AS n_docs, TRUE AS thr_rank_ok, TRUE AS keep_frac_ok
        |FROM scored""".stripMargin,

    // substring(term, i, 2) is 1-based on both engines; counts carry
    // multiplicity across repeated tokens
    "q_bpe_merges" ->
      """WITH terms AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |pairs AS (
        |  SELECT unnest(list_transform(
        |    generate_series(1, length(term) - 1), i -> substring(term, i, 2))) AS pair
        |  FROM terms WHERE length(term) >= 2),
        |c AS (SELECT pair, count(*) AS n FROM pairs GROUP BY 1)
        |SELECT rank, pair, n FROM (
        |  SELECT pair, n,
        |    CAST(row_number() OVER (ORDER BY n DESC, pair) AS INTEGER) AS rank
        |  FROM c) ranked
        |WHERE rank <= 20""".stripMargin,

    // integer-threshold heavy hitters: cnt*k >= total is exact on both
    // engines — the ONE oracle shared by the exact form and the
    // Misra-Gries sketch form (candidates recounted exactly, false
    // positives cut by the same comparison, so both equal this SQL)
    "q_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        |SELECT term, cnt, total FROM c, tot WHERE cnt * 30 >= total""".stripMargin,

    "q_heavy_hitters_sketch" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c)
        |SELECT term, cnt, total FROM c, tot WHERE cnt * 30 >= total""".stripMargin,

    // per-term contributions pivoted into FIXED columns, summed in fixed
    // left-to-right order — the only float-order hazard (ln) is the same
    // correctly-rounded-class call both engines make; round(·,6) absorbs
    // the last ulp. Literals mirror the Scala arithmetic exactly
    // ((1.2 + 1.0), 1.0 - 0.75, ...) so both engines fold identically.
    "q_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |corpus AS (SELECT count(*) AS n_docs, sum(dl) AS n_tokens FROM dl),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN ('spark', 'join', 'filter') GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |w AS (
        |  SELECT tf.doc_id, tf.term,
        |    ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
        |      * (tf * (1.2 + 1.0))
        |      / (tf + 1.2 * (1.0 - 0.75
        |          + 0.75 * dl / (CAST(n_tokens AS DOUBLE) / n_docs))) AS w
        |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), corpus),
        |p AS (
        |  SELECT doc_id, count(*) AS n_query_terms,
        |    COALESCE(max(w) FILTER (WHERE term = 'spark'), 0.0) AS ws,
        |    COALESCE(max(w) FILTER (WHERE term = 'join'), 0.0) AS wj,
        |    COALESCE(max(w) FILTER (WHERE term = 'filter'), 0.0) AS wf
        |  FROM w GROUP BY 1)
        |SELECT doc_id, n_query_terms,
        |  round(ws, 6) AS w_spark, round(wj, 6) AS w_join,
        |  round(wf, 6) AS w_filter, round(ws + wj + wf, 6) AS bm25
        |FROM p""".stripMargin,

    // same shingle construction as the dedup family's pair CTEs; the
    // first-occurrence index is min(doc_id) per shingle
    "q_ngram_novelty" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(t) - 2), i -> array_to_string(t[i:i+2], ' ')))) AS sh
        |  FROM toks WHERE len(t) >= 3),
        |first AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY 1)
        |SELECT s.doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*), 6) AS novelty
        |FROM sh s JOIN first f USING (sh)
        |GROUP BY s.doc_id""".stripMargin,

    // p^alpha each rounded to 6 decimals, summed as DECIMAL(18,6) so the
    // normalizer is order-independent in both engines (pow/round are the
    // correctly-rounded-class calls both make — q_tfidf's accepted class)
    "q_mix_temperature" ->
      """WITH lt AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(len(string_split_regex(lower(trim(text)), '\s+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT sum(n_tokens) AS total_tokens FROM lt),
        |w AS (
        |  SELECT lang, n_docs, n_tokens,
        |    CAST(round(pow(CAST(n_tokens AS DOUBLE) / total_tokens, 0.3), 6)
        |      AS DECIMAL(18,6)) AS w_raw
        |  FROM lt, tot),
        |z AS (SELECT sum(w_raw) AS z FROM w)
        |SELECT lang, n_docs, n_tokens,
        |  round(CAST(w_raw AS DOUBLE) / CAST(z.z AS DOUBLE), 6) AS weight,
        |  CAST(floor(round(CAST(w_raw AS DOUBLE) / CAST(z.z AS DOUBLE), 6) * 100000)
        |    AS BIGINT) AS planned_docs
        |FROM w, z""".stripMargin,

    // exact top-20 heavy hitters (count-desc/term-asc total order) with
    // the sketch-contract verdicts pinned to literal TRUE: est >= exact
    // (CountMin only overcounts) and overcount <= (e/width)*N
    "q_countmin" ->
      """WITH t AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |c AS (SELECT term, count(*) AS n_exact FROM t GROUP BY 1)
        |SELECT term, n_exact, TRUE AS est_ge_exact, TRUE AS within_eps
        |FROM c ORDER BY n_exact DESC, term LIMIT 20""".stripMargin,

    // vocab rank ties break on the term string (total order); the
    // parallel unnest zips positions with tokens like q_bigram_logprob;
    // the id sequence leaves the gate as a ','-joined string (ORDER BY
    // pos matches Spark's (pos, id)-struct array_sort) — the driver's
    // pandas row-sort can't hash list cells, so arrays become scalars
    "q_tokenize_ids" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, len(t))) AS pos,
        |    unnest(t) AS term
        |  FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |        FROM documents)),
        |c AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
        |vocab AS (
        |  SELECT term, CAST(row_number() OVER (ORDER BY c DESC, term) AS INTEGER) AS id
        |  FROM c QUALIFY id <= 64)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  string_agg(CAST(COALESCE(v.id, 0) AS VARCHAR), ',' ORDER BY t.pos) AS ids_csv
        |FROM toks t LEFT JOIN vocab v USING (term)
        |GROUP BY 1""".stripMargin,

    // the emitted set is decided by the INTEGER c_xy >= 5 cut alone;
    // pmi is six ln() terms of exact integers summed left-to-right —
    // the same fixed-tree discipline as q_type_entropy
    "q_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents),
        |u0 AS (SELECT unnest(t) AS w FROM toks),
        |uni AS (SELECT w, count(*) AS cw FROM u0 GROUP BY 1),
        |bg AS (
        |  SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |  FROM toks WHERE len(t) >= 2),
        |tot AS (SELECT (SELECT count(*) FROM u0) AS n_tok,
        |  (SELECT count(*) FROM bg) AS n_big),
        |b AS (
        |  SELECT w1, w2, count(*) AS c_xy FROM bg GROUP BY 1, 2
        |  HAVING count(*) >= 5)
        |SELECT b.w1, b.w2, b.c_xy, u1.cw AS c_w1, u2.cw AS c_w2,
        |  round(ln(CAST(b.c_xy AS DOUBLE)) - ln(CAST(t.n_big AS DOUBLE))
        |    - ln(CAST(u1.cw AS DOUBLE)) + ln(CAST(t.n_tok AS DOUBLE))
        |    - ln(CAST(u2.cw AS DOUBLE)) + ln(CAST(t.n_tok AS DOUBLE)), 6)
        |    AS pmi
        |FROM b JOIN uni u1 ON b.w1 = u1.w JOIN uni u2 ON b.w2 = u2.w
        |CROSS JOIN tot t""".stripMargin,
  )
}
