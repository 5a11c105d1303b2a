package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast

/** Driver contract (see /root/repo/SURVEY.md §7 and VERDICT.md).
  *
  * Every operator from SURVEY.md §2 plus the LLM-pipeline north-star ops
  * ships as a `queries` entry; every SQL-expressible one also ships a
  * DuckDB oracle in `oracleSql` (same column names both sides — the
  * driver's compare sorts columns by name and hashes values).
  *
  * Determinism contract for oracle-checked queries: double sums/means go
  * through DECIMAL casts (order-independent), pivots use fixed value
  * lists with max (not first), rankings always carry a unique tiebreak
  * column, and float similarity ranks order on round(cos, 6). See
  * `graft.operators` package doc.
  */
object SparkEntry {

  /** Flagship query (reference-parity ETL spine with first-ignoreNulls
    * pivot, `/root/reference/sensor_data_etl.py:57-92`) on sf=0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    SensorEtl.flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + north-star. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "q_quantile"       -> (TimeWindows.quantiles _),
    "q_quantile_trim"  -> (TimeWindows.quantileTrim _),
    "q_quantile_trim_sketch" -> ((s: SparkSession, d: String) => TimeWindows.quantileTrimSketch(s, d)),
    // sorts / top-k (O1-O2)
    "q_orderby_topk"   -> (Relational.orderbyTopk _),
    // grouped ranking: per-user top-5 by value (WindowGroupLimit plan —
    // no global sort; TopkPerKeySpec asserts the plan shape)
    "q_topk_per_key"   -> ((s: SparkSession, d: String) => Relational.topkPerKey(s, d)),
    // set operations (INTERSECT / EXCEPT / UNION DISTINCT, labeled legs)
    "q_set_ops"        -> (Relational.setOps _),
    // left SEMI / ANTI join as first-class shapes (EXISTS / NOT EXISTS)
    "q_semi_anti"      -> (Relational.semiAnti _),
    // CUBE grouping sets over (event_type, day) — one-shuffle all-slices
    "q_cube_daily"     -> (Relational.cubeDaily _),
    // UNPIVOT (melt): the A2 pivot inverted back to long rows
    "q_unpivot"        -> (Relational.unpivotDaily _),
    // click→purchase conversion funnel (first-touch attribution report)
    "q_funnel"         -> (graft.operators.Analytics.funnel _),
    // signup-cohort retention triangle (distinct active users per offset)
    "q_cohort"         -> (graft.operators.Analytics.cohortRetention _),
    // per-type equi-width value histogram (bit-exact bin arithmetic)
    "q_histogram"      -> ((s: SparkSession, d: String) => graft.operators.Analytics.histogram(s, d)),
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
    // HLL sketch twin of q_profile (no oracle: JVM-hashed HLL buckets;
    // ProfileSketchSpec pins the rsd envelope vs the exact profile)
    "q_profile_sketch" -> ((s: SparkSession, d: String) =>
      graft.operators.Analytics.profileSketch(s, d)),
    // key-skew diagnostic (group-size distribution + straggler factor per
    // candidate key) — exact integer sums, cross-engine percentiles
    "q_key_skew" -> (graft.operators.Analytics.keySkew _),
    // windows / time series (W1-W6, A7)
    "q_lead_window"    -> (TimeWindows.leadWindow _),
    "q_lead_global"    -> (TimeWindows.leadGlobal _),
    "q_resample_30m"   -> (TimeWindows.resample30m _),
    "q_ffill"          -> (TimeWindows.ffill _),
    "q_interpolate"    -> (TimeWindows.interpolate _),
    "q_seasonal_decompose" -> ((s: SparkSession, d: String) => TimeWindows.seasonalDecompose(s, d)),
    // the ETL spine, deterministic variant (flagship = entry())
    "q_etl_wide"       -> (SensorEtl.wide _),
    // LLM-pipeline: text analysis
    "q_text_stats"     -> (TextAnalytics.textStats _),
    "q_lang_id"        -> (TextAnalytics.langId _),
    "q_token_count"    -> (TextAnalytics.tokenCount _),
    // overlapping token-window chunking (doc -> training/embedding rows)
    "q_chunk"          -> (TextAnalytics.chunk _),
    "q_fingerprint"    -> (TextAnalytics.fingerprint _),
    // Gopher-style repetition quality filters (top-bigram share +
    // duplicate-trigram fraction)
    "q_repetition"     -> ((s: SparkSession, d: String) => TextAnalytics.repetitionStats(s, d)),
    // whitespace/case normalization + email/digit-run redaction over a
    // deterministically synthesized noisy input
    "q_normalize_redact" -> (TextAnalytics.normalizeRedact _),
    // LLM-pipeline: dedup
    "q_dedup_exact"    -> (Dedup.exact _),
    "q_ngram_jaccard"  -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    // transitive closure of the near-dup pair graph (connected
    // components) and the cleaned corpus it induces
    "q_dedup_clusters" -> (Dedup.dedupClusters _),
    // same clusters through O(log n) large-star/small-star rounds (the
    // giant-component path); must agree exactly with the min-label form
    "q_dedup_clusters_ls" -> (Dedup.dedupClustersLogRounds _),
    "q_dedup_clean"    -> (Dedup.dedupClean _),
    // PageRank centrality over the same memoized near-dup pair graph
    // (no oracle: float iterations; PagerankSpec pins closed forms)
    "q_doc_pagerank"   -> ((s: SparkSession, d: String) => Dedup.docPagerank(s, d)),
    // per-node triangles + clustering coefficient over the pair graph
    // (oriented-join count — exact integer ratios, fully oracled)
    "q_triangles"      -> (Dedup.triangleCounts _),
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
    // train/eval n-gram containment (test-set-leakage guard)
    "q_decontaminate"  -> (Dedup.decontaminate _),
    // Bloom-filter decontamination (bounded-broadcast scale path; no
    // oracle — spark.util.sketch bit layout — BloomDecontaminateSpec
    // pins the no-false-negative + fpp contracts)
    "q_bloom_decontaminate" -> (Dedup.bloomDecontaminate _),
    // duplicated w-token span report (exact-substring-dedup half of
    // Lee et al. 2022; catches boilerplate whole-doc Jaccard misses)
    "q_dup_spans"      -> ((s: SparkSession, d: String) => Dedup.dupSpans(s, d)),
    // corpus-wide top-k n-gram vocabulary report
    "q_topk_ngrams"    -> ((s: SparkSession, d: String) => TextAnalytics.topkNgrams(s, d)),
    // α=0.5 temperature-resampled language mixing weights + keep rates
    "q_lang_sample"    -> (graft.etl.CorpusPipeline.langSample _),
    // corpus-unigram LM quality proxy (CCNet-style perplexity filter)
    "q_unigram_logprob" -> (TextAnalytics.unigramLogProb _),
    // bigram conditional-LM score (word-order-sensitive quality axis)
    "q_bigram_logprob" -> (TextAnalytics.bigramLogProb _),
    // percentile prune on the LM score (keep top 90%)
    "q_quality_prune"  -> ((s: SparkSession, d: String) => TextAnalytics.qualityPrune(s, d)),
    // 100 TB twin: threshold from approx_percentile broadcast as a scalar
    // filter — no rank window anywhere (no oracle: GK sketch internals;
    // QualityPruneSketchSpec pins >=99% keep-set agreement with the exact
    // form)
    "q_quality_prune_sketch" -> ((s: SparkSession, d: String) => TextAnalytics.qualityPruneSketch(s, d)),
    // first-iteration BPE merge candidates (adjacent char-pair counts)
    "q_bpe_merges"     -> ((s: SparkSession, d: String) => TextAnalytics.bpeMergeCandidates(s, d)),
    // exact φ=1/30 heavy hitters (integer-threshold cut, no float share)
    "q_heavy_hitters"  -> ((s: SparkSession, d: String) => TextAnalytics.heavyHitters(s, d)),
    // Misra-Gries candidates + exact recount: provably EQUAL to the
    // exact form, so it shares the same oracle — the vocabulary never
    // shuffles, only ≤ k candidates per partition do
    "q_heavy_hitters_sketch" -> ((s: SparkSession, d: String) => TextAnalytics.heavyHittersSketch(s, d)),
    // Okapi BM25 against a fixed query term set (fixed-order term sum)
    "q_bm25"           -> ((s: SparkSession, d: String) => TextAnalytics.bm25(s, d)),
    // incremental-ingest dedup triage (batch vs existing corpus)
    "q_incremental_dedup" -> (Dedup.incrementalStatus _),
    // JSONL sink + explicit-schema scan roundtrip (content-md5 extrema
    // prove lossless escaping, not just row counts)
    "q_jsonl_roundtrip" -> (Relational.jsonlRoundtrip _),
    // ORC sink + scan roundtrip (Spark's other native columnar format)
    "q_orc_roundtrip"  -> (Relational.orcRoundtrip _),
    // streaming ingest gate: stream-static anti join vs the corpus hash
    // index + within-stream dedup (watermark-bounded state)
    "q_stream_ingest_dedup" -> (graft.streaming.EventStreams.streamIngestDedup _),
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
    // multimodal: typed mapPartitions feature pass over opaque binary
    // payloads (SQL-expressible projection; floats stay spec-tested)
    "q_media_features" -> (graft.multimodal.Media.mediaFeatures _),
    // typed resize pass: dim + payload-length arithmetic oracle-checked
    "q_media_resize"   -> (graft.multimodal.Media.mediaResize _),
    // frame-sampling fan-out summary (count + sampled bytes per media)
    "q_media_frames"   -> (graft.multimodal.Media.mediaFrames _),
    // perceptual-hash (aHash) media near-dup — the multimodal dedup leg,
    // banded-Hamming blocked (no oracle: PRNG payloads; MediaPhashSpec
    // pins planted-near-copy recovery)
    "q_media_phash_neardup" -> ((s: SparkSession, d: String) =>
      graft.multimodal.Media.mediaPhashNearDup(s, d)),
    // native banded minhash (Dedup.minhashBanded); the spark.ml
    // approxSimilarityJoin form (Dedup.minhashLsh) stays as the API-parity
    // variant but was 60-120 s at sf0.1 vs seconds for the banded form
    "q_minhash_lsh"    -> (Dedup.minhashBanded _),
    // LSH-prefiltered EXACT jaccard — the posting-self-join-free scale
    // path (no oracle: JVM minhash candidates; NgramBandedSpec measures
    // recall vs the exact operator)
    "q_ngram_jaccard_banded" -> ((s: SparkSession, d: String) => Dedup.ngramJaccardBanded(s, d)),
    "q_simhash"        -> (Dedup.simhash _),
    "q_simhash_neardup" -> ((s: SparkSession, d: String) => Dedup.simhashNearDup(s, d)),
    // measured band-blocking recall vs exact-Hamming ground truth on a
    // broadcast probe set (no oracle: xxhash64 signatures;
    // SimhashRecallSpec pins recall(<=3) = 1 and the planted losses)
    "q_simhash_recall" -> (Dedup.simhashRecall _),
    // LLM-pipeline: similarity search
    "q_cosine_topk"    -> ((s: SparkSession, d: String) => Similarity.cosineTopK(s, d)),
    "q_ann_ivf"        -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    // measured recall@k of Lloyd-refined IVF vs brute-force ground truth
    // (no oracle: float Lloyd means; AnnRecallSpec pins the floor)
    "q_ann_recall"     -> ((s: SparkSession, d: String) => Similarity.annRecall(s, d)),
    // measured recall@k of IVF-PQ ADC vs exact-dot ground truth — the
    // number for the stacked IVF-pruning + non-residual-PQ trades
    "q_ivf_pq_recall"  -> ((s: SparkSession, d: String) => Similarity.ivfPqRecall(s, d)),
    // the IVFADC residual-encoding composition (Jégou 2011 §IV) and its
    // measured recall — the raw-vs-residual trade as numbers
    "q_ivf_pq_topk_res" -> ((s: SparkSession, d: String) => Similarity.ivfPqResidualTopK(s, d)),
    "q_ivf_pq_recall_res" -> ((s: SparkSession, d: String) => Similarity.ivfPqRecall(s, d, residual = true)),
    // Matryoshka truncation trade: recall@5 of prefix-dim cosine search
    // vs full-dim truth — exact math, so fully oracle-able
    "q_mrl_recall"     -> ((s: SparkSession, d: String) => Similarity.mrlRecall(s, d)),
    // symmetric int8 embedding quantization (scale, checksum, max error)
    "q_quantize_int8"  -> (Similarity.quantizeInt8 _),
    // product quantization: deterministic Lloyd codebooks + ADC top-k
    // (no oracle — seeded JVM fits; PqSpec pins the contracts)
    "q_pq_topk"        -> ((s: SparkSession, d: String) => Similarity.pqTopK(s, d)),
    // IVF-PQ composition: probe nprobe buckets, ADC over codes only
    "q_ivf_pq_topk"    -> ((s: SparkSession, d: String) => Similarity.ivfPqTopK(s, d)),
    // τ = 0.4 at the gate: the driver's synthetic embeddings carry no
    // planted near-identical pairs (max pairwise cos ≈ 0.51), so the
    // near-dup in margin-0 CALIBRATION mode (τ = raw p99 of the
    // id-successor background-pair cosines): a fixed 0.95 would exercise
    // nothing on the synthetic corpus (VERDICT r2 item 5), and the
    // library default margin (+0.05) would correctly emit zero pairs
    // here. Margin 0 is explicit because ~1% of unrelated pairs exceed
    // the raw p99 by construction — gate-coverage semantics, not a
    // dedup recommendation (see embeddingNearDup scaladoc).
    "q_embed_neardup"  -> ((s: SparkSession, d: String) =>
      Dedup.embeddingNearDup(s, d, tauMargin = 0.0)),
    // embedding-side transitive closure: CC over the same margin-0 pair
    // graph, canonical = min vec_id (recursive-CTE oracle)
    "q_embed_clusters" -> ((s: SparkSession, d: String) =>
      Dedup.embedDedupClusters(s, d, tauMargin = 0.0)),
    // streaming (extension): windowed means via Structured Streaming,
    // oracle-checked against the SAME SQL as the batch resample
    "q_stream_resample" -> (graft.streaming.EventStreams.streamResample _),
    // streaming exact dedup: events streamed twice (two unioned file
    // sources), dropDuplicatesWithinWatermark must recover the table
    "q_stream_dedup"   -> (graft.streaming.EventStreams.streamDedup _),
    // production sink path: Append mode -> parquet files + checkpoint,
    // read back; oracle = the watermark-closed window subset
    "q_stream_sink"    -> (graft.streaming.EventStreams.streamSink _),
    // streaming sessionization via native session_window (event-time gap
    // sessions), oracled at full timestamp precision
    "q_stream_sessionize" -> (graft.streaming.EventStreams.streamSessionize _),
    // stream-STREAM inner interval join (click→purchase attribution);
    // drained inner join == batch interval join, which is the oracle
    "q_stream_stream_join" -> (graft.streaming.EventStreams.streamStreamJoin _),
    // streaming Misra-Gries via flatMapGroupsWithState (term-sharded
    // keyed state across micro-batches) + exact candidate recount —
    // equals the exact form, so it SHARES q_heavy_hitters' oracle
    "q_stream_heavy_hitters" -> ((s: SparkSession, d: String) =>
      graft.streaming.EventStreams.streamHeavyHitters(s, d)),
    // typed grouped forecasting kernel (U1/U2 replacement)
    "q_holt_prep"      -> ((s: SparkSession, d: String) => HoltForecast.prep(s, d)),
    "q_holt_forecast"  -> ((s: SparkSession, d: String) => HoltForecast.forecast(s, d)),
    "q_ar_forecast"    -> ((s: SparkSession, d: String) => graft.timeseries.ArForecast.forecast(s, d)),
    "q_holt_gridsearch" -> ((s: SparkSession, d: String) => graft.timeseries.ArForecast.holtGridSearch(s, d)),
    "q_arima_gridsearch" -> ((s: SparkSession, d: String) => graft.timeseries.ArForecast.arimaGridSearch(s, d)),
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
    "q_tfidf"          -> ((s: SparkSession, d: String) => TextAnalytics.tfidfTopTerms(s, d)),
    "q_count_distinct" -> (Relational.countDistinctUsers _),
    "q_json_extract"   -> (Relational.jsonExtract _),
    // array HOFs (transform/filter/aggregate/zip_with) as a gate row —
    // float→double-first lambdas + left folds match DuckDB list_* exactly
    "q_array_hof"      -> (Relational.arrayHof _),
    // hash-based sampling is deterministic by KEY (not partitioning), so
    // the rows-only gate check is stable; the hash itself is JVM-side →
    // no cross-engine oracle
    "q_hash_sample"    -> ((s: SparkSession, d: String) => Relational.hashSample(s, d)),
    // temporal joins (composition operators; oracled vs DuckDB ASOF JOIN)
    "q_asof_join"      -> (TemporalJoins.asofJoin _),
    "q_range_join"     -> ((s: SparkSession, d: String) => TemporalJoins.rangeJoin(s, d)),
    "q_sessionize"     -> ((s: SparkSession, d: String) => TemporalJoins.sessionize(s, d)),
    "q_rolling_stats"  -> ((s: SparkSession, d: String) => TemporalJoins.rollingStats(s, d)),
  )

  /** Shared CTE block: the n-gram Jaccard candidate-pair graph over
    * `base` (3-token shingles, df-capped inverted index) — the common
    * prefix of the `q_ngram_jaccard` / `q_dedup_clusters` /
    * `q_dedup_clean` / `q_corpus_clean` oracles, so they stay in
    * lockstep. `base` must expose (doc_id, text). */
  private def ngramPairCtes(base: String): String =
    s"""toks AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM $base),
      |sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    generate_series(1, len(t) - 2), i -> array_to_string(t[i:i+2], ' ')))) AS sh
      |  FROM toks WHERE len(t) >= 3),
      |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
      |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
      |rare AS (SELECT s.doc_id, s.sh FROM sh s JOIN df USING (sh) WHERE df.df <= 100),
      |pairs AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared
      |  FROM rare a JOIN rare b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  private val NgramPairCtes: String = ngramPairCtes("documents")

  /** The τ = 0.12 thresholded pair edges (same filter as
    * `q_ngram_jaccard`'s output) — shared by the reachability and
    * triangle oracles so the edge set can never drift between them. */
  private val JpairsCte: String =
    """jpairs AS (
      |  SELECT p.a_id, p.b_id FROM pairs p
      |  JOIN sizes sa ON p.a_id = sa.doc_id
      |  JOIN sizes sb ON p.b_id = sb.doc_id
      |  WHERE CAST(p.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - p.shared AS DOUBLE) >= 0.12)""".stripMargin

  /** Symmetric edge list + recursive reachability over the thresholded
    * pair graph; nodes come from the same `base` as [[ngramPairCtes]]. */
  private def ngramReachCtes(base: String): String =
    s"""$JpairsCte,
      |edges AS (
      |  SELECT a_id AS src, b_id AS dst FROM jpairs
      |  UNION ALL SELECT b_id, a_id FROM jpairs),
      |reach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM $base
      |  UNION
      |  SELECT e.dst AS id, reach.r FROM edges e JOIN reach ON e.src = reach.id)""".stripMargin

  private val NgramReachCtes: String = ngramReachCtes("documents")

  /** The full corpus-clean CTE chain (quality gate → exact dedup →
    * near-dup reachability → keepers) over `documents` — shared by the
    * `q_corpus_clean` / `q_corpus_pack` oracles so the composed recipe's
    * stages can never drift apart. */
  private val CorpusCleanCtes: String =
    s"""quality AS (
      |  SELECT doc_id, text, lang, n_chars,
      |    len(string_split_regex(lower(trim(text)), '\\s+')) AS n_tokens,
      |    CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
      |      / length(text) AS alpha_ratio
      |  FROM documents),
      |exdedup AS (
      |  SELECT doc_id, text, lang, n_chars, n_tokens FROM (
      |    SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
      |    FROM quality WHERE n_tokens >= 5 AND alpha_ratio >= 0.5) t
      |  WHERE rn = 1),
      |base AS (SELECT doc_id, text FROM exdedup),
      |${ngramPairCtes("base")},
      |${ngramReachCtes("base")},
      |keepers AS (SELECT id FROM reach GROUP BY id HAVING min(r) = id)""".stripMargin

  /** The deterministic embedding near-dup pair CTEs (norms, id-successor
    * τ sample, √N centroids, nearest-bucket assignment, within-bucket
    * pair cosines) — shared by the q_embed_neardup and q_embed_clusters
    * oracles so the edge set can never drift between them. */
  private val EmbedPairCtes: String =
    """n AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_sum(list_transform(generate_series(1, 64),
      |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
      |  FROM embeddings),
      |succ AS (
      |  SELECT list_sum(list_transform(generate_series(1, 64),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm) AS cos
      |  FROM n a JOIN n b ON b.vec_id = a.vec_id + 1),
      |tq AS (SELECT round(LEAST(0.95, quantile_cont(cos, 0.99) + 0.0), 4) AS tau_v FROM succ),
      |c AS (
      |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n
      |  WHERE vec_id < LEAST(4096, GREATEST(4,
      |    CAST(round(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)))),
      |a AS (
      |  SELECT vec_id, embedding, nrm, c_id AS bucket FROM (
      |    SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
      |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
      |        list_sum(list_transform(generate_series(1, 64),
      |          i -> CAST(n.embedding[i] AS DOUBLE) * c.c_emb[i])) / (n.nrm * c.c_nrm) DESC,
      |        c.c_id) AS rn
      |    FROM n, c) t
      |  WHERE rn = 1),
      |p AS (
      |  SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket,
      |    list_sum(list_transform(generate_series(1, 64),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * b.embedding[i])) / (a.nrm * b.nrm) AS cos
      |  FROM a JOIN a b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)""".stripMargin

  /** DuckDB oracles; keys absent here (ML fits, LSH, simhash, Holt, IVF)
    * get the driver's weaker rows-only check — they are either seeded
    * model fits or depend on JVM-specific hashes (xxhash64, MinHash
    * coefficients) no other engine reproduces. */
  def oracleSql: Map[String, String] = Map(
    "q_scan_project" ->
      "SELECT event_id, user_id AS terminal_id, value FROM events",

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

    "q_quantile" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.25), 4) AS p25,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.75), 4) AS p75
        |FROM events GROUP BY event_type""".stripMargin,

    "q_quantile_trim" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_trimmed
        |FROM (
        |  SELECT event_type, event_id, value,
        |    ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS q
        |  FROM events) t
        |WHERE q IN (2, 3) GROUP BY 1""".stripMargin,

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

    "q_cube_daily" ->
      """WITH e AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, value FROM events)
        |SELECT event_type, day, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM e GROUP BY CUBE (event_type, day)""".stripMargin,

    // pivot∘unpivot with null-drop is exactly the long-form aggregate —
    // the oracle checks the roundtrip against the direct groupBy
    "q_unpivot" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

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

    "q_lead_window" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, max(value) AS day_max
        |  FROM events GROUP BY 1, 2)
        |SELECT * FROM (
        |  SELECT user_id, day, day_max,
        |    lead(day_max, 1) OVER (PARTITION BY user_id ORDER BY day) AS next_day_max
        |  FROM daily) t
        |WHERE next_day_max IS NOT NULL""".stripMargin,

    "q_lead_global" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, max(value) AS day_max
        |  FROM events GROUP BY 1)
        |SELECT * FROM (
        |  SELECT day, day_max, lead(day_max, 1) OVER (ORDER BY day) AS next_day_max
        |  FROM daily) t
        |WHERE next_day_max IS NOT NULL""".stripMargin,

    "q_resample_30m" ->
      """SELECT user_id, time_bucket(INTERVAL '30 minutes', ts) AS bucket,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
        |  count(*) AS n, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,

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
    "q_stream_sink" ->
      """WITH cutoff AS (
        |  SELECT max(ts) - INTERVAL 10 MINUTE AS wm FROM events),
        |agg AS (
        |  SELECT user_id, time_bucket(INTERVAL '30 minutes', ts) AS bucket,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value,
        |    count(*) AS n, max(value) AS max_value
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, bucket, avg_value, n, max_value
        |FROM agg, cutoff
        |WHERE bucket + INTERVAL 30 MINUTE <= wm""".stripMargin,

    "q_count_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,

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

    // the window-composition as-of join must match DuckDB's NATIVE ASOF
    // JOIN — the oracle is the canonical operator itself, not a SQL
    // re-derivation of the same composition
    "q_asof_join" ->
      """WITH dim AS (
        |  SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS ts,
        |    max(value) AS setting
        |  FROM events GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, e.value, d.setting AS asof_max
        |FROM events e ASOF JOIN dim d
        |  ON e.user_id = d.user_id AND e.ts >= d.ts""".stripMargin,

    // whole-second gap math on both sides: Spark unix_timestamp truncates
    // to seconds; DuckDB floor(epoch(ts)) reproduces it
    "q_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR CAST(floor(epoch(ts)) AS BIGINT)
        |         - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
        |    THEN 1 ELSE 0 END AS new_sess FROM o),
        |s AS (
        |  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM f)
        |SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM s GROUP BY 1, 2""".stripMargin,

    // session_window semantics: new session when ts > prev + gap at FULL
    // timestamp precision — an event landing exactly on the gap boundary
    // still merges (verified by spec). The batch q_sessionize oracle
    // instead floors epochs to whole seconds (reference-lineage
    // semantics); both use the strict > split.
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
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM f)
        |SELECT user_id, session_id, min(ts) AS s_start, max(ts) AS s_end,
        |  count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM s GROUP BY 1, 2""".stripMargin,

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

    "q_rolling_stats" ->
      """SELECT event_id, user_id, ts, value,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / count(*) OVER w AS roll_avg,
        |  min(value) OVER w AS roll_min,
        |  max(value) OVER w AS roll_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_range_join" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, min(ts) AS s_ts, max(ts) AS e_ts
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT iv.user_id, iv.day, iv.s_ts, iv.e_ts, count(c.ts) AS n_clicks
        |FROM iv LEFT JOIN c
        |  ON c.user_id = iv.user_id AND c.ts BETWEEN iv.s_ts AND iv.e_ts
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "q_ffill" ->
      """WITH f AS (SELECT * FROM events WHERE user_id < 50),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |  FROM f GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
        |  FROM f GROUP BY 1),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS bucket
        |  FROM bounds)
        |SELECT s.user_id, s.bucket, h.avg_value,
        |  last_value(h.avg_value IGNORE NULLS) OVER (
        |    PARTITION BY s.user_id ORDER BY s.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |FROM spine s LEFT JOIN hourly h
        |  ON s.user_id = h.user_id AND s.bucket = h.bucket""".stripMargin,

    "q_interpolate" ->
      """WITH f AS (SELECT * FROM events WHERE user_id < 50),
        |hourly AS (
        |  SELECT user_id, date_trunc('hour', ts) AS bucket,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |  FROM f GROUP BY 1, 2),
        |bounds AS (
        |  SELECT user_id, date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx
        |  FROM f GROUP BY 1),
        |spine AS (
        |  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL '1 hour')) AS bucket
        |  FROM bounds),
        |j AS (
        |  SELECT s.user_id, s.bucket, h.avg_value FROM spine s
        |  LEFT JOIN hourly h ON s.user_id = h.user_id AND s.bucket = h.bucket),
        |x AS (
        |  SELECT user_id, bucket, avg_value,
        |    last_value(avg_value IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    last_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_b,
        |    first_value(avg_value IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    first_value(CASE WHEN avg_value IS NOT NULL THEN bucket END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
        |  FROM j)
        |SELECT user_id, bucket, avg_value,
        |  CASE WHEN avg_value IS NOT NULL THEN avg_value
        |       WHEN prev_v IS NULL THEN next_v
        |       WHEN next_v IS NULL THEN prev_v
        |       ELSE prev_v + (next_v - prev_v) *
        |         (CAST(CAST(floor(epoch(bucket)) AS BIGINT) - CAST(floor(epoch(prev_b)) AS BIGINT) AS DOUBLE) /
        |          CAST(CAST(floor(epoch(next_b)) AS BIGINT) - CAST(floor(epoch(prev_b)) AS BIGINT) AS DOUBLE))
        |  END AS interp
        |FROM x""".stripMargin,

    "q_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS day_avg
        |  FROM events GROUP BY 1),
        |t AS (
        |  SELECT day, day_avg,
        |    CAST(SUM(CAST(day_avg AS DECIMAL(24,8))) OVER w AS DOUBLE) / count(*) OVER w AS trend
        |  FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |v AS (
        |  SELECT day, day_avg, trend, day_avg - trend AS dev,
        |    CAST(dayofweek(day) + 1 AS INTEGER) AS dow
        |  FROM t),
        |sea AS (
        |  SELECT day, day_avg, trend, dev, dow,
        |    CAST(SUM(CAST(dev AS DECIMAL(24,8))) OVER pw AS DOUBLE) / count(*) OVER pw AS seasonal
        |  FROM v WINDOW pw AS (PARTITION BY dow))
        |SELECT day, day_avg, trend, dow, seasonal, dev - seasonal AS resid FROM sea""".stripMargin,

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

    "q_dedup_exact" ->
      """SELECT doc_id, text_hash, lang, n_chars FROM (
        |  SELECT doc_id, sha256(text) AS text_hash, lang, n_chars,
        |    row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM documents) t
        |WHERE rn = 1""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH $NgramPairCtes
        |SELECT p.a_id, p.b_id, p.shared, sa.n_sh AS a_n, sb.n_sh AS b_n,
        |  CAST(p.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - p.shared AS DOUBLE) AS jaccard
        |FROM pairs p
        |JOIN sizes sa ON p.a_id = sa.doc_id
        |JOIN sizes sb ON p.b_id = sb.doc_id
        |WHERE CAST(p.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - p.shared AS DOUBLE) >= 0.12""".stripMargin,

    // oriented triangle join over the SAME thresholded edge set (the
    // shared JpairsCte keeps it in lockstep with the cluster oracles);
    // clustering = 2T/(deg(deg-1)) is an exact integer-ratio double
    "q_triangles" ->
      s"""WITH $NgramPairCtes,
        |$JpairsCte,
        |tri AS (
        |  SELECT e1.a_id AS x, e1.b_id AS y, e2.b_id AS z
        |  FROM jpairs e1
        |  JOIN jpairs e2 ON e2.a_id = e1.a_id AND e2.b_id > e1.b_id
        |  JOIN jpairs e3 ON e3.a_id = e1.b_id AND e3.b_id = e2.b_id),
        |pern AS (
        |  SELECT x AS doc_id FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri),
        |tcount AS (SELECT doc_id, count(*) AS triangles FROM pern GROUP BY 1),
        |deg AS (
        |  SELECT doc_id, count(*) AS deg FROM (
        |    SELECT a_id AS doc_id FROM jpairs
        |    UNION ALL SELECT b_id FROM jpairs) t GROUP BY 1)
        |SELECT d.doc_id, d.deg,
        |  COALESCE(t.triangles, 0) AS triangles,
        |  CASE WHEN d.deg >= 2
        |    THEN 2.0 * COALESCE(t.triangles, 0) / (d.deg * (d.deg - 1))
        |    ELSE 0.0 END AS clustering
        |FROM deg d LEFT JOIN tcount t ON d.doc_id = t.doc_id""".stripMargin,

    // transitive closure of the same pair graph: reach(id, r) enumerates
    // every node r reachable from id (components are near-dup clusters —
    // tiny — so full reachability is cheap); cluster = min reachable id
    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $NgramPairCtes,
        |$NgramReachCtes
        |SELECT id AS doc_id, min(r) AS cluster, (min(r) = id) AS keep
        |FROM reach GROUP BY id""".stripMargin,

    // identical oracle: the log-round variant must produce the same
    // transitive closure as min-label propagation
    "q_dedup_clusters_ls" ->
      s"""WITH RECURSIVE $NgramPairCtes,
        |$NgramReachCtes
        |SELECT id AS doc_id, min(r) AS cluster, (min(r) = id) AS keep
        |FROM reach GROUP BY id""".stripMargin,

    "q_dedup_clean" ->
      s"""WITH RECURSIVE $NgramPairCtes,
        |$NgramReachCtes,
        |keepers AS (SELECT id FROM reach GROUP BY id HAVING min(r) = id)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d JOIN keepers k ON d.doc_id = k.id""".stripMargin,

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
        |surv AS (
        |  SELECT e.doc_id, e.lang,
        |    CAST(len(regexp_extract_all(e.text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
        |      AS n_tokens
        |  FROM exdedup e JOIN keepers k ON e.doc_id = k.id),
        |cc AS (
        |  SELECT doc_id, lang, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM surv)
        |SELECT doc_id, lang, n_tokens,
        |  CAST((cum - n_tokens) // 2048 AS BIGINT) AS shard
        |FROM cc""".stripMargin,

    // containment is against the eval shingle SET (distinct), train docs
    // with < 3 tokens have no shingles and no row — both sides agree
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(t) - 2), i -> array_to_string(t[i:i+2], ' ')))) AS sh
        |  FROM toks WHERE len(t) >= 3),
        |evalsh AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0),
        |trainsh AS (SELECT doc_id, sh FROM sh WHERE doc_id % 20 <> 0),
        |hits AS (
        |  SELECT t.doc_id, count(*) AS n_hit FROM trainsh t JOIN evalsh e USING (sh)
        |  GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_sh FROM trainsh GROUP BY 1)
        |SELECT tot.doc_id, tot.n_sh, COALESCE(h.n_hit, CAST(0 AS BIGINT)) AS n_hit,
        |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / tot.n_sh AS contamination,
        |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / tot.n_sh >= 0.5 AS contaminated
        |FROM tot LEFT JOIN hits h USING (doc_id)""".stripMargin,

    // 8-token sliding windows WITH positions (multiplicity counts);
    // DuckDB list slices are inclusive-bounds like q_chunk's
    "q_dup_spans" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |win AS (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(t) - 7), i -> array_to_string(t[i:i+7], ' '))) AS win
        |  FROM toks WHERE len(t) >= 8),
        |wc AS (SELECT win, count(*) AS c FROM win GROUP BY 1)
        |SELECT w.doc_id, count(*) AS n_windows,
        |  CAST(sum(CASE WHEN wc.c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
        |  CAST(sum(CASE WHEN wc.c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_ratio,
        |  CAST(sum(CASE WHEN wc.c > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) >= 0.5 AS flagged
        |FROM win w JOIN wc USING (win)
        |GROUP BY 1""".stripMargin,

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

    // existing corpus = doc_id % 10 < 8; the batch carries synthesized
    // exact re-arrivals (+100000 = corpus copies, +200000 = in-batch
    // repeats) since the raw testdata has no byte-identical pair; 8-token
    // shingles; statuses by the same precedence as the Spark CASE
    "q_incremental_dedup" ->
      """WITH ex AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
        |inc AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
        |  UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents
        |    WHERE doc_id % 10 < 8 AND doc_id % 100 = 1
        |  UNION ALL SELECT doc_id + 200000 AS doc_id, text FROM documents
        |    WHERE doc_id % 10 >= 8 AND doc_id % 100 = 98),
        |exh AS (SELECT DISTINCT sha256(text) AS h FROM ex),
        |m AS (
        |  SELECT doc_id, sha256(text) AS h,
        |    row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM inc),
        |extoks AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS t FROM ex),
        |exsh AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    generate_series(1, len(t) - 7), i -> array_to_string(t[i:i+7], ' ')))) AS sh
        |  FROM extoks WHERE len(t) >= 8),
        |intoks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM inc),
        |insh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(t) - 7), i -> array_to_string(t[i:i+7], ' ')))) AS sh
        |  FROM intoks WHERE len(t) >= 8),
        |hits AS (SELECT i.doc_id, count(*) AS n_hit FROM insh i JOIN exsh USING (sh) GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_sh FROM insh GROUP BY 1),
        |cont AS (
        |  SELECT tot.doc_id, CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / tot.n_sh AS contamination
        |  FROM tot LEFT JOIN hits h USING (doc_id))
        |SELECT m.doc_id,
        |  CASE WHEN m.h IN (SELECT h FROM exh) THEN 'exact_corpus'
        |       WHEN m.rn > 1 THEN 'exact_batch'
        |       WHEN COALESCE(c.contamination, 0) >= 0.5 THEN 'near_corpus'
        |       ELSE 'kept' END AS status,
        |  COALESCE(c.contamination, 0.0) AS contamination
        |FROM m LEFT JOIN cont c USING (doc_id)""".stripMargin,

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

    // reported doubles are RAW (bit-exact cross-engine: float→double is
    // exact, and both engines evaluate the same IEEE ops in the same
    // order); round(x, 6) would reintroduce the engine-specific
    // decimal-rounding hazard ADVICE r5 flagged. round() inside the
    // quantizer itself is half-away-from-zero on both engines.
    "q_quantize_int8" ->
      """WITH s AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, embedding, scale,
        |    CASE WHEN scale = 0.0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding,
        |        x -> CAST(round(CAST(x AS DOUBLE) / scale * 127.0) AS BIGINT)) END AS qv
        |  FROM s)
        |SELECT vec_id, scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  CAST(list_min(qv) AS BIGINT) AS q_min,
        |  CAST(list_max(qv) AS BIGINT) AS q_max,
        |  CASE WHEN scale = 0.0 THEN 0.0
        |    ELSE list_max(list_transform(generate_series(1, len(embedding)),
        |      i -> abs(CAST(embedding[i] AS DOUBLE) - qv[i] * scale / 127.0)))
        |  END AS max_abs_err
        |FROM q""".stripMargin,

    // kind/width/height are synthesized from doc_id; the payload is
    // seeded-PRNG bytes whose LENGTH follows the Media.payloadLen
    // formula — the oracle re-derives the arithmetic, never the bytes
    "q_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |  CAST(200 + doc_id % 300 AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin,

    // floor(x + 0.5) mirrors Scala's math.round exactly; scale/area are
    // the same doubles on both engines, so dims and byte counts match
    "q_media_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        |    CAST(doc_id % 640 + 1 AS INTEGER) AS src_width,
        |    CAST(doc_id % 480 + 1 AS INTEGER) AS src_height,
        |    CAST(200 + doc_id % 300 AS BIGINT) AS len
        |  FROM documents),
        |sc AS (
        |  SELECT *, LEAST(1.0, LEAST(64.0 / src_width, 64.0 / src_height)) AS scale
        |  FROM m),
        |dims AS (
        |  SELECT *,
        |    CAST(GREATEST(1, CAST(floor(src_width * scale + 0.5) AS BIGINT)) AS INTEGER) AS width,
        |    CAST(GREATEST(1, CAST(floor(src_height * scale + 0.5) AS BIGINT)) AS INTEGER) AS height,
        |    scale * scale AS area
        |  FROM sc),
        |st AS (
        |  SELECT *, CASE WHEN area >= 1.0 OR len = 0 THEN CAST(1 AS BIGINT)
        |    ELSE GREATEST(CAST(1 AS BIGINT), CAST(floor(1.0 / area + 0.5) AS BIGINT)) END AS step
        |  FROM dims)
        |SELECT media_id, kind, src_width, src_height, width, height,
        |  CASE WHEN area >= 1.0 OR len = 0 THEN len
        |       ELSE (len + step - 1) // step END AS n_bytes_out
        |FROM st""".stripMargin,

    // frames = 64-byte chunks at stride 4; the last chunk is ragged
    "q_media_frames" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, CAST(200 + doc_id % 300 AS BIGINT) AS len
        |  FROM documents),
        |f AS (
        |  SELECT media_id, len,
        |    unnest(generate_series(0, CAST(ceil(len / 64.0) AS BIGINT) - 1)) AS i
        |  FROM m),
        |k AS (
        |  SELECT media_id, i, LEAST(CAST(64 AS BIGINT), len - i * 64) AS fb
        |  FROM f WHERE i % 4 = 0)
        |SELECT media_id, count(*) AS n_frames, CAST(sum(fb) AS BIGINT) AS total_frame_bytes
        |FROM k GROUP BY 1""".stripMargin,

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

    "q_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
        |x AS (
        |  SELECT q.q_id, e.vec_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
        |r AS (
        |  SELECT q_id, vec_id, cos,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY round(cos, 6) DESC, vec_id)
        |      AS INTEGER) AS rank
        |  FROM x)
        |SELECT q_id, vec_id, rank, round(cos, 4) AS sim FROM r WHERE rank <= 10""".stripMargin,

    // prefix-dim cosine reproduces the Spark slice exactly (same
    // left-to-right double accumulation as q_cosine_topk, over
    // generate_series(1, trunc_dim)); recall = integer hit count / 5
    "q_mrl_recall" ->
      """WITH dims AS (SELECT unnest([8, 16, 32]) AS trunc_dim),
        |q AS (
        |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
        |  WHERE vec_id < 10),
        |tx AS (
        |  SELECT q.q_id, e.vec_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
        |truth AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
        |      ORDER BY round(cos, 6) DESC, vec_id) AS rank FROM tx) t
        |  WHERE rank <= 5),
        |gx AS (
        |  SELECT d.trunc_dim, q.q_id, e.vec_id,
        |    list_sum(list_transform(generate_series(1, d.trunc_dim),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(generate_series(1, d.trunc_dim),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(generate_series(1, d.trunc_dim),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS cos
        |  FROM embeddings e, q, dims d WHERE e.vec_id <> q.q_id),
        |got AS (
        |  SELECT trunc_dim, q_id, vec_id FROM (
        |    SELECT trunc_dim, q_id, vec_id, row_number() OVER (
        |      PARTITION BY trunc_dim, q_id
        |      ORDER BY round(cos, 6) DESC, vec_id) AS rank FROM gx) t
        |  WHERE rank <= 5)
        |SELECT d.trunc_dim, t.q_id,
        |  CAST(count(g.vec_id) AS DOUBLE) / 5 AS recall_at_k
        |FROM dims d CROSS JOIN truth t
        |LEFT JOIN got g ON g.trunc_dim = d.trunc_dim AND g.q_id = t.q_id
        |  AND g.vec_id = t.vec_id
        |GROUP BY 1, 2""".stripMargin,

    // IVF assignment is deterministic SQL: centroids = ⌊√N⌋-ish lowest
    // vec_ids, nearest by exact cosine (ties → lowest c_id). Both engines
    // accumulate the dot product left-to-right in double, so the sims —
    // and therefore buckets, pairs, and ranks — hash-match bitwise. τ is
    // the p99 of the id-successor background-pair cosines (quantile_cont
    // = Spark's interpolated percentile on identical doubles), rounded
    // to 4 dp on both engines before the compare.
    "q_embed_neardup" ->
      s"""WITH $EmbedPairCtes
        |SELECT a_id, b_id, bucket, round(cos, 4) AS sim, tq.tau_v AS tau
        |FROM p, tq WHERE cos >= tq.tau_v""".stripMargin,

    // the embedding-side transitive closure: recursive reachability over
    // the SAME thresholded pair graph, canonical = min vec_id
    "q_embed_clusters" ->
      s"""WITH RECURSIVE $EmbedPairCtes,
        |ep AS (SELECT a_id, b_id FROM p, tq WHERE cos >= tq.tau_v),
        |edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM ep
        |  UNION ALL SELECT b_id, a_id FROM ep),
        |reach AS (
        |  SELECT vec_id AS id, vec_id AS r FROM embeddings
        |  UNION
        |  SELECT e.dst AS id, reach.r FROM edges e JOIN reach ON e.src = reach.id)
        |SELECT id AS vec_id, min(r) AS cluster, min(r) = id AS keep
        |FROM reach GROUP BY id""".stripMargin,

    "q_ann_ivf" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |c AS (
        |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n
        |  WHERE vec_id < LEAST(4096, GREATEST(4,
        |    CAST(round(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)))),
        |asg AS (
        |  SELECT vec_id, embedding, nrm, c_id AS bucket FROM (
        |    SELECT n.vec_id, n.embedding, n.nrm, c.c_id,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(n.embedding[i] AS DOUBLE) * c.c_emb[i])) / (n.nrm * c.c_nrm) DESC,
        |        c.c_id) AS rn
        |    FROM n, c) t
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM n WHERE vec_id < 10),
        |probes AS (
        |  SELECT q_id, q_emb, q_nrm, c_id AS bucket FROM (
        |    SELECT q.q_id, q.q_emb, q.q_nrm, c.c_id,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(q.q_emb[i] AS DOUBLE) * c.c_emb[i])) / (q.q_nrm * c.c_nrm), 6) DESC,
        |        c.c_id) AS rn
        |    FROM q, c) t
        |  WHERE rn <= 2),
        |x AS (
        |  SELECT p.q_id, a.vec_id, a.bucket,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(p.q_emb[i] AS DOUBLE) * a.embedding[i])) / (p.q_nrm * a.nrm) AS cos
        |  FROM asg a JOIN probes p USING (bucket)
        |  WHERE a.vec_id <> p.q_id),
        |r AS (
        |  SELECT q_id, vec_id, bucket, cos,
        |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY round(cos, 6) DESC, vec_id)
        |      AS INTEGER) AS rank
        |  FROM x)
        |SELECT q_id, vec_id, bucket, rank, round(cos, 4) AS sim FROM r WHERE rank <= 5""".stripMargin,

    // the Holt/AR kernels' input path: per-series 30-min DECIMAL means,
    // dense spine, direct-lerp gap fill — hash-matches the in-JVM
    // interpolateBuckets kernel bit for bit (VERDICT r2 item 7)
    "q_holt_prep" ->
      """WITH m AS (
        |  SELECT user_id AS series, CAST(floor(epoch(ts)) AS BIGINT) // 1800 AS b,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT series, min(b) AS mn, max(b) AS mx FROM m GROUP BY 1),
        |spine AS (SELECT series, unnest(generate_series(mn, mx)) AS b FROM bounds),
        |j AS (
        |  SELECT s.series, s.b, m.y FROM spine s
        |  LEFT JOIN m ON s.series = m.series AND s.b = m.b),
        |x AS (
        |  SELECT series, b, y,
        |    last_value(y IGNORE NULLS) OVER (PARTITION BY series ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        |    last_value(CASE WHEN y IS NOT NULL THEN b END IGNORE NULLS) OVER (
        |      PARTITION BY series ORDER BY b
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_b,
        |    first_value(y IGNORE NULLS) OVER (PARTITION BY series ORDER BY b
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        |    first_value(CASE WHEN y IS NOT NULL THEN b END IGNORE NULLS) OVER (
        |      PARTITION BY series ORDER BY b
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
        |  FROM j)
        |SELECT series, b * 1800 AS bucket,
        |  CASE WHEN y IS NOT NULL THEN y
        |       ELSE prev_v + (next_v - prev_v) *
        |         (CAST(b - prev_b AS DOUBLE) / CAST(next_b - prev_b AS DOUBLE))
        |  END AS y
        |FROM x""".stripMargin,

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
