package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast
import OracleCtes._

/** Dedup family: exact, n-gram Jaccard, clusters, simhash, minhash,
  * decontamination, embedding near-dup — gate rows: `queries` entries + their DuckDB
  * oracles (keys without an oracle are spec-pinned; see SparkEntry
  * scaladoc for the determinism contract). */
object DedupGates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LLM-pipeline: dedup
    "q_dedup_exact"    -> (Dedup.exact _),
    "q_ngram_jaccard"  -> ((s: SparkSession, d: String) => Dedup.ngramJaccard(s, d)),
    // ASYMMETRIC containment pairs (shared/min(|A|,|B|) — the quote /
    // doc-in-doc detector Jaccard's symmetric denominator misses)
    "q_ngram_containment" -> ((s: SparkSession, d: String) => Dedup.ngramContainment(s, d)),
    // transitive closure of the near-dup pair graph (connected
    // components) and the cleaned corpus it induces
    "q_dedup_clusters" -> (Dedup.dedupClusters _),
    // same clusters through O(log n) large-star/small-star rounds (the
    // giant-component path); must agree exactly with the min-label form
    "q_dedup_clusters_ls" -> (Dedup.dedupClustersLogRounds _),
    "q_dedup_clean"    -> (Dedup.dedupClean _),
    // PageRank centrality over the same memoized near-dup pair graph —
    // fixed-point integer iterations, so the DuckDB oracle replays them
    // exactly (PagerankSpec additionally pins closed forms)
    "q_doc_pagerank"   -> ((s: SparkSession, d: String) => Dedup.docPagerank(s, d)),
    // per-node triangles + clustering coefficient over the pair graph
    // (oriented-join count — exact integer ratios, fully oracled)
    "q_triangles"      -> (Dedup.triangleCounts _),
    // train/eval n-gram containment (test-set-leakage guard)
    "q_decontaminate"  -> (Dedup.decontaminate _),
    // Bloom-filter decontamination (bounded-broadcast scale path): the
    // gate emits the exact-contaminated subset + the Bloom superset
    // verdict, oracle-pinned (no-false-negative contract in the hash);
    // BloomDecontaminateSpec still pins the fpp direction
    "q_bloom_decontaminate" -> (Dedup.bloomDecontaminateChecked _),
    // duplicated w-token span report (exact-substring-dedup half of
    // Lee et al. 2022; catches boilerplate whole-doc Jaccard misses)
    "q_dup_spans"      -> ((s: SparkSession, d: String) => Dedup.dupSpans(s, d)),
    // duplicate-span REMOVAL (the rewrite the report only flags):
    // corpus-wide first-occurrence-wins over 8-token tiles, docs
    // reassembled from surviving tiles (C4/Lee-style substring dedup)
    "q_span_scrub"     -> ((s: SparkSession, d: String) => Dedup.spanScrub(s, d)),
    // incremental-ingest dedup triage (batch vs existing corpus)
    "q_incremental_dedup" -> (Dedup.incrementalStatus _),
    // native banded minhash (Dedup.minhashBanded); the spark.ml
    // approxSimilarityJoin form (Dedup.minhashLsh) stays as the API-parity
    // variant but was 60-120 s at sf0.1 vs seconds for the banded form.
    // Oracled r13: FNV-1a + splitmix64 replay in SQL with the kernel's
    // own seeds embedded as literals (see minhashLshOracle)
    "q_minhash_lsh"    -> (Dedup.minhashBanded _),
    // LSH-prefiltered EXACT jaccard — the posting-self-join-free scale
    // path (no oracle: JVM minhash candidates; NgramBandedSpec measures
    // recall vs the exact operator)
    "q_ngram_jaccard_banded" -> ((s: SparkSession, d: String) => Dedup.ngramJaccardBanded(s, d)),
    // simhash family oracled in r13: xxhash64 itself is replayed in SQL
    // (OracleCtes.xxh64Ctes) over the <= 8-byte ASCII token vocabulary —
    // SimhashRecallSpec pins that fixture invariant
    "q_simhash"        -> (Dedup.simhash _),
    "q_simhash_neardup" -> ((s: SparkSession, d: String) => Dedup.simhashNearDup(s, d)),
    // measured band-blocking recall vs exact-Hamming ground truth on a
    // broadcast probe set (oracled r13; SimhashRecallSpec additionally
    // pins recall(<=3) = 1 and the planted losses)
    "q_simhash_recall" -> (Dedup.simhashRecall _),
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
    // SemDeDup: centroid-partitioned semantic dedup — the seeded-Lloyd
    // pipeline is deterministic end to end, so the oracle unrolls both
    // refinement rounds in SQL (semDedupCtes); SemDedupSpec additionally
    // pins recovery/precision/subset and the decision margins
    "q_semdedup"       -> ((s: SparkSession, d: String) => Dedup.semDedup(s, d)),
    // the production parameterization (nClusters = n/25 -> constant
    // expected cluster size -> O(n) pair space) as a first-class
    // measurable query; same unrolled-Lloyd oracle with the linear
    // cluster-count expression, linearity pinned by the SurvivorshipSpec
    // pair test
    "q_semdedup_linear" -> ((s: SparkSession, d: String) => Dedup.semDedupLinear(s, d)),
    // post-split exact-content leakage audit (LCG split + sha256 join)
    "q_split_leakage"  -> (Dedup.splitLeakage _),
    // per-key time-horizon debounce (batch twin of the streaming dedup)
    "q_window_dedup"   -> ((s: SparkSession, d: String) => Dedup.windowDedup(s, d)),
    // boilerplate-prefix clusters (hash-groupBy first pass before any
    // shingle-index near-dup spend)
    "q_prefix_dedup"   -> ((s: SparkSession, d: String) => Dedup.prefixDedup(s, d)),
    // blocked edit-distance record linkage (vocab vs 3rd-char-deleted
    // dirty side; (lang, prefix2) blocking, levenshtein <= 1 verify)
    "q_fuzzy_join"     -> ((s: SparkSession, d: String) => Dedup.fuzzyVocabJoin(s, d)),
    // golden-record consolidation per prefix-dup cluster (merge rules +
    // provenance; the step after detection in entity resolution)
    "q_survivorship"   -> (Dedup.survivorship _),
  )

  /** The minhash-LSH oracle (r13): the "JVM-hash class" fell to the
    * 64-bit wrapping devices in OracleCtes — FNV-1a per distinct shingle
    * is a uniform `list_reduce` fold, the 128 splitmix64 lane seeds and
    * 32 band-key initializers are deterministic CONSTANTS computed from
    * the same MinHashKernel the operator runs (embedded as literals, the
    * P1..P5 discipline), lane mins compare SIGNED longs exactly as the
    * kernel does, band keys fold mix64 over the 4 lanes in j order, and
    * buckets replay the 2..64 cap + within-bucket pairs + the exact
    * matching-lane Jaccard estimate (m/128 is a power-of-two divide —
    * exact in both engines). */
  private def minhashLshOracle: String = {
    import org.apache.spark.sql.graft.MinHashKernel
    def u(v: Long) = java.lang.Long.toUnsignedString(v)
    val seedVals = MinHashKernel.seeds(128).zipWithIndex
      .map { case (s, j) => s"($j, CAST(${u(s)} AS HUGEINT))" }.mkString(", ")
    val binitVals = (0 until 32)
      .map(b => s"($b, CAST(${u(MinHashKernel.mix64(0xBADC0DEL + b))} AS HUGEINT))")
      .mkString(", ")
    s"""WITH toks2 AS (
      |  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS tk
      |  FROM documents),
      |shing AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(tk) - 2),
      |    i -> array_to_string(tk[i:i+2], ' '))) AS sh
      |  FROM toks2 WHERE len(tk) >= 3),
      |svocab AS (SELECT DISTINCT sh FROM shing),
      |fnv AS MATERIALIZED (
      |  SELECT sh, list_reduce(
      |    [CAST(14695981039346656037 AS HUGEINT)] ||
      |      list_transform(generate_series(1, length(sh)),
      |        i -> CAST(ord(substr(sh, i, 1)) AS HUGEINT)),
      |    (h, c) -> ${u64Mul("xor(h, c)", "1099511628211")}) AS f
      |  FROM svocab),
      |dsh AS (SELECT DISTINCT s.doc_id, x.f FROM shing s JOIN fnv x ON x.sh = s.sh),
      |sd(j, sd) AS (VALUES $seedVals),
      |lanes AS MATERIALIZED (
      |  SELECT doc_id, j,
      |    min(CAST(CASE WHEN u >= 9223372036854775808 THEN u - $U64
      |      ELSE u END AS BIGINT)) AS lane
      |  FROM (SELECT d.doc_id, s.j, ${mix64Expr("xor(d.f, s.sd)")} AS u
      |        FROM dsh d, sd s) raw
      |  GROUP BY doc_id, j),
      |sigs AS MATERIALIZED (
      |  SELECT doc_id, list(lane ORDER BY j) AS sig FROM lanes GROUP BY doc_id),
      |bi(b, h0) AS (VALUES $binitVals),
      |bandkeys AS MATERIALIZED (
      |  SELECT l.doc_id, b.b AS band_idx,
      |    list_reduce([b.h0] || list(
      |        CASE WHEN l.lane < 0 THEN CAST(l.lane AS HUGEINT) + $U64
      |          ELSE CAST(l.lane AS HUGEINT) END ORDER BY l.j),
      |      (h, v) -> ${mix64Expr("xor(h, v)")}) AS band_key
      |  FROM lanes l JOIN bi b ON l.j // 4 = b.b
      |  GROUP BY l.doc_id, b.b, b.h0),
      |bucketed AS (
      |  SELECT band_idx, band_key, doc_id,
      |    count(*) OVER (PARTITION BY band_idx, band_key) AS bn
      |  FROM bandkeys),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      |  FROM bucketed a JOIN bucketed b
      |    ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      |      AND a.doc_id < b.doc_id
      |  WHERE a.bn BETWEEN 2 AND 64),
      |est AS (
      |  SELECT c.a_id, c.b_id,
      |    CAST(list_sum(list_transform(generate_series(1, 128),
      |      i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) AS DOUBLE)
      |      / 128 AS est_jaccard
      |  FROM cand c
      |  JOIN sigs sa ON sa.doc_id = c.a_id
      |  JOIN sigs sb ON sb.doc_id = c.b_id)
      |SELECT a_id, b_id, est_jaccard FROM est WHERE est_jaccard >= 0.6""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // ---- the simhash family (r13): xxhash64 replayed in SQL
    // (OracleCtes.xxh64Ctes — 64-bit wrapping arithmetic in HUGEINT,
    // per-length CASE over the ≤ 8-byte ASCII token vocabulary), votes
    // as 64 conditional bit-sums, bands off the unsigned value ----
    "q_simhash" ->
      s"""WITH $SimhashCtes
        |SELECT doc_id, sig AS simhash, band0, band1, band2, band3 FROM sh_sig""".stripMargin,

    // the 3-of-6 block keying is exhaustive at Hamming ≤ 3 (pigeonhole —
    // the q_media_phash_neardup argument), so the oracle is the exact
    // pair scan over the replayed signatures
    "q_simhash_neardup" ->
      s"""WITH $SimhashCtes
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        |FROM sh_sig a JOIN sh_sig b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sig, b.sig)) <= 3""".stripMargin,

    // band-blocking recall curve: 200 lowest-id probes vs all partners,
    // blocked ⟺ ≥ 3 of the 6 Manku-Manber-Sarma blocks equal, cumulative
    // counts over the ≤ 12 Hamming grid
    "q_simhash_recall" ->
      s"""WITH $SimhashCtes,
        |probes AS (SELECT doc_id AS p_id, usig AS p_usig, sig AS p_sig FROM sh_sig
        |  ORDER BY doc_id LIMIT 200),
        |blocks AS (
        |  SELECT p.p_id, s.doc_id,
        |    CAST(bit_count(xor(p.p_sig, s.sig)) AS INT) AS hamming,
        |    (CASE WHEN p.p_usig % 2048 = s.usig % 2048 THEN 1 ELSE 0 END
        |     + CASE WHEN p.p_usig // 2048 % 2048 = s.usig // 2048 % 2048 THEN 1 ELSE 0 END
        |     + CASE WHEN p.p_usig // 4194304 % 2048 = s.usig // 4194304 % 2048 THEN 1 ELSE 0 END
        |     + CASE WHEN p.p_usig // 8589934592 % 2048 = s.usig // 8589934592 % 2048 THEN 1 ELSE 0 END
        |     + CASE WHEN p.p_usig // 17592186044416 % 1024 = s.usig // 17592186044416 % 1024 THEN 1 ELSE 0 END
        |     + CASE WHEN p.p_usig // 18014398509481984 % 1024 = s.usig // 18014398509481984 % 1024 THEN 1 ELSE 0 END
        |    ) >= 3 AS blk
        |  FROM probes p JOIN sh_sig s ON p.p_id < s.doc_id),
        |hg AS (
        |  SELECT hamming, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN blk THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
        |  FROM blocks WHERE hamming <= 12 GROUP BY hamming)
        |SELECT hamming, n_pairs, n_blocked,
        |  CAST(sum(n_pairs) OVER w AS BIGINT) AS cum_pairs,
        |  CAST(sum(n_blocked) OVER w AS BIGINT) AS cum_blocked,
        |  round(CAST(sum(n_blocked) OVER w AS DOUBLE) / CAST(sum(n_pairs) OVER w AS BIGINT), 6) AS recall
        |FROM hg
        |WINDOW w AS (ORDER BY hamming ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_minhash_lsh" -> minhashLshOracle,

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

    // the banded gate SHARES the exact pair CTEs at its own τ = 0.2 —
    // the batch-twin oracle device: the LSH prefilter is candidate
    // generation only (exact jaccard verify downstream), and on this
    // fixture every true pair sits at j ≥ 0.9 where the per-pair band
    // miss probability is (1 − j²)^64 ≈ 1e-46, so banded output ==
    // exact output (NgramBandedSpec pins agreement; the r11 sf30 run
    // measured identical 25 k-pair outputs)
    "q_ngram_jaccard_banded" ->
      s"""WITH $NgramPairCtes
        |SELECT p.a_id, p.b_id, p.shared, sa.n_sh AS a_n, sb.n_sh AS b_n,
        |  CAST(p.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - p.shared AS DOUBLE) AS jaccard
        |FROM pairs p
        |JOIN sizes sa ON p.a_id = sa.doc_id
        |JOIN sizes sb ON p.b_id = sb.doc_id
        |WHERE CAST(p.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - p.shared AS DOUBLE) >= 0.2""".stripMargin,

    // same shared pair CTEs, asymmetric min-denominator score
    "q_ngram_containment" ->
      s"""WITH $NgramPairCtes
        |SELECT p.a_id, p.b_id, p.shared, sa.n_sh AS a_n, sb.n_sh AS b_n,
        |  CAST(p.shared AS DOUBLE) / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
        |FROM pairs p
        |JOIN sizes sa ON p.a_id = sa.doc_id
        |JOIN sizes sb ON p.b_id = sb.doc_id
        |WHERE CAST(p.shared AS DOUBLE) / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.5""".stripMargin,

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

    // fixed-point PageRank replay: the operator carries ranks as integer
    // units of 1e-15 with every step in exact long arithmetic (u//deg
    // contributions, integer sums, damping as *85//100), so five
    // unrolled iterations of the IDENTICAL integer recurrence — floor
    // divisions and all — reproduce the Spark units bit-for-bit; the
    // only float op is the final units/1e15, the same single division in
    // both engines (the q_correlation raw-double discipline)
    "q_doc_pagerank" -> {
      val S = "1000000000000000"
      def iterCte(k: Int) =
        s"""r$k AS (
           |  SELECT ids.id,
           |    (SELECT (15 * $S) // (100 * n) FROM nn)
           |      + (85 * COALESCE(m.mass, 0)) // 100 AS u
           |  FROM ids LEFT JOIN (
           |    SELECT e.dst AS id, CAST(sum(r.u // d.deg) AS BIGINT) AS mass
           |    FROM edges e JOIN r${k - 1} r ON e.src = r.id
           |    JOIN deg d ON d.src = e.src
           |    GROUP BY 1) m ON m.id = ids.id)""".stripMargin
      s"""WITH $NgramPairCtes,
        |$JpairsCte,
        |edges AS (
        |  SELECT a_id AS src, b_id AS dst FROM jpairs
        |  UNION ALL SELECT b_id, a_id FROM jpairs),
        |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        |ids AS (SELECT doc_id AS id FROM documents),
        |nn AS (SELECT count(*) AS n FROM ids),
        |r0 AS (SELECT id, (SELECT $S // n FROM nn) AS u FROM ids),
        |${(1 to 5).map(iterCte).mkString(",\n")}
        |SELECT r5.id AS doc_id,
        |  CAST(r5.u AS DOUBLE) / $S.0 AS "rank",
        |  COALESCE(d.deg, 0) AS deg
        |FROM r5 LEFT JOIN deg d ON d.src = r5.id""".stripMargin
    },

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

    // the exact-contaminated subset (same derivation as q_decontaminate,
    // restricted to contaminated rows) that the Bloom pass — which has
    // no false negatives — must flag as a superset: bloom_flagged is
    // literal TRUE in the oracle, so a filter dropping a truly
    // contaminated doc breaks the row hash
    "q_bloom_decontaminate" ->
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
        |SELECT tot.doc_id, tot.n_sh, h.n_hit,
        |  CAST(h.n_hit AS DOUBLE) / tot.n_sh AS contamination,
        |  TRUE AS bloom_flagged
        |FROM tot JOIN hits h USING (doc_id)
        |WHERE CAST(h.n_hit AS DOUBLE) / tot.n_sh >= 0.5""".stripMargin,

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

    // non-overlapping 8-token tiles (ceil(n/8), ragged tail kept);
    // first occurrence = min (doc_id, tile_idx) — the oracle's
    // row_number equals the Spark side's min-struct agg; string_agg
    // skips the non-kept NULLs and coalesces to '' when every tile of a
    // doc was already seen elsewhere (Spark's array_join on empty)
    "q_span_scrub" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents),
        |tiles AS (
        |  SELECT doc_id,
        |    unnest(generate_series(0, CAST(ceil(len(t) / 8.0) AS BIGINT) - 1)) AS tile_idx,
        |    unnest(list_transform(generate_series(0, CAST(ceil(len(t) / 8.0) AS BIGINT) - 1),
        |      i -> array_to_string(t[i * 8 + 1 : i * 8 + 8], ' '))) AS tile
        |  FROM toks WHERE len(t) >= 1),
        |k AS (
        |  SELECT doc_id, tile_idx, tile,
        |    row_number() OVER (PARTITION BY tile ORDER BY doc_id, tile_idx) = 1 AS keep
        |  FROM tiles)
        |SELECT doc_id, count(*) AS n_tiles,
        |  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  COALESCE(string_agg(CASE WHEN keep THEN tile END, ' ' ORDER BY tile_idx), '')
        |    AS clean_text
        |FROM k GROUP BY 1""".stripMargin,

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

    // SemDeDup replayed decision-for-decision: √N lowest-id seeds, two
    // unrolled Lloyd rounds (ordered double sums → float means), final
    // nearest-centroid assignment, within-cluster lower-id drop at
    // τ = 0.95. Output columns are integers/booleans only, so the hash
    // needs decision equality, not float bit-equality — and both engines
    // run the identical IEEE sequence anyway (the q_embed_neardup
    // argument, one level deeper).
    "q_semdedup" ->
      s"""WITH ${semDedupCtes(
            "LEAST(4096, GREATEST(4, CAST(round(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)))")}
        |SELECT a.vec_id AS vec_id, a.bucket AS cluster,
        |  d.dup_of IS NULL AS keep,
        |  COALESCE(d.n_dups, 0) AS n_dups, d.dup_of
        |FROM af a LEFT JOIN sd_dropped d ON a.vec_id = d.vec_id""".stripMargin,

    // same pipeline, production cluster count (⌊n/25⌋ — constant
    // expected cluster size). Both semdedup oracles replay the FLAT
    // argmax; semDedupVecs switches to the approximate hierarchical
    // assignment above nc = 512 (~12,800 embeddings for this form) —
    // SemDedupSpec's oracle-scale bound test pins nc <= 512 at every
    // Verify scale so fixture growth fails pointedly (r13 ADVICE #1)
    "q_semdedup_linear" ->
      s"""WITH ${semDedupCtes(
            "GREATEST(4, CAST((SELECT count(*) FROM embeddings) // 25 AS BIGINT))")}
        |SELECT a.vec_id AS vec_id, a.bucket AS cluster,
        |  d.dup_of IS NULL AS keep,
        |  COALESCE(d.n_dups, 0) AS n_dups, d.dup_of
        |FROM af a LEFT JOIN sd_dropped d ON a.vec_id = d.vec_id""".stripMargin,

    // same LCG split as q_stratified_split (engine-independent integer
    // math) + sha256 content identity: holdout docs with a train twin.
    // corpus = documents + the planted re-crawl (every 7th doc again
    // under doc_id + 10000)
    "q_split_leakage" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000 AS doc_id, text FROM documents
        |  WHERE doc_id % 7 = 0),
        |docs AS (
        |  SELECT doc_id, sha256(text) AS text_hash,
        |    CASE WHEN ((doc_id % 2147483648) * 1103515245 + 12345)
        |        % 2147483648 % 100 < 80 THEN 'train'
        |      WHEN ((doc_id % 2147483648) * 1103515245 + 12345)
        |        % 2147483648 % 100 < 90 THEN 'val'
        |      ELSE 'test' END AS split
        |  FROM corpus),
        |train AS (
        |  SELECT text_hash, count(*) AS n_train_copies,
        |    min(doc_id) AS first_train_doc
        |  FROM docs WHERE split = 'train' GROUP BY 1)
        |SELECT d.doc_id, d.split, d.text_hash, t.n_train_copies,
        |  t.first_train_doc
        |FROM docs d JOIN train t USING (text_hash)
        |WHERE d.split <> 'train'""".stripMargin,

    // raw-neighbor debounce: LAG over the (user, type) series, keep when
    // no same-key event fired within the previous 60 s (ties → event_id)
    "q_window_dedup" ->
      """WITH lagged AS (
        |  SELECT event_id, ts, user_id, event_type, value,
        |    lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_us
        |  FROM events)
        |SELECT event_id, ts, user_id, event_type, value
        |FROM lagged
        |WHERE prev_us IS NULL OR epoch_us(ts) - prev_us > 60000000""".stripMargin,

    // 64-char prefix clusters; n_distinct_full separates template
    // boilerplate from plain exact copies
    "q_prefix_dedup" ->
      """SELECT sha256(substring(text, 1, 64)) AS prefix_hash,
        |  count(*) AS n_docs,
        |  count(DISTINCT sha256(text)) AS n_distinct_full,
        |  min(doc_id) AS canonical_doc
        |FROM documents
        |GROUP BY 1 HAVING count(*) > 1""".stripMargin,

    // both engines derive the identical dirty side from the corpus
    // vocabulary (3rd char deleted), so the whole linkage — blocking,
    // length prefilter, integer edit distance — is hash-checkable
    "q_fuzzy_join" ->
      """WITH vocab AS (
        |  SELECT lang, tok AS token, count(*) AS c_token FROM (
        |    SELECT lang,
        |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        |    FROM documents) raw
        |  WHERE len(tok) >= 4 GROUP BY 1, 2),
        |dirty AS (
        |  SELECT DISTINCT lang,
        |    substr(token, 1, 2) || substr(token, 4) AS query_term
        |  FROM vocab)
        |SELECT v.lang, v.token, d.query_term,
        |  CAST(levenshtein(v.token, d.query_term) AS INT) AS dist, v.c_token
        |FROM vocab v JOIN dirty d
        |  ON v.lang = d.lang
        |  AND substr(v.token, 1, 2) = substr(d.query_term, 1, 2)
        |WHERE abs(len(v.token) - len(d.query_term)) <= 1
        |  AND levenshtein(v.token, d.query_term) <= 1""".stripMargin,

    "q_survivorship" ->
      """SELECT sha256(substring(text, 1, 64)) AS prefix_hash,
        |  count(*) AS n_members,
        |  min(doc_id) AS canonical_doc,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  array_to_string(list_sort(list(DISTINCT lang)), ',') AS langs,
        |  min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars
        |FROM documents
        |GROUP BY 1 HAVING count(*) > 1""".stripMargin,
  )
}
