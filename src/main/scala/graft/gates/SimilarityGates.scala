package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast
import OracleCtes._

/** Similarity search: cosine top-k, IVF, PQ/IVFADC, MRL, int8 — gate rows: `queries` entries + their DuckDB
  * oracles (keys without an oracle are spec-pinned; see SparkEntry
  * scaladoc for the determinism contract). */
object SimilarityGates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LLM-pipeline: similarity search
    "q_cosine_topk"    -> ((s: SparkSession, d: String) => Similarity.cosineTopK(s, d)),
    "q_ann_ivf"        -> ((s: SparkSession, d: String) => Similarity.annIvf(s, d)),
    // index persisted to parquet and reloaded — same answers, same oracle
    "q_ann_index_io"   -> ((s: SparkSession, d: String) => Similarity.annIvfIndexIO(s, d)),
    // incremental index maintenance: base build + one-batch append under
    // frozen centroids answers identically to the one-shot build
    "q_ann_index_append" -> ((s: SparkSession, d: String) => Similarity.annIvfIndexAppend(s, d)),
    // contrastive pair mining: per anchor, top-k same-label positives +
    // top-k nearest WRONG-label hard negatives
    "q_hard_negatives" -> ((s: SparkSession, d: String) => Similarity.hardNegatives(s, d)),
    // measured recall@k of Lloyd-refined IVF vs brute-force ground truth
    // (oracled r13: the lloydCtes chain replays the refined centroids;
    // AnnRecallSpec additionally pins the floor)
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
    // (oracled r13: pqCtes unrolls the 3 training rounds + encode;
    // PqSpec additionally pins the contracts)
    "q_pq_topk"        -> ((s: SparkSession, d: String) => Similarity.pqTopK(s, d)),
    // IVF-PQ composition: probe nprobe buckets, ADC over codes only
    "q_ivf_pq_topk"    -> ((s: SparkSession, d: String) => Similarity.ivfPqTopK(s, d)),
    // late-interaction (ColBERT MaxSim) multi-vector top-k — integer
    // token quantization makes the whole score exact, full hash oracle
    "q_maxsim"         -> ((s: SparkSession, d: String) => Similarity.maxSimTopK(s, d)),
    // the PRODUCTION MaxSim form: fixed broadcast query set routed
    // through the IVF coarse buckets (nprobe·√N candidates per query,
    // linear corpus cost) instead of q_maxsim's n²/199 label blocks
    "q_maxsim_ivf"     -> ((s: SparkSession, d: String) => Similarity.maxSimTopKIvf(s, d)),
    // exact-rescore over IVF candidates (r16): q_maxsim's query set and
    // same-label contract, candidates bounded by nprobe coarse buckets,
    // scoring still the exact integer MaxSim kernel — the path the
    // exact gate's pair-mass guard names for corpora above its cap
    "q_maxsim_rescore" -> ((s: SparkSession, d: String) => Similarity.maxSimTopKRescore(s, d)),
    // IVFADC-prefiltered rescore (r17): same routing and same-label
    // contract, but candidates are PQ-ADC proxy-scored first and only
    // the top-m per query reach the exact integer MaxSim kernel — the
    // emitted top-k stays exactly scored; the prune cost is 4 LUT
    // lookups/candidate vs the 8×8 late-interaction scorer
    "q_maxsim_rescore_adc" -> ((s: SparkSession, d: String) => Similarity.maxSimTopKRescoreAdc(s, d)),
    // sign-bit binary quantization: 64-d float → ONE long, Hamming
    // (bit_count ⊕) top-m prefilter, exact-cosine rerank — 32× smaller
    // hot set, integer candidate math, full oracle
    "q_ann_binary"     -> ((s: SparkSession, d: String) => Similarity.annBinary(s, d)),
    // hybrid sparse+dense retrieval: doc-to-doc BM25 ranks ⊕ cosine
    // ranks fused by reciprocal-rank fusion (1/(60+r)), integer-quantized
    // lexical scores so the whole ranking is hash-exact
    "q_hybrid_rrf"     -> ((s: SparkSession, d: String) => Similarity.hybridRrf(s, d)),
  )

  /** The IVF probe/search oracle — shared verbatim by q_ann_ivf and
    * q_ann_index_io: the persisted-reloaded index must answer
    * IDENTICALLY to the in-memory one. */
  private val AnnIvfOracle: String =
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
        |SELECT q_id, vec_id, bucket, rank, round(cos, 4) AS sim FROM r WHERE rank <= 5""".stripMargin

  /** PQ-ADC scoring + deterministic ranking over `pq_enc`/`pq_qt`
    * (OracleCtes.pqCtes/pqAdcCte), optionally routed through IVF probes.
    * The score fold replays the kernel's left-to-right accumulation:
    * `list(dotv ORDER BY sub)` (prefixed with the exact q·c_b constant
    * in the residual variant). */
  private def pqRankSql(scCte: String, cols: String): String =
    s"""$scCte,
       |pq_rk AS (
       |  SELECT *, round(score, 6) AS sim_key,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY round(score, 6) DESC, vec_id) AS INTEGER) AS rank
       |  FROM pq_sc)
       |SELECT $cols, rank, sim_key AS adc_score
       |FROM pq_rk WHERE rank <= 5""".stripMargin

  /** The IVF-PQ top-k CTE chain (raw variant: seed centroids, cosine
    * probes, ADC over raw-vector codebooks) up to and including the
    * ranked result — shared verbatim by `q_ivf_pq_topk` and the recall
    * gate so the approximate side can never drift between them. */
  private val IvfPqTopkSql: String = {
    val probeSim = "list_sum(list_transform(generate_series(1, 64), " +
      "i -> CAST(nq.embedding[i] AS DOUBLE) * c.c_emb[i])) / (nq.nrm * c.c_nrm)"
    s"""n AS (
       |  SELECT vec_id, embedding,
       |    sqrt(list_sum(list_transform(generate_series(1, 64),
       |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
       |  FROM embeddings),
       |c0 AS (
       |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n
       |  WHERE vec_id < ($SqrtNcExpr)),
       |${assignCte("ivf_a", "c0")},
       |${pqCtes("embeddings")},
       |${pqAdcCte("embeddings")},
       |probe AS (
       |  SELECT q_id, bucket FROM (
       |    SELECT nq.vec_id AS q_id, c.c_id AS bucket,
       |      row_number() OVER (PARTITION BY nq.vec_id ORDER BY
       |        $probeSim DESC, c.c_id) AS rn
       |    FROM n nq, c0 c WHERE nq.vec_id < 10) t
       |  WHERE rn <= 2),
       |${pqRankSql(
           """pq_sc AS (
             |  SELECT p.q_id, e.vec_id, a.bucket,
             |    list_sum(list(q.dotv ORDER BY q.sub)) AS score
             |  FROM pq_enc e
             |  JOIN ivf_a a ON a.vec_id = e.vec_id
             |  JOIN probe p ON p.bucket = a.bucket
             |  JOIN pq_qt q ON q.q_id = p.q_id AND q.sub = e.sub AND q.code = e.code
             |  WHERE e.vec_id <> p.q_id
             |  GROUP BY p.q_id, e.vec_id, a.bucket)""".stripMargin,
           "q_id, vec_id, bucket")}""".stripMargin
  }

  /** The residual (IVFADC) top-k chain: Lloyd-refined coarse centroids
    * (OracleCtes.lloydCtes — the SemDeDup device), float residuals,
    * residual-trained codebooks (seedSkip = nc), probes by normalized
    * cosine with the exact q·c_b constant folded FIRST into the score
    * (the kernel seeds its accumulator with it). */
  private val IvfPqResidualTopkSql: String = {
    val rawDot = "list_sum(list_transform(generate_series(1, 64), " +
      "i -> CAST(nq.embedding[i] AS DOUBLE) * c.c_emb[i]))"
    s"""${lloydCtes(SqrtNcExpr)},
       |res_src AS (
       |  SELECT a.vec_id, a.bucket,
       |    list_transform(generate_series(1, 64),
       |      i -> CAST(CAST(a.embedding[i] AS DOUBLE) - CAST(c.c_emb[i] AS DOUBLE) AS FLOAT)) AS embedding
       |  FROM af a JOIN c2 c ON c.c_id = a.bucket),
       |${pqCtes("res_src", SqrtNcExpr)},
       |${pqAdcCte("embeddings")},
       |probe AS (
       |  SELECT q_id, bucket, qc FROM (
       |    SELECT nq.vec_id AS q_id, c.c_id AS bucket, $rawDot AS qc,
       |      row_number() OVER (PARTITION BY nq.vec_id ORDER BY
       |        $rawDot / (nq.nrm * c.c_nrm) DESC, c.c_id) AS rn
       |    FROM n nq, c2 c WHERE nq.vec_id < 10) t
       |  WHERE rn <= 2),
       |${pqRankSql(
           """pq_sc AS (
             |  SELECT p.q_id, e.vec_id, r.bucket,
             |    list_sum([first(p.qc)] || list(q.dotv ORDER BY q.sub)) AS score
             |  FROM pq_enc e
             |  JOIN res_src r ON r.vec_id = e.vec_id
             |  JOIN probe p ON p.bucket = r.bucket
             |  JOIN pq_qt q ON q.q_id = p.q_id AND q.sub = e.sub AND q.code = e.code
             |  WHERE e.vec_id <> p.q_id
             |  GROUP BY p.q_id, e.vec_id, r.bucket)""".stripMargin,
           "q_id, vec_id, bucket")}""".stripMargin
  }

  /** Exact dot-product top-5 ground truth (Similarity.dotTopK) —
    * terminal CTE `truth(q_id, vec_id)`. */
  private val DotTruthCte: String =
    """truth AS (
      |  SELECT q_id, vec_id FROM (
      |    SELECT q.vec_id AS q_id, e.vec_id,
      |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
      |        round(list_sum(list_transform(generate_series(1, 64),
      |          i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))), 6) DESC,
      |        e.vec_id) AS trank
      |    FROM embeddings e JOIN embeddings q
      |      ON q.vec_id < 10 AND e.vec_id <> q.vec_id) t
      |  WHERE trank <= 5)""".stripMargin

  /** recall@k readout over `truth` and a `got(q_id, vec_id)` CTE —
    * Similarity's truth LEFT JOIN got → per-query hit count. */
  private val RecallSelect: String =
    """SELECT t.q_id, CAST(count(*) AS BIGINT) AS k_truth,
      |  CAST(COALESCE(sum(CASE WHEN g.vec_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS n_hits,
      |  CAST(COALESCE(sum(CASE WHEN g.vec_id IS NOT NULL THEN 1 END), 0) AS DOUBLE)
      |    / count(*) AS recall_at_k
      |FROM truth t LEFT JOIN got g ON t.q_id = g.q_id AND t.vec_id = g.vec_id
      |GROUP BY t.q_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // ---- PQ / IVF-PQ / recall family (r13): the codebooks are the same
    // deterministic seeded-Lloyd scheme the SemDeDup oracle replays
    // (lowest-id seeds, vec_id-ordered float means, carry-over), so the
    // whole family unrolls: 3 training rounds, L2-argmin encode (ties →
    // lowest code), per-query ADC tables, and the (round(score,6) DESC,
    // vec_id) rank key. ----
    "q_pq_topk" ->
      s"""WITH ${pqCtes("embeddings")},
        |${pqAdcCte("embeddings")},
        |${pqRankSql(
            """pq_sc AS (
              |  SELECT q.q_id, e.vec_id,
              |    list_sum(list(q.dotv ORDER BY q.sub)) AS score
              |  FROM pq_enc e JOIN pq_qt q ON q.sub = e.sub AND q.code = e.code
              |  WHERE e.vec_id <> q.q_id
              |  GROUP BY q.q_id, e.vec_id)""".stripMargin,
            "q_id, vec_id")}""".stripMargin,

    "q_ivf_pq_topk" -> s"WITH $IvfPqTopkSql",

    "q_ivf_pq_topk_res" -> s"WITH $IvfPqResidualTopkSql",

    // recall readouts share the top-k chains verbatim (got = the ranked
    // result re-selected) against the exact-dot truth
    "q_ivf_pq_recall" ->
      s"""WITH ivfpq AS (WITH $IvfPqTopkSql),
        |got AS (SELECT q_id, vec_id FROM ivfpq),
        |$DotTruthCte
        |$RecallSelect""".stripMargin,

    "q_ivf_pq_recall_res" ->
      s"""WITH ivfpq AS (WITH $IvfPqResidualTopkSql),
        |got AS (SELECT q_id, vec_id FROM ivfpq),
        |$DotTruthCte
        |$RecallSelect""".stripMargin,

    // IVF (Lloyd-refined coarse, the lloydCtes chain) vs brute-force
    // cosine truth — annRecall at gate defaults (refineIters = 2)
    "q_ann_recall" ->
      s"""WITH ${lloydCtes(SqrtNcExpr)},
        |probes AS (
        |  SELECT q_id, bucket FROM (
        |    SELECT nq.vec_id AS q_id, c.c_id AS bucket,
        |      row_number() OVER (PARTITION BY nq.vec_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(nq.embedding[i] AS DOUBLE) * c.c_emb[i])) / (nq.nrm * c.c_nrm), 6) DESC,
        |        c.c_id) AS rn
        |    FROM n nq, c2 c WHERE nq.vec_id < 10) t
        |  WHERE rn <= 2),
        |got AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT p.q_id, a.vec_id,
        |      row_number() OVER (PARTITION BY p.q_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(nq.embedding[i] AS DOUBLE) * a.embedding[i])) / (nq.nrm * a.nrm), 6) DESC,
        |        a.vec_id) AS rn
        |    FROM probes p
        |    JOIN af a ON a.bucket = p.bucket
        |    JOIN n nq ON nq.vec_id = p.q_id
        |    WHERE a.vec_id <> p.q_id) t
        |  WHERE rn <= 5),
        |truth AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT q.vec_id AS q_id, e.vec_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(q.embedding[i] AS DOUBLE) * e.embedding[i])) / (q.nrm * e.nrm), 6) DESC,
        |        e.vec_id) AS trank
        |    FROM n e JOIN n q ON q.vec_id < 10 AND e.vec_id <> q.vec_id) t
        |  WHERE trank <= 5)
        |$RecallSelect""".stripMargin,

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

    "q_ann_ivf" -> AnnIvfOracle,
    "q_ann_index_io" -> AnnIvfOracle,
    "q_ann_index_append" -> AnnIvfOracle,

    "q_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_emb, label AS q_label
        |  FROM embeddings WHERE vec_id < 10),
        |x AS (
        |  SELECT q.q_id, e.vec_id, e.label,
        |    CASE WHEN e.label = q.q_label THEN 'positive'
        |      ELSE 'hard_negative' END AS pair_type,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(q.q_emb[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.q_id),
        |r AS (
        |  SELECT q_id, pair_type, vec_id, label, cos,
        |    CAST(row_number() OVER (PARTITION BY q_id, pair_type
        |      ORDER BY round(cos, 6) DESC, vec_id) AS INTEGER) AS rank
        |  FROM x)
        |SELECT q_id, pair_type, rank, vec_id, label, round(cos, 4) AS sim
        |FROM r WHERE rank <= 3""".stripMargin,

    // MaxSim: 8×8 token reshape, floor(x·10⁴) integer quantization —
    // every dot/max/sum is exact integer math on both engines
    "q_maxsim" ->
      """WITH toks AS (
        |  SELECT vec_id, label, i // 8 AS t, i % 8 AS dim,
        |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 10000) AS BIGINT) AS v
        |  FROM embeddings, range(64) r(i)),
        |qt AS (SELECT * FROM toks WHERE vec_id % 199 = 0),
        |dots AS (
        |  SELECT q.vec_id AS q_id, d.vec_id AS did, q.t AS qt_i, d.t AS dt_j,
        |    CAST(SUM(q.v * d.v) AS BIGINT) AS dot
        |  FROM qt q JOIN toks d
        |    ON q.dim = d.dim AND q.label = d.label AND d.vec_id <> q.vec_id
        |  GROUP BY 1, 2, 3, 4),
        |best AS (SELECT q_id, did, qt_i, MAX(dot) AS m FROM dots GROUP BY 1, 2, 3),
        |score AS (SELECT q_id, did, CAST(SUM(m) AS BIGINT) AS maxsim
        |  FROM best GROUP BY 1, 2),
        |ranked AS (
        |  SELECT q_id, did AS vec_id, maxsim,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY maxsim DESC, did) AS INTEGER) AS rank
        |  FROM score)
        |SELECT q_id, vec_id, rank, maxsim FROM ranked WHERE rank <= 5""".stripMargin,

    // production MaxSim: AnnIvfOracle's seed-centroid assignment + probe
    // CTEs select the candidates; the integer MaxSim CTEs score them
    "q_maxsim_ivf" ->
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
        |  SELECT vec_id, c_id AS bucket FROM (
        |    SELECT n.vec_id, c.c_id,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(n.embedding[i] AS DOUBLE) * c.c_emb[i])) / (n.nrm * c.c_nrm) DESC,
        |        c.c_id) AS rn
        |    FROM n, c) t
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM n WHERE vec_id < 10),
        |probes AS (
        |  SELECT q_id, c_id AS bucket FROM (
        |    SELECT q.q_id, c.c_id,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(q.q_emb[i] AS DOUBLE) * c.c_emb[i])) / (q.q_nrm * c.c_nrm), 6) DESC,
        |        c.c_id) AS rn
        |    FROM q, c) t
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT p.q_id, a.vec_id, a.bucket
        |  FROM asg a JOIN probes p USING (bucket)
        |  WHERE a.vec_id <> p.q_id),
        |toks AS (
        |  SELECT vec_id, i // 8 AS t, i % 8 AS dim,
        |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 10000) AS BIGINT) AS v
        |  FROM embeddings, range(64) r(i)),
        |dots AS (
        |  SELECT cd.q_id, cd.vec_id, cd.bucket, qt.t AS qt_i, dt.t AS dt_j,
        |    CAST(SUM(qt.v * dt.v) AS BIGINT) AS dot
        |  FROM cand cd
        |  JOIN toks qt ON qt.vec_id = cd.q_id
        |  JOIN toks dt ON dt.vec_id = cd.vec_id AND dt.dim = qt.dim
        |  GROUP BY 1, 2, 3, 4, 5),
        |best AS (SELECT q_id, vec_id, bucket, qt_i, MAX(dot) AS m
        |  FROM dots GROUP BY 1, 2, 3, 4),
        |score AS (SELECT q_id, vec_id, bucket, CAST(SUM(m) AS BIGINT) AS maxsim
        |  FROM best GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT q_id, vec_id, bucket, maxsim,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY maxsim DESC, vec_id) AS INTEGER) AS rank
        |  FROM score)
        |SELECT q_id, vec_id, bucket, rank, maxsim FROM ranked WHERE rank <= 5""".stripMargin,

    // exact-rescore MaxSim: the q_maxsim_ivf probe/assignment CTEs with
    // q_maxsim's % 199 query set, a label-equality candidate filter, and
    // the same integer MaxSim scoring CTEs
    "q_maxsim_rescore" ->
      """WITH n AS (
        |  SELECT vec_id, label, embedding,
        |    sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |c AS (
        |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n
        |  WHERE vec_id < LEAST(4096, GREATEST(4,
        |    CAST(round(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)))),
        |asg AS (
        |  SELECT vec_id, label, c_id AS bucket FROM (
        |    SELECT n.vec_id, n.label, c.c_id,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(n.embedding[i] AS DOUBLE) * c.c_emb[i])) / (n.nrm * c.c_nrm) DESC,
        |        c.c_id) AS rn
        |    FROM n, c) t
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb, nrm AS q_nrm
        |  FROM n WHERE vec_id % 199 = 0),
        |probes AS (
        |  SELECT q_id, q_label, c_id AS bucket FROM (
        |    SELECT q.q_id, q.q_label, c.c_id,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(q.q_emb[i] AS DOUBLE) * c.c_emb[i])) / (q.q_nrm * c.c_nrm), 6) DESC,
        |        c.c_id) AS rn
        |    FROM q, c) t
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT p.q_id, a.vec_id, a.bucket
        |  FROM asg a JOIN probes p USING (bucket)
        |  WHERE a.vec_id <> p.q_id AND a.label = p.q_label),
        |toks AS (
        |  SELECT vec_id, i // 8 AS t, i % 8 AS dim,
        |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 10000) AS BIGINT) AS v
        |  FROM embeddings, range(64) r(i)),
        |dots AS (
        |  SELECT cd.q_id, cd.vec_id, cd.bucket, qt.t AS qt_i, dt.t AS dt_j,
        |    CAST(SUM(qt.v * dt.v) AS BIGINT) AS dot
        |  FROM cand cd
        |  JOIN toks qt ON qt.vec_id = cd.q_id
        |  JOIN toks dt ON dt.vec_id = cd.vec_id AND dt.dim = qt.dim
        |  GROUP BY 1, 2, 3, 4, 5),
        |best AS (SELECT q_id, vec_id, bucket, qt_i, MAX(dot) AS m
        |  FROM dots GROUP BY 1, 2, 3, 4),
        |score AS (SELECT q_id, vec_id, bucket, CAST(SUM(m) AS BIGINT) AS maxsim
        |  FROM best GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT q_id, vec_id, bucket, maxsim,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY maxsim DESC, vec_id) AS INTEGER) AS rank
        |  FROM score)
        |SELECT q_id, vec_id, bucket, rank, maxsim FROM ranked WHERE rank <= 5""".stripMargin,

    // ADC-prefiltered rescore: the q_maxsim_rescore chain with the
    // q_pq_topk codebook/encode CTEs composed in — per-(query, sub, code)
    // LUT dot products (qt), candidate ADC = the sub-ordered double sum
    // (list_sum(list ORDER BY sub) replays Spark's fixed s = 0..3 fold),
    // top-m prune on (round(adc, 6) DESC, vec_id), then the exact integer
    // MaxSim CTEs over the pruned candidate set only
    "q_maxsim_rescore_adc" ->
      s"""WITH n AS (
        |  SELECT vec_id, label, embedding,
        |    sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
        |  FROM embeddings),
        |c AS (
        |  SELECT vec_id AS c_id, embedding AS c_emb, nrm AS c_nrm FROM n
        |  WHERE vec_id < LEAST(4096, GREATEST(4,
        |    CAST(round(sqrt((SELECT count(*) FROM embeddings))) AS BIGINT)))),
        |asg AS (
        |  SELECT vec_id, label, c_id AS bucket FROM (
        |    SELECT n.vec_id, n.label, c.c_id,
        |      row_number() OVER (PARTITION BY n.vec_id ORDER BY
        |        list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(n.embedding[i] AS DOUBLE) * c.c_emb[i])) / (n.nrm * c.c_nrm) DESC,
        |        c.c_id) AS rn
        |    FROM n, c) t
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb, nrm AS q_nrm
        |  FROM n WHERE vec_id % 199 = 0),
        |probes AS (
        |  SELECT q_id, q_label, c_id AS bucket FROM (
        |    SELECT q.q_id, q.q_label, c.c_id,
        |      row_number() OVER (PARTITION BY q.q_id ORDER BY
        |        round(list_sum(list_transform(generate_series(1, 64),
        |          i -> CAST(q.q_emb[i] AS DOUBLE) * c.c_emb[i])) / (q.q_nrm * c.c_nrm), 6) DESC,
        |        c.c_id) AS rn
        |    FROM q, c) t
        |  WHERE rn <= 2),
        |cand AS (
        |  SELECT p.q_id, a.vec_id, a.bucket
        |  FROM asg a JOIN probes p USING (bucket)
        |  WHERE a.vec_id <> p.q_id AND a.label = p.q_label),
        |${pqCtes("embeddings")},
        |qt AS (
        |  SELECT q.vec_id AS q_id, c.sub, c.code,
        |    list_reduce(list_transform(generate_series(1, 16),
        |      i -> CAST(q.embedding[i + c.sub * 16] AS DOUBLE) * c.cw[i]), (u, v) -> u + v) AS dotv
        |  FROM embeddings q JOIN pq_cb3 c ON TRUE
        |  WHERE q.vec_id % 199 = 0),
        |adc AS (
        |  SELECT cd.q_id, cd.vec_id, cd.bucket,
        |    list_sum(list(qt.dotv ORDER BY qt.sub)) AS adc
        |  FROM cand cd
        |  JOIN pq_enc e ON e.vec_id = cd.vec_id
        |  JOIN qt ON qt.q_id = cd.q_id AND qt.sub = e.sub AND qt.code = e.code
        |  GROUP BY 1, 2, 3),
        |pruned AS (
        |  SELECT q_id, vec_id, bucket FROM (
        |    SELECT q_id, vec_id, bucket,
        |      row_number() OVER (PARTITION BY q_id
        |        ORDER BY round(adc, 6) DESC, vec_id) AS rn
        |    FROM adc) t
        |  WHERE rn <= 32),
        |toks AS (
        |  SELECT vec_id, i // 8 AS t, i % 8 AS dim,
        |    CAST(floor(CAST(embedding[i + 1] AS DOUBLE) * 10000) AS BIGINT) AS v
        |  FROM embeddings, range(64) r(i)),
        |dots AS (
        |  SELECT cd.q_id, cd.vec_id, cd.bucket, qt2.t AS qt_i, dt.t AS dt_j,
        |    CAST(SUM(qt2.v * dt.v) AS BIGINT) AS dot
        |  FROM pruned cd
        |  JOIN toks qt2 ON qt2.vec_id = cd.q_id
        |  JOIN toks dt ON dt.vec_id = cd.vec_id AND dt.dim = qt2.dim
        |  GROUP BY 1, 2, 3, 4, 5),
        |best AS (SELECT q_id, vec_id, bucket, qt_i, MAX(dot) AS m
        |  FROM dots GROUP BY 1, 2, 3, 4),
        |score AS (SELECT q_id, vec_id, bucket, CAST(SUM(m) AS BIGINT) AS maxsim
        |  FROM best GROUP BY 1, 2, 3),
        |ranked AS (
        |  SELECT q_id, vec_id, bucket, maxsim,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY maxsim DESC, vec_id) AS INTEGER) AS rank
        |  FROM score)
        |SELECT q_id, vec_id, bucket, rank, maxsim FROM ranked WHERE rank <= 5""".stripMargin,

    // binary quantization: identical sign-bit packing (strict > 0), 64-bit
    // signature, bit_count(xor) Hamming, exact-cosine rerank of the top-20
    "q_ann_binary" ->
      """WITH sg AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm,
        |    -- bit 63 is the sign bit: DuckDB's checked 1 << 63 overflows,
        |    -- so it contributes the two's-complement constant (Spark's
        |    -- shiftleft wraps to exactly this value); list_sum goes
        |    -- through HUGEINT, the final value is a valid long
        |    CAST(list_sum(list_transform(generate_series(0, 63),
        |      i -> CASE WHEN embedding[i + 1] <= 0 THEN CAST(0 AS BIGINT)
        |           WHEN i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
        |           ELSE (CAST(1 AS BIGINT) << i) END)) AS BIGINT) AS sig
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, sig AS q_sig
        |  FROM sg WHERE vec_id < 10),
        |h AS (
        |  SELECT q.q_id, e.vec_id, e.embedding, e.nrm, q.q_emb, q.q_nrm,
        |    bit_count(xor(e.sig, q.q_sig)) AS hamming
        |  FROM sg e, q WHERE e.vec_id <> q.q_id),
        |cand AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY hamming, vec_id) AS h_rank FROM h) t
        |  WHERE h_rank <= 20),
        |x AS (
        |  SELECT q_id, vec_id, hamming,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q_emb[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / (q_nrm * nrm) AS cos
        |  FROM cand),
        |r AS (
        |  SELECT q_id, vec_id, hamming, cos,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY round(cos, 6) DESC, vec_id) AS INTEGER) AS rank
        |  FROM x)
        |SELECT q_id, vec_id, hamming, rank, round(cos, 4) AS sim
        |FROM r WHERE rank <= 5""".stripMargin,

    // hybrid RRF: integer-quantized doc-to-doc BM25 rank list ⊕ cosine
    // rank list, fused on floor(Σ 1/(60+r) · 10¹²) with doc_id tiebreak
    "q_hybrid_rrf" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
        |corpus AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS n_tokens FROM dl),
        |qterms AS (SELECT DISTINCT doc_id AS q_id, term FROM toks WHERE doc_id < 5),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE term IN (SELECT DISTINCT term FROM qterms) GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |lexs AS (
        |  SELECT q.q_id, t.doc_id,
        |    CAST(SUM(CAST(floor(
        |      ln((CAST(c.n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |      * (t.tf * (1.2 + 1.0))
        |      / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl
        |          / (CAST(c.n_tokens AS DOUBLE) / c.n_docs)))
        |      * 1000000.0) AS BIGINT)) AS BIGINT) AS lex_score
        |  FROM qterms q JOIN tf t USING (term) JOIN df d USING (term)
        |  JOIN dl l ON l.doc_id = t.doc_id CROSS JOIN corpus c
        |  WHERE t.doc_id <> q.q_id
        |  GROUP BY 1, 2),
        |lexr AS (
        |  SELECT q_id, doc_id, r_lex FROM (
        |    SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY lex_score DESC, doc_id) AS INTEGER) AS r_lex FROM lexs) t
        |  WHERE r_lex <= 20),
        |sx AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS doc_id,
        |    list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(generate_series(1, 64),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) AS cos
        |  FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 5) q
        |  WHERE e.vec_id <> q.vec_id),
        |semr AS (
        |  SELECT q_id, doc_id, r_sem FROM (
        |    SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY round(cos, 6) DESC, doc_id) AS INTEGER) AS r_sem FROM sx) t
        |  WHERE r_sem <= 20),
        |fused AS (
        |  SELECT COALESCE(l.q_id, s.q_id) AS q_id,
        |    COALESCE(l.doc_id, s.doc_id) AS doc_id,
        |    COALESCE(l.r_lex, 0) AS r_lex, COALESCE(s.r_sem, 0) AS r_sem
        |  FROM lexr l FULL JOIN semr s ON l.q_id = s.q_id AND l.doc_id = s.doc_id),
        |scored AS (
        |  SELECT q_id, doc_id, r_lex, r_sem,
        |    (CASE WHEN r_lex > 0 THEN 1.0 / (r_lex + 60) ELSE 0.0 END +
        |     CASE WHEN r_sem > 0 THEN 1.0 / (r_sem + 60) ELSE 0.0 END) AS rrf
        |  FROM fused),
        |ranked AS (
        |  SELECT q_id, doc_id, r_lex, r_sem, rrf,
        |    CAST(row_number() OVER (PARTITION BY q_id
        |      ORDER BY CAST(floor(rrf * 1000000000000.0) AS BIGINT) DESC, doc_id)
        |      AS INTEGER) AS rank
        |  FROM scored)
        |SELECT q_id, doc_id, rank, r_lex, r_sem, round(rrf, 6) AS rrf
        |FROM ranked WHERE rank <= 10""".stripMargin,
  )
}
