package graft.gates

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.SensorEtl
import graft.functions.TextAnalytics
import graft.ml.Pipelines
import graft.operators.{Dedup, Relational, Similarity, TemporalJoins, TimeWindows}
import graft.timeseries.HoltForecast
import OracleCtes._

/** Multimodal media: typed binary features, resize, frames,
  * perceptual-hash near-dup — gate rows: `queries` entries + their DuckDB
  * oracles (keys without an oracle are spec-pinned; see SparkEntry
  * scaladoc for the determinism contract). */
object MediaGates {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // multimodal: typed mapPartitions feature pass over opaque binary
    // payloads (SQL-expressible projection; floats stay spec-tested)
    "q_media_features" -> (graft.multimodal.Media.mediaFeatures _),
    // typed resize pass: dim + payload-length arithmetic oracle-checked
    "q_media_resize"   -> (graft.multimodal.Media.mediaResize _),
    // frame-sampling fan-out summary (count + sampled bytes per media)
    "q_media_frames"   -> (graft.multimodal.Media.mediaFrames _),
    // perceptual-hash (aHash) media near-dup — the multimodal dedup leg,
    // banded-Hamming blocked (oracled r13: the PRNG payloads ARE
    // replayable — java.util.Random is a 48-bit LCG; MediaPhashSpec
    // additionally pins planted-near-copy recovery)
    "q_media_phash_neardup" -> ((s: SparkSession, d: String) =>
      graft.multimodal.Media.mediaPhashNearDup(s, d)),
  )

  val oracles: Map[String, String] = Map(
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

    // The "unoracleable PRNG bytes" turned out to be replayable after
    // all (r13): java.util.Random is a 48-bit LCG — seed scramble and
    // steps run in HUGEINT mod 2^48, nextBytes' unsigned byte lanes are
    // integer shifts, the fixture's plant rule (id ≡ 2 mod 10 draws
    // id−2's stream at its own length, bits flipped at positions
    // 0/7/14) is arithmetic, decodeStub's float32 accumulation replays
    // with a per-step CAST(… AS REAL) fold (DuckDB REAL arithmetic is
    // per-op single precision — verified against all 256 byte/255.0f
    // divisions), and the aHash bit for lane 63 wraps through HUGEINT
    // into the signed BIGINT. The banded 3-of-6 keying needs no replay:
    // at Hamming ≤ 3, ≤ 3 of 6 blocks can differ, so ≥ 3 blocks always
    // match and the prefilter is EXHAUSTIVE — the oracle is the exact
    // within-kind pair scan.
    "q_media_phash_neardup" ->
      """WITH RECURSIVE meta AS (
        |  SELECT doc_id AS media_id,
        |    CASE WHEN doc_id % 10 = 2 AND doc_id > 1 THEN doc_id - 2 ELSE doc_id END AS src_id,
        |    CAST(200 + doc_id % 300 AS INT) AS len,
        |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind
        |  FROM documents),
        |seed0 AS (
        |  SELECT media_id, len, kind,
        |    xor(CAST((CAST(src_id AS HUGEINT) * 11400714819323198485 + 2685821657736338717)
        |          % 281474976710656 AS BIGINT), 25214903917) AS st,
        |    src_id <> media_id AS planted
        |  FROM meta),
        |rng AS (
        |  SELECT media_id, len, kind, planted, 0 AS k, st FROM seed0
        |  UNION ALL
        |  SELECT media_id, len, kind, planted, k + 1,
        |    CAST((CAST(st AS HUGEINT) * 25214903917 + 11) % 281474976710656 AS BIGINT)
        |  FROM rng WHERE k < (len + 3) // 4),
        |pbytes AS (
        |  SELECT r.media_id, r.len, r.kind, (r.k - 1) * 4 + g.j AS pos,
        |    CASE WHEN r.planted AND (r.k - 1) * 4 + g.j IN (0, 7, 14)
        |      THEN xor((r.st // 65536 // CAST(power(256, g.j) AS BIGINT)) % 256, 1)
        |      ELSE (r.st // 65536 // CAST(power(256, g.j) AS BIGINT)) % 256 END AS b
        |  FROM rng r, generate_series(0, 3) AS g(j)
        |  WHERE r.k >= 1 AND (r.k - 1) * 4 + g.j < r.len),
        |cellv AS (
        |  SELECT media_id, len, kind, CAST(pos % 64 AS INT) AS c,
        |    CAST(list_reduce(
        |      list(CAST(CAST(b AS REAL) / CAST(255.0 AS REAL) AS REAL) ORDER BY pos),
        |      (u, v) -> CAST(u + v AS REAL)) / CAST(len AS REAL) AS REAL) AS g
        |  FROM pbytes GROUP BY media_id, len, kind, pos % 64),
        |gl AS (
        |  SELECT media_id, kind, list(g ORDER BY c) AS gs FROM cellv
        |  GROUP BY media_id, kind),
        |gm AS (
        |  SELECT *, CAST(list_reduce(gs, (u, v) -> CAST(u + v AS REAL))
        |    / CAST(64.0 AS REAL) AS REAL) AS mean FROM gl),
        |sig AS (
        |  SELECT media_id, kind,
        |    CAST(CASE WHEN us >= 9223372036854775808 THEN us - 18446744073709551616
        |      ELSE us END AS BIGINT) AS sig
        |  FROM (
        |    SELECT media_id, kind,
        |      list_sum(list_transform(generate_series(1, 64),
        |        i -> CASE WHEN gs[i] > mean
        |          THEN CAST(power(2, i - 1) AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)) AS us
        |    FROM gm) t),
        |hp AS (
        |  SELECT a.media_id AS a_id, b.media_id AS b_id,
        |    bit_count(xor(a.sig, b.sig)) AS hamming
        |  FROM sig a JOIN sig b ON a.kind = b.kind AND a.media_id < b.media_id)
        |SELECT a_id, b_id, CAST(hamming AS INT) AS hamming
        |FROM hp WHERE hamming <= 3""".stripMargin,
  )
}
