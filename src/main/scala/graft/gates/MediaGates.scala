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
    // banded-Hamming blocked (no oracle: PRNG payloads; MediaPhashSpec
    // pins planted-near-copy recovery)
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
  )
}
