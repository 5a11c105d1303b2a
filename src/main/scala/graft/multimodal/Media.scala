package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling (brief north-star): image/audio/video as
  * opaque `binary` columns with typed metadata, processed with the typed
  * Dataset API (`mapPartitions` — the JVM analog of `mapInPandas`: one
  * iterator per partition, batch-shaped, no per-row task overhead).
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `decodeStub` produces a deterministic fake feature vector from the
  * bytes. The Spark-side plumbing — schema, partitioning, batch iterator
  * shape, feature schema — is real and tested; swapping `decodeStub` for
  * a JNI/ffmpeg decoder changes no plan shape.
  *
  * Scale notes: media blobs stay opaque byte arrays end to end (no
  * row-level UDF boxing of pixel data); per-partition processing keeps
  * decoder init (the expensive part of real codecs) amortized across a
  * partition, exactly like a Pandas-UDF batch would.
  */
object Media {

  case class MediaRow(media_id: Long, kind: String, width: Int, height: Int,
      content: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      byte_mean: Double, feature: Array[Float])

  /** STUB decoder: deterministic 8-dim "feature" from raw bytes (byte
    * histogram moments). Replace with a real codec at the same signature. */
  def decodeStub(content: Array[Byte], dim: Int = 8): Array[Float] = {
    val f = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      f(i % dim) += (content(i) & 0xFF) / 255.0f
      i += 1
    }
    if (content.length > 0) { var j = 0; while (j < dim) { f(j) /= content.length; j += 1 } }
    f
  }

  /** Deterministic payload length for a media id — the arithmetic
    * contract the DuckDB oracles re-derive (they can't reproduce the
    * PRNG bytes, but every gate output depends on the payload only
    * through its LENGTH). */
  def payloadLen(mediaId: Long): Int = (200 + mediaId % 300).toInt

  private val fixtureLock = new Object
  private val fixtureWritten =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Binary media fixture: one row per document id with a seeded-PRNG
    * payload of [[payloadLen]] bytes, written ONCE per (JVM, sfDir) as a
    * true `binary` parquet column (PID-suffixed scratch path, cleaned at
    * exit — the testdata dir is read-only). Unlike the earlier UTF-8
    * re-encoding of document text, the payload here is genuinely opaque
    * bytes (full 0-255 range, no character-set structure), so the typed
    * binary plumbing — parquet BYTE_ARRAY scan, Array[Byte] encoder,
    * mapPartitions batches — is exercised on what it claims to carry. */
  def mediaFixturePath(s: SparkSession, d: String): String = fixtureLock.synchronized {
    val path = graft.Scratch.dir(s"mediafix_$d")
    // marked written only AFTER the parquet commit succeeds — if the
    // write throws, the next caller retries instead of reading a
    // missing/partial fixture (all checks serialize under fixtureLock)
    if (!fixtureWritten.contains(path)) {
      import s.implicits._
      graft.Tables.documents(s, d).select(col("doc_id")).as[Long]
        .map { id =>
          // PLANTED NEAR-DUPS for the perceptual-hash gate: every id with
          // id % 10 == 2 draws from id-2's PRNG stream (same first
          // bytes) at its OWN formula length, then 3 low bits flip — a
          // visually-near, not byte-identical, neighbor. Both members
          // are EVEN, i.e. the SAME kind ("image"), so a realistic
          // kind-partitioned dedup pass still finds every plant
          // (r8 ADVICE: the old id-1 pairing was always cross-kind).
          // Lengths stay payloadLen(id), so every length-derived oracle
          // is untouched. (id % 300 ∈ {0, 1} implies id % 10 ∈ {0, 1},
          // never 2, so the source length is always exactly two bytes
          // shorter — no wrap in the length formula.)
          val srcId = if (id % 10 == 2 && id > 1) id - 2 else id
          val rnd = new java.util.Random(srcId * 0x9E3779B97F4A7C15L + 0x2545F4914F6CDD1DL)
          val b = new Array[Byte](payloadLen(id))
          rnd.nextBytes(b)
          if (srcId != id) {
            var j = 0
            while (j < 3 && j < b.length) {
              val p = (j * 7) % b.length
              b(p) = (b(p) ^ 0x01).toByte
              j += 1
            }
          }
          MediaRow(id, if (id % 2 == 0) "image" else "audio",
            (id % 640 + 1).toInt, (id % 480 + 1).toInt, b)
        }
        .write.mode("overwrite").parquet(path)
      fixtureWritten.add(path)
    }
    path
  }

  /** The media table: binary payloads + typed metadata, read back from
    * the parquet fixture (so every downstream op consumes a real binary
    * parquet scan, not an in-plan cast). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRow] = {
    import s.implicits._
    s.read.parquet(mediaFixturePath(s, d))
      .select("media_id", "kind", "width", "height", "content")
      .as[MediaRow]
  }

  /** Feature extraction over partitions: decoder "init" once per
    * partition, then streamed batch processing. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs would init here, once per partition
      rows.map { r =>
        val feat = decodeStub(r.content)
        val mean = if (r.content.isEmpty) 0.0
          else r.content.map(b => (b & 0xFF).toDouble).sum / r.content.length
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong, mean, feat)
      }
    }
  }

  /** Average-hash (aHash) of one payload: decode to a 64-cell feature
    * grid (the stub codec's byte-histogram cells — a real codec would
    * produce an 8×8 downscaled luma grid at the same signature), then
    * one bit per cell: 1 iff the cell exceeds the grid mean.
    *
    * What byte perturbations the hash ABSORBS (MediaPhashSpec pins both
    * directions adversarially): a cell only changes its bit when its
    * normalized histogram value crosses the grid mean, so small-magnitude
    * flips (low-bit XOR: ±1/255 per byte before the 1/len normalization)
    * and perturbations SPREAD across many cells are absorbed — each cell
    * moves by ~1/(255·len). Concentrated large-magnitude damage (driving
    * the bytes of ONE cell, i.e. positions congruent mod 64, toward an
    * extreme) forces that cell's bit by construction — a maxed cell sits
    * above any grid mean, a zeroed cell below it — while the grid-mean
    * coupling (mean moves by cellDelta/64) may flip a few borderline
    * cells, keeping the total within the near-dup Hamming radius. That is
    * the aHash trade: robust to low-amplitude/diffuse noise, sensitive to
    * localized content change. */
  def aHash64(content: Array[Byte]): Long = {
    val g = decodeStub(content, 64)
    var mean = 0.0f
    var i = 0
    while (i < 64) { mean += g(i); i += 1 }
    mean /= 64
    var h = 0L
    var b = 0
    while (b < 64) { if (g(b) > mean) h |= (1L << b); b += 1 }
    h
  }

  /** Perceptual fingerprint per media row ([[aHash64]]): two media whose
    * DECODED content is close get close hashes regardless of
    * container-level byte differences — which is why image dedup hashes
    * pixels, not files. Runs in the same typed mapPartitions shape as
    * [[extractFeatures]]; carries `kind` so downstream dedup can block
    * per media type. */
  def phash(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map(r => (r.media_id, r.kind, aHash64(r.content)))
    }.toDF("media_id", "kind", "phash")
  }

  /** Gate query: perceptual-hash near-dup pairs over the media table —
    * the multimodal leg of the dedup family (exact/minhash/simhash text
    * dedup ⟶ aHash media dedup), sharing `Dedup.bandedHammingPairs`'
    * 3-of-6-block keying and its recall contract (exhaustive at Hamming
    * ≤ 3), BLOCKED BY `kind`: near-dup candidates only form within one
    * media type, the way a production image-dedup pass partitions its
    * corpus (an image and an audio clip are never dedup candidates even
    * if their byte histograms collide). The fixture plants a near-copy at
    * every id ≡ 2 (mod 10) (id-2's byte stream, 3 low-bit flips, own
    * formula length — both members even ⇒ same kind), so the pair set is
    * non-empty by construction WITHIN a block and MediaPhashSpec pins
    * recovery. DuckDB-oracled since r13: java.util.Random is a 48-bit
    * LCG the oracle replays in HUGEINT mod 2^48, decodeStub's float32
    * folds replay with per-step CAST(.. AS REAL), and at Hamming <= 3
    * the 3-of-6 banding is exhaustive, so the oracle is the exact
    * within-kind pair scan (MediaGates.scala). */
  def mediaPhashNearDup(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame =
    graft.operators.Dedup.bandedHammingPairs(
      phash(mediaTable(s, d))
        .select(col("media_id").as("id"), col("phash").as("sig"), col("kind")),
      maxHamming, blockCols = Seq("kind"))

  /** Resize analog: deterministic payload subsampling to the target
    * dimension ratio (every k-th byte for a k× area reduction) with the
    * metadata updated in lockstep — the plumbing shape of a real
    * image-resize stage (new dims + new payload + provenance), stub
    * codec like [[decodeStub]]. Upscaling passes bytes through
    * unchanged (a real codec would interpolate). */
  def resizeStub(content: Array[Byte], scale: Double): Array[Byte] = {
    require(scale > 0.0, s"scale must be positive, got $scale")
    if (scale >= 1.0 || content.isEmpty) content
    else {
      val step = math.max(1, math.round(1.0 / scale).toInt)
      val out = new Array[Byte]((content.length + step - 1) / step)
      var i = 0
      var j = 0
      while (i < content.length) { out(j) = content(i); i += step; j += 1 }
      out
    }
  }

  /** Resize a media table to bounded target dims: per-partition typed
    * pass (codec init amortized, same shape as [[extractFeatures]]),
    * emitting updated metadata + subsampled payload + the original dims
    * for provenance. */
  def resize(media: Dataset[MediaRow], maxW: Int, maxH: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val scale = math.min(1.0, math.min(maxW.toDouble / r.width, maxH.toDouble / r.height))
        val w = math.max(1, math.round(r.width * scale).toInt)
        val h = math.max(1, math.round(r.height * scale).toInt)
        (r.media_id, r.kind, r.width, r.height, w, h,
          resizeStub(r.content, scale * scale)) // area ratio drives bytes
      }
    }.toDF("media_id", "kind", "src_width", "src_height", "width", "height", "content")
  }

  /** Gate query: the SQL-expressible projection of [[extractFeatures]]
    * (media identity, kind, payload byte count) — hash-checks the
    * mediaTable synthesis + the typed mapPartitions feature pass against
    * DuckDB's octet_length over the same UTF-8 payload. The float
    * feature vector and byte_mean stay spec-tested (cross-engine float
    * folds aren't hash-stable). */
  def mediaFeatures(s: SparkSession, d: String): DataFrame =
    extractFeatures(mediaTable(s, d))
      .select(col("media_id"), col("kind"), col("n_bytes"))

  /** Gate query: the SQL-expressible projection of [[resize]] — identity,
    * source/target dims, and the subsampled payload length. The dim and
    * byte-count arithmetic (bound scale, half-up rounding, every-k-th
    * byte) is pure integer/double math DuckDB reproduces exactly, so the
    * typed mapPartitions resize pass is hash-checked end to end; only the
    * payload bytes themselves stay spec-tested. */
  def mediaResize(s: SparkSession, d: String): DataFrame =
    resize(mediaTable(s, d), maxW = 64, maxH = 64)
      .select(col("media_id"), col("kind"), col("src_width"), col("src_height"),
        col("width"), col("height"), length(col("content")).cast("long").as("n_bytes_out"))

  /** Gate query: per-media frame-sampling summary (frame count + total
    * sampled bytes) — the [[sampleFrames]] fan-out and slicing re-derived
    * arithmetically by the oracle. */
  def mediaFrames(s: SparkSession, d: String): DataFrame =
    sampleFrames(mediaTable(s, d))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum("frame_bytes").cast("long").as("total_frame_bytes"))

  /** Frame-sampling analog for "video": slice the payload into fixed-size
    * frames and keep every `stride`-th — pure byte plumbing, shows the
    * explode-with-metadata shape real frame sampling needs. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.content.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (frame, idx) => (r.media_id, idx, frame.length, decodeStub(frame)) }
    }.toDF("media_id", "frame_idx", "frame_bytes", "frame_feature")
  }
}
