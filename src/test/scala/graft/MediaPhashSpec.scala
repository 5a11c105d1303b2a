package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

/** Perceptual-hash media near-dup: the fixture's planted near-copies
  * (id ≡ 2 mod 10 draws from id-2's byte stream — both members even,
  * i.e. the SAME kind) must be recovered by the kind-blocked pass, and
  * unrelated media must not flood the pair set. Plus the adversarial
  * invariance contract of aHash itself: diffuse low-amplitude byte
  * damage is absorbed, concentrated same-cell damage flips exactly the
  * damaged cell's bit. */
class MediaPhashSpec extends SparkTestBase {

  test("planted within-kind near-copies are recovered; pairs stay sparse") {
    val pairs = Media.mediaPhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => id % 10 == 2 && id > 1)
      .map(id => (id - 2, id)).toSet
    val found = planted.count(pairs.contains)
    // aHash over near-identical byte streams (3 low-bit flips + two
    // extra tail bytes) — the grid barely moves, so most planted pairs
    // sit within the guaranteed Hamming <= 3 radius
    assert(found.toDouble / planted.size >= 0.7,
      s"recovered $found/${planted.size} planted near-copies")
    // and the pair set is dominated by plants, not random collisions
    // (64 random bits collide at h<=3 with probability ~2^-46)
    val extras = pairs.size - found
    assert(extras <= planted.size / 2,
      s"${extras} non-planted pairs vs ${planted.size} planted")
  }

  test("kind blocking: every emitted pair is same-kind (even ids pair with even)") {
    // kind = "image" iff id is even; the blocked join must never emit a
    // mixed-parity pair, planted or collided
    val pairs = Media.mediaPhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a % 2 == b % 2 },
      s"cross-kind pairs: ${pairs.filter { case (a, b) => a % 2 != b % 2 }.take(5).toSeq}")
  }

  test("phash is deterministic and near-copies are close in Hamming") {
    val h1 = Media.phash(Media.mediaTable(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val h2 = Media.phash(Media.mediaTable(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(h1 == h2)
    val planted = h1.keys.filter(id => id % 10 == 2 && id > 1 && h1.contains(id - 2))
    val dists = planted.map(id => java.lang.Long.bitCount(h1(id) ^ h1(id - 2)))
    assert(dists.nonEmpty)
    // median planted distance far below the ~32 of unrelated hashes
    assert(dists.toSeq.sorted.apply(dists.size / 2) <= 6, s"dists ${dists.toSeq.sorted}")
  }

  test("adversarial: concentrated same-cell damage deterministically forces " +
      "that cell's bit; spread and low-amplitude damage is absorbed") {
    // fixed seeded payload, 320 bytes = 5 bytes per histogram cell
    val rnd = new java.util.Random(424242L)
    val base = new Array[Byte](320)
    rnd.nextBytes(base)
    val h0 = Media.aHash64(base)

    // CONCENTRATED: drive EVERY byte feeding cell 5 (positions ≡ 5 mod
    // 64) to max / to zero. A maxed cell (5/320 ≈ 1.56 %) is above any
    // possible grid mean and a zeroed cell below it, so the damaged
    // cell's bit is forced BY CONSTRUCTION — the deterministic guarantee,
    // independent of the payload. The grid mean moves by cellDelta/64,
    // which can flip a few BORDERLINE cells too (measured: 2 bits total
    // for this seed), so localization is "within the near-dup radius",
    // not "exactly one bit".
    val toMax = base.clone(); val toMin = base.clone()
    for (p <- base.indices if p % 64 == 5) {
      toMax(p) = 0xFF.toByte; toMin(p) = 0x00.toByte
    }
    val hMax = Media.aHash64(toMax)
    val hMin = Media.aHash64(toMin)
    assert(((hMax >> 5) & 1L) == 1L, "maxed cell must sit above the grid mean")
    assert(((hMin >> 5) & 1L) == 0L, "zeroed cell must sit below the grid mean")
    assert(java.lang.Long.bitCount(h0 ^ hMax) <= 3 &&
      java.lang.Long.bitCount(h0 ^ hMin) <= 3,
      s"single-cell damage escaped the near-dup radius: " +
        s"${java.lang.Long.bitCount(h0 ^ hMax)}/${java.lang.Long.bitCount(h0 ^ hMin)} bits")

    // SPREAD: five 0x80-flips, one per DISTINCT cell — each cell moves
    // by only ≤128/255/320 ≈ 0.16 %, inside the typical |cell − mean|
    // gap, so the hash stays within the near-dup radius (measured: 2
    // bits for this seed vs a guaranteed forced flip above).
    val spread = base.clone()
    for (j <- 0 until 5) spread(j * 64 + j) = (spread(j * 64 + j) ^ 0x80).toByte
    val hSpread = Media.aHash64(spread)
    assert(java.lang.Long.bitCount(h0 ^ hSpread) <= 3,
      s"diffuse damage flipped ${java.lang.Long.bitCount(h0 ^ hSpread)} bits")

    // LOW-AMPLITUDE: low-bit XOR of 32 bytes across 32 cells (±1/255
    // each before normalization) — the planted-fixture perturbation
    // class — must be FULLY absorbed (hash-identical).
    val lowAmp = base.clone()
    for (j <- 0 until 32) lowAmp(j * 2) = (lowAmp(j * 2) ^ 0x01).toByte
    assert(Media.aHash64(lowAmp) == h0, "low-bit flips must be absorbed")
  }
}
