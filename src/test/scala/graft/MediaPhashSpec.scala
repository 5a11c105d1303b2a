package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Media

/** Perceptual-hash media near-dup: the fixture's planted near-copies
  * (id ≡ 1 mod 10 draws from its predecessor's byte stream) must be
  * recovered, and unrelated media must not flood the pair set. */
class MediaPhashSpec extends SparkTestBase {

  test("planted near-copies are recovered; pairs stay sparse") {
    val pairs = Media.mediaPhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(id => id % 10 == 1 && id > 0)
      .map(id => (id - 1, id)).toSet
    val found = planted.count(pairs.contains)
    // aHash over near-identical byte streams (3 low-bit flips + one
    // extra tail byte) — the grid barely moves, so most planted pairs
    // sit within the guaranteed Hamming <= 3 radius
    assert(found.toDouble / planted.size >= 0.7,
      s"recovered $found/${planted.size} planted near-copies")
    // and the pair set is dominated by plants, not random collisions
    // (64 random bits collide at h<=3 with probability ~2^-46)
    val extras = pairs.size - found
    assert(extras <= planted.size / 2,
      s"${extras} non-planted pairs vs ${planted.size} planted")
  }

  test("phash is deterministic and near-copies are close in Hamming") {
    val h1 = Media.phash(Media.mediaTable(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Media.phash(Media.mediaTable(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == h2)
    val planted = h1.keys.filter(id => id % 10 == 1 && id > 0 && h1.contains(id - 1))
    val dists = planted.map(id => java.lang.Long.bitCount(h1(id) ^ h1(id - 1)))
    assert(dists.nonEmpty)
    // median planted distance far below the ~32 of unrelated hashes
    assert(dists.toSeq.sorted.apply(dists.size / 2) <= 6, s"dists ${dists.toSeq.sorted}")
  }
}
