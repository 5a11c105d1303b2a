package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The simhash blocking recall contract (VERDICT r7 #2): 3-of-6-block
  * keying (Manku-Manber-Sarma) guarantees recall 1 at Hamming ≤ 3
  * (pigeonhole — 3 flips damage ≤ 3 of the 6 blocks, so some 3-block
  * combo stays clean), and the loss above 3 is a measured number,
  * pinned here on planted signatures where the ground truth is known by
  * construction. The planted cases below were chosen so their
  * blocked/not-blocked outcomes are IDENTICAL under the old 4×16
  * banding and the new 3-of-6 keying — the scheme swap (done when the
  * 2¹⁶ key space saturated at the 1.5 M-doc fixture) could not silently
  * shift this spec's expectations. */
class SimhashRecallSpec extends SparkTestBase {
  import spark.implicits._

  test("planted signatures: recall 1.0 at h<=3, exact counts above") {
    // one probe (id 1, sig 0); partners chosen so blocking outcomes are
    // forced: h=0 identical; h=3 all flips in band0 (blocked — bands
    // 1-3 untouched); h=4 one flip per band (NOT blocked); h=4 all
    // flips in band1 (blocked); h=12 three flips per band (NOT blocked)
    val sigs = Seq(
      (1L, 0L),
      (2L, 7L),                                                  // h=3
      (3L, (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)),    // h=4 spread
      (4L, 0xF0000L),                                            // h=4 in band1
      (5L, (7L << 0) | (7L << 16) | (7L << 32) | (7L << 48)),    // h=12 spread
      (6L, 0L)                                                   // h=0
    ).toDF("doc_id", "simhash")
    val out = Dedup.simhashBandRecall(sigs, nProbes = 1)
      .orderBy("hamming")
      .select("hamming", "n_pairs", "n_blocked", "cum_pairs", "cum_blocked", "recall")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((0L, 1L, 1L), (3L, 1L, 1L), (4L, 2L, 1L), (12L, 1L, 0L)))
    // cumulative recall: exactly 1 through h=3; the measured loss after
    val byH = out.map(r => r._1 -> r._6).toMap
    assert(byH(0L) == 1.0 && byH(3L) == 1.0)
    assert(byH(4L) == 0.75)     // 3 of 4 pairs at h<=4 blocked
    assert(byH(12L) == 0.6)     // 3 of 5 pairs at h<=12 blocked
  }

  test("real table: the h<=3 guarantee holds on every observed pair") {
    val rows = Dedup.simhashRecall(spark, sf)
      .where(col("hamming") <= 3)
      .select("n_pairs", "n_blocked").as[(Long, Long)].collect()
    rows.foreach { case (n, b) => assert(n == b, s"pigeonhole violated: $n pairs, $b blocked") }
  }

  test("default simhashNearDup radius matches the guaranteed band recall") {
    // every returned pair must now satisfy h <= 3 (the honest default)
    val pairs = Dedup.simhashNearDup(spark, sf)
    assert(pairs.where(col("hamming") > 3).isEmpty)
  }

  test("fixture invariant behind the xxhash64 oracle: tokens are <= 8 ASCII bytes") {
    // the simhash-family DuckDB oracles replay Spark's xxhash64 in SQL
    // (OracleCtes.xxh64Ctes), whose per-length CASE covers only strings
    // of <= 8 bytes and whose byte access (ord(substr)) equals UTF-8
    // bytes only for ASCII. The driver corpus' whole token vocabulary
    // satisfies both; pin it so a fixture change fails here with a
    // pointed message instead of an opaque oracle NULL/hash mismatch.
    import spark.implicits._
    val offenders = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextAnalytics.tokens(col("text"))).as("t"))
      .distinct()
      .as[String].collect()
      .filter(t => t.getBytes("UTF-8").length > 8 || t.exists(_ > 127))
    assert(offenders.isEmpty,
      "token vocabulary left the xxh64Ctes domain (<= 8 ASCII bytes) — " +
        s"the simhash oracles can no longer replay: ${offenders.take(5).mkString(", ")}")
  }
}
