package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The banded-minhash prefiltered exact-Jaccard variant: candidate
  * recall vs the exact posting-self-join operator, exactness of the
  * Jaccard values on the pairs both find, and the planted-dup floor. */
class NgramBandedSpec extends SparkTestBase {
  import spark.implicits._

  test("shipped defaults sit on the steep S-curve side: recall floor vs exact at j >= 0.2") {
    // exact operator at the banded variant's SHIPPED default threshold
    // (0.2) — the floor asserted here is the one the scaladoc states
    val exact = Dedup.ngramJaccard(spark, sf, threshold = 0.2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    val banded = Dedup.ngramJaccardBanded(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    // every banded pair is an exact pair (verification is exact Jaccard
    // on the same capped postings — no false positives possible) and the
    // values agree bitwise
    banded.foreach { case (pair, j) =>
      assert(exact.contains(pair), s"banded-only pair $pair")
      assert(exact(pair) == j, s"$pair: banded $j vs exact ${exact(pair)}")
    }
    if (exact.nonEmpty) {
      val recall = banded.size.toDouble / exact.size
      info(s"recall at shipped defaults (j >= 0.2): $recall (${banded.size}/${exact.size})")
      // the scaladoc's stated floor: P(candidate) ≈ 0.93 at the 0.2
      // edge, rising steeply — require ≥ 0.9 overall at the defaults
      assert(recall >= 0.9, s"recall $recall (${banded.size}/${exact.size})")
      // and ≥ 0.95 where the curve says ≥ 0.998
      val hi = exact.filter(_._2 >= 0.3)
      val hiFound = hi.keys.count(banded.contains)
      info(s"recall at j >= 0.3: $hiFound/${hi.size}")
      if (hi.nonEmpty)
        assert(hiFound.toDouble / hi.size >= 0.95,
          s"high-sim recall $hiFound/${hi.size}")
    }
  }

  test("fixture invariant behind the hash oracle: no true pair sits in the banded miss zone [0.2, 0.6)") {
    // q_ngram_jaccard_banded's DuckDB oracle is the EXACT tau=0.2 join
    // (DedupGates.scala, shared NgramPairCtes) — hash equality relies on
    // the banded prefilter missing NO true pair. With the shipped
    // signature (k=128, bands=64, r=2) the per-pair miss probability is
    // (1 - j^2)^64: ~4e-13 at j=0.6, ~1e-43 at the fixture's lowest real
    // pair (j=0.889), but 2.4e-3 at j=0.3 — a fixture pair below ~0.6
    // would make the hash check fail opaquely with real probability.
    // Pin the invariant here so a fixture change fails with a pointed
    // message instead.
    val zone = Dedup.ngramJaccard(spark, sf, threshold = 0.2).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("jaccard")))
      .filter { case (_, j) => j < 0.6 }
    assert(zone.isEmpty,
      "fixture now contains true pairs inside the banded-LSH miss zone " +
        s"[0.2, 0.6), where (1-j^2)^64 miss probability is non-negligible " +
        s"— the q_ngram_jaccard_banded hash oracle is no longer safe: " +
        zone.mkString(", "))
  }

  test("the documented lossy zone is real: recall at j = 0.12 is partial, not silent-zero") {
    // 0.12 remains an accepted argument; its measured recall (~0.6-0.8
    // here) is the reason it is no longer the default — pin both sides
    val exact = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.ngramJaccardBanded(spark, sf, threshold = 0.12).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exact.nonEmpty) {
      val recall = banded.size.toDouble / exact.size
      info(s"recall at j >= 0.12 (lossy zone): $recall (${banded.size}/${exact.size})")
      assert(recall >= 0.5 && banded.subsetOf(exact))
    }
  }

  test("memoized dir-level gates equal the build-from-docs variants row-for-row") {
    // r17: the three ngram gates (and minhashBanded) consume ONE memoized
    // postings/sizes/signatures build per (session, dir) — results must be
    // identical to the per-call builders they replaced, and the banded
    // size-bound prefilter must be output-invariant (it drops only pairs
    // whose max achievable jaccard is already below threshold)
    val docs = Tables.documents(spark, sf)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(Dedup.ngramJaccard(spark, sf)) ==
      rows(Dedup.ngramJaccardDocs(docs)))
    assert(rows(Dedup.ngramContainment(spark, sf)) ==
      rows(Dedup.ngramContainmentDocs(docs)))
    assert(rows(Dedup.ngramJaccardBanded(spark, sf)) ==
      rows(Dedup.ngramJaccardBandedDocs(docs)))
    assert(rows(Dedup.minhashBanded(spark, sf)) ==
      rows(Dedup.minhashBandedDocs(docs)))
  }

  test("planted near-dup is found by the banded path") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = "the quick brown fox jumps over the lazy dog again and again tonight"
    val far = "completely different content with no overlapping shingles at all here"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardBandedDocs(docs).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"planted dup missed: ${pairs.mkString(",")}")
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }
}
