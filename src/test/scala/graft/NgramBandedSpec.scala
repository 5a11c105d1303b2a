package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The banded-minhash prefiltered exact-Jaccard variant: candidate
  * recall vs the exact posting-self-join operator, exactness of the
  * Jaccard values on the pairs both find, and the planted-dup floor. */
class NgramBandedSpec extends SparkTestBase {
  import spark.implicits._

  test("banded pairs are a subset of exact pairs with identical jaccard values") {
    val exact = Dedup.ngramJaccard(spark, sf).collect()
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
    // measured recall: with b=64, r=2 the S-curve gives ~0.60 at the
    // 0.12 edge and >0.99 by 0.3 — require the floor only when the
    // exact set is non-empty at this SF
    if (exact.nonEmpty) {
      val recall = banded.size.toDouble / exact.size
      assert(recall >= 0.5, s"recall $recall (${banded.size}/${exact.size})")
      // high-similarity pairs must essentially never be missed
      val hi = exact.filter(_._2 >= 0.3)
      val hiFound = hi.keys.count(banded.contains)
      if (hi.nonEmpty)
        assert(hiFound.toDouble / hi.size >= 0.9,
          s"high-sim recall $hiFound/${hi.size}")
    }
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
