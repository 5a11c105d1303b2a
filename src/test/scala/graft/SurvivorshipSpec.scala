package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Survivorship (golden-record consolidation) contract on a planted
  * fixture: multi-source clusters merge provenance correctly, identity
  * tie-breaks are deterministic (min doc_id wins, even when the
  * n_chars attribute ties), and singletons never surface. Plus the
  * SemDeDup production-parameterization claim as a test instead of
  * SCALE.md prose: at FIXED target cluster size (nClusters = n /
  * targetSize), the within-cluster candidate pair space grows ~linearly
  * with the corpus, not ~n^1.5 as under the √n gate default.
  */
class SurvivorshipSpec extends SparkTestBase {
  import spark.implicits._

  test("survivorship merges multi-source clusters and tie-breaks on min doc_id") {
    val prefixA = "A" * 64
    val prefixB = "B" * 64
    val docs = Seq(
      // cluster A: 3 members, 2 sources, 2 langs, min n_chars TIED
      // between doc 7 and doc 10 — identity must go to min doc_id (7)
      // independent of which member carries the min attribute
      (10L, prefixA + " tail one", "crawl-1", "en", 100L),
      (7L,  prefixA + " tail two", "crawl-2", "de", 100L),
      (12L, prefixA + " tail three", "crawl-1", "en", 250L),
      // cluster B: 2 members, single source, one lang
      (3L, prefixB + " x", "crawl-1", "en", 80L),
      (5L, prefixB + " y", "crawl-1", "en", 90L),
      // singleton: must not be reported
      (99L, "unique text with no shared prefix at all", "crawl-3", "fr", 40L)
    ).toDF("doc_id", "text", "source", "lang", "n_chars")

    val out = Dedup.survivorshipDocs(docs).collect()
    assert(out.length == 2, s"expected 2 clusters, got ${out.length}")
    val byCanon = out.map(r => r.getAs[Long]("canonical_doc") -> r).toMap

    val a = byCanon(7L)
    assert(a.getAs[Long]("n_members") == 3L)
    assert(a.getAs[Long]("n_sources") == 2L)
    assert(a.getAs[String]("langs") == "de,en", "language set sorted + deduped")
    assert(a.getAs[Long]("min_chars") == 100L && a.getAs[Long]("max_chars") == 250L)

    val b = byCanon(3L)
    assert(b.getAs[Long]("n_members") == 2L)
    assert(b.getAs[Long]("n_sources") == 1L)
    assert(b.getAs[String]("langs") == "en")
    assert(b.getAs[Long]("min_chars") == 80L && b.getAs[Long]("max_chars") == 90L)
  }

  test("survivorship is deterministic under reshuffled input order") {
    val prefix = "C" * 64
    val docs = Seq(
      (21L, prefix + " p", "s2", "en", 50L),
      (20L, prefix + " q", "s1", "de", 50L),
      (22L, prefix + " r", "s3", "fr", 50L))
    val a = Dedup.survivorshipDocs(docs.toDF("doc_id", "text", "source", "lang", "n_chars"))
      .collect().head
    val b = Dedup.survivorshipDocs(
      docs.reverse.toDF("doc_id", "text", "source", "lang", "n_chars"))
      .collect().head
    assert(a == b, "row must be input-order independent")
    assert(a.getAs[Long]("canonical_doc") == 20L)
    assert(a.getAs[String]("langs") == "de,en,fr")
  }

  test("semDedup fixed-cluster-size parameterization keeps pair space ~linear") {
    // deterministic gaussian corpus; the small fixture is a prefix of the
    // large one so the comparison is a pure scale-up, not a re-draw
    val rnd = new scala.util.Random(42)
    val all = (0 until 1600).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val targetSize = 25

    def pairSpace(vecs: Seq[(Long, Array[Float])]): Double = {
      val e = vecs.toDF("vec_id", "embedding")
        .withColumn("nrm", sqrt(org.apache.spark.sql.graft.VectorExpressions
          .floatDot(col("embedding"), col("embedding"))))
      val nc = vecs.length / targetSize // the production parameterization
      val cents = Similarity.refineCentroids(e, nc, 2)
      Similarity.assignWith(e, cents)
        .groupBy("bucket").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * (col("c") - 1) / 2).as("pairs"))
        .collect().head.getAs[Any]("pairs").toString.toDouble
    }

    val p1 = pairSpace(all.take(400))
    val p2 = pairSpace(all)
    val ratio = p2 / p1
    // 4× corpus: linear pair space → ~4×; the √n default would give ~8×
    // (pairs ~ n^1.5). The bound splits the two regimes with slack for
    // k-means imbalance on noise data.
    assert(ratio >= 2.0 && ratio <= 6.0,
      f"pair-space ratio $ratio%.2f at 4x corpus not ~linear (p1=$p1, p2=$p2)")
  }
}
