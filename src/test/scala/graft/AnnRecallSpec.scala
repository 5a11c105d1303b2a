package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measured-recall gates for the ANN family (VERDICT r5 #4 / r6 #3):
  * the recall@k queries must report numbers a production index would
  * ship with, with floors pinned here.
  *
  * Measured context for the floors (this box, nQueries=10, k=5,
  * nprobe=2): IVF refined recall 0.90 at sf0.001 and sf0.01; IVF seed
  * recall 0.92 / 0.90. The driver's synthetic embeddings are isotropic
  * (no cluster structure, max pairwise cos ≈ 0.5), so Lloyd refinement
  * has no density centers to find and lands within noise of the seeds —
  * a strict refined > seed assertion would pin noise, not behavior; the
  * non-regression ordering at its own parameters is pinned by
  * LayoutSpec's "recall does not regress" test. IVF-PQ ADC recall:
  * 0.36 / 0.42 (m=4, k=16 non-residual encoding — the documented trade);
  * the random-pick baseline at these sizes is k/N ≈ 0.05 / 0.005, so the
  * 0.25 floor is ~10-100× above chance while robust to seed noise. */
class AnnRecallSpec extends SparkTestBase {

  private def meanRecall(df: org.apache.spark.sql.DataFrame): Double =
    df.agg(avg("recall_at_k")).head().getDouble(0)

  test("IVF recall@k: one row per query, refined floor 0.8, values in [0,1]") {
    val refined = Similarity.annRecall(spark, sf, refineIters = 2).cache()
    try {
      val rows = refined.collect()
      assert(rows.length == 10, s"expected 10 query rows, got ${rows.length}")
      rows.foreach { r =>
        assert(r.getAs[Long]("k_truth") == 5L)
        val rec = r.getAs[Double]("recall_at_k")
        assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $r")
        assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("k_truth"))
      }
      val m = meanRecall(refined)
      assert(m >= 0.8, s"refined IVF mean recall $m below 0.8 floor")
    } finally { refined.unpersist(); () }
  }

  test("IVF seed-centroid recall also clears the floor (bucketing, not luck)") {
    val m = meanRecall(Similarity.annRecall(spark, sf, refineIters = 0))
    assert(m >= 0.8, s"seed IVF mean recall $m below 0.8 floor")
  }

  test("IVF-PQ ADC recall is measured, bounded, and far above chance") {
    val df = Similarity.ivfPqRecall(spark, sf).cache()
    try {
      val rows = df.collect()
      assert(rows.length == 10)
      rows.foreach { r =>
        val rec = r.getAs[Double]("recall_at_k")
        assert(rec >= 0.0 && rec <= 1.0, s"recall out of range: $r")
      }
      val m = meanRecall(df)
      assert(m >= 0.25, s"IVF-PQ mean ADC recall $m below 0.25 floor")
    } finally { df.unpersist(); () }
  }

  test("residual (IVFADC) encoding does not lose recall vs raw encoding") {
    // Isolate the ENCODING: same trained coarse quantizer for both sides
    // and probe EVERY bucket, so no recall is won or lost to IVF pruning.
    // (At small nprobe the crude raw codebook can score HIGHER recall by
    // accident — pruning filters out impostors whose ADC scores are
    // inflated — which measures the pruning filter, not the encoding.
    // Measured at sf0.001: probe-all raw 0.20 vs residual 0.30; nprobe=2
    // raw 0.36 rides exactly that artifact.)
    val raw = meanRecall(Similarity.ivfPqRecall(spark, sf,
      nprobe = 4096, refineIters = 2))
    val res = meanRecall(Similarity.ivfPqRecall(spark, sf,
      nprobe = 4096, residual = true, refineIters = 2))
    assert(res >= raw - 1e-9,
      s"residual IVF-PQ recall $res regressed below raw $raw")
    assert(res >= 0.25, s"residual IVF-PQ mean recall $res below 0.25 floor")
  }

  test("residual gate defaults clear the recall floor") {
    val res = meanRecall(Similarity.ivfPqRecall(spark, sf, residual = true))
    assert(res >= 0.25, s"residual IVF-PQ mean recall $res below 0.25 floor")
  }

  test("dot-product ground truth is deterministic and disjoint from the query itself") {
    val t1 = Similarity.dotTopK(spark, sf).collect().map(_.toString).sorted.toSeq
    val t2 = Similarity.dotTopK(spark, sf).collect().map(_.toString).sorted.toSeq
    assert(t1 == t2)
    assert(Similarity.dotTopK(spark, sf)
      .where(col("q_id") === col("vec_id")).count() == 0)
  }

  test("persisted-and-reloaded IVF index answers identically to the in-memory index") {
    // floats round-trip parquet bit-exactly, so the reloaded postings
    // must reproduce every (q_id, vec_id, bucket, rank, sim) row
    val mem = Similarity.annIvf(spark, sf).collect().map(_.toString).sorted.toSeq
    val io = Similarity.annIvfIndexIO(spark, sf).collect().map(_.toString).sorted.toSeq
    assert(io == mem, "index IO round-trip changed answers")
  }
}
