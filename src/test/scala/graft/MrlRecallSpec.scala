package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Matryoshka truncation recall: the measured dim-vs-recall trade must
  * behave like a trade — bounded, improving with dim, and perfect when
  * the "truncation" is the full vector. */
class MrlRecallSpec extends SparkTestBase {

  test("recall is bounded, improves with dim, and is exact at full dim") {
    val out = Similarity.mrlRecall(spark, sf, dims = Seq(8, 32, 64)).cache()
    try {
      val vals = out.collect()
      assert(vals.length == 3 * 10, "one row per (dim, query)")
      assert(vals.forall { r =>
        val rec = r.getAs[Double]("recall_at_k"); rec >= 0.0 && rec <= 1.0
      })
      def mean(dim: Int): Double = {
        val rows = vals.filter(_.getAs[Int]("trunc_dim") == dim)
        rows.map(_.getAs[Double]("recall_at_k")).sum / rows.length
      }
      // dim 64 IS the full vector: the "truncated" search equals truth
      assert(mean(64) == 1.0, s"full-dim recall ${mean(64)} != 1.0")
      assert(mean(32) >= mean(8) - 1e-9,
        s"recall should not degrade with more dims: 32->${mean(32)} 8->${mean(8)}")
      // 8 of 64 dims on isotropic vectors is a real loss — if this were
      // ~1.0 the fixture wouldn't be measuring anything
      assert(mean(8) < 0.9, s"8-dim recall ${mean(8)} suspiciously perfect")
    } finally { out.unpersist(); () }
  }
}
