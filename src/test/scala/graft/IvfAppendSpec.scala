package graft

import graft.operators.Similarity

/** Incremental-IVF-maintenance contract: building on the base half and
  * appending the second half's postings under the frozen capacity-
  * planned centroids must answer queries BIT-IDENTICALLY to the
  * one-shot q_ann_ivf build over the full corpus (same centroid seeds,
  * same per-vector assignment, same probe/search path). */
class IvfAppendSpec extends SparkTestBase {
  import spark.implicits._

  test("appended index answers identically to the one-shot build") {
    val oneShot = Similarity.annIvf(spark, sf)
      .as[(Long, Long, Long, Int, Double)].collect().toSet
    val appended = Similarity.annIvfIndexAppend(spark, sf)
      .as[(Long, Long, Long, Int, Double)].collect().toSet
    assert(oneShot.nonEmpty)
    assert(appended == oneShot,
      "base-build + batch-append must equal the one-shot index answers")
  }
}
