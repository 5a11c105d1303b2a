package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Similarity

/** r17 optimization round: the ANN family's shared-build memos
  * (Memo.cached/cachedValue in Similarity) must be INVISIBLE in the
  * results — every memo-path gate frame must equal the direct
  * (unmemoized) build row-for-row. A drift here would silently break the
  * DuckDB oracle parity the driver checks, so the equality is pinned at
  * spec scale for each rewired path. */
class AnnMemoSpec extends SparkTestBase {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("memoized cosineTopK (canonical k=20 build, filtered) equals the direct build at every gate parameterization") {
    Memo.clear(spark)
    for ((q, k) <- Seq((10, 10), (10, 5), (5, 20))) {
      val direct = Similarity.cosineTopKBuild(spark, sf, q, k)
        .select("q_id", "vec_id", "rank", "sim")
      assert(rows(Similarity.cosineTopK(spark, sf, q, k)) == rows(direct),
        s"cosineTopK memo path diverged at (nQueries=$q, k=$k)")
    }
  }

  test("suite-shared IVF assignment (memoAssigned minus label) equals the per-gate assignWith pass") {
    Memo.clear(spark)
    val e = Similarity.withNorm(spark, sf)
    val nc = Similarity.centroidCount(e.count())
    val direct = Similarity.assignToNearestCentroid(e, nc)
      .select("vec_id", "bucket")
    val shared = Similarity.memoAssigned(spark, sf).select("vec_id", "bucket")
    assert(rows(shared) == rows(direct),
      "memoAssigned bucket assignments diverged from assignToNearestCentroid")
  }

  test("memoized ivfPqTopK / residual twin equal their direct builds (the frames q_ivf_pq_recall[_res] now read)") {
    Memo.clear(spark)
    assert(rows(Similarity.ivfPqTopK(spark, sf)) ==
      rows(Similarity.ivfPqTopKBuild(spark, sf, 0, 2, 4, 16, 10, 5, 3, 0)),
      "ivfPqTopK memo path diverged from the direct build")
    assert(rows(Similarity.ivfPqResidualTopK(spark, sf)) ==
      rows(Similarity.ivfPqResidualTopKBuild(spark, sf, 0, 2, 4, 16, 10, 5, 3, 2)),
      "ivfPqResidualTopK memo path diverged from the direct build")
  }

  test("memo results are stable across repeated calls within a session (checkpoint reads, not rebuilds)") {
    Memo.clear(spark)
    val first = rows(Similarity.maxSimTopKRescoreAdc(spark, sf))
    val second = rows(Similarity.maxSimTopKRescoreAdc(spark, sf))
    assert(first == second, "rescore-adc result changed between calls")
  }
}
