package graft

import org.apache.spark.sql.functions._
import graft.ml.Pipelines

/** Seeded k-means topic clustering: planted-blob recovery and report
  * invariants (the no-oracle determinism contract for the gate row). */
class KmeansTopicsSpec extends SparkTestBase {
  import spark.implicits._

  test("planted blobs: each blob lands in one cluster, clusters stay apart") {
    // three tight 8-d blobs, 40 points each, far apart relative to jitter
    val centers = Seq(
      Array.fill(8)(0.0), Array.fill(8)(10.0),
      Array.tabulate(8)(i => if (i % 2 == 0) -10.0 else 10.0))
    val pts = for {
      (c, b) <- centers.zipWithIndex
      i <- 0 until 40
    } yield {
      val rnd = new scala.util.Random(b * 1000 + i)
      ((b * 40 + i).toLong, b,
        c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }
    val df = pts.toDF("vec_id", "blob", "embedding")
    val report = Pipelines.kmeansTopicsVecs(spark, df.select("vec_id", "embedding"), k = 3)
      .collect()
    assert(report.length == 3)
    assert(report.map(_.getAs[Long]("n")).sum == 120L)
    // every cluster has exactly one blob's worth of points — k-means with
    // k = true cluster count on well-separated blobs recovers them
    assert(report.forall(_.getAs[Long]("n") == 40L),
      report.map(r => r.getAs[Long]("n")).mkString(","))
    // tight blobs -> tiny within-cluster SSE vs the 10-unit separations
    assert(report.head.getAs[Double]("training_cost") < 50.0)
    // shares sum to 1 within rounding
    assert(math.abs(report.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
  }

  test("gate report on sf0.001 is deterministic across reruns") {
    def run() = Pipelines.kmeansTopics(spark, sf)
      .orderBy("cluster").collect().map(_.toString).toSeq
    assert(run() == run())
  }
}
