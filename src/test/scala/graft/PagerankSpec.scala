package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** PageRank against closed-form fixtures. Star: solving the symmetric
  * stationary equations with d = 0.85, N = 5 gives center
  * 0.132/0.2775 ≈ 0.47568, leaves ≈ 0.13108. Cycle: every node of a
  * regular graph holds exactly 1/N at every iteration. Isolated node:
  * the (1−d)/N floor. */
class PagerankSpec extends SparkTestBase {

  private def ranksOf(edges: Seq[(Long, Long)], nodes: Seq[Long],
      iters: Int): Map[Long, Double] = {
    val s = spark
    import s.implicits._
    Dedup.pagerank(edges.toDF("a", "b"), nodes.toDF("id"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
  }

  test("star graph: center dominates, leaves tie, values match closed form") {
    val r = ranksOf(Seq(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L),
      0L to 4L, iters = 60)
    assert(math.abs(r(0L) - 0.4756756757) < 1e-3, s"center ${r(0L)}")
    (1L to 4L).foreach(l =>
      assert(math.abs(r(l) - 0.1310810811) < 1e-3, s"leaf $l ${r(l)}"))
    assert(r(0L) > r(1L) * 3)
  }

  test("cycle graph: uniform 1/N at every iteration; mass conserved") {
    val n = 6L
    val edges = (0L until n).map(i => i -> ((i + 1) % n))
    val r = ranksOf(edges, 0L until n, iters = 5)
    r.values.foreach(v => assert(math.abs(v - 1.0 / n) < 1e-8))
    // tolerances absorb the gate output's round(rank, 9) display key
    assert(math.abs(r.values.sum - 1.0) < 1e-7)
  }

  test("isolated node holds the (1-d)/N floor; dangling-free star keeps order") {
    val r = ranksOf(Seq(0L -> 1L), Seq(0L, 1L, 2L), iters = 10)
    assert(math.abs(r(2L) - 0.15 / 3) < 1e-12, s"isolated ${r(2L)}")
    assert(r(0L) == r(1L), "symmetric pair must tie")
  }

  test("triangle counts: K4 is all-clustered, a path has none") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} plus a pendant path 4-5-6
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("a_id", "b_id")
    val r = Dedup.triangleCountsEdges(edges).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getDouble(3))).toMap
    // K4: every vertex sits in C(3,2) = 3 triangles, clustering 1.0
    (1L to 3L).foreach { v =>
      assert(r(v)._2 == 3, s"$v: ${r(v)}")
      assert(math.abs(r(v)._3 - 1.0) < 1e-12)
    }
    // vertex 4 has deg 4 (K4 + pendant): 3 triangles, clustering 0.5
    assert(r(4L) == ((4L, 3L, 0.5)))
    // path vertices: no triangles
    assert(r(5L)._2 == 0 && r(5L)._3 == 0.0)
    assert(r(6L)._2 == 0)
  }

  test("doc pagerank runs over the memoized pair graph with degree attached") {
    val out = Dedup.docPagerank(spark, sf).cache()
    try {
      assert(out.count() == Tables.documents(spark, sf).count())
      assert(out.where(col("rank") <= 0).count() == 0)
      // linked docs (deg > 0) outrank the isolated floor — only
      // checkable if this SF's corpus has any near-dup pairs at all
      if (out.where(col("deg") > 0).count() > 0) {
        val floor = out.where(col("deg") === 0)
          .agg(max("rank")).collect()(0).getDouble(0)
        val linkedMin = out.where(col("deg") > 0)
          .agg(min("rank")).collect()(0).getDouble(0)
        assert(linkedMin > floor)
      }
    } finally { out.unpersist(); () }
  }
}
