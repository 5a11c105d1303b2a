package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup}

/** Round-11 batch-3 contracts: asymmetric n-gram containment (planted
  * quote recovery — the pair Jaccard misses) and robust median/MAD
  * outliers (brute-force percentile recompute). */
class RoundElevenOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("a planted quote is recovered at containment 1.0 where Jaccard stays low") {
    val big = (0 until 40).map(i => s"tok$i").mkString(" ")
    val quote = (10 until 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, big), (2L, quote)).toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentDocs(docs, threshold = 0.5, maxDf = 100L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(cont.length == 1, s"expected exactly the planted pair, got $cont")
    val (aId, bId, shared, aN, bN, c) = cont.head
    assert((aId, bId) == (1L, 2L))
    assert(shared == 8 && bN == 8, "all 8 quote shingles must be contained")
    assert(c == 1.0, "full containment")
    // the same pair under symmetric Jaccard: 8 / (38 + 8 - 8) = 0.2105...
    val jac = shared.toDouble / (aN + bN - shared).toDouble
    assert(jac < 0.25, s"Jaccard must miss what containment catches ($jac)")
  }

  test("containment >= jaccard for every candidate pair (min vs union denominator)") {
    val docs = Tables.documents(spark, sf)
    val cont = Dedup.ngramContainmentDocs(docs, threshold = 0.0, maxDf = 100L)
      .select("a_id", "b_id", "containment")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val jacc = Dedup.ngramJaccardDocs(docs, threshold = 0.0, maxDf = 100L)
      .select("a_id", "b_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(jacc.nonEmpty)
    assert(jacc.map(j => (j._1, j._2)).toSet == cont.keySet,
      "both scores must rank the identical candidate pair set")
    jacc.foreach { case (a, b, j) =>
      assert(cont((a, b)) >= j, s"containment < jaccard for ($a,$b)")
    }
  }

  test("mad outliers match a brute-force interpolated-percentile recompute") {
    val rows = Tables.events(spark, sf)
      .select("event_type", "value").as[(String, Double)].collect().toSeq
    def q50(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = pos.toInt
      val frac = pos - lo
      if (lo + 1 < s.length) s(lo) + (s(lo + 1) - s(lo)) * frac else s(lo)
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = rows.groupBy(_._1).map { case (t, rs) =>
      val vs = rs.map(_._2)
      val med = r4(q50(vs))
      val mad = r4(q50(vs.map(v => math.abs(v - med))))
      val nOut = vs.count(v => math.abs(v - med) > 3.0 * 1.4826 * mad)
      t -> (vs.length.toLong, med, mad, nOut.toLong)
    }
    val got = Analytics.madOutliers(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (t, e) =>
      assert(got(t) == e, s"mad report mismatch for type $t: got ${got(t)}, want $e")
    }
    // a median/MAD cut must flag SOMETHING on heavy-ish tails but never most
    val flagged = got.values.map(_._4).sum
    val total = got.values.map(_._1).sum
    assert(flagged.toDouble / total < 0.2, "MAD cut must not flag a fifth of the data")
  }
}
