package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics
import graft.operators.{Layout, TemporalJoins}

/** Round-9 operators: salted exact distinct count, trailing-window
  * z-score anomalies, n-gram novelty attribution, temperature mixture
  * schedule, CountMin probe contract. */
class RoundNineOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("salted distinct count equals the plain COUNT(DISTINCT) per key") {
    val plain = Tables.events(spark, sf)
      .groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Layout.saltedDistinctCount(
        Tables.events(spark, sf), "event_type", "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("anomaly z-score matches a brute-force trailing-window recompute") {
    val got = TemporalJoins.anomalyZscore(spark, sf)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("z")).toMap
    // brute force: per user, sort by (ts, event_id), slide the trailing
    // 20-row frame by hand with plain doubles on the 2-decimal values
    val rows = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val expected = scala.collection.mutable.Map.empty[Long, Double]
    rows.groupBy(_._2).foreach { case (_, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._1))
      for (i <- sorted.indices) {
        val frame = sorted.slice(math.max(0, i - 20), i).map(_._4)
        if (frame.length >= 10) {
          val n = frame.length
          val mean = frame.sum / n
          val variance = frame.map(v => (v - mean) * (v - mean)).sum / (n - 1)
          if (variance > 0) {
            val z = (sorted(i)._4 - mean) / math.sqrt(variance)
            if (math.abs(z) >= 3.0) expected(sorted(i)._1) = z
          }
        }
      }
    }
    // same flag set (the DECIMAL-exact moments equal the plain-double
    // recompute at 2-decimal inputs far from the cut boundary) and the
    // z values agree to the rounding the operator emits
    assert(got.keySet == expected.keySet,
      s"only-op=${got.keySet -- expected.keySet} only-bf=${expected.keySet -- got.keySet}")
    got.foreach { case (id, z) =>
      assert(math.abs(z - expected(id)) < 1e-5, s"event $id: $z vs ${expected(id)}")
    }
    assert(got.nonEmpty, "no anomalies at sf0.001 — fixture too small for the spec")
  }

  test("ngram novelty: planted overlap attributes shingles to the earliest doc") {
    val docs = Seq(
      (1L, "a b c d e f"),        // all 4 shingles first seen here
      (2L, "a b c d x y"),        // shares "a b c"/"b c d" with doc 1
      (3L, "p q r s t u"),        // disjoint: fully novel
      (4L, "a b c d e f")         // exact copy of doc 1: zero novelty
    ).toDF("doc_id", "text")
    val got = TextAnalytics.ngramNoveltyDocs(docs)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novelty"))).toMap
    assert(got(1L) == ((4L, 4L, 1.0)))
    assert(got(2L) == ((4L, 2L, 0.5)))
    assert(got(3L) == ((4L, 4L, 1.0)))
    assert(got(4L) == ((4L, 0L, 0.0)))
  }

  test("mix temperature: weights normalize, alpha=1 degenerates to token shares") {
    val m = TextAnalytics.mixTemperature(spark, sf, alpha = 0.3)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("weight"), r.getAs[Long]("planned_docs")))
    assert(m.nonEmpty)
    val wSum = m.map(_._2._2).sum
    assert(math.abs(wSum - 1.0) < 1e-4, s"weights sum $wSum")
    assert(m.map(_._2._3).sum <= 100000L)
    // alpha < 1 flattens: the largest language's weight must sit BELOW
    // its proportional token share, the smallest ABOVE it
    val total = m.map(_._2._1).sum.toDouble
    val byTok = m.sortBy(_._2._1)
    assert(byTok.last._2._2 < byTok.last._2._1 / total + 1e-9)
    assert(byTok.head._2._2 > byTok.head._2._1 / total - 1e-9)
    // alpha = 1: proportional sampling exactly (up to the 6-decimal round)
    val prop = TextAnalytics.mixTemperature(spark, sf, alpha = 1.0)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    m.foreach { case (lang, (nt, _, _)) =>
      assert(math.abs(prop(lang) - nt / total) < 1e-5)
    }
  }

  test("countmin probe: one-sided error within the eps*N envelope") {
    val width = 2048
    val probes = TextAnalytics.countMinProbe(spark, sf, width = width)
      .collect().map(r => (r.getAs[String]("term"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_est"), r.getAs[Long]("overcount")))
    assert(probes.nonEmpty)
    val nTokens = Tables.documents(spark, sf)
      .select(sum(size(TextAnalytics.tokens(col("text"))))).as[Long].head()
    probes.foreach { case (term, exact, est, over) =>
      assert(est >= exact, s"$term: est $est < exact $exact — CountMin can never undercount")
      assert(over == est - exact)
      // classic bound: overcount <= (e/width)*N per row w.h.p.; min over
      // 4 seeded rows on this fixed corpus sits far inside it
      assert(over <= (math.E / width * nTokens).ceil.toLong,
        s"$term overcount $over vs eps*N bound ${math.E / width * nTokens}")
    }
  }
}
