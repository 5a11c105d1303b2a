package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics

/** Heavy hitters: the Misra-Gries sketch form must EQUAL the exact form
  * (candidates are a guaranteed superset of the φ=1/k items, the recount
  * is exact, the threshold cut identical) — not approximate it. The
  * planted fixture forces the decrement-all branch with k counters far
  * below the vocabulary size and a genuinely skewed distribution. */
class HeavyHittersSpec extends SparkTestBase {

  private def planted = {
    val s = spark
    import s.implicits._
    // 1 dominant term (40%), 3 mid terms (~15% each), 150 singletons —
    // with k = 5 counters the MG maps must evict constantly
    val rows =
      Seq.fill(200)("alpha") ++ Seq.fill(80)("beta") ++
        Seq.fill(75)("gamma") ++ Seq.fill(70)("delta") ++
        (0 until 75).map(i => s"rare$i")
    rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("MG sketch equals the exact heavy hitters on the planted skew (k=5)") {
    val exact = TextAnalytics.heavyHittersDocs(planted, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val sketch = TextAnalytics.heavyHittersSketchDocs(planted, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted fixture must produce heavy hitters")
    assert(sketch == exact, s"sketch $sketch != exact $exact")
    // the dominant term is found with its exact count
    assert(exact.contains(("alpha", 200L)))
    // singletons can never clear a 20% threshold
    assert(!exact.exists(_._1.startsWith("rare")))
  }

  test("MG sketch equals the exact form on the real corpus at the gate k") {
    val exact = TextAnalytics.heavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val sketch = TextAnalytics.heavyHittersSketch(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(sketch == exact)
  }

  test("threshold is the integer φ=1/k cut") {
    val out = TextAnalytics.heavyHittersDocs(planted, k = 5).collect()
    val total = out.head.getLong(2)
    assert(out.forall(r => r.getLong(1) * 5 >= total))
  }

  test("BM25 ranks query-term-rich docs above term-poor docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "spark join filter spark join filter spark"),   // all 3 terms, dense
      (1L, "spark alpha beta gamma delta epsilon zeta"),   // 1 term, long
      (2L, "alpha beta gamma delta"),                      // no query terms
      (3L, "join join join join"),                         // 1 term, saturated
      (4L, "spark join alpha beta")                        // 2 terms
    ).toDF("doc_id", "text")
    val out = TextAnalytics.bm25Docs(docs, Seq("spark", "join", "filter"),
      k1 = 1.2, b = 0.75).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // doc 2 has no query terms — absent from the result entirely
    assert(!byId.contains(2L))
    val score = byId.view.mapValues(_.getAs[Double]("bm25")).toMap
    assert(score(0L) > score(4L), s"3-term doc must beat 2-term doc: $score")
    assert(score(4L) > score(1L), s"2-term doc must beat 1-term doc: $score")
    // matched-term counts are reported
    assert(byId(0L).getAs[Long]("n_query_terms") == 3L)
    assert(byId(4L).getAs[Long]("n_query_terms") == 2L)
    // per-term contributions of unmatched terms are exactly zero
    assert(byId(3L).getAs[Double]("w_spark") == 0.0)
    assert(byId(3L).getAs[Double]("w_filter") == 0.0)
  }
}
