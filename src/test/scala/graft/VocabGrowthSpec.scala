package graft

import graft.functions.TextAnalytics

/** Vocab-growth contract: the first-occurrence formulation must equal a
  * plain-Scala per-prefix distinct count (the naive definition), the
  * curve is monotone in all three measures, and the last decile equals
  * the whole-corpus totals. */
class VocabGrowthSpec extends SparkTestBase {
  import spark.implicits._

  test("curve equals the naive per-prefix distinct computation") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val maxId = docs.map(_._1).max
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val expected = (1 to 10).map { k =>
      val c = (maxId + 1) * k / 10
      val prefix = docs.filter(_._1 < c)
      (k, prefix.length.toLong,
        prefix.map(d => toks(d._2).length.toLong).sum,
        prefix.flatMap(d => toks(d._2)).distinct.length.toLong)
    }
    val got = TextAnalytics.vocabGrowth(spark, sf)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == expected)
    // monotone, and the final decile covers the whole corpus
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4, "curve not monotone")
      case _ =>
    }
    assert(got.last._2 == docs.length.toLong)
  }
}
