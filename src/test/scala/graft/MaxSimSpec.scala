package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Late-interaction (MaxSim) retrieval contract: the operator's top-k
  * must be IDENTICAL (ids, ranks, scores) to an independent plain-Scala
  * brute-force reimplementation of Σ_i max_j ⟨q_i, d_j⟩ over the same
  * floor(x·10⁴) token quantization and (score DESC, vec_id) tiebreak;
  * and a planted exact duplicate lands exactly where the ground truth
  * puts it, with the analytically-known self-score. */
class MaxSimSpec extends SparkTestBase {
  import spark.implicits._

  /** Independent reference: quantize → 8×8 reshape → MaxSim, all loops. */
  private def refMaxSim(q: Array[Float], d: Array[Float]): Long = {
    def tok(v: Array[Float], t: Int): Array[Long] =
      (0 until 8).map(i => math.floor(v(t * 8 + i).toDouble * 10000).toLong).toArray
    (0 until 8).map { i =>
      val qi = tok(q, i)
      (0 until 8).map { j =>
        val dj = tok(d, j)
        (0 until 8).map(x => qi(x) * dj(x)).sum
      }.max
    }.sum
  }

  /** Ground-truth top-k per query over the label block. */
  private def refTopK(corpus: Seq[(Long, Int, Array[Float])], queryMod: Int,
      k: Int): Map[Long, Seq[(Long, Long)]] =
    corpus.filter(_._1 % queryMod == 0).map { case (qid, qlab, qv) =>
      qid -> corpus
        .filter(c => c._2 == qlab && c._1 != qid)
        .map(c => (c._1, refMaxSim(qv, c._3)))
        .sortBy { case (id, score) => (-score, id) }
        .take(k)
    }.toMap

  private def loadBase(): Seq[(Long, Int, Array[Float])] =
    Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect().toSeq

  private def runOp(corpus: Seq[(Long, Int, Array[Float])]): Seq[(Long, Long, Int, Long)] =
    Similarity.maxSimTopKVecs(
      corpus.toDF("vec_id", "label", "embedding"), queryMod = 199, k = 5)
      .as[(Long, Long, Int, Long)].collect().toSeq

  test("operator top-5 is identical to the brute-force reference") {
    val base = loadBase()
    val truth = refTopK(base, 199, 5)
    val out = runOp(base)
    assert(out.nonEmpty, "no query rows — queryMod too sparse for fixture")
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == truth.keySet)
    byQ.foreach { case (qid, rows) =>
      val got = rows.sortBy(_._3).map(r => (r._2, r._4))
      assert(got == truth(qid), s"top-5 mismatch for query $qid")
      assert(rows.sortBy(_._3).map(_._3) == (1 to rows.length), "rank gap")
    }
  }

  test("IVF-routed top-5 is identical to an independent probe+score reference") {
    val base = loadBase().sortBy(_._1)
    val n = base.length
    val nc = Similarity.centroidCount(n.toLong)
    val cents = base.filter(_._1 < nc).map(c => (c._1, c._3))
    def dot(a: Array[Float], b: Array[Float]): Double =
      (0 until a.length).map(i => a(i).toDouble * b(i).toDouble).sum
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    // assignment: exact cosine, ties to the lowest c_id (ascending scan)
    val bucketOf = base.map { case (id, _, v) =>
      var bestId = -1L; var bestSim = Double.NegativeInfinity
      cents.foreach { case (cid, cv) =>
        val sim = dot(v, cv) / (nrm(v) * nrm(cv))
        if (sim > bestSim) { bestSim = sim; bestId = cid }
      }
      id -> bestId
    }.toMap
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val truth = base.filter(_._1 < 10).map { case (qid, _, qv) =>
      val probed = cents
        .map { case (cid, cv) => (cid, r6(dot(qv, cv) / (nrm(qv) * nrm(cv)))) }
        .sortBy { case (cid, key) => (-key, cid) }
        .take(2).map(_._1).toSet
      qid -> base
        .filter(c => probed(bucketOf(c._1)) && c._1 != qid)
        .map(c => (c._1, refMaxSim(qv, c._3)))
        .sortBy { case (id, score) => (-score, id) }
        .take(5)
    }.toMap
    val out = Similarity.maxSimTopKIvf(spark, sf)
      .select("q_id", "vec_id", "rank", "maxsim")
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(out.nonEmpty)
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == truth.keySet)
    byQ.foreach { case (qid, rows) =>
      val got = rows.sortBy(_._3).map(r => (r._2, r._4))
      assert(got == truth(qid), s"IVF-routed top-5 mismatch for query $qid")
    }
  }

  test("a planted exact duplicate lands at its ground-truth rank with the self-score") {
    val base = loadBase()
    val orig = base.find(_._1 == 0L).get
    val maxId = base.map(_._1).max
    val planted = base :+ ((maxId + 1, orig._2, orig._3))
    val truth = refTopK(planted, 199, 5)
    val out = runOp(planted).filter(_._1 == 0L).sortBy(_._3)
    assert(out.map(r => (r._2, r._4)) == truth(0L))
    val dup = out.find(_._2 == maxId + 1)
    assert(dup.isDefined, "exact duplicate missing from the original's top-5")
    assert(dup.get._4 == refMaxSim(orig._3, orig._3),
      "duplicate's score must be the analytic self-score")
  }

  test("pair-mass guard refuses pointedly past the exact scorer's domain") {
    // VERDICT r14 #2: the exact form must never silently run n² — above
    // maxScorePairs it fails with the IVF twin named in the message
    val base = loadBase()
    val ex = intercept[IllegalArgumentException] {
      Similarity.maxSimTopKVecs(
        base.toDF("vec_id", "label", "embedding"), queryMod = 199, k = 5,
        maxScorePairs = 1L)
    }
    assert(ex.getMessage.contains("query-candidate pairs"))
    assert(ex.getMessage.contains("maxSimTopKIvf"),
      "guard message must route the caller to the scale path")
    assert(ex.getMessage.contains("maxSimTopKRescore"),
      "guard message must name the exact-rescore twin (r16)")
  }

  test("exact-rescore top-5 equals an independent probe+label+rescore reference") {
    // r16: same query set and same-label contract as the exact gate,
    // candidates bounded to the 2 probed IVF buckets, scores exact
    val base = loadBase().sortBy(_._1)
    val nc = Similarity.centroidCount(base.length.toLong)
    val cents = base.filter(_._1 < nc).map(c => (c._1, c._3))
    def dot(a: Array[Float], b: Array[Float]): Double =
      (0 until a.length).map(i => a(i).toDouble * b(i).toDouble).sum
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val bucketOf = base.map { case (id, _, v) =>
      var bestId = -1L; var bestSim = Double.NegativeInfinity
      cents.foreach { case (cid, cv) =>
        val sim = dot(v, cv) / (nrm(v) * nrm(cv))
        if (sim > bestSim) { bestSim = sim; bestId = cid }
      }
      id -> bestId
    }.toMap
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val truth = base.filter(_._1 % 199 == 0).map { case (qid, qlab, qv) =>
      val probed = cents
        .map { case (cid, cv) => (cid, r6(dot(qv, cv) / (nrm(qv) * nrm(cv)))) }
        .sortBy { case (cid, key) => (-key, cid) }
        .take(2).map(_._1).toSet
      qid -> base
        .filter(c => probed(bucketOf(c._1)) && c._2 == qlab && c._1 != qid)
        .map(c => (c._1, refMaxSim(qv, c._3)))
        .sortBy { case (id, score) => (-score, id) }
        .take(5)
    }.toMap
    val out = Similarity.maxSimTopKRescore(spark, sf)
      .select("q_id", "vec_id", "rank", "maxsim")
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(out.nonEmpty)
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == truth.filter(_._2.nonEmpty).keySet)
    byQ.foreach { case (qid, rows) =>
      val got = rows.sortBy(_._3).map(r => (r._2, r._4))
      assert(got == truth(qid), s"rescore top-5 mismatch for query $qid")
    }
    // every rescored pair the exact block scorer also scored must carry
    // the IDENTICAL integer score (rescoring is exact, routing is not)
    val exact = runOp(base).map(r => (r._1, r._2) -> r._4).toMap
    out.foreach { case (qid, vid, _, score) =>
      exact.get((qid, vid)).foreach { es =>
        assert(es == score, s"score drift vs exact scorer for ($qid, $vid)")
      }
    }
    // and the default cap admits every oracle/bench fixture scale
    assert(runOp(base).nonEmpty)
  }

  test("ADC-prefiltered rescore with an admit-all m equals the rescore twin exactly") {
    // r17: with m >= the corpus size the top-m prune admits every probed
    // candidate, so the ADC variant must reproduce maxSimTopKRescore's
    // output byte-for-byte — proving the prefilter ONLY prunes and never
    // perturbs routing, scoring, or ranking
    val base = loadBase()
    val rescore = Similarity.maxSimTopKRescore(spark, sf)
      .select("q_id", "vec_id", "bucket", "rank", "maxsim")
      .as[(Long, Long, Long, Int, Long)].collect().toSet
    val adcAll = Similarity.maxSimTopKRescoreAdc(spark, sf, m = base.length + 1)
      .select("q_id", "vec_id", "bucket", "rank", "maxsim")
      .as[(Long, Long, Long, Int, Long)].collect().toSet
    assert(adcAll == rescore,
      "admit-all ADC prefilter must be a no-op relative to the rescore twin")
  }

  test("ADC-prefiltered rescore emits exactly-scored, contract-respecting rows at default m") {
    // the emitted top-k must remain EXACTLY scored (the late-interaction
    // integer kernel, byte-equal to the independent reference) and every
    // emitted candidate must respect the routing + same-label contract;
    // what m trades is membership recall only
    val base = loadBase().sortBy(_._1)
    val byId = base.map(c => c._1 -> c).toMap
    val nc = Similarity.centroidCount(base.length.toLong)
    val cents = base.filter(_._1 < nc).map(c => (c._1, c._3))
    def dot(a: Array[Float], b: Array[Float]): Double =
      (0 until a.length).map(i => a(i).toDouble * b(i).toDouble).sum
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    val bucketOf = base.map { case (id, _, v) =>
      var bestId = -1L; var bestSim = Double.NegativeInfinity
      cents.foreach { case (cid, cv) =>
        val sim = dot(v, cv) / (nrm(v) * nrm(cv))
        if (sim > bestSim) { bestSim = sim; bestId = cid }
      }
      id -> bestId
    }.toMap
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val probedOf = base.filter(_._1 % 199 == 0).map { case (qid, _, qv) =>
      qid -> cents
        .map { case (cid, cv) => (cid, r6(dot(qv, cv) / (nrm(qv) * nrm(cv)))) }
        .sortBy { case (cid, key) => (-key, cid) }
        .take(2).map(_._1).toSet
    }.toMap
    val out = Similarity.maxSimTopKRescoreAdc(spark, sf)
      .select("q_id", "vec_id", "rank", "maxsim")
      .as[(Long, Long, Int, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.sortBy(_._3).map(_._3) == (1 to rows.length), "rank gap")
    }
    out.foreach { case (qid, vid, _, score) =>
      val (_, qlab, qv) = byId(qid)
      val (_, clab, cv) = byId(vid)
      assert(clab == qlab, s"label contract broken for ($qid, $vid)")
      assert(probedOf(qid).contains(bucketOf(vid)),
        s"candidate ($qid, $vid) outside the probed buckets")
      assert(score == refMaxSim(qv, cv),
        s"emitted score not the exact kernel's for ($qid, $vid)")
    }
  }
}
