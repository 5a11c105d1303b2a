package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Contracts for the round-11 retrieval additions: trailing-8 EWMA
  * (brute-force per-row recompute), sign-bit binary ANN (independent
  * pack/Hamming/rerank reimplementation + planted-duplicate recovery),
  * and hybrid RRF fusion (rank-list consistency + fusion arithmetic
  * recompute). The DuckDB oracles pin cross-engine exactness at sf0.01;
  * these pin the semantics against plain-Scala references. */
class HybridRetrievalSpec extends SparkTestBase {
  import spark.implicits._

  /** ewma rows decoded with exact epoch-micros (java.sql.Timestamp
    * getTime is ms-truncated — not a safe sort key). */
  private def ewmaRows(): Seq[(Long, Long, Long, Double, Double)] =
    graft.operators.TimeWindows.ewma(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("value"), col("ewma"))
      .as[(Long, Long, Long, Double, Double)].collect().toSeq

  test("ewma matches a per-row brute-force recompute on every series") {
    val rows = ewmaRows()
    val got = rows.map(r => (r._1, r._2) -> r._5).toMap
    rows.groupBy(_._1).foreach { case (_, rs0) =>
      val rs = rs0.sortBy(r => (r._3, r._2))
      rs.zipWithIndex.foreach { case (r, idx) =>
        val window = rs.slice(math.max(0, idx - 7), idx + 1).reverse
        var num = 0.0
        var den = 0.0
        window.zipWithIndex.foreach { case (x, i) =>
          val w = math.pow(0.5, i)
          num += x._4 * w
          den += w
        }
        val expect = num / den
        assert(got((r._1, r._2)) === expect,
          s"ewma mismatch for user ${r._1} event ${r._2}")
      }
    }
  }

  test("ewma stays inside its trailing frame (convex combination)") {
    val rows = ewmaRows()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._2))
      sorted.zipWithIndex.foreach { case (r, idx) =>
        val frame = sorted.slice(math.max(0, idx - 7), idx + 1).map(_._4)
        assert(r._5 >= frame.min - 1e-9 && r._5 <= frame.max + 1e-9,
          "ewma must be a convex combination of its frame")
      }
    }
  }

  /** Plain-Scala binary-ANN reference over a (vec_id, emb) corpus. */
  private def refBinary(corpus: Seq[(Long, Array[Float])], nQueries: Int,
      m: Int, k: Int): Map[Long, Seq[(Long, Int)]] = {
    def sig(v: Array[Float]): Long =
      (0 until 64).foldLeft(0L)((acc, i) => if (v(i) > 0f) acc + (1L << i) else acc)
    def dot(a: Array[Float], b: Array[Float]): Double =
      (0 until 64).map(i => a(i).toDouble * b(i).toDouble).sum
    def nrm(a: Array[Float]): Double = math.sqrt(dot(a, a))
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val sigs = corpus.map { case (id, v) => (id, v, sig(v)) }
    corpus.filter(_._1 < nQueries).map { case (qid, qv) =>
      val qs = sig(qv)
      val cands = sigs.filter(_._1 != qid)
        .map { case (id, v, s2) => (id, v, java.lang.Long.bitCount(s2 ^ qs)) }
        .sortBy { case (id, _, h) => (h, id) }
        .take(m)
      qid -> cands
        .map { case (id, v, h) => (id, h, r6(dot(qv, v) / (nrm(qv) * nrm(v)))) }
        .sortBy { case (id, _, c) => (-c, id) }
        .take(k)
        .map { case (id, h, _) => (id, h) }
    }.toMap
  }

  test("binary ANN top-5 matches the independent pack/Hamming/rerank reference") {
    val corpus = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq
    val truth = refBinary(corpus, nQueries = 10, m = 20, k = 5)
    val out = Similarity.annBinary(spark, sf)
      .select("q_id", "vec_id", "hamming", "rank")
      .as[(Long, Long, Int, Int)].collect().toSeq
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == truth.keySet)
    byQ.foreach { case (qid, rows) =>
      val got = rows.sortBy(_._4).map(r => (r._2, r._3))
      assert(got == truth(qid), s"binary-ANN mismatch for query $qid")
    }
  }

  test("a planted identical vector has Hamming 0 and lands at rank 1") {
    val corpus = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq
    val orig = corpus.find(_._1 == 3L).get
    val maxId = corpus.map(_._1).max
    val planted = (corpus :+ ((maxId + 1, orig._2)))
      .map { case (id, v) => (id, 0, v) }
      .toDF("vec_id", "label", "embedding")
    // route through the public entry by staging the planted corpus
    val dir = Scratch.dir("binary_planted")
    planted.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.annBinary(spark, dir)
      .as[(Long, Long, Int, Int, Double)].collect()
    val hit = out.filter(r => r._1 == 3L && r._2 == maxId + 1)
    assert(hit.length == 1, "planted duplicate missing from query 3's top-k")
    assert(hit.head._3 == 0, "identical vector must be at Hamming 0")
    assert(hit.head._4 == 1, "identical vector must rerank to the top")
  }

  test("hybrid RRF fusion arithmetic and ordering are consistent with its rank lists") {
    val out = Similarity.hybridRrf(spark, sf)
      .select("q_id", "doc_id", "rank", "r_lex", "r_sem", "rrf")
      .as[(Long, Long, Int, Int, Int, Double)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (_, _, _, rLex, rSem, rrf) =>
      val expect =
        (if (rLex > 0) 1.0 / (rLex + 60) else 0.0) +
        (if (rSem > 0) 1.0 / (rSem + 60) else 0.0)
      assert(math.abs(rrf - expect) < 5e-7, "rrf must equal its definition")
      assert(rLex > 0 || rSem > 0, "a fused row must appear in >= 1 list")
      assert(rLex <= 20 && rSem <= 20, "ranks beyond the list bound leaked")
    }
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3) == (1 to sorted.length), s"rank gap for query $q")
      // scores non-increasing in rank
      val scores = sorted.map(r => math.floor(r._6 * 1e6))
      assert(scores == scores.sortBy(-_), s"fusion order broken for query $q")
    }
  }

  test("hybrid RRF: a doc topping BOTH lists outranks single-list docs") {
    val out = Similarity.hybridRrf(spark, sf)
      .select("q_id", "doc_id", "rank", "r_lex", "r_sem")
      .as[(Long, Long, Int, Int, Int)].collect().toSeq
    out.groupBy(_._1).foreach { case (_, rows) =>
      val both = rows.filter(r => r._4 > 0 && r._5 > 0)
      val single = rows.filter(r => r._4 == 0 || r._5 == 0)
      if (both.nonEmpty && single.nonEmpty) {
        // with both ranks <= 20, any two-list rrf >= 2/80 = 0.025 strictly
        // beats any one-list rrf <= 1/61 ~ 0.0164 — so EVERY two-list doc
        // must outrank EVERY single-list doc
        assert(both.map(_._3).max < single.map(_._3).min,
          "every two-list doc must outrank every one-list doc")
      }
    }
  }
}
