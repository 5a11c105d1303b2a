package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** SemDeDup contract: planted exact duplicates are always recovered
  * (identical vectors share a nearest centroid), every dropped vector
  * really has a lower-id partner at cosine ≥ tau (precision 1), and the
  * flagged set is a subset of the brute-force all-pairs ground truth
  * (the clustered search may only MISS cross-cluster pairs, never
  * invent one). */
class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def cos(x: Array[Float], y: Array[Float]): Double = {
    var d = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < x.length) {
      d += x(i).toDouble * y(i).toDouble
      nx += x(i).toDouble * x(i).toDouble
      ny += y(i).toDouble * y(i).toDouble
      i += 1
    }
    d / (math.sqrt(nx) * math.sqrt(ny))
  }

  test("semDedup recovers planted exact duplicates and never over-drops") {
    val base = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    // plant: 300 := copy of 3, 301 := copy of 47 (ids above the corpus
    // range so the lower-id originals stay canonical)
    val maxId = base.keys.max
    val planted = base + ((maxId + 1) -> base(3L)) + ((maxId + 2) -> base(47L))
    val e = planted.toSeq.toDF("vec_id", "embedding")
      .withColumn("nrm", sqrt(org.apache.spark.sql.graft.VectorExpressions
        .floatDot(col("embedding"), col("embedding"))))
    val tau = 0.95
    val out = Dedup.semDedupVecs(e, tau = tau).collect()
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap

    // planted copies must be dropped with the original as dup_of ancestor
    assert(!byId(maxId + 1).getAs[Boolean]("keep"), "planted copy of 3 kept")
    assert(!byId(maxId + 2).getAs[Boolean]("keep"), "planted copy of 47 kept")
    assert(byId(3L).getAs[Boolean]("keep") && byId(47L).getAs[Boolean]("keep"),
      "originals must stay canonical")

    // precision: every dropped vector has a true lower-id partner >= tau
    val eps = 1e-9 // float-sum associativity slack vs the codegen'd dot
    out.filter(!_.getAs[Boolean]("keep")).foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val dupOf = r.getAs[Long]("dup_of")
      assert(dupOf < id, s"$id dup_of $dupOf not lower")
      assert(cos(planted(id), planted(dupOf)) >= tau - eps,
        s"$id flagged against $dupOf below tau")
    }

    // subset of brute force: clustering may only miss pairs, not add
    val ids = planted.keys.toSeq.sorted
    val bruteDropped = ids.filter(b =>
      ids.exists(a => a < b && cos(planted(a), planted(b)) >= tau - eps)).toSet
    val gotDropped = out.filter(!_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(gotDropped.subsetOf(bruteDropped),
      s"invented pairs: ${gotDropped -- bruteDropped}")
  }

  test("fixture invariant behind the hash oracle: comfortable decision margins at both gate parameterizations") {
    // q_semdedup / q_semdedup_linear are DuckDB-oracled by replaying the
    // seeded-Lloyd pipeline (OracleCtes.semDedupCtes). The output is
    // integers/booleans, so hash equality needs DECISION equality: the
    // argmax over centroid cosines and the cos >= 0.95 compares must land
    // the same way in both engines. Both run the identical IEEE sequence,
    // but a fixture whose best/second-best centroid sims tie to ~1e-15,
    // or whose pair cosines graze tau, would make the oracle fragile to
    // any future expression re-ordering. Pin the margins (measured:
    // argmax >= 2e-6, nearest pair cosine 0.49 vs tau 0.95) so a fixture
    // change fails here with a pointed message, not as an opaque hash
    // mismatch.
    val e = Similarity.withNorm(spark, sf)
    val n = e.count()
    val vecs = e.select("vec_id", "embedding", "nrm")
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
    def dot(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < x.length) { d += x(i).toDouble * y(i).toDouble; i += 1 }
      d
    }
    for (nc <- Seq(Similarity.centroidCount(n), math.max(4, (n / 25).toInt))) {
      val cents = Similarity.refineCentroids(e, nc, iters = 2)
      var minMargin = Double.PositiveInfinity
      val bucketOf = vecs.map { case (id, emb, nrm) =>
        val sims = cents.map(c => (dot(emb, c._2) / (nrm * c._3), c._1))
        val best = sims.maxBy(s => (s._1, -s._2))
        val second = sims.filter(_._2 != best._2).map(_._1).max
        minMargin = math.min(minMargin, best._1 - second)
        id -> best._2
      }.toMap
      assert(minMargin >= 1e-7,
        s"nc=$nc: argmax margin $minMargin too small for a safe hash oracle")
      var minTauDist = Double.PositiveInfinity
      for (i <- vecs.indices; j <- (i + 1) until vecs.length
           if bucketOf(vecs(i)._1) == bucketOf(vecs(j)._1)) {
        val c = dot(vecs(i)._2, vecs(j)._2) / (vecs(i)._3 * vecs(j)._3)
        minTauDist = math.min(minTauDist, math.abs(c - 0.95))
      }
      assert(minTauDist >= 0.05,
        s"nc=$nc: a within-cluster pair cosine sits $minTauDist from tau=0.95")
    }
  }

  test("oracle-scale bound: both gate parameterizations stay on the FLAT assignment path (nc <= 512) at every Verify scale") {
    // The q_semdedup / q_semdedup_linear DuckDB oracles (OracleCtes
    // .semDedupCtes / lloydCtes) replay the FLAT nearest-centroid argmax;
    // Dedup.semDedupVecs routes through the approximate assignWithHier
    // (probes = 8) whenever nc > 512, which would make the operator
    // legitimately diverge from the oracle and fail as an opaque hash
    // mismatch (r13 ADVICE #1). q_semdedup_linear's nc = n/25 crosses
    // 512 at ~12,800 embeddings — far above every scale Verify runs
    // (driver: sf0.01 = 500 vecs; local check.py: sf0.01/sf0.1 ≤ 2000
    // vecs). Pin that bound HERE so fixture growth fails pointedly.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val n = Tables.embeddings(spark, dir).count()
      for ((label, nc) <- Seq(
          "q_semdedup sqrt(n)" -> Similarity.centroidCount(n),
          "q_semdedup_linear n/25" -> math.max(4, (n / 25).toInt))) {
        assert(nc <= 512,
          s"$dir: $label gives nc=$nc > 512 — semDedupVecs would switch " +
            "to the hierarchical assignment (probes=8) and DIVERGE from " +
            "the flat-argmax DuckDB oracle. Either shrink the fixture, " +
            "raise the flat-path threshold, or extend " +
            "OracleCtes.semDedupCtes with the hier routing.")
      }
    }
  }

  test("hierarchical assignment tracks the flat scan and keeps exact dups co-clustered") {
    val e = Similarity.withNorm(spark, sf)
    val n = e.count()
    val nc = math.max(4, (n / 5).toInt) // force a large centroid set
    val cents = Similarity.refineCentroids(e, nc, iters = 1, hier = true)
    val flat = Similarity.assignWith(e, cents)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    val hier = Similarity.assignWithHier(e, cents)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(hier.keySet == flat.keySet)
    // the probe may miss the true nearest cell for borderline vectors;
    // on this corpus agreement must stay high (the IVF recall argument
    // — and this tiny-cluster setup is the adversarial case: cells of
    // ~5 members mean each unprobed cell hides more candidates than at
    // production scale, where cells hold ~√nc centroids)
    val agree = flat.count { case (id, b) => hier(id) == b }.toDouble / flat.size
    assert(agree >= 0.85, s"hier/flat agreement $agree")
    // probing EVERY cell removes the approximation entirely: the scan
    // order differs from flat but on tie-free data the argmax is the same
    val ncc = math.ceil(math.sqrt(cents.length.toDouble)).toInt
    val full = Similarity.assignWithHier(e, cents, probes = ncc)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(full == flat, "full-probe hier must equal the flat scan")
    // identical vectors follow identical probe paths -> same cluster
    val slim = e.select("vec_id", "embedding", "nrm")
    val row = slim.where(col("vec_id") === 11L).collect().head
    val twin = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(9999L, row.getAs[Any]("embedding"),
        row.getAs[Double]("nrm"))), slim.schema)
    val both = Similarity.assignWithHier(slim.unionByName(twin), cents)
      .where(col("vec_id").isin(11L, 9999L))
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(both(11L) == both(9999L), "identical vectors split across clusters")
    // determinism: identical recompute
    val again = Similarity.assignWithHier(e, cents)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap
    assert(again == hier)
  }
}
