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
}
