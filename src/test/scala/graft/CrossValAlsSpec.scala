package graft

import org.apache.spark.sql.functions._
import graft.ml.Pipelines

/** Model-selection (CrossValidator) and ALS recommendation contracts —
  * seeded JVM fits, so spec-pinned rather than oracled. */
class CrossValAlsSpec extends SparkTestBase {

  test("cross-validation scores every grid point and flags exactly one winner") {
    val out = Pipelines.crossValidate(spark, sf).collect()
    assert(out.length == 4, s"2x2 grid must give 4 rows, got ${out.length}")
    val chosen = out.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.length == 1, "exactly one grid point is chosen")
    val best = chosen.head.getAs[Double]("cv_rmse")
    out.foreach(r => assert(best <= r.getAs[Double]("cv_rmse") + 1e-12))
    out.foreach { r =>
      val rmse = r.getAs[Double]("cv_rmse")
      assert(!rmse.isNaN && rmse > 0, s"rmse must be finite positive: $rmse")
    }
    // rerun is bit-identical (seeded folds + seeded fits)
    val again = Pipelines.crossValidate(spark, sf).collect()
    assert(out.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("frequent itemsets obey downward closure and exact support counts") {
    val out = Pipelines.freqItemsets(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    // anti-monotonicity: a superset never outnumbers its subsets
    for ((set, freq) <- out; (sub, subFreq) <- out
        if sub != set && sub.split('+').forall(set.split('+').contains))
      assert(subFreq >= freq, s"$sub ($subFreq) < $set ($freq)")
    // singleton supports equal direct counts
    val clickUsers = Tables.events(spark, sf)
      .where(col("event_type") === "click").select("user_id").distinct().count()
    out.get("click").foreach(f => assert(f == clickUsers))
  }

  test("word2vec synonyms are deterministic, bounded, and exclude the probe") {
    // the SERIAL form (numPartitions = 1) is the bit-reproducible one;
    // the operator DEFAULT is the distributed fit (scale-safe plan).
    val a = Pipelines.word2vec(spark, sf, numPartitions = 1).collect()
    val b = Pipelines.word2vec(spark, sf, numPartitions = 1).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq,
      "seeded single-partition fit must be bit-reproducible")
    assert(a.length == 5)
    a.foreach { r =>
      assert(r.getString(1) != "spark", "probe is not its own synonym")
      val sim = r.getAs[Double]("similarity")
      assert(sim >= -1.0 - 1e-9 && sim <= 1.0 + 1e-9)
    }
  }

  test("word2vec distributed default preserves planted synonym structure (serial-fit parity)") {
    // Gates the determinism-for-throughput trade (the IVF-PQ raw/residual
    // precedent). The driver corpus is a near-uniform 31-word bag, so
    // serial-vs-distributed top-10 overlap there is chance-level
    // (measured 3/10 at sf0.01 = the 10*10/30 expectation) for ANY
    // partitioning -- raw-neighborhood overlap on noise gates nothing.
    // Instead the gate plants real structure: two disjoint 8-word topics,
    // each document drawn from exactly one. A correct fit -- serial OR
    // distributed -- must place a probe word's nearest neighbors inside
    // its own topic; that is the property distributed averaging must not
    // destroy.
    import spark.implicits._
    val topicA = Vector("red", "green", "blue", "cyan", "teal", "pink", "amber", "ivory")
    val topicB = Vector("dog", "cat", "wolf", "bear", "lynx", "otter", "mole", "hare")
    val docs = (0 until 400).map { i =>
      val v = if (i % 2 == 0) topicA else topicB
      // deterministic LCG token stream
      Tuple1((0 until 24).map(j => v((((i * 2654435761L + j * 40503L) >>> 8) % 8).toInt)))
    }.toDF("tokens")
    def topicPurity(numPartitions: Int): (Int, Set[String]) = {
      val syn = Pipelines
        .word2vecSynonyms(spark, docs, "red", topK = 5, numPartitions = numPartitions)
        .collect().map(_.getString(1)).toSet
      (syn.count(topicA.contains), syn)
    }
    val (serialPure, serialSyn) = topicPurity(1)
    val (distPure, distSyn) = topicPurity(0) // operator default: defaultParallelism
    info(s"serial top-5 in-topic: $serialPure/5 $serialSyn")
    info(s"distributed top-5 in-topic: $distPure/5 $distSyn")
    assert(serialPure >= 4, s"serial fit lost planted structure: $serialSyn")
    assert(distPure >= 4,
      s"distributed default lost planted structure the serial fit finds: $distSyn")
    // A rerun of the distributed fit is NOT bit-identical (cross-partition
    // float reduction order flips tie-margin neighbors — measured: a
    // teal/cyan swap, both in-topic), but the learned STRUCTURE is stable:
    val (rerunPure, rerunSyn) = topicPurity(0)
    info(s"distributed rerun in-topic: $rerunPure/5 $rerunSyn")
    assert(rerunPure >= 4,
      s"distributed rerun lost planted structure: $rerunSyn")
    // r15 verdict #8: PRICE the documented override ("a deployment
    // raises numPartitions and owns the quality trade") — at 4× the
    // gate's pinned training parallelism the averaged-SGD fit must
    // still recover the planted topics (numbers quoted in SCALE.md)
    val (p32Pure, p32Syn) = topicPurity(32)
    info(s"numPartitions=32 top-5 in-topic: $p32Pure/5 $p32Syn")
    assert(p32Pure >= 4,
      s"numPartitions=32 override lost planted structure: $p32Syn")
  }

  test("ALS covers every interacting user with one top-1 recommendation") {
    val out = Pipelines.alsRecommend(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 5)
    val covered = out.map(_.getAs[Long]("n_users_top1")).sum
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(covered == users,
      s"every interacting user gets a rec: covered=$covered users=$users")
    out.foreach(r => assert(r.getAs[Long]("n_users_top1") > 0))
  }
}
