package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Invariant pins for the round-9 dedup additions (q_split_leakage /
  * q_window_dedup / q_prefix_dedup). The DuckDB oracles pin the values
  * at sf0.01; these tests pin the CONTRACTS the oracles can't see —
  * leakage rows really do have a train twin, the debounce really
  * enforces the horizon, prefix clusters really share prefixes. */
class SplitLeakageSpec extends SparkTestBase {
  import spark.implicits._

  test("every leakage row's text really exists verbatim in the train split") {
    val leaks = Dedup.splitLeakage(spark, sf).collect()
    assert(leaks.nonEmpty, "the planted re-crawl must produce real leakage")
    val baseDocs = Tables.documents(spark, sf)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .as[(Long, String)].collect()
    // the operator's corpus: documents + every 7th doc again at id+10000
    val docs = (baseDocs ++ baseDocs.collect {
      case (id, h) if id % 7 == 0 => (id + 10000L, h)
    }).toMap
    def split(id: Long): String = {
      val b = (((id % 2147483648L) * 1103515245L + 12345L) % 2147483648L) % 100L
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    leaks.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(split(id) != "train", s"doc $id reported from the train split")
      assert(split(r.getAs[Long]("first_train_doc")) == "train",
        s"witness ${r.getAs[Long]("first_train_doc")} not in train")
      assert(docs(r.getAs[Long]("first_train_doc")) == docs(id),
        s"doc $id and its witness differ in content")
    }
    // and completeness: brute-force recount agrees
    val byHash = docs.toSeq.groupBy(_._2)
    val expect = docs.count { case (id, h) =>
      split(id) != "train" && byHash(h).exists(p => split(p._1) == "train")
    }
    assert(leaks.length == expect, s"${leaks.length} != $expect leaked docs")
  }

  test("window debounce keeps exactly the events with no same-key " +
      "predecessor inside the horizon") {
    val kept = Dedup.windowDedup(spark, sf, horizonS = 60L)
      .select("event_id").as[Long].collect().toSet
    val evs = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")))
      .as[(Long, Long, String, Long)].collect()
    evs.groupBy(e => (e._2, e._3)).foreach { case (_, group) =>
      val sorted = group.sortBy(e => (e._4, e._1))
      sorted.zipWithIndex.foreach { case ((id, _, _, t), i) =>
        val expectKeep = i == 0 || t - sorted(i - 1)._4 > 60000000L
        assert(kept.contains(id) == expectKeep,
          s"event $id keep=${kept.contains(id)}, expected $expectKeep")
      }
    }
  }

  test("prefix clusters share a 64-char prefix and never overcount exact dups") {
    val rows = Dedup.prefixDedup(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val byPrefix = docs.groupBy(d => d._2.take(64))
    val expect = byPrefix.filter(_._2.length > 1)
    assert(rows.length == expect.size,
      s"${rows.length} clusters != ${expect.size} brute-force prefix groups")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val distinctFull = r.getAs[Long]("n_distinct_full")
      assert(distinctFull >= 1L && distinctFull <= n,
        s"n_distinct_full $distinctFull outside [1, $n]")
    }
    // canonical_doc is the minimum member id of its cluster
    val canon = rows.map(_.getAs[Long]("canonical_doc")).toSet
    expect.foreach { case (_, members) =>
      assert(canon.contains(members.map(_._1).min))
    }
  }
}
