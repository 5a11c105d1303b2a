package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.etl.Packing

/** Sequence packing: token-budget sharding (distributed prefix sum) and
  * greedy per-shard packing. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  test("packShards: running-total sharding matches a hand-computed cut") {
    // token counts: 3, 3, 3, 3 with budget 5 -> start offsets 0,3,6,9
    // -> shards 0,0,1,1
    val d = docs(
      (1L, "en", "a b c"), (2L, "en", "d e f"),
      (3L, "en", "g h i"), (4L, "en", "j k l"))
    val out = Packing.packShards(d, budget = 5L, chunkDocs = 2L)
      .orderBy("doc_id").select("doc_id", "shard").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("packShards: two-level prefix sum is exact across chunk boundaries") {
    // 20 docs of 1 token each ("x" — a digit suffix would tokenize as a
    // second run), chunkDocs=4 forces 6 id-range chunks; budget 6 ->
    // shard = floor((i-1)/6) when doc_ids are 1..20
    val d = docs((1L to 20L).map(i => (i, "en", "x")): _*)
    val out = Packing.packShards(d, budget = 6L, chunkDocs = 4L)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    (1L to 20L).foreach { i => assert(out(i) == (i - 1) / 6, s"doc $i") }
  }

  test("packShards: languages shard independently") {
    val d = docs(
      (1L, "en", "a b"), (2L, "de", "x y"), (3L, "en", "c d"), (4L, "de", "z w"))
    val out = Packing.packShards(d, budget = 3L, chunkDocs = 2L)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    // per lang: offsets 0 and 2 with budget 3 -> shards 0 and 0
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("packGreedyDocs: packs never exceed budget except single big docs") {
    val d = Tables.documents(spark, sf)
    val shards = Packing.packShards(d, budget = 512L)
    val packed = Packing.packGreedyDocs(shards, budget = 512L)
    val sums = packed.groupBy("lang", "shard", "pack")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(sums.nonEmpty)
    sums.foreach { case (lang, shard, pack, tok, n) =>
      assert(tok <= 512L || n == 1L, s"pack ($lang,$shard,$pack): $tok tokens in $n docs")
    }
    // every input doc is packed exactly once
    assert(packed.count() == d.count())
    assert(packed.select("doc_id").distinct().count() == d.count())
  }

  test("greedyPacks properties: capacity, monotonicity, maximality") {
    val cases = for {
      budget <- Gen.choose(1L, 200L)
      toks   <- Gen.listOf(Gen.choose(0L, 60L))
    } yield (budget, toks.toArray)
    val prop = Prop.forAll(cases) { case (budget, toks) =>
      val packs = Packing.greedyPacks(toks, budget)
      val byPack = toks.indices.groupBy(packs(_))
      val capacity = byPack.values.forall { idx =>
        idx.map(toks(_)).sum <= budget || idx.size == 1
      }
      // pack ids start at 0 and never skip
      val monotone = packs.isEmpty ||
        (packs.head == 0L && packs.sliding(2).forall {
          case Array(a, b) => b == a || b == a + 1; case _ => true
        })
      // greedy maximality: a new pack only opens when the previous one
      // genuinely could not take the next item
      val maximal = toks.indices.drop(1).forall { i =>
        packs(i) == packs(i - 1) ||
          byPack(packs(i - 1)).map(toks(_)).sum + toks(i) > budget
      }
      capacity && monotone && maximal
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("packGreedyDocs: pack ids are consecutive from 0 in doc order") {
    val d = docs(
      (1L, "en", "a b c d"),   // 4 tokens
      (2L, "en", "e f g"),     // 3 -> pack 0 full at 7? budget 7: 4+3=7 ok
      (3L, "en", "h i"),       // 2 -> overflow -> pack 1
      (4L, "en", "j"))         // 1 -> pack 1 (3)
    val shards = Packing.packShards(d, budget = 100L) // one shard
    val out = Packing.packGreedyDocs(shards, budget = 7L)
      .orderBy("doc_id").select("doc_id", "pack").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }
}
