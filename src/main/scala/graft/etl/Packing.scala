package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget training shards, then greedily pack documents into
  * model sequences within each shard — the step between a cleaned corpus
  * (graft.etl.CorpusPipeline) and a tokenizer/loader.
  *
  * Two operators, deliberately layered for scale:
  *
  *  1. [[packShards]] — a deterministic token-budget SHARDING: documents
  *     in (lang, doc_id) order are cut into shards of ~budget tokens by
  *     the running token total. The running total is computed as a
  *     two-level distributed prefix sum (within-chunk cumsum + cumulative
  *     chunk totals joined back), NOT as one window over the whole
  *     language: a per-language window is the reference's global-window
  *     hazard all over again — one range partition per language would
  *     sort corpus-sized data on a single task at 100 TB. Chunk size
  *     bounds every window partition; the second-level scan runs over
  *     corpus/chunkDocs rows (recurse the same trick if THAT ever gets
  *     big — two levels with the default covers ~10^9 docs per language).
  *  2. [[packGreedyDocs]] — exact greedy first-fit packing WITHIN a
  *     shard (new sequence when the budget would overflow). Greedy
  *     packing is inherently sequential, so it runs as a typed
  *     flatMapGroups per (lang, shard) — and stays scale-safe precisely
  *     because stage 1 bounded each shard to ~budget tokens plus one
  *     straddling document. Never run a sequential packer per LANGUAGE;
  *     always per bounded shard.
  *
  * Both stages are pure functions of (doc_id, lang, n_tokens), so the
  * composition is oracle-checkable end to end (`q_pack_shards`,
  * `q_pack_greedy` — the greedy recurrence maps to a DuckDB recursive
  * CTE that advances all (lang, shard) groups in lockstep).
  */
object Packing {

  /** BPE-ish token counts per document (same regex family as
    * TextAnalytics.tokenCount: letter runs / digit runs / single
    * punctuation) — the cheap deterministic proxy for tokenizer budget. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")
        .as("n_tokens"))

  /** Token-budget sharding: shard = (running token total before this doc)
    * div budget, over documents in (lang, doc_id) order. A document whose
    * tokens straddle a boundary belongs to the shard where it STARTS, so
    * shards hold ~budget tokens (never less than budget unless the
    * language runs out, at most budget + its last doc's overhang).
    *
    * @param chunkDocs  doc_ids per first-level chunk; every window
    *                   partition in the scan is ≤ this many rows
    */
  def packShards(docs: DataFrame, budget: Long = 2048L,
      chunkDocs: Long = 1024L): DataFrame = {
    // the explicit not-null filter matches what join-key null-filter
    // inference would add to ONE branch only; stating it up front keeps
    // both branch subtrees canonically identical (ReuseExchange, below)
    val t = tokenCounts(docs).withColumn("chunk", expr(s"doc_id div $chunkDocs"))
      .where(col("lang").isNotNull && col("chunk").isNotNull)
    // level 1: cumsum within (lang, chunk) — partition bounded by chunkDocs.
    // The chunk TOTAL (ctot) is a second, whole-partition frame over the
    // SAME (partition, order) spec. The orderBy on the whole-partition
    // frame is semantically redundant but LOAD-BEARING: it makes the
    // level-2 branch's window need exactly the same input columns as the
    // level-1 branch (doc_id is the sort key), so column pruning cannot
    // specialize the two subtrees and ReuseExchange collapses them onto
    // ONE scan + ONE shuffle — the corpus is read and tokenized once,
    // not twice (round-8 q_pack_greedy diagnosis, SCALE.md)
    val wChunk = Window.partitionBy("lang", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wWhole = Window.partitionBy("lang", "chunk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val within = t.withColumn("wcum", sum("n_tokens").over(wChunk))
      .withColumn("ctot", sum("n_tokens").over(wWhole))
    // level 2: cumulative totals of PRIOR chunks — corpus/chunkDocs rows,
    // broadcast back (chunk-count-sized, ~MBs even at petabyte corpora);
    // ctot is constant per chunk, so the distinct collapses to one row
    // per (lang, chunk)
    val wPrev = Window.partitionBy("lang").orderBy("chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunkPrefix = within.select("lang", "chunk", "ctot").distinct()
      .withColumn("cpre", coalesce(sum("ctot").over(wPrev), lit(0L)))
      .select("lang", "chunk", "cpre")
    within
      .join(broadcast(chunkPrefix), Seq("lang", "chunk"))
      .withColumn("cum", col("cpre") + col("wcum"))
      .withColumn("shard", expr(s"(cum - n_tokens) div $budget"))
      .select("doc_id", "lang", "n_tokens", "shard")
  }

  /** Row shape of [[packShards]] output (public: encoder codegen needs
    * constructor access). */
  case class ShardDoc(doc_id: Long, lang: String, shard: Long, n_tokens: Long)

  /** Greedy sequence packing within each (lang, shard): walk documents in
    * doc_id order, open a new pack when adding the next document would
    * exceed the budget (a single over-budget document still gets its own
    * pack). Input must carry (doc_id, lang, shard, n_tokens) — normally
    * [[packShards]] output, which also bounds each group to ~budget
    * tokens so the per-group walk is O(budget/avg_doc). */
  /** The greedy recurrence as a pure fold (property-tested without a
    * SparkSession): pack index per position given token counts in order.
    * First item always opens pack 0, even when alone over budget. */
  def greedyPacks(tokens: Array[Long], budget: Long): Array[Long] = {
    val out = new Array[Long](tokens.length)
    var acc = 0L
    var pack = 0L
    var i = 0
    while (i < tokens.length) {
      if (i > 0 && acc + tokens(i) > budget) { pack += 1; acc = tokens(i) }
      else acc += tokens(i)
      out(i) = pack
      i += 1
    }
    out
  }

  /** Declarative form of the per-shard greedy fold: ONE hash aggregate
    * (collect_list under the bounded-group contract — stage 1 bounds
    * every (lang, shard) group to ~budget tokens), then the greedy
    * recurrence as a higher-order `aggregate` over the sorted doc
    * array, zipped back and exploded. Replaces the round-7
    * `groupByKey(lambda).flatMapGroups` typed path, whose per-row
    * encoder/serialize cost was the measured ~40 µs/row constant behind
    * q_pack_greedy's 22× sf1 bench scaling (SCALE.md round-8 entry):
    * object-hash aggregation beats shuffle+sort+typed-iterate, and no
    * row ever leaves Tungsten format. */
  def packGreedyDocs(shards: DataFrame, budget: Long = 2048L): DataFrame =
    shards.select("doc_id", "lang", "shard", "n_tokens")
      .groupBy("lang", "shard")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n_tokens"))))
        .as("ds"))
      // the same recurrence as greedyPacks (the property-tested fold):
      // first doc always opens pack 0; a doc that would overflow opens
      // the next pack and resets the accumulator
      .withColumn("packs", expr(
        s"""aggregate(ds,
           |  named_struct('packs', cast(array() as array<bigint>),
           |               'acc', 0L, 'pack', 0L),
           |  (st, x) -> if(size(st.packs) > 0 and st.acc + x.n_tokens > ${budget}L,
           |    named_struct('packs', concat(st.packs, array(st.pack + 1L)),
           |                 'acc', x.n_tokens, 'pack', st.pack + 1L),
           |    named_struct('packs', concat(st.packs, array(st.pack)),
           |                 'acc', st.acc + x.n_tokens, 'pack', st.pack)),
           |  st -> st.packs)""".stripMargin))
      .select(col("lang"), col("shard"),
        explode(arrays_zip(col("ds"), col("packs"))).as("z"))
      .select(col("z.ds.doc_id").as("doc_id"), col("lang"), col("shard"),
        col("z.packs").as("pack"), col("z.ds.n_tokens").as("n_tokens"))

  /** Packing-efficiency report — the utilization audit a training-data
    * team runs after any packing change: per language, the pack count,
    * doc count, token total, MEAN UTILIZATION (total tokens / packs ×
    * budget — exact integer sums, one final divide) and the count of
    * over-budget packs (single documents larger than the budget, the
    * greedy contract's only overflow case). Two partial-aggregated
    * groupBys on top of [[packGreedyDocs]]; chain-oracled through the
    * same recursive CTE as q_pack_greedy. */
  def packEfficiency(s: SparkSession, d: String, budget: Long = 2048L): DataFrame =
    packGreedyDocs(packShards(Tables.documents(s, d)), budget)
      .groupBy("lang", "shard", "pack")
      .agg(sum("n_tokens").as("pack_tokens"), count(lit(1)).as("n_docs"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_packs"),
        sum("n_docs").as("n_docs"),
        sum("pack_tokens").as("total_tokens"),
        round(sum("pack_tokens").cast("double") / (count(lit(1)) * budget), 6)
          .as("mean_util"),
        sum(when(col("pack_tokens") > budget, 1L).otherwise(0L)).as("n_overflow"))

  /** Length-bucketed inference batching — group docs of similar token
    * length into fixed-size batches (the padding-waste killer for any
    * batched tokenizer/embedder). Buckets are n_tokens div bucketTokens;
    * batch ids are assigned WITHIN (bucket, id-chunk) so every
    * row_number partition is bounded by chunkDocs — never a corpus-sized
    * per-bucket window (the same discipline as [[packShards]]'s prefix
    * sum; the cost is at most one ragged batch per (bucket, chunk),
    * which the efficiency report above would surface if it mattered). */
  def lengthBatches(s: SparkSession, d: String, bucketTokens: Long = 64L,
      batchSize: Long = 16L, chunkDocs: Long = 1024L): DataFrame = {
    val w = Window.partitionBy("len_bucket", "chunk").orderBy("doc_id")
    tokenCounts(Tables.documents(s, d))
      .withColumn("len_bucket", expr(s"n_tokens div $bucketTokens"))
      .withColumn("chunk", expr(s"doc_id div $chunkDocs"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("batch_idx", expr(s"(rn - 1) div $batchSize"))
      .select("doc_id", "lang", "n_tokens", "len_bucket", "chunk", "batch_idx")
  }

  /** Gate query: token-budget shards over the documents table. */
  def shards(s: SparkSession, d: String): DataFrame =
    packShards(Tables.documents(s, d))

  /** Gate query: greedy packs within the shards of [[shards]]. */
  def greedy(s: SparkSession, d: String): DataFrame =
    packGreedyDocs(packShards(Tables.documents(s, d)))
}
