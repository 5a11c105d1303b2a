package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextAnalytics

/** Deduplication operators for LLM-data pipelines over `documents`
  * (brief north-star). Scale stance: NO all-pairs joins — exact dedup is a
  * hash groupBy; near-dup goes through an inverted shingle index (with a
  * document-frequency cap against hot-shingle skew) or MinHash-LSH
  * banding, both of which bucket before comparing. That is the only shape
  * that survives 100 TB (VERDICT.md: "an all-pairs cross-join on
  * embeddings/docs is the canonical 100 TB killer").
  */
object Dedup {

  /** Exact dedup: content hash + keep the lowest doc_id per hash. One
    * shuffle on the 256-bit hash; row_number over the hash partition is
    * bounded by duplicate-group size, never by data volume. */
  def exact(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("text_hash").orderBy("doc_id")
    Tables.documents(s, d)
      .withColumn("text_hash", sha2(col("text"), 256))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("doc_id", "text_hash", "lang", "n_chars")
  }

  /** Distinct 3-token shingles per document: (doc_id, shingle) pairs. */
  private def shingles(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalytics.tokens(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', slice(toks, i+1, 3)))")))
        .as("sh"))
  }

  /** Near-dup by n-gram Jaccard over an inverted shingle index: explode
    * distinct shingles, drop shingles appearing in > maxDf docs (hot-key
    * guard — a stop-shingle shared by half the corpus would otherwise
    * create a quadratic join output), self-join on shingle, count shared
    * shingles per candidate pair, compute exact Jaccard, threshold.
    * Candidate generation cost is sum over shingles of df², bounded by
    * maxDf² per shingle — linear-ish in corpus size, not quadratic. */
  def ngramJaccard(s: SparkSession, d: String,
      threshold: Double = 0.12, maxDf: Long = 100L): DataFrame = {
    val sh = shingles(s, d)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val rare = sh.join(
      sh.groupBy("sh").agg(count(lit(1)).as("df")).where(col("df") <= maxDf),
      Seq("sh"))
    val pairs = rare.as("a")
      .join(rare.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "a_n"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "b_n"), Seq("b_id"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("a_n") + col("b_n") - col("shared")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select("a_id", "b_id", "shared", "a_n", "b_n", "jaccard")
  }

  /** Near-dup via MinHash-LSH banding (spark.ml): shingle sets → sparse
    * binary vectors (HashingTF) → MinHashLSH → approxSimilarityJoin, which
    * OR-combines hash-table buckets and only compares within buckets —
    * the scale path when even the inverted index is too wide. */
  def minhashLsh(s: SparkSession, d: String, maxJaccardDist: Double = 0.85): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
    val sets = shingles(s, d)
      .groupBy("doc_id").agg(collect_list("sh").as("sh_set"))
    val tf = new HashingTF().setInputCol("sh_set").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val vecs = tf.transform(sets).select("doc_id", "features").cache()
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("bands")
      .setNumHashTables(8).setSeed(42L)
    val model = lsh.fit(vecs)
    model.approxSimilarityJoin(vecs, vecs, maxJaccardDist, "jaccard_dist")
      .select(col("datasetA.doc_id").as("a_id"), col("datasetB.doc_id").as("b_id"),
        col("jaccard_dist"))
      .where(col("a_id") < col("b_id"))
  }

  /** 64-bit SimHash per document from token hashes (sign-aggregated bit
    * votes), plus 4×16-bit band keys for bucketed near-dup grouping.
    * Pure expression pipeline: per-token 64-bit hash (xxhash64), per-bit
    * ±1 votes aggregated with SQL higher-order functions. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val toks = TextAnalytics.tokens(col("text"))
    // votes: for bit i, sum over tokens of (bit set ? 1 : -1); simhash bit
    // i = 1 iff votes > 0. aggregate() folds entirely inside codegen.
    val sim = expr(
      """aggregate(
        |  sequence(0, 63),
        |  0L,
        |  (acc, i) -> acc + if(
        |    aggregate(th, 0L,
        |      (v, h) -> v + if(((h >> i) & 1L) = 1L, 1L, -1L)) > 0L,
        |    shiftleft(1L, i), 0L))""".stripMargin)
    Tables.documents(s, d)
      .select(col("doc_id"), array_distinct(toks).as("tok_set"))
      .withColumn("th", transform(col("tok_set"), t => xxhash64(t)))
      .withColumn("simhash", sim)
      .select(col("doc_id"), col("simhash"),
        col("simhash").bitwiseAND(lit(0xFFFFL)).as("band0"),
        shiftrightunsigned(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)).as("band1"),
        shiftrightunsigned(col("simhash"), 32).bitwiseAND(lit(0xFFFFL)).as("band2"),
        shiftrightunsigned(col("simhash"), 48).bitwiseAND(lit(0xFFFFL)).as("band3"))
  }

  /** SimHash near-dup candidates: docs sharing any 16-bit band (standard
    * 4-band blocking for Hamming distance ≤ 3-ish), verified by exact
    * Hamming distance on the 64-bit signatures. Bucketed, not all-pairs. */
  def simhashNearDup(s: SparkSession, d: String, maxHamming: Int = 12): DataFrame = {
    val sh = simhash(s, d).cache()
    val byBand = (0 to 3).map { b =>
      sh.select(col("doc_id"), col("simhash"), col(s"band$b").as("band"), lit(b).as("band_idx"))
    }.reduce(_.unionAll(_))
    val hamming = expr(
      "aggregate(sequence(0,63), 0, (acc,i) -> acc + int((shiftrightunsigned(a_sim ^ b_sim, i) & 1)))")
    byBand.as("a")
      .join(byBand.as("b"),
        col("a.band") === col("b.band") && col("a.band_idx") === col("b.band_idx")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.simhash").as("a_sim"), col("b.simhash").as("b_sim"))
      .distinct()
      .withColumn("hamming", hamming)
      .where(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }
}
